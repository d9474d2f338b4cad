"""Where do the Tsukuba ~0.66 ms/frame go in the DUAL-kernel composed
pipeline?  Chained-in-jit timing of pipeline prefixes (default env)."""

import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG as cfg
from stereo_matching_cuda_tpu import ops
from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused_dual
from stereo_matching_cuda_tpu.utils.io import read_png

D = "/root/reference/stereo_matching_cuda/data"
left = jnp.asarray(read_png(f"{D}/tsukuba0.png"))
right = jnp.asarray(read_png(f"{D}/tsukuba1.png"))
print(f"device: {jax.devices()[0].device_kind}", flush=True)


def prefix(stage):
    def run1(l, r):
        gl = ops.rgb_to_grayscale(l, cfg)
        gr = ops.rgb_to_grayscale(r, cfg)
        if stage == 0:
            return gl.astype(jnp.float32).sum() + gr.astype(jnp.float32).sum()
        _, dl, _, dr = guided_wta_fused_dual(gl, gr, cfg)
        if stage == 1:
            return dl.sum() + dr.sum()
        occ = ops.detect_occlusion(dl, dr, cfg.d_occlusion, cfg)
        if stage == 2:
            return occ.sum()
        return ops.fill_occlusion(occ, cfg.v_min, cfg).sum()
    return run1


def chained(fn, n):
    def looped(l, r):
        def step(i, carry):
            li, acc = carry
            v = fn(li, r)
            li2 = li + (v.astype(jnp.uint8) & 1)
            return (li2, acc + v)
        _, acc = jax.lax.fori_loop(0, n, step, (l, jnp.float32(0)))
        return acc
    return jax.jit(looped)


def t(f, l, r):
    t0 = time.time()
    float(f(l, r))
    return time.time() - t0


labels = ["grayscale only", "+ dual fused kernel", "+ LR check", "+ fill"]
prev = 0.0
for stage in range(4):
    f1 = chained(prefix(stage), 1)
    f17 = chained(prefix(stage), 17)
    t0 = time.time()
    float(f1(left, right)); float(f17(left, right))
    cs = time.time() - t0
    t1 = min(t(f1, left, right), t(f1, left, right))
    tn = min(t(f17, left, right), t(f17, left, right))
    ms = (tn - t1) / 16 * 1e3
    print(f"  {labels[stage]:24s} {ms:7.3f} ms/frame  (+{ms-prev:6.3f})  "
          f"[compile {cs:.0f}s]", flush=True)
    prev = ms
print("done", flush=True)
