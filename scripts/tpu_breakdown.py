"""Where do the Tsukuba 5.7 ms/frame go?  Chained-in-jit timing of
pipeline prefixes on the TPU (run with default env)."""

import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG as cfg
from stereo_matching_cuda_tpu import ops
from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused
from stereo_matching_cuda_tpu.utils.io import read_png

D = "/root/reference/stereo_matching_cuda/data"
left = jnp.asarray(read_png(f"{D}/tsukuba0.png"))
right = jnp.asarray(read_png(f"{D}/tsukuba1.png"))


def prefix(stage):
    def run1(l, r):
        gl = ops.rgb_to_grayscale(l, cfg)
        gr = ops.rgb_to_grayscale(r, cfg)
        if stage == 0:
            return gl.astype(jnp.float32).sum() + gr.astype(jnp.float32).sum()
        bl, dl = guided_wta_fused(gl, gr, cfg.d_min, cfg)
        if stage == 1:
            return dl.sum()
        br, dr = guided_wta_fused(gr, gl, cfg.d_min_right, cfg)
        if stage == 2:
            return dl.sum() + dr.sum()
        occ = ops.detect_occlusion(dl, dr, cfg.d_occlusion, cfg)
        if stage == 3:
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


names = ["grayscale", "+fused L", "+fused L+R", "+LR check", "+fill"]
prev = 0.0
for stage, name in enumerate(names):
    f1 = chained(prefix(stage), 1)
    f9 = chained(prefix(stage), 9)
    float(f1(left, right)); float(f9(left, right))  # compile

    def t(f):
        t0 = time.time(); float(f(left, right)); return time.time() - t0

    t1 = min(t(f1), t(f1))
    t9 = min(t(f9), t(f9))
    cum = (t9 - t1) / 8
    print(f"{name:12s} cumulative {cum*1e3:7.3f} ms  delta {(cum-prev)*1e3:7.3f} ms", flush=True)
    prev = cum
