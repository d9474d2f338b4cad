"""Why is batched B=8 sequence throughput (0.732 ms/frame) slower than
the single-frame chained pipeline (0.309 ms/frame)?

Compares, all inside one jit each, on Tsukuba at B=8:
  a) stereo_pipeline_batch (frame axis on the pallas grid)
  b) lax.map of the single-frame stereo_pipeline over the batch
  c) batched fused kernel alone (no gray/LR/fill) vs
  d) lax.map of the single-frame fused kernel alone
N-steps-chained differencing, min of 3.
"""

import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu import ops
from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG as cfg
from stereo_matching_cuda_tpu.pipeline import (
    stereo_pipeline, stereo_pipeline_batch)
from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused_dual
from stereo_matching_cuda_tpu.utils.io import read_png

D = "/root/reference/stereo_matching_cuda/data"
left = np.asarray(read_png(f"{D}/tsukuba0.png"))
right = np.asarray(read_png(f"{D}/tsukuba1.png"))
B = 8
bl = jnp.asarray(np.stack([np.roll(left, i, axis=1) for i in range(B)]))
br = jnp.asarray(np.stack([np.roll(right, i, axis=1) for i in range(B)]))
print(f"device: {jax.devices()[0].device_kind}", flush=True)


def chained(frame_fn, n):
    """n steps chained in one jit; each step consumes the previous."""
    def step(i, carry):
        l, acc = carry
        out = frame_fn(l)
        l2 = l + (out[..., None].astype(jnp.uint8) & 1)
        return (l2, acc + jnp.sum(out.astype(jnp.float32)))
    def run(l):
        _, acc = jax.lax.fori_loop(0, n, step, (l, jnp.float32(0)))
        return acc
    return jax.jit(run)


def t(f, x):
    t0 = time.time()
    float(f(x))
    return time.time() - t0


def per_ms(frame_fn, label, n1=3, n2=9):
    f1, f2 = chained(frame_fn, n1), chained(frame_fn, n2)
    t0 = time.time()
    float(f1(bl)); float(f2(bl))
    cs = time.time() - t0
    t1 = min(t(f1, bl) for _ in range(3))
    t2 = min(t(f2, bl) for _ in range(3))
    ms = (t2 - t1) / (n2 - n1) / B * 1e3
    print(f"  {label:44s} {ms:7.3f} ms/frame  (compile+first {cs:.0f}s)",
          flush=True)
    return ms


def full_batched(l):
    return stereo_pipeline_batch(l, br, cfg)["occlusion_filled"]


def full_laxmap(l):
    return jax.lax.map(
        lambda lr: stereo_pipeline(lr[0], lr[1], cfg)["occlusion_filled"],
        (l, br))


gb = jax.vmap(lambda x: ops.rgb_to_grayscale(x, cfg))(br)


def kern_batched(l):
    gl = jax.vmap(lambda x: ops.rgb_to_grayscale(x, cfg))(l)
    _, dl, _, _ = guided_wta_fused_dual(gl, gb, cfg)
    return dl


def kern_laxmap(l):
    gl = jax.vmap(lambda x: ops.rgb_to_grayscale(x, cfg))(l)
    def one(ab):
        _, dl, _, _ = guided_wta_fused_dual(ab[0], ab[1], cfg)
        return dl
    return jax.lax.map(one, (gl, gb))


per_ms(full_batched, "full pipeline, batched grid")
per_ms(full_laxmap, "full pipeline, lax.map per frame")
per_ms(kern_batched, "dual kernel only, batched grid")
per_ms(kern_laxmap, "dual kernel only, lax.map per frame")
print("done", flush=True)
