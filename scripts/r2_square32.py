"""Decider bench: SQUARE band-matmul kernel at vmem_mb=32 (sh=128
strips) vs the measured restricted@32 result (0.630 ms/frame).

Run with the working tree holding the square (pre-restriction) kernel.
Chained-in-jit timing (BENCH.md methodology).
"""

import dataclasses
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline
from stereo_matching_cuda_tpu.utils.io import read_png

D = "/root/reference/stereo_matching_cuda/data"
left = jnp.asarray(read_png(f"{D}/tsukuba0.png"))
right = jnp.asarray(read_png(f"{D}/tsukuba1.png"))
print(f"device: {jax.devices()[0].device_kind}", flush=True)


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


def per_ms(fn, l, r, n=17, label=""):
    f1 = chained(fn, 1)
    fn_ = chained(fn, n)
    t0 = time.time()
    float(f1(l, r)); float(fn_(l, r))
    compile_s = time.time() - t0
    t1 = min(t(f1, l, r), t(f1, l, r))
    tn = min(t(fn_, l, r), t(fn_, l, r))
    ms = (tn - t1) / (n - 1) * 1e3
    print(f"  {label:46s} {ms:8.3f} ms/frame  (compile+first {compile_s:.1f}s)",
          flush=True)
    return ms


for mb, label in [(32, "tsukuba full dual SQUARE, vmem 32 (sh=128)"),
                  (None, "tsukuba full dual SQUARE, default (sh=64)")]:
    cfg = dataclasses.replace(DEFAULT_CONFIG, vmem_mb=mb)

    def full(l, r, cfg=cfg):
        return stereo_pipeline(l, r, cfg)["occlusion_filled"].sum(
            dtype=jnp.float32)

    per_ms(full, left, right, label=label)

print("done", flush=True)
