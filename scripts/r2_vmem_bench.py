"""Round-2 decisive config bench: y_sum winner x VMEM budget, plus the
batched sequence path, on TPU (chained-in-jit).

Measures:
  1. Tsukuba FULL pipeline, dual-view, y_sum=mxu3, default 16 MiB vs
     vmem_mb=100 (taller strips, fewer programs).
  2. 6 MP kernel stage (gray + fused x2): mxu3 at default vs
     vmem_mb=100 (whole-width strips: 16 programs instead of 192),
     and dual-view at vmem_mb=100.
  3. Sequence throughput stereo_pipeline_batch B=8 (batch rides the
     pallas grid — the vmap formulation does not lower on Mosaic).
"""

import dataclasses
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu import ops
from stereo_matching_cuda_tpu.ops.pallas_guided import (
    guided_wta_fused, guided_wta_fused_dual)
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline, stereo_pipeline_batch
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
    try:
        f1 = chained(fn, 1)
        fn_ = chained(fn, n)
        t0 = time.time()
        float(f1(l, r)); float(fn_(l, r))
        compile_s = time.time() - t0
        t1 = min(t(f1, l, r), t(f1, l, r))
        tn = min(t(fn_, l, r), t(fn_, l, r))
        ms = (tn - t1) / (n - 1) * 1e3
        print(f"  {label:44s} {ms:8.3f} ms/frame   (compile+first {compile_s:.1f}s)",
              flush=True)
        return ms
    except Exception as e:
        print(f"  {label:44s} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def full(c):
    def fn(l, r):
        return stereo_pipeline(l, r, c)["occlusion_filled"].sum()
    return fn


def singles(c):
    def fn(l, r):
        gl = ops.rgb_to_grayscale(l, c)
        gr = ops.rgb_to_grayscale(r, c)
        _, dl = guided_wta_fused(gl, gr, c.d_min, c)
        _, dr = guided_wta_fused(gr, gl, c.d_min_right, c)
        return dl.sum() + dr.sum()
    return fn


def dual(c):
    def fn(l, r):
        gl = ops.rgb_to_grayscale(l, c)
        gr = ops.rgb_to_grayscale(r, c)
        _, dl, _, dr = guided_wta_fused_dual(gl, gr, c)
        return dl.sum() + dr.sum()
    return fn


print("=== 1. Tsukuba FULL pipeline (dual-view) ===", flush=True)
for label, c in [
    ("dual mxu3, vmem 16",
     dataclasses.replace(DEFAULT_CONFIG, y_sum="mxu3")),
    ("dual mxu3, vmem 100",
     dataclasses.replace(DEFAULT_CONFIG, y_sum="mxu3", vmem_mb=100)),
    ("dual mxu,  vmem 100",
     dataclasses.replace(DEFAULT_CONFIG, vmem_mb=100)),
    ("dual roll, vmem 100",
     dataclasses.replace(DEFAULT_CONFIG, y_sum="roll", vmem_mb=100)),
]:
    per_ms(full(c), left, right, label=label)

print("=== 2. 6 MP kernel stage ===", flush=True)
rng = np.random.default_rng(1)
big_l = jnp.asarray(rng.integers(0, 256, (1992, 3008, 3), np.uint8))
big_r = jnp.asarray(np.roll(np.asarray(big_l), 7, axis=1))
for label, fn in [
    ("singles mxu3, vmem 16",
     singles(dataclasses.replace(DEFAULT_CONFIG, y_sum="mxu3"))),
    ("singles mxu3, vmem 100",
     singles(dataclasses.replace(DEFAULT_CONFIG, y_sum="mxu3", vmem_mb=100))),
    ("dual    mxu3, vmem 100",
     dual(dataclasses.replace(DEFAULT_CONFIG, y_sum="mxu3", vmem_mb=100))),
    ("dual    mxu3, vmem 16",
     dual(dataclasses.replace(DEFAULT_CONFIG, y_sum="mxu3"))),
    ("singles roll, vmem 100",
     singles(dataclasses.replace(DEFAULT_CONFIG, y_sum="roll", vmem_mb=100))),
    ("dual    roll, vmem 100",
     dual(dataclasses.replace(DEFAULT_CONFIG, y_sum="roll", vmem_mb=100))),
]:
    per_ms(fn, big_l, big_r, n=5, label=label)

print("=== 3. sequence throughput: batch B=8 Tsukuba ===", flush=True)
B = 8
lnp, rnp = np.asarray(left), np.asarray(right)
bl = jnp.asarray(np.stack([np.roll(lnp, i, axis=1) for i in range(B)]))
br = jnp.asarray(np.stack([np.roll(rnp, i, axis=1) for i in range(B)]))
for label, c in [
    ("batch dual mxu3, vmem 100",
     dataclasses.replace(DEFAULT_CONFIG, y_sum="mxu3", vmem_mb=100)),
]:
    def batch_fn(l, r, c=c):
        return stereo_pipeline_batch(l, r, c)["occlusion_filled"].sum()

    ms = per_ms(batch_fn, bl, br, n=9, label=label + " (per step)")
    if ms:
        print(f"    -> {ms/B:.3f} ms/frame = {1e3/(ms/B):.0f} frames/s",
              flush=True)

print("done", flush=True)
