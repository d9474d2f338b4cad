"""y-window-sum implementation shootout on TPU (chained-in-jit).

Measures the kernel stage (grayscale + fused single-view x2) per-frame
time for every cfg.y_sum variant at Tsukuba and 6 MP scale.  The band
matmul at HIGHEST precision is ~6 bf16 MXU passes with K = she >> 19
(the window) — the limb-split variants (mxu3/mxu2) and the VPU roll
form attack exactly that cost.  Winner becomes the module default.
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
        print(f"  {label:38s} {ms:8.3f} ms/frame   (compile+first {compile_s:.1f}s)",
              flush=True)
        return ms
    except Exception as e:
        print(f"  {label:38s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


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


VARIANTS = ["mxu3", "mxu2", "roll", "mxu"]

print("=== Tsukuba 384x288 D=16, fused x2 single-view ===", flush=True)
for v in VARIANTS:
    c = dataclasses.replace(DEFAULT_CONFIG, y_sum=v)
    per_ms(singles(c), left, right, label=f"y_sum={v}")

print("=== Tsukuba dual-view, best MXU alternative vs roll ===", flush=True)
for v in ["mxu3", "roll"]:
    c = dataclasses.replace(DEFAULT_CONFIG, y_sum=v)
    per_ms(dual(c), left, right, label=f"dual y_sum={v}")

print("=== 6 MP 1992x3008 D=16, fused x2 single-view ===", flush=True)
rng = np.random.default_rng(1)
big_l = jnp.asarray(rng.integers(0, 256, (1992, 3008, 3), np.uint8))
big_r = jnp.asarray(np.roll(np.asarray(big_l), 7, axis=1))
for v in ["mxu3", "roll", "mxu"]:
    c = dataclasses.replace(DEFAULT_CONFIG, y_sum=v)
    per_ms(singles(c), big_l, big_r, n=5, label=f"y_sum={v}")

print("done", flush=True)
