"""Dual-view kernel vs two single-view calls on TPU (chained-in-jit).

Measures, on Tsukuba and a 6 MP frame:
  - two guided_wta_fused calls (round-1 production path)
  - one guided_wta_fused_dual call
  - full stereo_pipeline with dual_view=False vs True
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

cfg = DEFAULT_CONFIG
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
    print(f"  {label:34s} {ms:8.3f} ms/frame   (compile+first {compile_s:.1f}s)",
          flush=True)
    return ms


def singles(l, r):
    gl = ops.rgb_to_grayscale(l, cfg)
    gr = ops.rgb_to_grayscale(r, cfg)
    _, dl = guided_wta_fused(gl, gr, cfg.d_min, cfg)
    _, dr = guided_wta_fused(gr, gl, cfg.d_min_right, cfg)
    return dl.sum() + dr.sum()


def dual(l, r):
    gl = ops.rgb_to_grayscale(l, cfg)
    gr = ops.rgb_to_grayscale(r, cfg)
    _, dl, _, dr = guided_wta_fused_dual(gl, gr, cfg)
    return dl.sum() + dr.sum()


def full(c):
    from stereo_matching_cuda_tpu.pipeline import stereo_pipeline

    def fn(l, r):
        return stereo_pipeline(l, r, c)["occlusion_filled"].sum()
    return fn


print("=== Tsukuba 384x288 D=16 ===", flush=True)
per_ms(singles, left, right, label="gray + fused x2 (single-view)")
per_ms(dual, left, right, label="gray + fused dual-view")
per_ms(full(dataclasses.replace(cfg, dual_view=False)), left, right,
       label="FULL pipeline single-view")
per_ms(full(dataclasses.replace(cfg, dual_view=True)), left, right,
       label="FULL pipeline dual-view")

print("=== y-sum implementation (env STEREO_Y_SUM switch) ===", flush=True)
import stereo_matching_cuda_tpu.ops.pallas_guided as pg  # noqa: E402

pg._Y_SUM_IMPL = "roll"


def singles_roll(l, r):
    gl = ops.rgb_to_grayscale(l, cfg)
    gr = ops.rgb_to_grayscale(r, cfg)
    # separate wrapper fn so jax.jit does not reuse the mxu trace
    _, dl = guided_wta_fused(gl, gr, cfg.d_min, dataclasses.replace(cfg, eps=cfg.eps * (1 + 1e-12)))
    _, dr = guided_wta_fused(gr, gl, cfg.d_min_right, dataclasses.replace(cfg, eps=cfg.eps * (1 + 1e-12)))
    return dl.sum() + dr.sum()


per_ms(singles_roll, left, right, label="fused x2, y-sum=ROLL (VPU)")
pg._Y_SUM_IMPL = "mxu"

print("=== 6 MP 1992x3008 D=16 (kernel stage only) ===", flush=True)
rng = np.random.default_rng(1)
big_l = jnp.asarray(rng.integers(0, 256, (1992, 3008, 3), np.uint8))
big_r = jnp.asarray(np.roll(np.asarray(big_l), 7, axis=1))
per_ms(singles, big_l, big_r, n=5, label="gray + fused x2 (single-view)")
per_ms(dual, big_l, big_r, n=5, label="gray + fused dual-view")

print("done", flush=True)
