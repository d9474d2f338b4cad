"""SQUARE-kernel follow-up: 3 MP / 128-disp full pipeline at default
and 32 MB VMEM budgets, plus batch B=8 Tsukuba at the winner budget.

Restricted-kernel counterparts measured 362.2 / 253.7 ms (128d) and
0.716 ms/frame (B=8, default budget); round-1 square default was
221.6 ms.  Chained timing per BENCH.md.
"""

import dataclasses
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG, StereoConfig
from stereo_matching_cuda_tpu.pipeline import (
    stereo_pipeline_batch, stereo_pipeline_staged, use_staged_path)
from stereo_matching_cuda_tpu.utils.io import read_png

D = "/root/reference/stereo_matching_cuda/data"
left = jnp.asarray(read_png(f"{D}/tsukuba0.png"))
right = jnp.asarray(read_png(f"{D}/tsukuba1.png"))
print(f"device: {jax.devices()[0].device_kind}", flush=True)

H, W = 1988, 2948
rng = np.random.default_rng(2)
base = rng.integers(0, 256, (H, W + 128, 3), np.uint8)
big_l = jnp.asarray(base[:, 128:])
big_r = jnp.asarray(base[:, :-128])
summ = jax.jit(lambda x: jnp.sum(x, dtype=jnp.float32))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))


def staged_chain(cfg, label, n=3):
    assert use_staged_path(cfg, H, W)

    def frame(l, r):
        return stereo_pipeline_staged(l, r, cfg)["occlusion_filled"]

    try:
        t0 = time.time()
        float(summ(frame(big_l, big_r)))
        print(f"  [{label}] first frame incl compile: {time.time()-t0:.1f}s",
              flush=True)

        def run_chain(k):
            t0 = time.time()
            l = big_l
            f = None
            for _ in range(k):
                f = frame(l, big_r)
                l = perturb(l, f)
            float(summ(f))
            return time.time() - t0

        run_chain(1)
        t1 = min(run_chain(1), run_chain(1))
        tn = min(run_chain(n), run_chain(n))
        per = (tn - t1) / (n - 1) * 1e3
        print(f"  {label:46s} {per:8.1f} ms/frame ({1e3/per:.2f} fps)",
              flush=True)
        return per
    except Exception as e:
        print(f"  {label:46s} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


cfg128 = StereoConfig(d_min=-127, d_max=0)
staged_chain(cfg128, "3MP/128d SQUARE, default vmem")
staged_chain(dataclasses.replace(cfg128, vmem_mb=32),
             "3MP/128d SQUARE, vmem 32")

print("=== batch B=8 Tsukuba, SQUARE vmem 32 ===", flush=True)
B = 8
lnp, rnp = np.asarray(left), np.asarray(right)
bl = jnp.asarray(np.stack([np.roll(lnp, i, axis=1) for i in range(B)]))
br = jnp.asarray(np.stack([np.roll(rnp, i, axis=1) for i in range(B)]))
c32 = dataclasses.replace(DEFAULT_CONFIG, vmem_mb=32)


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


def batch_fn(l, r):
    return stereo_pipeline_batch(l, r, c32)["occlusion_filled"].sum(
        dtype=jnp.float32)


try:
    f1, f9 = chained(batch_fn, 1), chained(batch_fn, 9)
    t0 = time.time()
    float(f1(bl, br)); float(f9(bl, br))
    print(f"  compile+first {time.time()-t0:.1f}s", flush=True)
    t1 = min(t(f1, bl, br), t(f1, bl, br))
    tn = min(t(f9, bl, br), t(f9, bl, br))
    ms = (tn - t1) / 8 * 1e3
    print(f"  batch B=8 SQUARE vmem32: {ms:.3f} ms/step -> "
          f"{ms/B:.3f} ms/frame = {1e3/(ms/B):.0f} frames/s", flush=True)
except Exception as e:
    print(f"  batch FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

print("done", flush=True)
