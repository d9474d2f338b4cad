"""6 MP y-sum decider: the analytic roofline (scripts/roofline.py) says
the dual kernel is MXU-limited at 6 MP (13.4 ms bound vs 31.8 measured)
— the opposite of Tsukuba, where it is VPU-bound and the
Precision.HIGHEST band matmul won.  So retry the MXU-halving variants
here: mxu3 (3-limb bf16 split, 3 passes instead of 6) and roll (no MXU
at all, y-sums on the VPU).  Baseline y_sum=mxu measured 31.8 ms
(r2_6mp_decider).  Product staged path, (t5-t1)/4 differencing, min of 2.
"""

import dataclasses
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import (
    stereo_pipeline_staged, use_staged_path)

print(f"device: {jax.devices()[0].device_kind}", flush=True)

rng = np.random.default_rng(1)
big_l = rng.integers(0, 256, size=(1992, 3008, 3), dtype=np.uint8)
big_r = np.roll(big_l, 7, axis=1)
bl, br = jnp.asarray(big_l), jnp.asarray(big_r)

summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))

for impl in ("mxu3", "roll", "mxu2"):
    cfg = dataclasses.replace(DEFAULT_CONFIG, y_sum=impl)
    assert use_staged_path(cfg, 1992, 3008)

    def frame(l, r, cfg=cfg):
        return stereo_pipeline_staged(l, r, cfg)["occlusion_filled"]

    try:
        t0 = time.time()
        float(summ(frame(bl, br)))
        print(f"  [6MP dual y_sum={impl}] compile+first {time.time()-t0:.1f}s",
              flush=True)
    except Exception as e:
        print(f"  [6MP dual y_sum={impl}] FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        continue

    def run_chain(n):
        t0 = time.time()
        l, f = bl, None
        for _ in range(n):
            f = frame(l, br)
            l = perturb(l, f)
        float(summ(f))
        return time.time() - t0

    run_chain(1)
    t1 = min(run_chain(1), run_chain(1))
    t5 = min(run_chain(5), run_chain(5))
    per = (t5 - t1) / 4 * 1e3
    print(f"  6MP dual y_sum={impl}: {per:.1f} ms/frame ({1e3/per:.2f} fps)",
          flush=True)

# --- 128-disparity wide-range fori kernel (5.9 MP), same question.
# Baselines (r2_validate_merge, y_sum=mxu): 362.2 ms default VMEM,
# 252.3 ms @ vmem 32 (roofline: VPU-limited 209 ms default,
# MXU-limited 135 ms @ vmem 32 — so mxu3 should help only the latter).
rng = np.random.default_rng(2)
wl = rng.integers(0, 256, size=(1988, 2948, 3), dtype=np.uint8)
wr = np.roll(wl, 11, axis=1)
wlj, wrj = jnp.asarray(wl), jnp.asarray(wr)

for label, cfg in [
    ("128d vmem32 mxu3", dataclasses.replace(
        DEFAULT_CONFIG, d_min=-127, d_max=0, vmem_mb=32, y_sum="mxu3")),
    ("128d default mxu3", dataclasses.replace(
        DEFAULT_CONFIG, d_min=-127, d_max=0, y_sum="mxu3")),
    ("128d vmem32 roll", dataclasses.replace(
        DEFAULT_CONFIG, d_min=-127, d_max=0, vmem_mb=32, y_sum="roll")),
]:
    def frame(l, r, cfg=cfg):
        return stereo_pipeline_staged(l, r, cfg)["occlusion_filled"]

    try:
        t0 = time.time()
        float(summ(frame(wlj, wrj)))
        print(f"  [{label}] compile+first {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"  [{label}] FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        continue

    def run_chain(n):
        t0 = time.time()
        l, f = wlj, None
        for _ in range(n):
            f = frame(l, wrj)
            l = perturb(l, f)
        float(summ(f))
        return time.time() - t0

    run_chain(1)
    t1 = min(run_chain(1), run_chain(1))
    t5 = min(run_chain(5), run_chain(5))
    per = (t5 - t1) / 4 * 1e3
    print(f"  {label}: {per:.1f} ms/frame ({1e3/per:.2f} fps)", flush=True)
print("done", flush=True)
