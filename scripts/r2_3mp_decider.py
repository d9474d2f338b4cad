"""3 MP / 2.1 MP decider for the big-frame kernel strategy threshold.

The 6 MP probe (scripts/r2_6mp_fori.py) measured single-view fori +
y_sum=roll at 24.3 ms/frame vs the dual unrolled kernel's 31.8 — a 24%
win.  The strategy flip (pipeline._BIG_STRATEGY) gates on frame area
>= _STAGED_PIXELS (2.1 MP); this probe checks whether fori+roll also
wins just above that gate (2.1 MP) and midway (3 MP), so the flip
doesn't regress the smaller big-frame sizes.

Staged product path, chain-of-5 differencing, min of 2 (bench.py
methodology for big frames).
"""

import dataclasses
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import (
    stereo_pipeline_staged, use_staged_path)

print(f"device: {jax.devices()[0].device_kind}", flush=True)

summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))

FORI_ROLL = dataclasses.replace(DEFAULT_CONFIG, unroll_max=8, y_sum="roll")

SIZES = [("2.1MP", 1200, 1792), ("3MP", 1504, 2000)]

for size_label, h, w in SIZES:
    rng = np.random.default_rng(3)
    lnp = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    rnp = np.roll(lnp, 9, axis=1)
    lj, rj = jnp.asarray(lnp), jnp.asarray(rnp)
    for label, cfg in [("dual (default)", DEFAULT_CONFIG),
                       ("fori+roll", FORI_ROLL)]:
        assert use_staged_path(cfg, h, w)

        def frame(l, r, cfg=cfg):
            return stereo_pipeline_staged(l, r, cfg)["occlusion_filled"]

        try:
            t0 = time.time()
            float(summ(frame(lj, rj)))
            print(f"  [{size_label} {label}] compile+first "
                  f"{time.time()-t0:.1f}s", flush=True)
        except Exception as e:
            print(f"  [{size_label} {label}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue

        def run_chain(n):
            t0 = time.time()
            l, f = lj, None
            for _ in range(n):
                f = frame(l, rj)
                l = perturb(l, f)
            float(summ(f))
            return time.time() - t0

        run_chain(1)
        t1 = min(run_chain(1), run_chain(1))
        t5 = min(run_chain(5), run_chain(5))
        per = (t5 - t1) / 4 * 1e3
        print(f"  {size_label} {label}: {per:.1f} ms/frame "
              f"({1e3/per:.2f} fps)", flush=True)
print("done", flush=True)
