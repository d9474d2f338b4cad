"""Confirm the ~1-1.5 MP band before lowering the strategy threshold.

Measured so far (composed pipeline): fori+roll wins 0.25 MP (−45%),
0.5 MP (−30%), loses 1 MP by 2.5% (noise-level, one shape), wins
2.1/3/6 MP.  Probe two more shapes in the band; if dual never wins
beyond noise, the auto-flip threshold moves from 2.1 MP to 0.2 MP.
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
from bench import make_looped, _timeit

print(f"device: {jax.devices()[0].device_kind}", flush=True)

FORI_ROLL = dataclasses.replace(DEFAULT_CONFIG, unroll_max=8, y_sum="roll")

for size_label, h, w in [("0.98MP", 768, 1280), ("1.5MP", 1024, 1472)]:
    rng = np.random.default_rng(9)
    lnp = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    rnp = np.roll(lnp, 9, axis=1)
    lj, rj = jnp.asarray(lnp), jnp.asarray(rnp)
    for label, cfg in [("dual", DEFAULT_CONFIG), ("fori+roll", FORI_ROLL)]:
        fs, fb = make_looped(cfg, 9), make_looped(cfg, 25)
        try:
            t0 = time.time()
            float(fs(lj, rj)); float(fb(lj, rj))
            print(f"  [{size_label} {label}] compile+first "
                  f"{time.time()-t0:.1f}s", flush=True)
        except Exception as e:
            print(f"  [{size_label} {label}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        ts = min(_timeit(fs, lj, rj) for _ in range(3))
        tb = min(_timeit(fb, lj, rj) for _ in range(3))
        per = (tb - ts) / 16 * 1e3
        print(f"  {size_label} {label}: {per:.2f} ms/frame", flush=True)
print("done", flush=True)
