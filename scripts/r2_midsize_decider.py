"""Mid-size crossover decider: dual unrolled vs fori+roll at 0.5/1 MP.

The big-frame strategy (fori + roll y-sums) wins at 2.1/3/6 MP and
loses at Tsukuba (0.11 MP).  These frames run the COMPOSED jit (below
the staged gate), so the probe uses composed-pipeline chained-in-jit
N=9/N=25 differencing.  If fori+roll wins at 1 MP or below, the
strategy gate (pipeline._BIG_STRATEGY area threshold) should decouple
from _STAGED_PIXELS and move down.
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
from bench import _timeit
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline


def make_looped_cfg(cfg, n):
    def step(i, carry):
        li, ri = carry
        out = stereo_pipeline(li, ri, cfg)["occlusion_filled"]
        li2 = li + (out[..., None].astype(jnp.uint8) & 1)
        return (li2, ri)

    def run(l, r):
        lo, _ = jax.lax.fori_loop(0, n, step, (l, r))
        return jnp.sum(lo.astype(jnp.float32))

    return jax.jit(run)


print(f"device: {jax.devices()[0].device_kind}", flush=True)

FORI_ROLL = dataclasses.replace(DEFAULT_CONFIG, unroll_max=8, y_sum="roll")

for size_label, h, w in [("0.5MP", 640, 800), ("1MP", 896, 1152)]:
    rng = np.random.default_rng(5)
    lnp = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    rnp = np.roll(lnp, 9, axis=1)
    lj, rj = jnp.asarray(lnp), jnp.asarray(rnp)
    for label, cfg in [("dual", DEFAULT_CONFIG), ("fori+roll", FORI_ROLL)]:
        fs, fb = make_looped_cfg(cfg, 9), make_looped_cfg(cfg, 25)
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
