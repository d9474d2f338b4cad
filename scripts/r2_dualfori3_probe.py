"""Dual-fori follow-up: the first decider (r2_dualfori_probe.py) lost
at every size with the conservative _DUAL_N_LIVE_FORI=50 estimate
picking (128,256) tiles at 6 MP vs the single-fori's (128,512).  This
probe forces the estimate down to 36 -> (128,512) tiles to separate
"estimate too conservative" from "the 4 carried ext buffers genuinely
shrink the tiles": if Mosaic OOMs or the time stays above 24.3 ms the
dual-fori is dead as a big-frame strategy.
"""

import dataclasses
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

import stereo_matching_cuda_tpu.ops.pallas_guided as pg
from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline_staged

pg._DUAL_N_LIVE_FORI = {k: 36 for k in pg._DUAL_N_LIVE_FORI}

print(f"device: {jax.devices()[0].device_kind}", flush=True)

rng = np.random.default_rng(1)
big_l = rng.integers(0, 256, size=(1992, 3008, 3), dtype=np.uint8)
big_r = np.roll(big_l, 7, axis=1)

summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))

cfg = dataclasses.replace(DEFAULT_CONFIG, dual_view=True, unroll_max=8,
                          y_sum="roll")
hy, px = pg.dual_geometry(cfg)
sh, tw = pg._pick_tiles(1992, 3008, px, hy,
                        vmem_budget=pg._vmem_params(cfg)[0],
                        n_live=pg._dual_n_live(cfg))
lj, rj = jnp.asarray(big_l), jnp.asarray(big_r)


def frame(l, r):
    return stereo_pipeline_staged(l, r, cfg)["occlusion_filled"]


try:
    t0 = time.time()
    float(summ(frame(lj, rj)))
    print(f"  [6MP dual-fori roll nlive=36 tiles=({sh},{tw})] compile+first "
          f"{time.time()-t0:.1f}s", flush=True)
except Exception as e:
    print(f"  [6MP dual-fori roll nlive=36 tiles=({sh},{tw})] FAILED: "
          f"{type(e).__name__}: {str(e)[:300]}", flush=True)
    raise SystemExit(0)


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
print(f"  6MP dual-fori roll nlive=36: {per:.1f} ms/frame "
      f"({1e3/per:.2f} fps; single-fori roll baseline 24.3)", flush=True)
print("done", flush=True)
