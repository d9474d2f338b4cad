"""Dual-view fori-branch decider: does combining the two measured wins
— the fori branch's big tiles (fewer live ext buffers) and the dual
kernel's shared DMA/derivative/raw-cost work — beat the current
big-frame strategy (single-view fori ×2, roll y-sums: 6 MP 24.3 ms,
3 MP 12.5 ms, 5.9 MP/128 d roll 308.7 ms — BENCH.md)?

Configs run the product staged path with explicit knobs
(dual_view=True + unroll_max=8 forces the dual kernel's fori branch;
effective_config leaves explicit knobs alone), (t5-t1)/4 chain
differencing, min of 2.  A Mosaic VMEM OOM at compile = the
_DUAL_N_LIVE_FORI estimate is too low for that config.
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
    stereo_pipeline_staged, use_dual_view, use_staged_path)
from stereo_matching_cuda_tpu.ops.pallas_guided import (
    _dual_n_live, _pick_tiles, _vmem_params, dual_geometry)

print(f"device: {jax.devices()[0].device_kind}", flush=True)

rng = np.random.default_rng(1)
big_l = rng.integers(0, 256, size=(1992, 3008, 3), dtype=np.uint8)
big_r = np.roll(big_l, 7, axis=1)
rng = np.random.default_rng(3)
mid_l = rng.integers(0, 256, size=(1504, 2000, 3), dtype=np.uint8)
mid_r = np.roll(mid_l, 9, axis=1)
rng = np.random.default_rng(2)
wl = rng.integers(0, 256, size=(1988, 2948, 3), dtype=np.uint8)
wr = np.roll(wl, 11, axis=1)

summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))

CONFIGS = [
    ("6MP dual-fori roll (single-fori roll: 24.3)", big_l, big_r,
     dataclasses.replace(DEFAULT_CONFIG, dual_view=True, unroll_max=8,
                         y_sum="roll")),
    ("6MP dual-fori mxu (single-fori mxu: 31.4)", big_l, big_r,
     dataclasses.replace(DEFAULT_CONFIG, dual_view=True, unroll_max=8,
                         y_sum="mxu")),
    ("3MP dual-fori roll (single-fori roll: 12.5)", mid_l, mid_r,
     dataclasses.replace(DEFAULT_CONFIG, dual_view=True, unroll_max=8,
                         y_sum="roll")),
    ("5.9MP 128d dual-fori roll (single-fori roll: 308.7)", wl, wr,
     dataclasses.replace(DEFAULT_CONFIG, d_min=-127, d_max=0,
                         dual_view=True, y_sum="roll")),
]

for label, lnp, rnp, cfg in CONFIGS:
    h, w = lnp.shape[:2]
    assert use_staged_path(cfg, h, w) and use_dual_view(cfg)
    hy, px = dual_geometry(cfg)
    sh, tw = _pick_tiles(h, w, px, hy, vmem_budget=_vmem_params(cfg)[0],
                         n_live=_dual_n_live(cfg))
    lj, rj = jnp.asarray(lnp), jnp.asarray(rnp)

    def frame(l, r, cfg=cfg):
        return stereo_pipeline_staged(l, r, cfg)["occlusion_filled"]

    try:
        t0 = time.time()
        float(summ(frame(lj, rj)))
        print(f"  [{label} tiles=({sh},{tw})] compile+first "
              f"{time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"  [{label} tiles=({sh},{tw})] FAILED: {type(e).__name__}: "
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
    print(f"  {label}: {per:.1f} ms/frame ({1e3/per:.2f} fps)", flush=True)
print("done", flush=True)
