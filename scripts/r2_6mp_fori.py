"""6 MP / 128-d fori-kernel probe: the fori d-loop branch keeps far
fewer ext-tile buffers live than the unrolled branch (_N_LIVE_FORI),
affording bigger tiles — roofline (scripts/roofline.py) predicts a
single-view fori pass at 6 MP costs 6.1-6.6 ms/view (mxu/roll) vs the
unrolled dual kernel's 23.7 ms serialized bound, i.e. a potential
~2x frame win despite running two passes.

Configs (staged product path, (t5-t1)/4 differencing, min of 2):
  6 MP, unroll_max=8 forces the fori branch, y_sum in roll/mxu3/mxu;
  5.9 MP 128-disp re-run at the new (bigger) fori tiles, default VMEM
  (old-tile baselines: 362.2 default / 252.3 vmem32) and vmem 32.
Mosaic VMEM OOM at compile time = the _N_LIVE_FORI estimate is too
low; the config prints FAILED and the estimate must be raised.
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
from stereo_matching_cuda_tpu.ops.pallas_guided import (
    _n_live, _pick_tiles, _vmem_params, fused_geometry)

print(f"device: {jax.devices()[0].device_kind}", flush=True)

rng = np.random.default_rng(1)
big_l = rng.integers(0, 256, size=(1992, 3008, 3), dtype=np.uint8)
big_r = np.roll(big_l, 7, axis=1)
rng = np.random.default_rng(2)
wl = rng.integers(0, 256, size=(1988, 2948, 3), dtype=np.uint8)
wr = np.roll(wl, 11, axis=1)

summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))

CONFIGS = [
    ("6MP fori roll", big_l, big_r, dataclasses.replace(
        DEFAULT_CONFIG, unroll_max=8, y_sum="roll")),
    ("6MP fori mxu3", big_l, big_r, dataclasses.replace(
        DEFAULT_CONFIG, unroll_max=8, y_sum="mxu3")),
    ("6MP fori mxu", big_l, big_r, dataclasses.replace(
        DEFAULT_CONFIG, unroll_max=8, y_sum="mxu")),
    ("128d fori-tiles default-vmem", wl, wr, dataclasses.replace(
        DEFAULT_CONFIG, d_min=-127, d_max=0)),
    ("128d fori-tiles vmem32", wl, wr, dataclasses.replace(
        DEFAULT_CONFIG, d_min=-127, d_max=0, vmem_mb=32)),
    ("128d fori-tiles roll", wl, wr, dataclasses.replace(
        DEFAULT_CONFIG, d_min=-127, d_max=0, y_sum="roll")),
]

for label, lnp, rnp, cfg in CONFIGS:
    h, w = lnp.shape[:2]
    assert use_staged_path(cfg, h, w)
    hy, px = fused_geometry(cfg)
    sh, tw = _pick_tiles(h, w, px, hy, vmem_budget=_vmem_params(cfg)[0],
                         n_live=_n_live(cfg))
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
