"""Round-3 probe: software-pipelined fori emission (VERDICT #1a).

At big-frame scale the shipped strategy is single-view fori + roll
y-sums — all-VPU, so the serialized-phases roofline gap cannot close
without moving work to the idle MXU *and* overlapping it.  The
pipelined fori emission (cfg.sw_pipeline) carries slice s-1's phase-1
means through the loop so each body holds two independent matmul
groups with the other's VPU work to overlap.  If Mosaic schedules the
overlap, pipe+mxu should approach the VPU-only time minus the roll
y-sum work (~20% of the frame).

Matrix (staged product path, structured layered-scene frames — the new
bench standard, (t5-t1)/4 chained differencing, min of 2):
  6 MP/16 d: fori roll plain (baseline), pipe roll, pipe mxu, pipe
    mxu3, plain mxu (re-baseline on structured frames)
  5.9 MP/128 d: plain mxu (shipped), pipe mxu, pipe mxu3
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
from stereo_matching_cuda_tpu.utils.synth import make_scene

print(f"device: {jax.devices()[0].device_kind}", flush=True)

s6 = make_scene(1992, 3008, ndisp=16, seed=7)
big_l, big_r = s6["left"], s6["right"]
sw = make_scene(1988, 2948, ndisp=128, seed=7)
wl, wr = sw["left"], sw["right"]

summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))


def six(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, unroll_max=8,
                               dual_view=False, **kw)


def wide(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, d_min=-127, d_max=0, **kw)


CONFIGS = [
    ("6MP fori roll plain (shipped)", big_l, big_r,
     six(y_sum="roll", sw_pipeline=False)),
    ("6MP fori roll pipe", big_l, big_r,
     six(y_sum="roll", sw_pipeline=True)),
    ("6MP fori mxu pipe", big_l, big_r,
     six(y_sum="mxu", sw_pipeline=True)),
    ("6MP fori mxu3 pipe", big_l, big_r,
     six(y_sum="mxu3", sw_pipeline=True)),
    ("6MP fori mxu plain", big_l, big_r,
     six(y_sum="mxu", sw_pipeline=False)),
    ("128d mxu plain (shipped)", wl, wr, wide(sw_pipeline=False)),
    ("128d mxu pipe", wl, wr, wide(sw_pipeline=True)),
    ("128d mxu3 pipe", wl, wr, wide(y_sum="mxu3", sw_pipeline=True)),
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
