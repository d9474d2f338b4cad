"""Round-3 probe B: push the wide-D VMEM budget to the chip edge.

r3_bigtile measured 128 d: 303 (16 MiB) → 218 (32) → 195 (64) → 173 (96),
tracking the issued-work ratio within ~3% every step.  The ratio keeps
falling to vmem120's (224, 2948) = 1.336 (predicted ~150 ms); v5e
carries 128 MiB VMEM so 120 leaves ~8 MiB head-room.  Also re-checks
6 MP roll at vmem80 (between the measured 64 winner and the 96
regression) and the B=8 batch at the new big-frame default.
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
                               dual_view=False, y_sum="roll", **kw)


def wide(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, d_min=-127, d_max=0, **kw)


CONFIGS = [
    ("128d mxu vmem112", wl, wr, wide(vmem_mb=112)),
    ("128d mxu vmem120", wl, wr, wide(vmem_mb=120)),
    ("128d roll vmem96", wl, wr, wide(vmem_mb=96, y_sum="roll")),
    ("6MP roll vmem80", big_l, big_r, six(vmem_mb=80)),
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
    print(f"  {label}: {per:.2f} ms/frame ({1e3/per:.2f} fps)", flush=True)
print("done", flush=True)
