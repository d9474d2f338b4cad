"""Round-3 probe: big-VMEM tiles against the halo-recompute overhead.

The r3 swpipe probe showed Mosaic schedules no VPU/MXU overlap — the
kernel runs at the speed of the work it ISSUES.  The remaining roofline
gap is therefore halo recompute: at 16 MiB the 6 MP fori tile issues
1.81x the frame's interior work, the 128-d tile 3.1x, the Tsukuba dual
tile 2.6x.  _pick_tiles now optimizes the exact issued-work ratio
(incl. strip ceil waste), and bigger VMEM budgets buy flatter ratios:

  6 MP fori roll:  vmem32 (256,640) 1.56 · vmem64 (224,1536) 1.36 ·
                   vmem96 (512,1024) 1.29     [16 MiB: (128,512) 1.81]
  128 d fori mxu:  vmem32 (128,1024) 2.03 · vmem64 (96,W) 1.72 ·
                   vmem96 (160,W) 1.54        [16 MiB: (64,640) 3.13]
  Tsukuba dual:    vmem32 (160,384) 1.93      [16 MiB: (64,384) 2.59]

If the issued-work model holds (it predicted the r2 vmem32 numbers to
~3%), 6 MP lands ~17.6 ms and Tsukuba ~0.52 ms/frame.  The Tsukuba
dual cell is the UNROLLED kernel whose Mosaic compile at big strips
took ~30 min in r2 — it runs LAST; the persistent compile cache
amortizes it for repeat runs (the vmem32 warm-cache product story).

Also: 128-d default-VMEM re-run (the picker now chooses (64,640),
predicted -5%), and a 6 MP fori mxu2 cell (2-pass y-sum matmul —
completes the y-sum matrix; serial prediction ~= roll).
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
    stereo_pipeline, stereo_pipeline_staged, use_staged_path)
from stereo_matching_cuda_tpu.ops.pallas_guided import (
    _dual_n_live, _n_live, _pick_tiles, _vmem_params, dual_geometry,
    fused_geometry)
from stereo_matching_cuda_tpu.utils.io import read_png
from stereo_matching_cuda_tpu.utils.synth import make_scene

print(f"device: {jax.devices()[0].device_kind}", flush=True)

s6 = make_scene(1992, 3008, ndisp=16, seed=7)
big_l, big_r = s6["left"], s6["right"]
sw = make_scene(1988, 2948, ndisp=128, seed=7)
wl, wr = sw["left"], sw["right"]
D = "/root/reference/stereo_matching_cuda/data"
tl = read_png(f"{D}/tsukuba0.png")
tr = read_png(f"{D}/tsukuba1.png")

summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))


def six(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, unroll_max=8,
                               dual_view=False, **kw)


def wide(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, d_min=-127, d_max=0, **kw)


CONFIGS = [
    ("6MP roll vmem32", big_l, big_r, six(y_sum="roll", vmem_mb=32)),
    ("6MP roll vmem64", big_l, big_r, six(y_sum="roll", vmem_mb=64)),
    ("6MP roll vmem96", big_l, big_r, six(y_sum="roll", vmem_mb=96)),
    ("6MP mxu2 default-vmem", big_l, big_r, six(y_sum="mxu2")),
    ("128d mxu new-default-tiles", wl, wr, wide()),
    ("128d mxu vmem32", wl, wr, wide(vmem_mb=32)),
    ("128d mxu vmem64", wl, wr, wide(vmem_mb=64)),
    ("128d mxu vmem96", wl, wr, wide(vmem_mb=96)),
    ("tsukuba dual vmem32 (long compile)", tl, tr,
     dataclasses.replace(DEFAULT_CONFIG, vmem_mb=32)),
]

for label, lnp, rnp, cfg in CONFIGS:
    h, w = lnp.shape[:2]
    staged = use_staged_path(cfg, h, w)
    dual = "dual" in label
    hy, px = (dual_geometry if dual else fused_geometry)(cfg)
    nl = _dual_n_live(cfg) if dual else _n_live(cfg)
    sh, tw = _pick_tiles(h, w, px, hy, vmem_budget=_vmem_params(cfg)[0],
                         n_live=nl)
    lj, rj = jnp.asarray(lnp), jnp.asarray(rnp)

    def frame(l, r, cfg=cfg, staged=staged):
        fn = stereo_pipeline_staged if staged else stereo_pipeline
        return fn(l, r, cfg)["occlusion_filled"]

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

    if h <= 512:     # tsukuba: sub-ms frames need long chains in one jit
        def make_looped(n, cfg=cfg):
            def step(i, carry):
                li, ri = carry
                out = stereo_pipeline(li, ri, cfg)["occlusion_filled"]
                return (li + (out[..., None].astype(jnp.uint8) & 1), ri)

            def run(l, r):
                lo, _ = jax.lax.fori_loop(0, n, step, (l, r))
                return jnp.sum(lo.astype(jnp.float32))

            return jax.jit(run)

        fs, fb = make_looped(17), make_looped(49)
        t0 = time.time()
        float(fs(lj, rj)); float(fb(lj, rj))
        print(f"    chain compile {time.time()-t0:.1f}s", flush=True)

        def tt(f):
            t0 = time.time(); float(f(lj, rj)); return time.time() - t0

        ts = min(tt(fs) for _ in range(3))
        tb = min(tt(fb) for _ in range(3))
        per = (tb - ts) / 32 * 1e3
    else:
        run_chain(1)
        t1 = min(run_chain(1), run_chain(1))
        t5 = min(run_chain(5), run_chain(5))
        per = (t5 - t1) / 4 * 1e3
    print(f"  {label}: {per:.2f} ms/frame ({1e3/per:.2f} fps)", flush=True)
print("done", flush=True)
