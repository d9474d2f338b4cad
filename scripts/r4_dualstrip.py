"""Round-4 follow-up: can the DUAL fori streaming kernel beat the new
single-view default (0.383 ms) when given enough VMEM for a
full-height strip?

At vmem32 the dual fori working set (44 live ext buffers) only affords
(168,384) → 2 strips (0.422, r4_tsufori).  A single (336,384) strip
needs ~44*360*512*4 = 32.4 MB — just over the vmem32 budget.  The dual
kernel shares the tile DMA, derivatives and the iota/area masks
between views and runs ONE program instead of two, so if the budget is
the only blocker it may shave the shared work off 2x0.19.  Also
re-checks the single-view pick at vmem24 (is 32 necessary?) and
vmem64 (does more headroom change the pick?).

Chain-of-17/49 (BENCH.md methodology), one process.
"""

import dataclasses
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

import stereo_matching_cuda_tpu.ops.pallas_guided as pg
from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline, use_dual_view
from stereo_matching_cuda_tpu.utils.io import read_png

print(f"device: {jax.devices()[0].device_kind}", flush=True)

D = "/root/reference/stereo_matching_cuda/data"
lj = jnp.asarray(read_png(f"{D}/tsukuba0.png"))
rj = jnp.asarray(read_png(f"{D}/tsukuba1.png"))
h, w = lj.shape[:2]


def sv(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, unroll_max=8,
                               dual_view=False, stream=True,
                               y_sum="roll", **kw)


def dv(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, unroll_max=8,
                               dual_view=True, stream=True,
                               y_sum="roll", **kw)


CONFIGS = [
    ("single fori stream vmem32 (shipped default)", sv(vmem_mb=32)),
    ("dual fori stream vmem48", dv(vmem_mb=48)),
    ("dual fori stream vmem64", dv(vmem_mb=64)),
    ("single fori stream vmem24", sv(vmem_mb=24)),
    ("single fori stream vmem64", sv(vmem_mb=64)),
]

for label, cfg in CONFIGS:
    dual = use_dual_view(cfg)
    geom = pg.dual_geometry if dual else pg.fused_geometry
    _, px = geom(cfg)
    try:
        if dual:
            sh, tw = pg._pick_tiles_stream(
                h, w, px, cfg.radius, cfg.size_d, pg._vmem_params(cfg)[0],
                pg._dual_stream_n_live(cfg),
                carry_bufs=8 * cfg.size_d + 4,
                max_sh=pg._stream_sh_cap(cfg))
        else:
            sh, tw = pg._pick_tiles_stream(
                h, w, px, cfg.radius, cfg.size_d, pg._vmem_params(cfg)[0],
                pg._stream_n_live(cfg), max_sh=pg._stream_sh_cap(cfg))
    except ValueError as e:
        print(f"  [{label}] no tiling: {e}", flush=True)
        continue
    A = pg._stream_carry(cfg.radius)
    nyp = (h + A + 2 * cfg.radius + sh - 1) // sh
    desc = f" tiles=({sh},{tw}) nyp={nyp} dual={dual}"

    def make_looped(n, cfg=cfg):
        def step(i, carry):
            li, ri = carry
            out = stereo_pipeline(li, ri, cfg)["occlusion_filled"]
            return (li + (out[..., None].astype(jnp.uint8) & 1), ri)

        def run(l, r):
            lo, _ = jax.lax.fori_loop(0, n, step, (l, r))
            return jnp.sum(lo.astype(jnp.float32))

        return jax.jit(run)

    try:
        fs, fb = make_looped(17), make_looped(49)
        t0 = time.time()
        float(fs(lj, rj)); float(fb(lj, rj))
        print(f"  [{label}{desc}] chains compile {time.time()-t0:.1f}s",
              flush=True)
    except Exception as e:
        print(f"  [{label}{desc}] FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        continue

    def tt(f):
        t0 = time.time(); float(f(lj, rj)); return time.time() - t0

    ts = min(tt(fs) for _ in range(3))
    tb = min(tt(fb) for _ in range(3))
    per = (tb - ts) / 32 * 1e3
    print(f"  {label}: {per:.3f} ms/frame ({1e3/per:.1f} fps)", flush=True)

print("done", flush=True)
