"""Round-4 strip-height sweep at Tsukuba scale: r4_dualstrip found the
vmem24 2-strip pick (168,384) at 0.371 ms BEATS the single-strip
(336,384) at 0.396-0.427 despite issuing ~7% MORE work — Mosaic runs
shorter strips at better achieved VPU rates (and the vmem64 single
strip was slower than the identical vmem32 one, so the scoped limit
itself also matters).  The picker's issued-work objective misses this.
Sweep forced strip heights on the single-view fori stream roll kernel
(chain-of-17/49, one process) to find the real optimum before
adjusting _SMALL_STRATEGY.

POST-MORTEM (do not trust the forced-sh rows): rows whose
StereoConfig equals an earlier row's (all the vmem32 sh=... rows)
never re-ran _pick_tiles_stream — the fused wrapper is an inner jit
with static cfg and the jaxpr trace cache skips retracing, so the
monkeypatched picker was never called and those rows re-measured the
first row's auto (336,384) executable plus jitter.  Only the
vmem24/vmem16 rows measured distinct executables.  See BENCH.md
"Methodology post-mortem"; give every forced-tile row a distinct cfg.
"""

import dataclasses
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

import stereo_matching_cuda_tpu.ops.pallas_guided as pg
from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline
from stereo_matching_cuda_tpu.utils.io import read_png

print(f"device: {jax.devices()[0].device_kind}", flush=True)

D = "/root/reference/stereo_matching_cuda/data"
lj = jnp.asarray(read_png(f"{D}/tsukuba0.png"))
rj = jnp.asarray(read_png(f"{D}/tsukuba1.png"))
h, w = 288, 384


def sv(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, unroll_max=8,
                               dual_view=False, stream=True,
                               y_sum="roll", **kw)


# (label, vmem_mb, forced (sh, tw) or None for the auto pick)
CONFIGS = [
    ("auto vmem32 (336)", 32, None),
    ("sh=168 vmem32", 32, (168, 384)),
    ("sh=112 vmem32", 32, (112, 384)),
    ("sh=88 vmem32", 32, (88, 384)),
    ("sh=64 vmem32", 32, (64, 384)),
    ("sh=136 vmem32", 32, (136, 384)),
    ("sh=224 vmem32", 32, (224, 384)),
    ("sh=168 vmem24", 24, (168, 384)),
    ("sh=112 vmem16", 16, (112, 384)),
]

orig_pick = pg._pick_tiles_stream

for label, mb, forced in CONFIGS:
    cfg = sv(vmem_mb=mb)
    pg._pick_tiles_stream = (
        (lambda *a, **k: forced) if forced else orig_pick)
    A = pg._stream_carry(cfg.radius)
    if forced:
        sh = forced[0]
    else:
        _, px = pg.fused_geometry(cfg)
        sh, _ = orig_pick(h, w, px, cfg.radius, cfg.size_d,
                          pg._vmem_params(cfg)[0], pg._stream_n_live(cfg),
                          max_sh=pg._stream_sh_cap(cfg))
    nyp = (h + A + 2 * cfg.radius + sh - 1) // sh
    desc = f" sh={sh} nyp={nyp}"

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

pg._pick_tiles_stream = orig_pick
print("done", flush=True)
