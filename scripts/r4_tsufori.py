"""Round-4 probe: can a CHEAP-COMPILE streaming config beat the
Tsukuba-scale default (non-stream dual unrolled, 0.63 ms, ~40 s
compile)?

The 0.449 ms `--fast` profile needs the UNROLLED dual-stream roll
emission at (112,384), whose chain executables pay a ~272 s Mosaic
compile per process — fine for --serve/--sequence, too slow for the
one-shot CLI default.  The fori emissions compile in 3-25 s.  This
probe measures the fori-branch streaming variants at Tsukuba scale:

  - single-view fori stream (unroll_max=8 forces the branch), roll,
    vmem {default, 32}
  - dual-view fori stream (dual_view=True + unroll_max=8), roll,
    vmem {default, 32}, plus a forced (112,384) to compare with the
    unrolled 0.449
  - one mxu y-sum variant for the record

against the pinned DEFAULT_CONFIG baseline in the same process.
Chain-of-17/49 fori-loop differencing (BENCH.md methodology).

POST-MORTEM: the forced (112,384) row shares the auto row's
StereoConfig, so the jit trace cache ignored the forced tiles and it
re-measured the (168,384) auto executable (0.416 vs 0.422 — same
kernel plus jitter).  All OTHER rows have distinct cfgs and are
valid; the decider conclusions (single-view fori stream wins, dual
loses) are unaffected.  See BENCH.md "Methodology post-mortem".
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
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline
from stereo_matching_cuda_tpu.utils.io import read_png

print(f"device: {jax.devices()[0].device_kind}", flush=True)

D = "/root/reference/stereo_matching_cuda/data"
tsul = read_png(f"{D}/tsukuba0.png")
tsur = read_png(f"{D}/tsukuba1.png")
lj, rj = jnp.asarray(tsul), jnp.asarray(tsur)


def sv(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, unroll_max=8,
                               dual_view=False, stream=True, **kw)


def dv(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, unroll_max=8,
                               dual_view=True, stream=True, **kw)


CONFIGS = [
    ("baseline default (non-stream dual unroll)", DEFAULT_CONFIG, None),
    ("dual fori stream roll vmem32 auto", dv(y_sum="roll", vmem_mb=32), None),
    ("dual fori stream roll vmem32 (112,384)", dv(y_sum="roll", vmem_mb=32),
     (112, 384)),
    ("dual fori stream roll default-vmem auto", dv(y_sum="roll"), None),
    ("single fori stream roll vmem32 auto", sv(y_sum="roll", vmem_mb=32),
     None),
    ("dual fori stream mxu vmem32 auto", dv(y_sum="mxu", vmem_mb=32), None),
]

orig_pick = pg._pick_tiles_stream

for label, cfg, forced in CONFIGS:
    h, w = tsul.shape[:2]
    pg._pick_tiles_stream = (
        (lambda *a, **k: forced) if forced else orig_pick)
    desc = ""
    if pg.use_stream(cfg):
        from stereo_matching_cuda_tpu.pipeline import use_dual_view

        dual = use_dual_view(cfg)
        geom = pg.dual_geometry if dual else pg.fused_geometry
        _, px = geom(cfg)
        try:
            if forced:
                sh, tw = forced
            elif dual:
                sh, tw = orig_pick(h, w, px, cfg.radius, cfg.size_d,
                                   pg._vmem_params(cfg)[0],
                                   pg._dual_stream_n_live(cfg),
                                   carry_bufs=8 * cfg.size_d + 4,
                                   max_sh=pg._stream_sh_cap(cfg))
            else:
                sh, tw = orig_pick(h, w, px, cfg.radius, cfg.size_d,
                                   pg._vmem_params(cfg)[0],
                                   pg._stream_n_live(cfg),
                                   max_sh=pg._stream_sh_cap(cfg))
        except ValueError as e:
            print(f"  [{label}] no tiling: {e}", flush=True)
            continue
        A = pg._stream_carry(cfg.radius)
        nyp = (h + A + 2 * cfg.radius + sh - 1) // sh
        nx = (w + tw - 1) // tw
        wte = ((tw + 2 * px + 127) // 128) * 128
        ratio = nx * wte * nyp * sh / (h * w)
        desc = (f" tiles=({sh},{tw}) nyp={nyp} nx={nx} ratio={ratio:.2f}"
                f" dual={dual}")

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
        float(fs(lj, rj))
        t17 = time.time() - t0
        t0 = time.time()
        float(fb(lj, rj))
        print(f"  [{label}{desc}] chain compiles {t17:.1f}s + "
              f"{time.time()-t0:.1f}s", flush=True)
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
