"""Round-4 follow-up: dual-view fori STREAMING kernel at 6 MP.

The 6 MP default runs the single-view fori stream kernel twice
(18.4 ms).  The dual kernel shares the tile DMA, derivatives and the
iota/area masks and halves the program count; in the fori branch the
raw costs are NOT shared (both views' carried shifts), so the
expected win is a few % — but at 27 programs/view the shared
per-program work is bigger than at Tsukuba (where dual tied).
Carries double (8/slice vs 4), so tiles shrink; probe vmem64 and
vmem96.  Staged chain-of-5 differencing, structured frames.
"""

import dataclasses
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

import stereo_matching_cuda_tpu.ops.pallas_guided as pg
from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import (
    effective_config, stereo_pipeline_staged)
from stereo_matching_cuda_tpu.utils.synth import make_scene

print(f"device: {jax.devices()[0].device_kind}", flush=True)

sc = make_scene(1992, 3008, ndisp=16, seed=7)
lj, rj = jnp.asarray(sc["left"]), jnp.asarray(sc["right"])
h, w = 1992, 3008

base = effective_config(DEFAULT_CONFIG, h, w)
print(f"auto 6MP config: stream={base.stream} vmem={base.vmem_mb} "
      f"unroll_max={base.unroll_max}", flush=True)


def dv(**kw):
    return dataclasses.replace(base, dual_view=True, **kw)


CONFIGS = [
    ("6MP single fori stream vmem64 [shipped]", base),
    ("6MP dual fori stream vmem64", dv()),
    ("6MP dual fori stream vmem96", dv(vmem_mb=96)),
]

summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))

for label, cfg in CONFIGS:
    A = pg._stream_carry(cfg.radius)
    _, px = (pg.dual_geometry if cfg.dual_view is True
             else pg.fused_geometry)(cfg)
    try:
        if cfg.dual_view is True:
            sh, tw = pg._pick_tiles_stream(
                h, w, px, cfg.radius, cfg.size_d, pg._vmem_params(cfg)[0],
                pg._dual_stream_n_live(cfg),
                carry_bufs=8 * cfg.size_d + 4,
                max_sh=pg._stream_sh_cap(cfg))
        else:
            sh, tw = pg._pick_tiles_stream(
                h, w, px, cfg.radius, cfg.size_d, pg._vmem_params(cfg)[0],
                pg._stream_n_live(cfg), max_sh=pg._stream_sh_cap(cfg))
        desc = f" tiles=({sh},{tw})"
    except ValueError as e:
        print(f"  [{label}] no tiling: {e}", flush=True)
        continue

    def frame(l, cfg=cfg):
        return stereo_pipeline_staged(l, rj, cfg)["occlusion_filled"]

    try:
        t0 = time.time()
        float(summ(frame(lj)))
        print(f"  [{label}{desc}] compile+first {time.time()-t0:.1f}s",
              flush=True)
    except Exception as e:
        print(f"  [{label}{desc}] FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        continue

    def chain(n):
        t0 = time.time()
        l, f = lj, None
        for _ in range(n):
            f = frame(l)
            l = perturb(l, f)
        float(summ(f))
        return time.time() - t0

    chain(1)
    t1 = min(chain(1), chain(1))
    t5 = min(chain(5), chain(5))
    per = (t5 - t1) / 4 * 1e3
    print(f"  {label}: {per:.2f} ms/frame", flush=True)

print("done", flush=True)
