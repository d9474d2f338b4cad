"""Round-4: VMEM budget sweep for the mid-size (0.2-2 MP) streaming
band.

The auto big-tile budgets (_BIG_VMEM_MB=64 / wide 128) apply only at
staged scale (>=2 MP); the 0.2-2 MP band runs the streaming fori
kernel at the 16 MiB default.  Streaming compiles are fori-class
(3-25 s), so bigger budgets are cheap to probe: if 32/64 MiB wins,
extend the auto budget down to _STRATEGY_PIXELS.

Chained fori-loop (17/49) for 512x512, python chains (1 vs 5) above.
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
from stereo_matching_cuda_tpu.pipeline import (
    effective_config, stereo_pipeline, stereo_pipeline_staged,
    use_staged_path)
from stereo_matching_cuda_tpu.utils.synth import make_scene

print(f"device: {jax.devices()[0].device_kind}", flush=True)

SIZES = [(512, 512), (704, 768), (896, 1152), (1024, 1504)]
scenes = {s: make_scene(*s, ndisp=16, seed=7) for s in SIZES}
summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))

CONFIGS = []
for (h, w) in SIZES:
    base = effective_config(DEFAULT_CONFIG, h, w)
    # pin every budget explicitly — effective_config now ships the
    # mid-band vmem32 default this probe measured, so `base` alone no
    # longer represents the 16 MiB baseline
    for mb in (16, 32, 64):
        label = f"{h}x{w} stream vmem{mb}"
        CONFIGS.append((label, scenes[(h, w)],
                        dataclasses.replace(base, vmem_mb=mb)))

for label, sc, cfg in CONFIGS:
    lnp, rnp = sc["left"], sc["right"]
    h, w = lnp.shape[:2]
    staged = use_staged_path(cfg, h, w)
    _, px = pg.fused_geometry(cfg)
    try:
        sh, tw = pg._pick_tiles_stream(h, w, px, cfg.radius, cfg.size_d,
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
    lj, rj = jnp.asarray(lnp), jnp.asarray(rnp)

    def frame(l, r, cfg=cfg, staged=staged):
        fn = stereo_pipeline_staged if staged else stereo_pipeline
        return fn(l, r, cfg)["occlusion_filled"]

    try:
        t0 = time.time()
        float(summ(frame(lj, rj)))
        print(f"  [{label} tiles=({sh},{tw}) nyp={nyp} nx={nx} "
              f"ratio={ratio:.2f}] compile+first {time.time()-t0:.1f}s",
              flush=True)
    except Exception as e:
        print(f"  [{label} tiles=({sh},{tw})] FAILED: {type(e).__name__}: "
              f"{str(e)[:250]}", flush=True)
        continue

    if h <= 512:
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
