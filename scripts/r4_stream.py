"""Round-4 probe: streaming-y strip-carry kernel vs the round-3 tiled
defaults.

The r3 issued-work model (BENCH.md) says the kernel runs at the speed
of the work it issues and the remaining gap is y-halo recompute
(6 MP vmem64 ratio 1.36, measured 20.26 ms).  The streaming kernel
removes the y-halo entirely — expected issued ratios:

  6 MP   stream roll:  x 3200/3008 = 1.064 (tw=W) or 1.15 (tw~1024),
         y ~1.03-1.19 incl. carry copies → predicts ~15-17 ms
  128 d  stream:  carry scratch is 514 bufs x A rows — VMEM-bound;
         x-halo (px=149) keeps the ratio ~1.4-1.5 → marginal vs 163 ms
  Tsukuba single-view stream x2: y 1.17 vs dual's total 2.59, but no
         dual sharing — exploratory

Each config: staged product path, chain-of-5 differencing (chain-of-49
for Tsukuba scale), structured frames.
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
    _pick_tiles_stream, _stream_n_live, _vmem_params, fused_geometry,
    _stream_carry)
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
                               dual_view=False, stream=True, **kw)


def wide(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, d_min=-127, d_max=0,
                               stream=True, **kw)


CONFIGS = [
    ("6MP stream roll vmem64", big_l, big_r, six(y_sum="roll", vmem_mb=64)),
    ("6MP stream roll vmem96", big_l, big_r, six(y_sum="roll", vmem_mb=96)),
    ("6MP stream roll vmem32", big_l, big_r, six(y_sum="roll", vmem_mb=32)),
    ("6MP stream mxu vmem64", big_l, big_r, six(y_sum="mxu", vmem_mb=64)),
    ("128d stream roll vmem96", wl, wr, wide(y_sum="roll", vmem_mb=96)),
    ("128d stream mxu vmem96", wl, wr, wide(y_sum="mxu", vmem_mb=96)),
    ("tsukuba single stream (unrolled)", tl, tr,
     dataclasses.replace(DEFAULT_CONFIG, dual_view=False, stream=True)),
]

for label, lnp, rnp, cfg in CONFIGS:
    h, w = lnp.shape[:2]
    staged = use_staged_path(cfg, h, w)
    _, px = fused_geometry(cfg)
    try:
        sh, tw = _pick_tiles_stream(h, w, px, cfg.radius, cfg.size_d,
                                    _vmem_params(cfg)[0],
                                    _stream_n_live(cfg))
    except ValueError as e:
        print(f"  [{label}] no tiling: {e}", flush=True)
        continue
    A = _stream_carry(cfg.radius)
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
        run_chain(1)
        t1 = min(run_chain(1), run_chain(1))
        t5 = min(run_chain(5), run_chain(5))
        per = (t5 - t1) / 4 * 1e3
    print(f"  {label}: {per:.2f} ms/frame ({1e3/per:.2f} fps)", flush=True)
print("done", flush=True)
