"""Round-4 sweep: streaming-kernel budget/tile tail.

  - 3 MP forced tiles (auto (392,1024) won only −5%; try 1536-wide)
  - --fast profile single-frame compile+first time (the CLI user's
    cost; the 272 s number is for chain-of-17/49 executables)
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
from stereo_matching_cuda_tpu.utils.io import read_png
from stereo_matching_cuda_tpu.utils.synth import make_scene

print(f"device: {jax.devices()[0].device_kind}", flush=True)

s3 = make_scene(1504, 2048, ndisp=16, seed=7)
summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))


def wide(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, d_min=-127, d_max=0,
                               stream=True, **kw)


cfg3 = effective_config(DEFAULT_CONFIG, 1504, 2048)

CONFIGS = [
    ("3MP stream (256,1536)", s3["left"], s3["right"], cfg3, (256, 1536)),
    ("3MP stream (192,1536)", s3["left"], s3["right"], cfg3, (192, 1536)),
    ("3MP stream (512,1024)", s3["left"], s3["right"], cfg3, (512, 1024)),
]

orig_pick = pg._pick_tiles_stream

for label, lnp, rnp, cfg, forced in CONFIGS:
    h, w = lnp.shape[:2]
    staged = use_staged_path(cfg, h, w)
    pg._pick_tiles_stream = (
        (lambda *a, **k: forced) if forced else orig_pick)
    _, px = pg.fused_geometry(cfg)
    try:
        if forced:
            sh, tw = forced
        else:
            sh, tw = orig_pick(h, w, px, cfg.radius, cfg.size_d,
                               pg._vmem_params(cfg)[0],
                               pg._stream_n_live(cfg))
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

pg._pick_tiles_stream = orig_pick

# --- --fast single-frame compile cost (fresh executable shapes) -----
D = "/root/reference/stereo_matching_cuda/data"
tl, tr = read_png(f"{D}/tsukuba0.png"), read_png(f"{D}/tsukuba1.png")
fast = dataclasses.replace(DEFAULT_CONFIG, stream=True, y_sum="roll",
                           vmem_mb=32)
lj, rj = jnp.asarray(tl), jnp.asarray(tr)
t0 = time.time()
out = stereo_pipeline(lj, rj, fast)["occlusion_filled"]
float(summ(out))
print(f"  --fast single-frame compile+first: {time.time()-t0:.1f}s",
      flush=True)
print("done", flush=True)
