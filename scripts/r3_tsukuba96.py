"""Round-3 probe: Tsukuba dual kernel at sh=96 (vmem24).

The vmem32 profile ((160,384) strips, ratio 1.93) measured 0.52 ms
behind a 1,897 s Mosaic compile.  sh=96 ((96,384), she=144) has ratio
2.0 with ZERO strip ceil waste (3x96=288=H exactly) — the model
predicts ~0.52-0.53 ms too — and the unrolled emission's compile cost
grows steeply with strip height, so this may buy the same speed at a
fraction of the compile.  vmem_mb=24 budgets exactly the (96,384)
pick."""

import dataclasses
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline
from stereo_matching_cuda_tpu.ops.pallas_guided import (
    _dual_n_live, _pick_tiles, _vmem_params, dual_geometry)
from stereo_matching_cuda_tpu.utils.io import read_png

print(f"device: {jax.devices()[0].device_kind}", flush=True)
D = "/root/reference/stereo_matching_cuda/data"
tl = jnp.asarray(read_png(f"{D}/tsukuba0.png"))
tr = jnp.asarray(read_png(f"{D}/tsukuba1.png"))

cfg = dataclasses.replace(DEFAULT_CONFIG, vmem_mb=24)
hy, px = dual_geometry(cfg)
sh, tw = _pick_tiles(288, 384, px, hy, vmem_budget=_vmem_params(cfg)[0],
                     n_live=_dual_n_live(cfg))
print(f"  vmem24 picks tiles=({sh},{tw})", flush=True)

summ = jax.jit(lambda x: jnp.sum(x))
t0 = time.time()
float(summ(stereo_pipeline(tl, tr, cfg)["occlusion_filled"]))
print(f"  first frame (incl compile): {time.time()-t0:.1f}s", flush=True)


def make_looped(n):
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
float(fs(tl, tr)); float(fb(tl, tr))
print(f"  chain compiles: {time.time()-t0:.1f}s", flush=True)


def tt(f):
    t0 = time.time(); float(f(tl, tr)); return time.time() - t0


ts = min(tt(fs) for _ in range(3))
tb = min(tt(fb) for _ in range(3))
print(f"  tsukuba vmem24 (sh={sh}): {(tb-ts)/32*1e3:.3f} ms/frame",
      flush=True)
print("done", flush=True)
