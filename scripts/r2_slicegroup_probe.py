"""Dual-kernel slice grouping (cfg.slice_group): G slices' y-sum
matmuls batched into one lane-concatenated band matmul per guided
phase.  Bit-exact; measures whether fewer/wider MXU ops beat the extra
VMEM pressure.  Composed Tsukuba pipeline, N=17/N=49 chained
differencing, min of 3.
"""

import dataclasses
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline
from stereo_matching_cuda_tpu.ops.pallas_guided import (
    _dual_n_live, _pick_tiles, _vmem_params, dual_geometry)
from stereo_matching_cuda_tpu.utils.io import read_png

D = "/root/reference/stereo_matching_cuda/data"
left = jnp.asarray(read_png(f"{D}/tsukuba0.png"))
right = jnp.asarray(read_png(f"{D}/tsukuba1.png"))
print(f"device: {jax.devices()[0].device_kind}", flush=True)


def chained(fn, n):
    def looped(l, r):
        def step(i, carry):
            li, acc = carry
            v = fn(li, r)
            li2 = li + (v.astype(jnp.uint8) & 1)
            return (li2, acc + v)
        _, acc = jax.lax.fori_loop(0, n, step, (l, jnp.float32(0)))
        return acc
    return jax.jit(looped)


def t(f, l, r):
    t0 = time.time()
    float(f(l, r))
    return time.time() - t0


for g, mb in [(2, 32), (4, 32), (4, 48), (8, 64)]:
    cfg = dataclasses.replace(DEFAULT_CONFIG, slice_group=g, vmem_mb=mb)
    hy, px = dual_geometry(cfg)
    sh, tw = _pick_tiles(288, 384, px, hy, vmem_budget=_vmem_params(cfg)[0],
                         n_live=_dual_n_live(cfg))
    label = f"G={g} vmem={mb} tiles=({sh},{tw})"

    def frame(l, r, cfg=cfg):
        out = stereo_pipeline(l, r, cfg)["occlusion_filled"]
        return jnp.sum(out.astype(jnp.float32))

    try:
        f1, f2 = chained(frame, 17), chained(frame, 49)
        t0 = time.time()
        float(f1(left, right)); float(f2(left, right))
        cs = time.time() - t0
    except Exception as e:
        print(f"  {label}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        continue
    t1 = min(t(f1, left, right) for _ in range(3))
    t2 = min(t(f2, left, right) for _ in range(3))
    ms = (t2 - t1) / 32 * 1e3
    print(f"  {label:34s} {ms:7.3f} ms/frame  (compile+first {cs:.0f}s)",
          flush=True)
print("done", flush=True)
