"""Round-3 probe: where does the batched frame's time go? (VERDICT #6)

B=8 sequence throughput is only ~4% under B=1 (0.657 vs 0.683 ms,
BENCH_r02.json).  stereo_pipeline_batch is a lax.map of the single-
frame pipeline, so every per-frame glue op (grayscale, LR, fill) runs
as 8 small sequential ops inside the map.  This probe:

  1. prefix-differences the batched pipeline (gray / +matching / +LR /
     +fill) to attribute the per-frame ms per stage;
  2. measures a HYBRID batch: vmapped glue (one wide op per stage for
     all 8 frames) around the batched-grid dual kernel — vs the
     shipped map-of-everything and the r2 grid-of-everything.

All chained-in-jit: N batch-steps inside one fori_loop, input perturbed
by the previous step's output, (t_N - t_1)/(N-1) differencing, min 3.
"""

import dataclasses
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu import ops
from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG as CFG
from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused_dual
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline
from stereo_matching_cuda_tpu.utils.io import read_png

print(f"device: {jax.devices()[0].device_kind}", flush=True)

D = "/root/reference/stereo_matching_cuda/data"
left = read_png(f"{D}/tsukuba0.png")
right = read_png(f"{D}/tsukuba1.png")
B = 8
bl = jnp.asarray(np.stack([np.roll(left, i, axis=1) for i in range(B)]))
br = jnp.asarray(np.stack([np.roll(right, i, axis=1) for i in range(B)]))


def map_prefix(stage):
    """Batched prefix via lax.map of the single-frame prefix (the
    shipped structure). stage: 0=gray, 1=+dual matching, 2=+LR, 3=+fill."""

    def one(l, r):
        gl = ops.rgb_to_grayscale(l, CFG)
        gr = ops.rgb_to_grayscale(r, CFG)
        if stage == 0:
            return gl.astype(jnp.float32).sum() + gr.astype(jnp.float32).sum()
        _, dl, _, dr = guided_wta_fused_dual(gl, gr, CFG)
        if stage == 1:
            return dl.sum() + dr.sum()
        occ = ops.detect_occlusion(dl, dr, CFG.d_occlusion, CFG)
        if stage == 2:
            return occ.sum()
        return ops.fill_occlusion(occ, CFG.v_min, CFG).sum()

    def run(l, r):
        return jax.lax.map(lambda lr: one(lr[0], lr[1]), (l, r)).sum()

    return run


def hybrid_full(l, r):
    """vmapped glue + batched-grid dual kernel (one Mosaic grid for all
    8 frames, one wide XLA op per glue stage)."""
    gl = jax.vmap(lambda x: ops.rgb_to_grayscale(x, CFG))(l)
    gr = jax.vmap(lambda x: ops.rgb_to_grayscale(x, CFG))(r)
    _, dl, _, dr = guided_wta_fused_dual(gl, gr, CFG)
    occ = jax.vmap(
        lambda a, b: ops.detect_occlusion(a, b, CFG.d_occlusion, CFG))(dl, dr)
    return jax.vmap(lambda o: ops.fill_occlusion(o, CFG.v_min, CFG))(occ).sum()


def hybrid_map_kernel(l, r):
    """vmapped glue but the kernel still per-frame via lax.map — isolates
    glue-fusing from kernel-batching."""
    gl = jax.vmap(lambda x: ops.rgb_to_grayscale(x, CFG))(l)
    gr = jax.vmap(lambda x: ops.rgb_to_grayscale(x, CFG))(r)
    dldr = jax.lax.map(
        lambda ab: guided_wta_fused_dual(ab[0], ab[1], CFG), (gl, gr))
    dl, dr = dldr[1], dldr[3]
    occ = jax.vmap(
        lambda a, b: ops.detect_occlusion(a, b, CFG.d_occlusion, CFG))(dl, dr)
    return jax.vmap(lambda o: ops.fill_occlusion(o, CFG.v_min, CFG))(occ).sum()


def map_full_pipeline(l, r):
    """The exact shipped structure (stereo_pipeline under lax.map)."""
    return jax.lax.map(
        lambda lr: stereo_pipeline(lr[0], lr[1], CFG)["occlusion_filled"].sum(),
        (l, r)).sum()


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


def time_fn(label, fn, n_small=3, n_big=11):
    fs, fb = chained(fn, n_small), chained(fn, n_big)
    t0 = time.time()
    float(fs(bl, br)); float(fb(bl, br))
    compile_s = time.time() - t0
    ts = min(float_time(fs) for _ in range(3))
    tb = min(float_time(fb) for _ in range(3))
    per_step = (tb - ts) / (n_big - n_small)
    print(f"  {label}: {per_step/B*1e3:.3f} ms/frame "
          f"({per_step*1e3:.2f} ms/step of {B}; compile {compile_s:.0f}s)",
          flush=True)
    return per_step / B * 1e3


def float_time(f):
    t0 = time.time()
    float(f(bl, br))
    return time.time() - t0


print("=== shipped structure: lax.map prefixes ===", flush=True)
prev = 0.0
stage_ms = []
for name, st in [("gray x2", 0), ("+dual matching", 1),
                 ("+LR", 2), ("+fill", 3)]:
    cum = time_fn(f"prefix {name}", map_prefix(st))
    stage_ms.append((name, cum - prev))
    prev = cum
print("  per-stage attribution (ms/frame): "
      + ", ".join(f"{n}={v:.3f}" for n, v in stage_ms), flush=True)

print("=== alternatives ===", flush=True)
time_fn("shipped map(full pipeline)", map_full_pipeline)
time_fn("hybrid vmap-glue + batched-grid kernel", hybrid_full)
time_fn("hybrid vmap-glue + map kernel", hybrid_map_kernel)
print("done", flush=True)
