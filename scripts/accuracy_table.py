"""Accuracy table: bad-2.0 / EPE of every fast path vs the exact mode
on Tsukuba (VERDICT round-1 Missing #3).

The exact_integral pipeline is bit-exact vs the reference
implementation (tests/test_oracle.py, test_pipeline.py), so its
disparity map IS the reference algorithm's output and serves as the
ground truth here (no true Tsukuba GT ships with the reference repo).
Maps compared are the final occlusion-filled disparities; |d| is used
since labels are negative.

Run on CPU (interpret-mode Pallas for the fused row):
  env JAX_PLATFORMS=cpu ... python scripts/accuracy_table.py
"""

import dataclasses

import numpy as np
import jax

import jax.experimental.pallas as pl

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG as CFG
from stereo_matching_cuda_tpu.metrics import bad_pixel_rate, end_point_error
from stereo_matching_cuda_tpu.pipeline import compute_disparity
from stereo_matching_cuda_tpu.utils.io import read_png

D = "/root/reference/stereo_matching_cuda/data"
left = read_png(f"{D}/tsukuba0.png")
right = read_png(f"{D}/tsukuba1.png")

exact = compute_disparity(
    left, right, dataclasses.replace(CFG, exact_integral=True))
gt = np.abs(exact["occlusion_filled"].astype(np.float32))

rows = []


def add(name, out):
    disp = np.abs(out["occlusion_filled"].astype(np.float32))
    rows.append((name,
                 bad_pixel_rate(disp, gt, 2.0),
                 bad_pixel_rate(disp, gt, 0.5),
                 end_point_error(disp, gt),
                 int((disp != gt).sum())))


add("fast XLA path", compute_disparity(left, right, CFG))

# fused Pallas kernels via interpret mode on CPU (same kernel code the
# TPU compiles; true f32, so MXU near-tie behavior is not covered here
# — the TPU-measured row is in BENCH.md)
_orig = pl.pallas_call
pl.pallas_call = lambda *a, **k: _orig(*a, **{**k, "interpret": True})
from stereo_matching_cuda_tpu.ops.pallas_guided import (  # noqa: E402
    guided_wta_fused, guided_wta_fused_dual)
from stereo_matching_cuda_tpu import ops  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def fused_out(dual):
    gl = ops.rgb_to_grayscale(jnp.asarray(left), CFG)
    gr = ops.rgb_to_grayscale(jnp.asarray(right), CFG)
    if dual:
        _, dl, _, dr = guided_wta_fused_dual(gl, gr, CFG)
    else:
        _, dl = guided_wta_fused(gl, gr, CFG.d_min, CFG)
        _, dr = guided_wta_fused(gr, gl, CFG.d_min_right, CFG)
    occ = ops.detect_occlusion(dl, dr, CFG.d_occlusion, CFG)
    return {"occlusion_filled": np.asarray(
        ops.fill_occlusion(occ, CFG.v_min, CFG))}


add("fused kernel (single-view)", fused_out(False))
add("fused kernel (dual-view)", fused_out(True))

# y-sum implementation variants on the dual kernel (cfg.y_sum —
# candidates for the MXU-limited big-frame configs, BENCH.md).
# Interpret mode computes matmuls in true f32 either way, so these
# rows measure the variants' float-association deltas, not bf16 loss.
for impl in ("mxu3", "mxu2", "roll"):
    cfg_v = dataclasses.replace(CFG, y_sum=impl)
    gl = ops.rgb_to_grayscale(jnp.asarray(left), CFG)
    gr = ops.rgb_to_grayscale(jnp.asarray(right), CFG)
    _, dl, _, dr = guided_wta_fused_dual(gl, gr, cfg_v)
    occ = ops.detect_occlusion(dl, dr, CFG.d_occlusion, CFG)
    add(f"dual kernel, y_sum={impl}", {"occlusion_filled": np.asarray(
        ops.fill_occlusion(occ, CFG.v_min, CFG))})
pl.pallas_call = _orig

from stereo_matching_cuda_tpu.parallel import (  # noqa: E402
    make_mesh, sharded_stereo_pipeline)

for mesh_dims, label in [((1, 2, 2, 1), "sharded (y=2,x=2)"),
                         ((1, 1, 2, 4), "sharded (x=2,d=4)")]:
    mesh = make_mesh(*mesh_dims)
    out = sharded_stereo_pipeline(left[None], right[None], mesh, CFG)
    add(label, {"occlusion_filled": np.asarray(out["occlusion_filled"][0])})

print(f"{'mode':32s} {'bad-2.0 %':>10s} {'bad-0.5 %':>10s} "
      f"{'EPE px':>8s} {'px changed':>10s}")
for name, b2, b05, epe, n in rows:
    print(f"{name:32s} {b2:10.4f} {b05:10.4f} {epe:8.5f} {n:10d}")
print(f"\n(vs exact-mode filled disparity, {gt.size} px; "
      "exact mode is bit-exact vs the reference)")
