"""TRUE ground-truth accuracy table (VERDICT round-2 next-step #5).

Scores every production mode against the committed synthetic scene's
exact-by-construction disparity field (tests/data/synthgt/scene0,
generator stereo_matching_cuda_tpu/utils/synth.py) — real accuracy
with occlusion exclusion, not parity-vs-self like accuracy_table.py.

Run on CPU (interpret-mode Pallas for the fused rows):
  env JAX_PLATFORMS=cpu AXON_LOOPBACK_RELAY=0 PALLAS_AXON_REMOTE_COMPILE=0 \
      PALLAS_AXON_POOL_IPS= python scripts/truth_table.py
"""

import dataclasses

import numpy as np
import jax.experimental.pallas as pl

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG as CFG
from stereo_matching_cuda_tpu.metrics import bad_pixel_rate, end_point_error
from stereo_matching_cuda_tpu.pipeline import compute_disparity
from stereo_matching_cuda_tpu.utils.synth import make_scene

scene = make_scene()
left, right, gt = scene["left"], scene["right"], scene["gt"]

rows = []


def add(name, filled):
    disp = np.abs(np.asarray(filled, np.float32))
    rows.append((name,
                 bad_pixel_rate(disp, gt, 2.0),
                 bad_pixel_rate(disp, gt, 1.0),
                 end_point_error(disp, gt)))


add("exact_integral (bit-exact vs ref)", compute_disparity(
    left, right, dataclasses.replace(CFG, exact_integral=True))
    ["occlusion_filled"])
add("fast XLA path", compute_disparity(left, right, CFG)["occlusion_filled"])

_orig = pl.pallas_call
pl.pallas_call = lambda *a, **k: _orig(*a, **{**k, "interpret": True})
from stereo_matching_cuda_tpu import ops  # noqa: E402
from stereo_matching_cuda_tpu.ops.pallas_guided import (  # noqa: E402
    guided_wta_fused, guided_wta_fused_dual)

import jax.numpy as jnp  # noqa: E402

gl = ops.rgb_to_grayscale(jnp.asarray(left), CFG)
gr = ops.rgb_to_grayscale(jnp.asarray(right), CFG)
_, dl, _, dr = guided_wta_fused_dual(gl, gr, CFG)
occ = ops.detect_occlusion(dl, dr, CFG.d_occlusion, CFG)
add("fused kernel (dual-view)", ops.fill_occlusion(occ, CFG.v_min, CFG))
# the big-frame strategy: single-view fori + roll y-sums
cfg_big = dataclasses.replace(CFG, y_sum="roll", unroll_max=8)
_, dl = guided_wta_fused(gl, gr, CFG.d_min, cfg_big)
_, dr = guided_wta_fused(gr, gl, CFG.d_min_right, cfg_big)
occ = ops.detect_occlusion(dl, dr, CFG.d_occlusion, CFG)
add("fused kernel (fori + roll y-sums)", ops.fill_occlusion(occ, CFG.v_min, CFG))
pl.pallas_call = _orig

from stereo_matching_cuda_tpu.parallel import (  # noqa: E402
    make_mesh, sharded_stereo_pipeline)

for mesh_dims, label in [((1, 2, 2, 1), "sharded (y=2,x=2)"),
                         ((1, 2, 2, 2), "sharded (d=2,y=2,x=2)")]:
    mesh = make_mesh(*mesh_dims)
    out = sharded_stereo_pipeline(left[None], right[None], mesh, CFG)
    add(label, out["occlusion_filled"][0])

print(f"{'mode':36s} {'bad-2.0 %':>10s} {'bad-1.0 %':>10s} {'EPE px':>8s}")
for name, b2, b1, epe in rows:
    print(f"{name:36s} {b2:10.3f} {b1:10.3f} {epe:8.4f}")
occf = scene["occluded"].mean() * 100
print(f"\n(synthetic scene0 240x320, ndisp=16, true integer GT; "
      f"{occf:.1f}% occluded px excluded)")
