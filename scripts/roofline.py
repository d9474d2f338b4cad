"""Analytic roofline for the fused dual-view kernel (BENCH.md §roofline).

Counts the work the compiled kernel issues — per (y-strip, x-tile)
program on the padded ext tile — and converts it into lower-bound
times at TPU v5e peaks:

  VPU  f32: 8x128 lanes x 4 ALUs x ~0.94 GHz  ~ 3.85 Top/s
  MXU bf16: ~197 TFLOP/s
  HBM     : ~819 GB/s

Granularity calibration (the lesson of the band-restriction
experiment, hardware-measured):

- Matmul row/contraction dims cost at the 8-row sublane granularity,
  lane dims at 128.  Kernel time scaled with ext-tile *elements*
  when the strip height grew (sh=64 -> 128: 1.57x elements/program,
  1.67x fewer programs, equal frame time), so a 176-row matmul is
  NOT two 128-row tiles.
- Restricting the y-sum matmuls to the consumed output band
  (she=112 -> mid=96 rows) saved MXU elements but REGRESSED the
  dual-view frame 0.657 -> 0.805 ms at default tiles: that kernel is
  VPU/element-bound and the MXU margin is idle, while the three
  distinct matmul shapes cost Mosaic mixed-shape overhead (and +25%
  VMEM stack fragmentation).  The dual kernel keeps the square form.
  In the single-view fori-loop kernel the restriction WINS
  (3 MP/128 d: 362 vs 394 ms @16 MiB, 254 vs 273 ms @32 MiB), so
  _make_kernel uses the restricted pair; `restricted=True` below
  models that variant.

Op model per box-sum on a (rows, w_ext) operand:
  x-direction forward window sum k=2r+1 via log-doubling (rolls
  counted 1 op/elt — hardware sublane/lane rolls cost more, so the
  VPU figure is a generous lower bound);
  y-direction (default ``mxu``): banded matmul at Precision.HIGHEST =
  6 bf16 passes.

Runs on CPU instantly (pure arithmetic + the repo's own tile picker).
"""

import dataclasses
import math
import sys

sys.path.insert(0, "/root/repo")

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.ops.pallas_guided import (
    _DUAL_N_LIVE, _n_live, _pick_tiles, _vmem_params, dual_geometry)

VPU_PEAK = 8 * 128 * 4 * 0.94e9          # f32 op/s
MXU_PEAK = 197e12                        # bf16 FLOP/s
HBM_BW = 819e9                           # B/s
T = 128                                  # MXU tile edge


def bits(k: int) -> int:
    return bin(k).count("1")


def tiles(n: int) -> int:
    """Lane-dim (last-axis) granularity: 128."""
    return -(-n // T)


def rows8(n: int) -> int:
    """Sublane (row/contraction) granularity: 8."""
    return -(-n // 8) * 8


def roofline(H, W, cfg, label, measured_ms=None, mxu_passes=6,
             force_sh=None, restricted=False):
    halo_y, px = dual_geometry(cfg)
    sh, tw = _pick_tiles(H, W, px, halo_y,
                         vmem_budget=_vmem_params(cfg)[0],
                         n_live=max(_DUAL_N_LIVE, 2 * _n_live(cfg) - 20))
    if force_sh:
        sh = force_sh
    she = sh + 2 * halo_y
    w_ext = ((tw + 2 * px + 127) // 128) * 128
    ny = (H + sh - 1) // sh
    nx = (W + tw - 1) // tw
    n_prog = ny * nx
    ext = she * w_ext

    r = cfg.radius
    k = 2 * r + 1
    top = max(0, (halo_y - (r + 1)) // 8 * 8) if restricted else 0
    mid = she - 2 * top
    out_rows = sh if restricted else she

    # MXU MACs per y matmul: rows/contraction at 8-sublane, lanes at
    # 128 granularity (hardware-calibrated, see module docstring)
    mid_macs = rows8(mid) * rows8(she) * tiles(w_ext) * T
    out_macs = rows8(out_rows) * rows8(mid) * tiles(w_ext) * T

    xsum_ops = 2 * int(math.log2(k)) + 2 * (bits(k) - 1) + 1 + 1
    boxm_vpu = xsum_ops + 1

    raw_cost = 2 + 7
    per_view = (4 * boxm_vpu + 1 + (5 + 3) * mid // she + 2 + 3 + 2)
    slice_vpu = raw_cost + 1 + 2 * per_view
    setup_vpu = 6 * boxm_vpu + 6 + 8

    vpu_ops = n_prog * ext * (cfg.size_d * slice_vpu + setup_vpu)
    mxu_flops = n_prog * mxu_passes * 2 * (
        cfg.size_d * 2 * (2 * mid_macs + 2 * out_macs) + 6 * mid_macs)
    hbm_bytes = n_prog * (2 * ext + 4 * sh * tw) * 4

    t_vpu = vpu_ops / VPU_PEAK * 1e3
    t_mxu = mxu_flops / MXU_PEAK * 1e3
    t_hbm = hbm_bytes / HBM_BW * 1e3
    bound = max(t_vpu, t_mxu, t_hbm)

    print(f"\n{label}: {H}x{W}, D={cfg.size_d}, sh={sh} tw={tw} "
          f"(ext {she}x{w_ext}, {n_prog} programs, "
          f"halo overhead {n_prog*ext/(H*W):.2f}x)")
    print(f"  VPU  {vpu_ops/1e9:8.2f} Gop    -> {t_vpu:7.3f} ms")
    print(f"  MXU  {mxu_flops/1e9:8.2f} GFLOP -> {t_mxu:7.3f} ms "
          f"({mxu_passes} bf16 passes/box-sum, 8x128-granular)")
    print(f"  HBM  {hbm_bytes/1e6:8.2f} MB    -> {t_hbm:7.3f} ms")
    who = "VPU" if bound == t_vpu else "MXU" if bound == t_mxu else "HBM"
    print(f"  bound = {bound:.3f} ms ({who}-limited)")
    if measured_ms:
        print(f"  measured {measured_ms:.3f} ms -> {bound/measured_ms*100:.0f}%"
              f" of speed-of-light")
    return bound


if __name__ == "__main__":
    cfg = DEFAULT_CONFIG
    roofline(288, 384, cfg, "Tsukuba dual kernel (default tiles)")
    roofline(288, 384, cfg, "Tsukuba dual kernel sh=128", force_sh=128)
    roofline(288, 384, cfg, "Tsukuba dual, rejected band-restricted",
             restricted=True)
    roofline(1992, 3008, cfg, "6 MP dual kernel (default tiles)")
    roofline(1992, 3008, cfg, "6 MP dual kernel sh=128", force_sh=128)
    c128 = dataclasses.replace(cfg, d_min=-127, d_max=0)
    roofline(1988, 2948, c128, "3 MP 128-disp kernel (default tiles)")
    c128v = dataclasses.replace(c128, vmem_mb=32)
    roofline(1988, 2948, c128v, "3 MP 128-disp kernel (vmem 32)")
