"""Analytic roofline for the fused dual-view kernel (BENCH.md §roofline).

Counts the work the compiled kernel actually issues — per (y-strip,
x-tile) program on the padded ext tile — and converts it into
lower-bound times at TPU v5e peaks:

  VPU  f32: 8x128 lanes x 4 ALUs x ~0.94 GHz  ~ 3.85 Top/s
  MXU bf16: ~197 TFLOP/s
  HBM     : ~819 GB/s

Runs on CPU instantly (pure arithmetic + the repo's own tile picker);
no jax device work.

Op model per box-sum on a (she, w_ext) ext tile (``_box_sum_hybrid``):
  x-direction forward window sum k=2r+1 via log-doubling: a roll+add
  per doubling plus one per set bit of k (rolls counted as 1 op/elt),
  then the centering roll and the inv_area multiply;
  y-direction (default ``mxu``): banded (she,she)@(she,w_ext) matmul at
  Precision.HIGHEST = 6 bf16 passes (3x2 limb cross terms).

Per disparity slice the dual kernel does 8 box-means (mean_p, mean_ip,
mean_a, mean_b per view), one shared raw-cost slice, and 2 WTA
updates; per frame it adds 6 guide-statistic box-means and the
derivative/valid-mask setup (counted below).
"""

import dataclasses
import sys

sys.path.insert(0, "/root/repo")

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.ops.pallas_guided import (
    _DUAL_N_LIVE, _n_live, _pick_tiles, _vmem_params, dual_geometry)

VPU_PEAK = 8 * 128 * 4 * 0.94e9          # f32 op/s
MXU_PEAK = 197e12                        # bf16 FLOP/s
HBM_BW = 819e9                           # B/s


def bits(k: int) -> int:
    return bin(k).count("1")


def roofline(H, W, cfg, label, measured_ms=None, mxu_passes=6):
    halo_y, px = dual_geometry(cfg)
    sh, tw = _pick_tiles(H, W, px, halo_y,
                         vmem_budget=_vmem_params(cfg)[0],
                         n_live=max(_DUAL_N_LIVE, 2 * _n_live(cfg) - 20))
    she = sh + 2 * halo_y
    w_ext = ((tw + 2 * px + 127) // 128) * 128
    ny = (H + sh - 1) // sh
    nx = (W + tw - 1) // tw
    n_prog = ny * nx
    ext = she * w_ext                      # elements touched per program

    k = 2 * cfg.radius + 1
    # band-restricted y matmuls (_make_boxms): mid-band and interior
    # output rows instead of the full ext tile
    top = max(0, (halo_y - (cfg.radius + 1)) // 8 * 8)
    mid = she - 2 * top
    # x-dir forward window sum: log-doubling (roll+add each) + offset
    # terms for the set bits of k, + centering roll + inv_area mult
    import math
    xsum_ops = 2 * int(math.log2(k)) + 2 * (bits(k) - 1) + 1 + 1
    boxm_vpu = xsum_ops + 1                # + final inv_area multiply
    mxu_mid = mxu_passes * 2 * mid * she * w_ext
    mxu_out = mxu_passes * 2 * sh * mid * w_ext

    # per-slice VPU ops/ext-elt (dual view)
    raw_cost = 2 + 7                       # 2 shifts + |.|,min,blend
    per_view = (
        4 * boxm_vpu                       # mean_p, mean_ip, mean_a, mean_b
        + 1                                # I*cost
        + (5 + 3) * mid // she             # a, b + masks (mid-band rows)
        + 2                                # q = mult-add (interior)
        + 3                                # WTA compare + 2 selects
        + 2                                # valid mask + oob blend
    )
    slice_vpu = raw_cost + 1 + 2 * per_view     # +1: right-view roll
    # per-frame setup: 6 guide box-means, 2 derivatives (~6), masks (~8)
    setup_vpu = 6 * boxm_vpu + 6 + 8

    vpu_ops = n_prog * ext * (cfg.size_d * slice_vpu + setup_vpu)
    mxu_flops = n_prog * (
        cfg.size_d * 2 * (2 * mxu_mid + 2 * mxu_out) + 6 * mxu_mid)
    # HBM: 2 ext-tile DMA reads/program + 4 (sh,tw) f32 outputs
    hbm_bytes = n_prog * (2 * ext + 4 * sh * tw) * 4

    t_vpu = vpu_ops / VPU_PEAK * 1e3
    t_mxu = mxu_flops / MXU_PEAK * 1e3
    t_hbm = hbm_bytes / HBM_BW * 1e3
    bound = max(t_vpu, t_mxu, t_hbm)

    print(f"\n{label}: {H}x{W}, D={cfg.size_d}, tiles sh={sh} tw={tw} "
          f"(ext {she}x{w_ext}, {n_prog} programs, "
          f"overhead {n_prog*ext/(H*W):.2f}x)")
    print(f"  VPU  {vpu_ops/1e9:7.2f} Gop   -> {t_vpu:7.3f} ms")
    print(f"  MXU  {mxu_flops/1e9:7.2f} GFLOP -> {t_mxu:7.3f} ms "
          f"({mxu_passes} bf16 passes/box-sum)")
    print(f"  HBM  {hbm_bytes/1e6:7.2f} MB   -> {t_hbm:7.3f} ms")
    print(f"  bound = {bound:.3f} ms ({'VPU' if bound == t_vpu else 'MXU' if bound == t_mxu else 'HBM'}-limited)")
    if measured_ms:
        print(f"  measured {measured_ms:.3f} ms -> {bound/measured_ms*100:.0f}% "
              f"of speed-of-light")
    return bound


if __name__ == "__main__":
    cfg = DEFAULT_CONFIG
    roofline(288, 384, cfg, "Tsukuba dual-view kernel", measured_ms=None)
    roofline(1992, 3008, cfg, "6 MP dual-view kernel", measured_ms=None)
    c128 = dataclasses.replace(cfg, d_min=-127, d_max=0)
    roofline(1988, 2948, c128, "3 MP 128-disp kernel")
