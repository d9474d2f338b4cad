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
             force_sh=None, restricted=False, single_view=False,
             n_live=None, y_impl="mxu", force_tw=None):
    """single_view=True models ONE guided_wta_fused call (callers run
    it twice per frame); n_live overrides the tile picker's live-buffer
    estimate (the fori d-loop branch keeps far fewer ext tiles live
    than the unrolled branch).  y_impl: 'mxu' (6 bf16 passes), 'mxu3'
    (3 passes + 4 VPU limb ops/elt on the matmul inputs), 'roll'
    (zero MXU; y window sums cost the same log-doubling VPU ops as x)."""
    halo_y, px = dual_geometry(cfg)
    sh, tw = _pick_tiles(H, W, px, halo_y,
                         vmem_budget=_vmem_params(cfg)[0],
                         n_live=n_live if n_live is not None else
                         max(_DUAL_N_LIVE, 2 * _n_live(cfg) - 20))
    if force_sh:
        sh = force_sh
    if force_tw:
        tw = force_tw
    if y_impl == "mxu3":
        mxu_passes = 3
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
    # boxm VPU cost per operand: x window sum (+1 normalize); the roll
    # y-impl pays the same window-sum again in y, the limb split (mxu3)
    # adds ~4 ops/elt on the matmul input, mxu adds nothing.
    y_extra = {"roll": xsum_ops, "mxu3": 4}.get(y_impl, 0)
    boxm_vpu = xsum_ops + 1 + y_extra

    raw_cost = 2 + 7
    per_view = (4 * boxm_vpu + 1 + (5 + 3) * mid // she + 2 + 3 + 2)
    if single_view:
        # one guided chain; 2 operands per phase instead of 4
        slice_vpu = raw_cost + 1 + per_view
        setup_vpu = 3 * boxm_vpu + 3 + 8
        mac_scale = 1
    else:
        slice_vpu = raw_cost + 1 + 2 * per_view
        setup_vpu = 6 * boxm_vpu + 6 + 8
        mac_scale = 2

    vpu_ops = n_prog * ext * (cfg.size_d * slice_vpu + setup_vpu)
    mxu_flops = 0 if y_impl == "roll" else n_prog * mxu_passes * 2 * (
        cfg.size_d * mac_scale * (2 * mid_macs + 2 * out_macs)
        + 3 * mac_scale * mid_macs)
    hbm_bytes = n_prog * (2 * ext + (2 if single_view else 4) * sh * tw) * 4

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
    roofline(1988, 2948, c128, "3 MP 128-disp kernel (old 45-buffer tiles)",
             single_view=True, restricted=True, n_live=45)
    c128v = dataclasses.replace(c128, vmem_mb=32)
    roofline(1988, 2948, c128v, "3 MP 128-disp (old tiles, vmem 32)",
             single_view=True, restricted=True, n_live=45)
    roofline(1988, 2948, c128, "3 MP 128-disp, fori-estimate tiles",
             single_view=True, restricted=True, n_live=_n_live(c128))
    roofline(1988, 2948, c128v, "3 MP 128-disp, fori tiles, vmem 32",
             single_view=True, restricted=True, n_live=_n_live(c128v))

    # --- 6 MP single-view fori-loop candidates (x2 per frame): the
    # fori branch keeps far fewer ext tiles live than the unrolled
    # branch, affording bigger tiles (less halo recompute).
    print("\n=== single-view fori candidates at 6 MP (time is PER VIEW;"
          " frame = 2x + gray/LR/fill) ===")
    for nl in (30, 24):
        for impl in ("mxu", "mxu3", "roll"):
            b = roofline(1992, 3008, cfg,
                         f"6 MP single fori n_live={nl} y_sum={impl}",
                         single_view=True, restricted=True, n_live=nl,
                         y_impl=impl)
    roofline(1992, 3008, cfg, "6 MP single fori (128,1024) roll",
             single_view=True, restricted=True, n_live=30, y_impl="roll",
             force_sh=128, force_tw=1024)

    # --- round-3 shipped configs.  The r3 swpipe probe settled that
    # Mosaic schedules no VPU/MXU overlap, so the bound that matters is
    # the BINDING-unit time on the ISSUED (ext-tile) work — and the
    # halo overhead printed per config is the lever the auto vmem64/
    # big-tile default pulls (BENCH.md round-3 decider).
    print("\n=== round-3 shipped big-tile configs (time PER VIEW; "
          "frame = 2x + gray/LR/fill) ===")
    c64 = dataclasses.replace(cfg, vmem_mb=64, unroll_max=8, y_sum="roll")
    roofline(1992, 3008, c64,
             "6 MP fori roll vmem64 (shipped auto; measured frame 20.26 ms)",
             single_view=True, restricted=True, n_live=_n_live(c64),
             y_impl="roll")
    c96 = dataclasses.replace(c128, vmem_mb=96)
    roofline(1988, 2948, c96,
             "5.9 MP/128 d mxu vmem96 (measured frame 173.2 ms)",
             single_view=True, restricted=True, n_live=_n_live(c96))
    cts = dataclasses.replace(cfg, vmem_mb=32)
    roofline(288, 384, cts, "Tsukuba dual vmem32 warm-cache profile")


def stream_roofline(H, W, cfg, label, measured_ms=None, single_view=False,
                    y_impl="roll", force_tiles=None, n_slices=None):
    """Round-4 streaming-y strip-carry kernel model.

    Each program column walks top-to-bottom carrying the last A rows of
    every per-slice x-window sum in persistent VMEM scratch; a strip
    computes exactly ``sh`` NEW rows of every quantity (no y-halo
    recompute).  Issued rows per column = nyp*sh ~ H + A + 2r + ceil
    waste; extra VPU work = the carry-copy shuffles (carry_bufs * A
    rows per strip, 1 op/elt) — this is the A/2-row per-strip charge
    the stream tile picker optimizes.  y window sums: 'roll' pays the
    same log-doubling ops as x on the sh new rows; 'mxu' runs
    (sh, sh+A)-banded matmuls (6 HIGHEST passes)."""
    from stereo_matching_cuda_tpu.ops.pallas_guided import (
        _dual_stream_n_live, _pick_tiles_stream, _stream_carry,
        _stream_n_live, _stream_sh_cap, fused_geometry)

    size_d = n_slices or cfg.size_d
    geom = fused_geometry(cfg) if single_view else dual_geometry(cfg)
    _, px = geom
    A = _stream_carry(cfg.radius)
    if force_tiles:
        sh, tw = force_tiles
    elif single_view:
        sh, tw = _pick_tiles_stream(H, W, px, cfg.radius, size_d,
                                    _vmem_params(cfg)[0],
                                    _stream_n_live(cfg),
                                    max_sh=_stream_sh_cap(cfg))
    else:
        sh, tw = _pick_tiles_stream(H, W, px, cfg.radius, size_d,
                                    _vmem_params(cfg)[0],
                                    _dual_stream_n_live(cfg),
                                    carry_bufs=8 * size_d + 4,
                                    max_sh=_stream_sh_cap(cfg))
    sha = sh + A
    w_ext = ((tw + 2 * px + 127) // 128) * 128
    nyp = (H + A + 2 * cfg.radius + sh - 1) // sh
    nx = (W + tw - 1) // tw
    n_prog = nyp * nx
    ext = sha * w_ext                       # rows a strip computes over

    r = cfg.radius
    k = 2 * r + 1
    xsum_ops = 2 * int(math.log2(k)) + 2 * (bits(k) - 1) + 1 + 1
    y_extra = {"roll": xsum_ops, "mxu3": 4}.get(y_impl, 0)
    boxm_vpu = xsum_ops + 1 + y_extra
    raw_cost = 2 + 7
    per_view = 4 * boxm_vpu + 1 + 5 + 3 + 2 + 3 + 2
    carry_bufs = (4 if single_view else 8) * size_d + (2 if single_view
                                                       else 4)
    if single_view:
        slice_vpu = raw_cost + 1 + per_view
        setup_vpu = 3 * boxm_vpu + 3 + 8
        mac_scale = 1
    else:
        slice_vpu = raw_cost + 1 + 2 * per_view
        setup_vpu = 6 * boxm_vpu + 6 + 8
        mac_scale = 2

    vpu_ops = n_prog * (ext * (size_d * slice_vpu + setup_vpu)
                        + carry_bufs * A * w_ext)   # carry copies
    if y_impl == "roll":
        mxu_flops = 0
    else:
        passes = 3 if y_impl == "mxu3" else 6
        band_macs = rows8(sh) * rows8(sha) * tiles(w_ext) * T
        mxu_flops = n_prog * passes * 2 * (
            size_d * mac_scale * 2 * band_macs + 3 * mac_scale * band_macs)
    hbm_bytes = n_prog * (2 * ext + (2 if single_view else 4) * sh * tw) * 4

    t_vpu = vpu_ops / VPU_PEAK * 1e3
    t_mxu = mxu_flops / MXU_PEAK * 1e3
    t_hbm = hbm_bytes / HBM_BW * 1e3
    bound = max(t_vpu, t_mxu, t_hbm)
    print(f"\n{label}: {H}x{W}, D={size_d}, stream tiles=({sh},{tw}) "
          f"(strip ext {sha}x{w_ext}, {n_prog} programs, "
          f"issued ratio {n_prog*ext/(H*W):.2f}x)")
    print(f"  VPU  {vpu_ops/1e9:8.2f} Gop    -> {t_vpu:7.3f} ms")
    print(f"  MXU  {mxu_flops/1e9:8.2f} GFLOP -> {t_mxu:7.3f} ms")
    print(f"  HBM  {hbm_bytes/1e6:8.2f} MB    -> {t_hbm:7.3f} ms")
    who = "VPU" if bound == t_vpu else "MXU" if bound == t_mxu else "HBM"
    print(f"  bound = {bound:.3f} ms ({who}-limited)")
    if measured_ms:
        print(f"  measured {measured_ms:.3f} ms -> "
              f"{bound/measured_ms*100:.0f}% of speed-of-light")
    return bound


def _round4_shipped():
    """Round-4 streaming configs vs their measured frame times."""
    print("\n=== round-4 shipped streaming configs ===")
    cfg = DEFAULT_CONFIG
    cfast = dataclasses.replace(cfg, stream=True, y_sum="roll", vmem_mb=32)
    stream_roofline(288, 384, cfast,
                    "Tsukuba dual stream roll vmem32 (old --fast; 0.449)",
                    measured_ms=0.449, y_impl="roll")
    csmall = dataclasses.replace(cfg, stream=True, y_sum="roll", vmem_mb=32,
                                 unroll_max=8)
    b = stream_roofline(288, 384, csmall,
                        "Tsukuba single-view fori stream roll vmem32 "
                        "PER VIEW (shipped default; frame 0.445 = 2x this "
                        "+ LR/fill glue)",
                        single_view=True, y_impl="roll")
    print(f"  -> 2 views = {2*b:.3f} ms of the 0.445 ms frame")
    c64 = dataclasses.replace(cfg, vmem_mb=64, unroll_max=8, y_sum="roll",
                              stream=True)
    b = stream_roofline(1992, 3008, c64,
                        "6 MP stream fori roll vmem64 PER VIEW "
                        "(frame 17.9-18.3 = 2x this + glue)",
                        single_view=True, y_impl="roll")
    print(f"  -> 2 views = {2*b:.2f} ms of the ~18 ms frame")
    c128 = dataclasses.replace(cfg, d_min=-127, d_max=0, vmem_mb=128,
                               y_sum="roll", stream=True)
    b = stream_roofline(1988, 2948, c128,
                        "5.9 MP/128 d stream roll vmem128 PER VIEW "
                        "(frame 148.3-148.6 = 2x this + glue)",
                        single_view=True, y_impl="roll")
    print(f"  -> 2 views = {2*b:.2f} ms of the ~148.5 ms frame")


if __name__ == "__main__" and "--r4" in sys.argv:
    _round4_shipped()


# ---------------------------------------------------------------------------
# Round 5: MEASURED-cost roofline (VERDICT r4 #1).
#
# The "1 op/elt" roll placeholder is gone.  Hardware microbenchmarks
# (scripts/r5_microbench.py, r5_micro2.py, r5_tpu1.py — logs in
# scripts/logs_r5/) measured, on this v5e:
#
#   isolated primitive costs (op-equivalents/elt at the 3.85 Top/s
#   4-ALU peak; "sweep" = VMEM->VMEM elementwise op):
#     add sweep 6.4-7.1        mul-add sweep 8.0
#     lane roll marginal +5.7  sublane roll +2.7 (+0.0 if shift%8==0)
#     k=19 window sum: 47 (lane) / 30 (sublane)
#     full box-mean (both axes + normalize): 64.3 — identical for 1
#     and 4 independent trees (issue-bound, no ILP headroom)
#   per-GRID-PROGRAM sequencing: 0.014 us (negligible)
#   per-pallas-call overhead: ~0.5 us
#   per-CHAIN-ITERATION overhead (lax.fori_loop step, the bench's
#   chained-frame methodology): ~22.6 us — an XLA-only elementwise
#   chain body costs the same, so every chained per-frame number in
#   BENCH.md includes ~22.6 us that is NOT pipeline compute.
#
#   REAL-KERNEL slice slope (guided_wta_fused, stream fori roll, tiles
#   pinned; per-call time is linear in D):
#     tiles (112,384) x3 programs:  12.03 us/slice -> 221 op-eq/ext-elt
#     tiles (128,1024) x7 programs: 71.58 us/slice -> 225
#     tiles (128,1536) x5 programs: 87.25 us/slice -> 230
#   -> per-slice cost is a SHAPE-INDEPENDENT constant ~225 op-eq per
#   ext-tile element per slice (+-2%), for D from 8 to 128.
#   Fixed term (intercept minus chain overhead): ~16-31 us/program.
#
# Interpretation: the counted per-slice op sequence (single-view roll
# path) is 158 ops/elt.  The kernel measures 221-230 — i.e. 1.4
# op-equivalents per counted op, BETTER than the isolated-primitive
# composition predicts (4 box-means + raw cost + WTA at isolated costs
# = ~282), because Mosaic fuses chains in vregs.  The ~40% over the
# pure-ALU floor is the in-context cost of the ~58 rolls/slice (~2.1
# op-eq each) — lane-crossing shuffle throughput, not schedulable
# waste (boxm4 == boxm1 proves issue-boundedness).
# ---------------------------------------------------------------------------

MEAS_PER_SLICE_OPEQ = 225.0       # op-equiv per ext-elt per slice (+-2%)
MEAS_SLICE_FLOOR_OPEQ = 158.0     # counted algorithm ops (ALU floor)
MEAS_FIXED_PER_PROG_US = 28.0     # measured range 16-31
MEAS_CHAIN_OVERHEAD_US = 22.6     # bench chained-frame artifact


def measured_roofline(H, W, cfg, label, measured_frame_ms,
                      glue_ms=0.0, n_slices=None):
    """Frame-level measured-cost model + true %-of-SoL for a shipped
    streaming single-view config (2 views/frame)."""
    from stereo_matching_cuda_tpu.ops.pallas_guided import (
        _pick_tiles_stream, _stream_carry, _stream_n_live, _stream_sh_cap,
        _vmem_params, fused_geometry)

    size_d = n_slices or cfg.size_d
    _, px = fused_geometry(cfg)
    A = _stream_carry(cfg.radius)
    sh, tw = _pick_tiles_stream(H, W, px, cfg.radius, size_d,
                                _vmem_params(cfg)[0], _stream_n_live(cfg),
                                max_sh=_stream_sh_cap(cfg))
    w_ext = ((tw + 2 * px + 127) // 128) * 128
    nyp = (H + A + 2 * cfg.radius + sh - 1) // sh
    nx = (W + tw - 1) // tw
    n_prog = nyp * nx
    ext_elts = n_prog * (sh + A) * w_ext

    per_view_slices_ms = (ext_elts * size_d * MEAS_PER_SLICE_OPEQ
                          / VPU_PEAK * 1e3)
    per_view_fixed_ms = n_prog * MEAS_FIXED_PER_PROG_US / 1e3
    pred_frame = 2 * (per_view_slices_ms + per_view_fixed_ms) + glue_ms
    floor_frame = 2 * (ext_elts * size_d * MEAS_SLICE_FLOOR_OPEQ
                       / VPU_PEAK * 1e3) + glue_ms
    print(f"\n{label}: {H}x{W} D={size_d}, stream tiles ({sh},{tw}), "
          f"{n_prog} programs/view, ext {ext_elts/1e6:.2f} M elts/view")
    print(f"  predicted frame (measured constants): {pred_frame:7.3f} ms "
          f"(slices 2x{per_view_slices_ms:.3f} + fixed "
          f"2x{per_view_fixed_ms:.3f} + glue {glue_ms:.3f})")
    print(f"  measured frame:                       "
          f"{measured_frame_ms:7.3f} ms "
          f"(model {pred_frame/measured_frame_ms*100:.0f}% of measured)")
    print(f"  ALU-issue floor (rolls at 1 op):      {floor_frame:7.3f} ms "
          f"-> TRUE {floor_frame/measured_frame_ms*100:.0f}% of "
          f"speed-of-light")
    return pred_frame


def _round5_measured():
    print("\n=== round-5 MEASURED-cost roofline (shipped configs) ===")
    cfg = DEFAULT_CONFIG
    csmall = dataclasses.replace(cfg, stream=True, y_sum="roll", vmem_mb=32,
                                 unroll_max=8)
    measured_roofline(288, 384, csmall,
                      "Tsukuba single fori stream vmem32 (r5 default, "
                      "fused post)", measured_frame_ms=0.406,
                      glue_ms=0.004 + 0.030)
    c64 = dataclasses.replace(cfg, vmem_mb=64, unroll_max=8, y_sum="roll",
                              stream=True)
    measured_roofline(1992, 3008, c64, "6 MP stream fori roll vmem64 (r5 picks)",
                      measured_frame_ms=17.55, glue_ms=0.5)
    c128 = dataclasses.replace(cfg, d_min=-127, d_max=0, vmem_mb=128,
                               y_sum="roll", stream=True)
    measured_roofline(1988, 2948, c128, "5.9 MP/128 d stream roll vmem128 (r5 fused post)",
                      measured_frame_ms=141.22, glue_ms=1.0)
    print("\n(The bench's chained-frame methodology additionally counts "
          f"~{MEAS_CHAIN_OVERHEAD_US:.0f} us/frame of lax.fori_loop step "
          "overhead inside every measured number — the pure device "
          "compute is that much lower, ~5% at Tsukuba scale.)")


if __name__ == "__main__" and "--r5" in sys.argv:
    _round5_measured()
