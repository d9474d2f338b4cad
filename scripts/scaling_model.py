"""Multi-chip scaling model from round-5 measured constants.

BASELINE.json's north star asks for frames/s scaling efficiency at
1 chip / 1 host / N hosts.  Multi-chip hardware is not available in
this environment (one v5e chip behind a tunnel), so this model is the
strongest honest artifact: it combines

  - the MEASURED single-chip kernel law (r5 slice slopes, BENCH.md
    measured-cost roofline): per-view kernel time =
    ext_elts x D x 225 op-eq / 3.85 Top/s + n_programs x 28 us,
    which explains 99-107% of every shipped config's measured frame;
  - EXACT per-frame collective volumes computed from the sharding
    design in parallel/sharded.py (one gray-image halo exchange per
    view, the 15-px right-map LR halo, the per-range WTA all_gather,
    the segmented-fill row summaries);
  - v5e interconnect specs: ICI ~ 400 GB/s/link bidirectional class,
    DCN ~ 25 GB/s/host class (order-of-magnitude; the point is the
    RATIO to compute, which is tiny).

Every predicted row is labeled MODEL; single-chip rows are measured.
The 8-virtual-device CPU mesh + the 2-process gloo test validate the
collective CORRECTNESS (tests/test_sharded.py, MULTICHIP_r05);
this script quantifies why the efficiency prediction is high: the
halo/collective bytes per frame are 3-5 orders of magnitude below the
compute time x ICI bandwidth product.

Run (CPU, instant):
  env JAX_PLATFORMS=cpu python scripts/scaling_model.py
"""

import dataclasses
import sys

sys.path.insert(0, "/root/repo")

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.parallel.mesh import pipeline_halo

VPU_PEAK = 8 * 128 * 4 * 0.94e9
PER_SLICE_OPEQ = 225.0
FIXED_PER_PROG_S = 28e-6
ICI_BW = 400e9          # B/s per chip, bidirectional class (v5e 2D torus)
DCN_BW = 25e9           # B/s per host class
REF_FPS_TSUKUBA = 5.45  # GTX 1080 aggregate (BASELINE.md)
REF_FPS_BIKE = 0.13


def kernel_frame_s(h, w, size_d, sh, tw, px):
    """Measured-law per-frame kernel seconds (2 views)."""
    A = 24
    w_ext = ((tw + 2 * px + 127) // 128) * 128
    nyp = (h + A + 18 + sh - 1) // sh
    nx = (w + tw - 1) // tw
    ext = nyp * nx * (sh + A) * w_ext
    per_view = ext * size_d * PER_SLICE_OPEQ / VPU_PEAK \
        + nyp * nx * FIXED_PER_PROG_S
    return 2 * per_view


def spatial_row(name, h, w, size_d, measured_1chip_ms, mesh, tiles, px):
    """Predict an (y, x)-spatial + d shard of ONE frame over n chips."""
    ny, nx_m, nd = mesh
    n = ny * nx_m * nd
    cfg = dataclasses.replace(DEFAULT_CONFIG, d_min=-(size_d - 1), d_max=0)
    halo_y, halo_x = pipeline_halo(cfg)
    hl, wl = h // ny, w // nx_m
    # collective bytes per frame per chip (f32 everywhere):
    # 2 gray views x both-axis halo exchange + LR right-map x-halo +
    # fill row summaries (2 int32 per row, all_gather over x) +
    # per-range WTA all_gather of (best, dmap) over d
    halo_bytes = 2 * 4 * (2 * halo_y * wl + 2 * halo_x * hl)
    lr_bytes = 4 * 2 * cfg.shift_max * hl
    fill_bytes = 8 * hl * nx_m
    wta_bytes = (2 * 4 * hl * wl * (nd - 1)) if nd > 1 else 0
    coll_bytes = halo_bytes + lr_bytes + fill_bytes + wta_bytes
    t_coll = coll_bytes / ICI_BW
    # per-chip kernel: local tile with halo, local d-range
    t_kernel = kernel_frame_s(hl + 2 * halo_y, wl + 2 * halo_x,
                              size_d // nd, *tiles, px)
    t_frame = t_kernel + t_coll
    eff = (measured_1chip_ms / 1e3) / (t_frame * n)
    print(f"  {name} on {mesh} = {n} chips [MODEL]: "
          f"{t_frame*1e3:6.2f} ms/frame ({1/t_frame:7.1f} fps), "
          f"collectives {coll_bytes/1e6:.2f} MB = {t_coll*1e6:.0f} us "
          f"({t_coll/t_frame*100:.1f}%), parallel efficiency {eff*100:.0f}%")
    return 1 / t_frame


def main():
    cfg = DEFAULT_CONFIG
    _, px16 = pipeline_halo(cfg)[0], 36
    print("=== measured single-chip laws (r5; BENCH.md) ===")
    rows = [
        ("Tsukuba 384x288 D=16", 288, 384, 16, 0.406, (336, 384), 36),
        ("6 MP D=16", 1992, 3008, 16, 17.55, (128, 1536), 36),
        ("5.9 MP D=128", 1988, 2948, 128, 141.22, (128, 1536), 148),
    ]
    for name, h, w, d, ms, tiles, px in rows:
        pred = kernel_frame_s(h, w, d, *tiles, px) * 1e3
        print(f"  {name}: measured {ms} ms/frame "
              f"(kernel law predicts {pred:.2f} + glue)")

    print("\n=== batch axis (sequence throughput, BASELINE #5) ===")
    print("  Frames are independent; the batch axis shards over chips")
    print("  (ICI) or hosts (DCN) with ONLY input distribution on the")
    print("  wire: a Tsukuba uint8 pair is 0.66 MB -> 26 us DCN/frame")
    print("  against 0.41 ms compute; a 6 MP pair is 36 MB -> 1.4 ms")
    print("  DCN vs 17.6 ms compute (and inputs usually originate")
    print("  per-host).  [MODEL] aggregate at 8 chips:")
    for name, ms, ref in [("Tsukuba", 0.406, REF_FPS_TSUKUBA),
                          ("6 MP", 17.55, REF_FPS_BIKE)]:
        fps8 = 8 * 1e3 / ms
        print(f"    {name}: {fps8:8.0f} fps = {fps8/ref:8.0f}x the "
              f"reference GPU (target was >10x)")

    print("\n=== spatial + disparity sharding of ONE frame [MODEL] ===")
    print("  (the latency axis — for when a single frame must finish")
    print("  fastest; halo/collective volumes from parallel/sharded.py)")
    spatial_row("6 MP D=16", 1992, 3008, 16, 17.55,
                (2, 2, 2), (128, 768), 36)
    spatial_row("6 MP D=16", 1992, 3008, 16, 17.55,
                (2, 4, 1), (128, 768), 36)
    spatial_row("5.9 MP D=128", 1988, 2948, 128, 141.22,
                (2, 2, 2), (128, 768), 148)
    spatial_row("5.9 MP D=128", 1988, 2948, 128, 141.22,
                (1, 1, 8), (128, 1536), 148)

    print("\nEfficiency losses are halo RECOMPUTE (the tile+halo region")
    print("grows relative to small per-chip tiles), not wire time —")
    print("collectives are <1% everywhere.  The batch axis is the")
    print("throughput-optimal deployment; spatial+d sharding buys")
    print("single-frame latency at the modeled efficiencies.")


if __name__ == "__main__":
    main()
