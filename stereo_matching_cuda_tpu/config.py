"""Configuration for the TPU-native dense stereo engine.

The reference implementation (hamza1030/stereo_matching_cuda) exposes every
tunable as a compile-time ``#define`` in ``SystemIncludes.h:6-24``.  Here they
become a frozen (hashable, jit-static) dataclass whose defaults reproduce the
reference numerics exactly:

  - ``R_W/G_W/B_W`` grayscale weights (note blue weight 0.0721, *not* the
    standard 0.114 — replicated for parity; SystemIncludes.h:7-9)
  - ``ALPHA`` gradient/color blend (SystemIncludes.h:10)
  - ``D_MIN/D_MAX`` disparity range (SystemIncludes.h:11-12)
  - ``TH_grad/TH_color`` truncation thresholds (SystemIncludes.h:13-14)
  - ``RADIUS`` box-filter radius → 19x19 window (SystemIncludes.h:21)
  - ``EPS`` guided-filter regularizer = (0.01*255)^2 (SystemIncludes.h:23)
  - ``D_LR`` left-right check tolerance (SystemIncludes.h:24)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class StereoConfig:
    """All tunables of the stereo pipeline. Hashable → usable as a jit
    static argument."""

    # Grayscale weights (SystemIncludes.h:7-9).
    r_w: float = 0.299
    g_w: float = 0.587
    b_w: float = 0.0721

    # Cost blend & truncation (SystemIncludes.h:10,13-14).
    alpha: float = 0.9
    th_color: float = 7.0
    th_grad: float = 2.0

    # Disparity search range, inclusive (SystemIncludes.h:11-12).
    d_min: int = -15
    d_max: int = 0

    # Guided filter (SystemIncludes.h:21,23).
    radius: int = 9
    eps: float = 6.5025

    # Left-right consistency tolerance (SystemIncludes.h:24).
    d_lr: int = 0

    # --- framework knobs (no reference equivalent) ---------------------
    # Number of disparity slices processed per scan step in the guided
    # filter (bounds peak HBM for large volumes). None = all at once.
    # Only affects the unfused jnp path — the fused Pallas kernel never
    # materializes the volume, so it has nothing to chunk.
    d_chunk: Optional[int] = None
    # The filtering path is float32 by design, not configurable:
    # a = (mean_Ip - mean_I·mean_p)·c cancels catastrophically and needs
    # the full 24-bit mantissa — bf16's 8 bits would swamp the 1e-3-level
    # q gaps that decide disparities.  The VPU runs f32 natively; the
    # pipeline is compute- not bandwidth-bound in VMEM, so bf16 would
    # buy little and cost accuracy.
    # Parity mode: compute integral-image cumsums with the reference's
    # sequential left-to-right association (rowSum/colSum,
    # integral.cu:78-131) via lax.scan instead of XLA's reassociating
    # parallel cumsum.  Bit-exact vs the oracle, but serial — use for
    # validation, not production.
    exact_integral: bool = False
    # Use the fused Pallas cost+guided+WTA kernel (ops/pallas_guided.py)
    # instead of the XLA op-by-op path.  "auto" = on TPU backends only;
    # True/False force.  Mutually exclusive with exact_integral (the
    # fused kernel is the fast path; ties may flip vs the oracle).
    fused: str | bool = "auto"
    # Compute both views in ONE fused kernel pass (shared DMA,
    # derivatives, raw cost slices — ops/pallas_guided.py
    # guided_wta_fused_dual).  "auto" = when the fused path runs and
    # size_d fits the unrolled d-loop; True forces (errors if
    # ineligible); False always uses two per-view kernel calls.
    dual_view: str | bool = "auto"
    # Run the pipeline as separately-jitted stages chained in Python
    # instead of one composed jit.  "auto" = big frames on TPU (the
    # composed-module XLA compile is pathological at bike scale —
    # BENCH.md); True/False force.  Identical numerics either way.
    staged: str | bool = "auto"
    # Fused-kernel d-loop unroll threshold override (None = the
    # module default, 32).  Unrolled runs ~9% faster per frame; Mosaic
    # compile time grows superlinearly in the unroll factor (BENCH.md).
    unroll_max: Optional[int] = None
    # Fused-kernel y-direction window-sum implementation (None = the
    # module default, the hardware-measured winner — BENCH.md):
    # "mxu" (band matmul, Precision.HIGHEST), "mxu3"/"mxu2" (band
    # matmul with a manual 3/2-limb bf16 split of the data operand),
    # "roll" (log-doubling sublane rolls on the VPU).
    y_sum: Optional[str] = None
    # Dual-view kernel: number of disparity slices whose y-sum matmuls
    # are batched into one lane-concatenated band matmul per guided
    # phase (None = the module default).  Grouping G slices turns the
    # 2 matmuls/slice into 2 matmuls per G slices (4G operands wide):
    # fewer, wider MXU ops amortize the band-weight loads further, at
    # the cost of keeping 4G ext-tile operands live (more VMEM).
    # Bit-exact: matmul columns are independent.
    slice_group: Optional[int] = None
    # Fused-kernel VMEM budget in MiB (None = the module default).
    # Mosaic's default scoped-VMEM limit is 16 MiB; v5e has 128 MiB per
    # core, so raising this lets the tile picker choose taller strips
    # (fewer programs, less per-program fixed cost and halo recompute)
    # at the cost of a larger working set.
    vmem_mb: Optional[int] = None
    # Fused-kernel software pipelining: skew the d-loop emission so
    # each y-sum matmul has independent VPU work between issue and
    # consumption.  Dual kernel, unrolled branch: next slice's
    # cost/x-sums + a deferred WTA update.  Single-view kernel, fori
    # branch (wide ranges / big-frame strategy): the loop carries the
    # previous slice's phase-1 means, so each body holds two
    # independent matmul groups (phase-1 of slice s, phase-2 of s-1)
    # with the other's VPU work available to overlap.  The per-slice
    # math and the ascending WTA update order are unchanged; the dual
    # unrolled emission is bit-exact, the fori emission may move best
    # costs ~1 ULP via FMA contraction (near-ties can flip — the
    # fast-path accuracy class, tested bounded).  None = the module
    # default (hardware-measured winner), True/False force.
    sw_pipeline: Optional[bool] = None
    # Streaming-y (strip-carry) fused kernel: grid programs walk each
    # x-column top-to-bottom and carry the last ~2R rows of every
    # per-slice x-window sum (cost, I·cost, a, b) in persistent VMEM
    # scratch, so no strip recomputes its neighbor's halo rows — the
    # y-direction issued-work ratio drops to ~1 (the output lags the
    # input by 2R rows; the wrapper crops the lag).  Same math, fused
    # fast-path accuracy class.  None = the module default
    # (hardware-measured winner per frame regime — BENCH.md round 4);
    # True/False force.
    stream: Optional[bool] = None
    # Streaming-kernel cross-program DMA double-buffering: each grid
    # program starts the NEXT program's input-tile DMA before its own
    # compute (two-slot input scratch; TPU grid programs run
    # sequentially, so program i's copy lands while program i-1
    # computes).  Bit-identical outputs — only the DMA schedule moves.
    # None = the module default (hardware-measured NEGATIVE, off —
    # BENCH.md round 4); True/False force.  Only the SINGLE-VIEW
    # streaming kernel honors it; the dual-view streaming kernel
    # ignores the knob (the decider was negative before it was worth
    # porting there).
    dma_buffer: Optional[bool] = None
    # Fused Pallas post-stage (ops/pallas_post.py): LR consistency
    # check + occlusion fill in ONE Mosaic kernel — the select tree
    # over size_d shifted right-map copies and the two packed-cummax
    # fill scans stay VMEM-resident instead of round-tripping HBM
    # between XLA ops.  BIT-IDENTICAL to the XLA post stage (integer
    # selects/compares only — no reassociation anywhere; tested).
    # None = auto (whenever the fused matching path runs); True/False
    # force.
    post_fused: Optional[bool] = None

    # ------------------------------------------------------------------
    def __post_init__(self):
        if self.d_max < self.d_min:
            raise ValueError(f"d_max {self.d_max} < d_min {self.d_min}")
        if self.radius < 1:
            raise ValueError(f"radius must be >= 1, got {self.radius}")
        if self.eps <= 0:
            raise ValueError(f"eps must be > 0, got {self.eps}")
        if self.th_color < 0 or self.th_grad < 0:
            raise ValueError("truncation thresholds must be >= 0")
        if self.d_chunk is not None and (
            self.d_chunk < 1 or self.size_d % self.d_chunk
        ):
            raise ValueError(
                f"d_chunk {self.d_chunk} must divide size_d {self.size_d}")
        if self.fused not in (True, False, "auto"):
            raise ValueError(
                f"fused must be True, False or 'auto', got {self.fused!r}")
        if self.dual_view not in (True, False, "auto"):
            raise ValueError(
                f"dual_view must be True, False or 'auto', got {self.dual_view!r}")
        if self.staged not in (True, False, "auto"):
            raise ValueError(
                f"staged must be True, False or 'auto', got {self.staged!r}")
        if self.unroll_max is not None and self.unroll_max < 1:
            raise ValueError(f"unroll_max must be >= 1, got {self.unroll_max}")
        if self.y_sum not in (None, "mxu", "mxu3", "mxu2", "roll"):
            raise ValueError(
                f"y_sum must be None, 'mxu', 'mxu3', 'mxu2' or 'roll', "
                f"got {self.y_sum!r}")
        if self.slice_group is not None and self.slice_group < 1:
            raise ValueError(
                f"slice_group must be >= 1, got {self.slice_group}")
        if self.vmem_mb is not None and not (4 <= self.vmem_mb <= 128):
            raise ValueError(
                f"vmem_mb must be in [4, 128] MiB, got {self.vmem_mb}")
        if self.sw_pipeline not in (None, True, False):
            raise ValueError(
                f"sw_pipeline must be None, True or False, "
                f"got {self.sw_pipeline!r}")
        if self.stream not in (None, True, False):
            raise ValueError(
                f"stream must be None, True or False, got {self.stream!r}")
        if self.dma_buffer not in (None, True, False):
            raise ValueError(
                f"dma_buffer must be None, True or False, "
                f"got {self.dma_buffer!r}")
        if self.post_fused not in (None, True, False):
            raise ValueError(
                f"post_fused must be None, True or False, "
                f"got {self.post_fused!r}")
        if self.fused is True and self.exact_integral:
            raise ValueError(
                "fused=True and exact_integral=True are mutually exclusive: "
                "the fused kernel is the fast path (WTA ties may flip)")

    @property
    def size_d(self) -> int:
        """Number of disparity hypotheses (main.cu:70)."""
        return self.d_max - self.d_min + 1

    @property
    def d_min_right(self) -> int:
        """Disparity offset of the right view's cost volume: labels are
        ``d_min_right + s`` for slice s (main.cu:81-82)."""
        return -self.d_max

    @property
    def d_occlusion(self) -> int:
        """Sentinel written into LR-inconsistent pixels (main.cu:149)."""
        return self.d_min - 100

    @property
    def v_min(self) -> int:
        """Occlusion-fill validity threshold (main.cu:154)."""
        return self.d_min

    @property
    def window(self) -> int:
        """Box window edge length."""
        return 2 * self.radius + 1

    @property
    def shift_max(self) -> int:
        """Largest |disparity| any view samples at.  The right view's
        labels are d_min_right + s = -d_max .. -d_min, so this is just
        max(|d_min|, |d_max|) — the long 4-term max previously written
        at every halo-arithmetic site reduces to it."""
        return max(abs(self.d_min), abs(self.d_max))

    def disparities(self, dmin: Optional[int] = None) -> Tuple[int, ...]:
        base = self.d_min if dmin is None else dmin
        return tuple(base + s for s in range(self.size_d))


DEFAULT_CONFIG = StereoConfig()
