"""Fused Pallas TPU kernel: cost volume + guided filter + WTA.

The reference pipeline materializes the (D,H,W) cost volume in GPU
memory and walks it with ~530 kernel launches and ~1,500 host copies
per frame (SURVEY.md §3.4).  The XLA op-by-op path in ops/ already
collapses that to one graph, but still materializes several
volume-sized intermediates in HBM (cost, mean_p, mean_ip, a, b, q).

This kernel is the speed-of-light redesign: HBM traffic is just the two
grayscale images in and (best_cost, disparity) out.  Everything else —
x-derivatives, per-disparity cost slices, six box filters, the guided
coefficients and the streaming WTA — lives in VMEM for one image strip
at a time:

  grid = (ny*nx,)          one program per (y-strip, x-tile)
  inputs:        the two grayscale images, zero-padded once in HBM;
                 each program DMAs its tile + halo (halo_y rows,
                 px = max|d|+1+2(R+1) cols) into VMEM scratch
  in kernel:     for s in 0..D-1 (unrolled ≤32 slices; fori_loop with
                 an incrementally-rolled match image beyond):
                   cost slice (truncated AD + gradient AD, zero outside
                   the image) → box means (x: log-doubling lane rolls;
                   y: banded matmul on the MXU, Precision.HIGHEST) →
                   a, b → q → streaming `best >= q` update (the
                   reference's ascending-d dispSelect rule,
                   guidedFilter.cu:403-411, literally)

Border semantics match ops/ and the sharded tiles: zero padding outside
the image + clamped-area normalizer from GLOBAL coordinates equals the
reference's clamped integral windows (guidedFilter.cu:305-318).

Float caveat (fast path): box sums use VMEM cumsum association and FMA
contraction is not suppressed, so WTA near-ties can flip vs the oracle
(~1e-4 of pixels on real images) — same tolerance class as the XLA fast
mode.  Parity testing uses the unfused exact path.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import StereoConfig, DEFAULT_CONFIG
from .guided import BEST_COST_INIT


def _pick_tiles(h: int, w: int, px: int, halo_y: int,
                vmem_budget: int = int(15.7 * 2**20),
                n_live: int = 45) -> tuple[int, int]:
    """(strip_height, tile_width) that fit VMEM.

    The kernel runs near speed-of-light on the work it ISSUES (r3
    swpipe probe: Mosaic schedules no VPU/MXU overlap, so issued work
    is the frame time); the waste is halo recompute.  The objective is
    therefore the exact issued-work ratio — ny*nx ext tiles over the
    frame's interior — which, unlike a per-tile ratio, also charges
    the ceil waste of strips overhanging the image (ny*sh > h burned
    25% of Tsukuba-height frames under the old per-tile objective).
    Ties prefer fewer programs (less per-program dispatch).

    ``n_live`` = ext-tile f32 buffers Mosaic keeps live through the
    d-loop (measured ~45 for the single-view unrolled kernel, ~32-34
    fori; the dual-view kernel runs two guided chains per slice and
    needs more), plus the (she, she) band matrix and DMA scratch."""
    best = None
    # the whole-width candidate rounds UP to the 128-lane tiling: with
    # tw = w and w % 128 != 0 the output array (nx*tw wide) is an
    # unaligned Mosaic memref — measured compile crash (r4_midvmem,
    # (216,1504)).  tw > w is safe: the kernel masks beyond W and the
    # wrapper crops.
    w_cand = ((w + 127) // 128) * 128
    tws = sorted({w_cand} | {tw for tw in (2048, 1792, 1536, 1280, 1024,
                                           896, 768, 640, 512, 384, 256)
                             if tw <= w})
    shs = [s for s in (512, 448, 384, 320, 256, 224, 192, 160, 128, 96,
                       64, 48, 32, 24, 16, 8) if s <= max(8, h)]
    for tw in tws:
        wte = ((tw + 2 * px + 127) // 128) * 128
        nx = (w + tw - 1) // tw
        for sh in shs:
            she = sh + 2 * halo_y
            # n_live ext-tile f32 values live through the d-loop
            # (measured: she=176, wte=640 → 19.0 MB OOM at n_live 45;
            # 176×512 fit), plus the band matrix.
            est = (n_live * she * wte + she * she) * 4
            if est > vmem_budget:
                continue
            ny = (h + sh - 1) // sh
            overhead = (ny * nx * she * wte) / (h * w)
            key = (overhead, ny * nx)
            if best is None or key < best[0]:
                best = (key, sh, tw)
    if best is None:
        raise ValueError(
            f"no fused-kernel tiling fits the {vmem_budget/2**20:.1f} MB "
            f"VMEM budget for image {h}x{w} (halo_y={halo_y}, px={px}); "
            "reduce the disparity range or radius, or use the unfused "
            "path (fused=False)")
    return best[1], best[2]


# d-loop unroll threshold: ranges up to this unroll statically; wider
# ranges use the in-kernel fori_loop (see _make_kernel).  Measured
# tradeoff on v5e (BENCH.md): the unrolled form runs ~9% faster per
# frame but Mosaic compile time grows superlinearly in the unroll
# factor (16-way ≈ 80-200 s, 128-way > 40 min; the fori form compiles
# in 2-6 s).  cfg.unroll_max overrides per run.
_UNROLL_MAX = 32


def unroll_max(cfg: StereoConfig) -> int:
    return _UNROLL_MAX if cfg.unroll_max is None else cfg.unroll_max


def _roll(x: jax.Array, shift: int, axis: int) -> jax.Array:
    """Circular roll with either sign (pltpu.roll wants shift >= 0):
    out[i] = x[i - shift]."""
    if shift == 0:
        return x
    n = x.shape[axis]
    return pltpu.roll(x, shift % n, axis)


def _forward_window_sum(x: jax.Array, k: int, axis: int) -> jax.Array:
    """out[i] = sum_{j=0..k-1} x[i+j], via log-doubling partial sums
    (Mosaic has no cumsum primitive).  Positions that wrap around the
    array edge are garbage; callers only consume positions at least
    halo away from edges."""
    pows = {1: x}
    p = 1
    while p * 2 <= k:
        pows[p * 2] = pows[p] + _roll(pows[p], -p, axis)
        p *= 2
    result = None
    offset = 0
    for p in sorted(pows, reverse=True):
        if k & p:
            term = _roll(pows[p], -offset, axis)
            result = term if result is None else result + term
            offset += p
    return result


def _band_matrix(n: int, r: int) -> jax.Array:
    """(n, n) float32 with M[i, j] = (|i-j| <= r) — multiplying by it
    sums a (2r+1) window (clamped at array edges)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (jnp.abs(i - j) <= r).astype(jnp.float32)


def _band_matrix_off(rows: int, cols: int, off: int, r: int) -> jax.Array:
    """(rows, cols) float32 with M[i, j] = (|i + off - j| <= r): a
    band matmul restricted to the ``rows`` output rows starting at
    input row ``off``.  Each retained output row computes the identical
    contraction as the square ``_band_matrix`` form, so restricting is
    bit-exact — it only skips rows nobody consumes."""
    i = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    return (jnp.abs(i + off - j) <= r).astype(jnp.float32)


# y-direction window-sum implementation:
#   "mxu"  — banded matmul, jax.lax.Precision.HIGHEST (6 bf16 passes)
#   "mxu3" — banded matmul, manual 3-limb bf16 split of the data
#            operand (the 0/1 band matrix is bf16-exact, so 3 limbs
#            carry all 24 f32 mantissa bits: same accuracy class as
#            HIGHEST at half the MXU passes)
#   "mxu2" — 2-limb split (~16 mantissa bits; slightly looser ties)
#   "roll" — log-doubling sublane rolls on the VPU (exact f32 adds,
#            no MXU passes)
# The default is the hardware-measured winner (BENCH.md).  Env override
# for benching.
_Y_SUM_IMPL = os.environ.get("STEREO_Y_SUM", "mxu")


def _band_matmul_limbs(my: jax.Array, sx: jax.Array, n_limbs: int) -> jax.Array:
    """``my @ sx`` with ``my`` a 0/1 band matrix (exact in bf16) and
    ``sx`` split into ``n_limbs`` bf16 limbs.  Each limb product is a
    1-pass bf16 matmul with f32 accumulation; every elementary product
    my[i,k]*limb[k,j] is exact (0 or the limb itself), so the result
    carries n_limbs*8 mantissa bits of sx — 3 limbs ≈ full f32."""
    mb = my.astype(jnp.bfloat16)
    acc = None
    rem = sx
    for _ in range(n_limbs):
        limb = rem.astype(jnp.bfloat16)
        rem = rem - limb.astype(jnp.float32)
        part = jax.lax.dot_general(
            mb, limb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def _y_matmul(impl: str, m: jax.Array, sx: jax.Array) -> jax.Array:
    """One y-direction band matmul under the chosen implementation —
    the single dispatch shared by the dual kernel's hybrid box sums and
    the single-view kernel's (optionally band-restricted) pair."""
    if impl == "mxu3":
        return _band_matmul_limbs(m, sx, 3)
    if impl == "mxu2":
        return _band_matmul_limbs(m, sx, 2)
    return jax.lax.dot_general(
        m, sx, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _y_matmul_many(impl: str, m: jax.Array, xs, w: int) -> list:
    """One band matmul over the lane-concatenated operands (bit-exact
    vs per-operand: matmul columns are independent), split back."""
    cat = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=1)
    out = _y_matmul(impl, m, cat)
    return [out[:, i * w : (i + 1) * w] for i in range(len(xs))]


def _box_sum_hybrid_many(xs, r: int, my: jax.Array,
                         impl: str | None = None) -> list:
    """Centered window sums for a LIST of same-shape operands:
    x-direction via per-operand log-doubling lane rolls (cheap on the
    VPU); y-direction as ONE banded matmul over the lane-concatenated
    operands on the otherwise-idle MXU (or per-operand log-doubling
    sublane rolls for impl="roll").  Matmul columns are independent, so
    each output element's contraction is identical to the per-operand
    form — bit-exact — while the single wide matmul amortizes the
    band-matrix weight loads over len(xs)x the lanes.

    The matmul's band matrix clamps at tile-ext edges while the roll
    form wraps garbage into the outermost r rows — both are outside
    the halo_y >= 2(r+1) consumption region, so consumers see identical
    coverage.  The default "mxu" matmul runs at Precision.HIGHEST: the
    1-pass bf16 MXU product loses ~16 mantissa bits and flipped ~60x
    more WTA near-ties on hardware (312 vs 5 of 110k Tsukuba px)."""
    impl = impl or _Y_SUM_IMPL
    k = 2 * r + 1
    sxs = [_roll(_forward_window_sum(x, k, 1), r, 1) for x in xs]
    if impl == "roll":
        return [_roll(_forward_window_sum(sx, k, 0), r, 0) for sx in sxs]
    return _y_matmul_many(impl, my, sxs, xs[0].shape[1])


def _make_boxms(impl: str | None, she: int, sh: int, halo_y: int, r: int,
                inv_area: jax.Array, restricted: bool = True):
    """(boxm_mid, boxm_out, top, mid): band-restricted box-mean pair
    for the SINGLE-VIEW kernel.

    ``boxm_mid``: full (she, W) ext tile -> (mid, W) — only the rows
    [top, top+mid) where a/b (and the guide statistics they consume)
    are needed: interior ± (r+1), 8-aligned.  ``boxm_out``: (mid, W)
    a/b band -> (sh, W) interior rows (the final mean(a)/mean(b)
    pass).  For the matmul y-sum impls the restriction is bit-exact
    row skipping (see _band_matrix_off); the roll impl keeps full
    columns (top = 0) and boxm_out slices the interior afterwards.

    Hardware note (BENCH.md): the restriction wins in the single-view
    fori-loop kernel (3 MP/128 d: 362 vs 394 ms @16 MiB, 254 vs
    273 ms @32 MiB) but REGRESSES unrolled kernels (Tsukuba dual 0.805
    vs 0.660 ms at default tiles — Mosaic mixed-shape overhead + VMEM
    fragmentation on a VPU-bound kernel), so ``restricted=False``
    (used by every unrolled d-loop) keeps ONE square matmul shape:
    top = 0, mid = she, and boxm_out row-slices the full product
    (identical contractions, bit-exact either way)."""
    k = 2 * r + 1
    impl = impl or _Y_SUM_IMPL
    if not restricted or impl == "roll":
        top = 0
    else:
        top = max(0, (halo_y - (r + 1)) // 8 * 8)
    mid = she - 2 * top

    if impl == "roll":
        m_mid = m_out = None
    elif restricted:
        m_mid = _band_matrix_off(mid, she, top, r)
        m_out = _band_matrix_off(sh, mid, halo_y - top, r)
    else:
        m_mid = m_out = _band_matrix(she, r)   # one shared shape
    ia_mid = inv_area[top : top + mid]
    ia_out = inv_area[halo_y : halo_y + sh]
    out_rows = (lambda t: t) if restricted else (
        lambda t: t[halo_y : halo_y + sh])

    def boxm_mid(*xs):
        w = xs[0].shape[1]
        sxs = [_roll(_forward_window_sum(x, k, 1), r, 1) for x in xs]
        if impl == "roll":
            return [_roll(_forward_window_sum(sx, k, 0), r, 0) * ia_mid
                    for sx in sxs]
        return [s * ia_mid for s in _y_matmul_many(impl, m_mid, sxs, w)]

    def boxm_out(*xs):
        w = xs[0].shape[1]
        sxs = [_roll(_forward_window_sum(x, k, 1), r, 1) for x in xs]
        if impl == "roll":
            return [_roll(_forward_window_sum(sx, k, 0), r, 0)
                    [halo_y : halo_y + sh] * ia_out for sx in sxs]
        return [out_rows(s) * ia_out for s in _y_matmul_many(impl, m_out, sxs, w)]

    return boxm_mid, boxm_out, top, mid


def _shift_x_vmem(x: jax.Array, d: int) -> jax.Array:
    """out[., x] = x[., x+d] via circular roll (wrapped columns land in
    the zero padding / masked region)."""
    return _roll(x, -d, 1)


def _make_kernel(cfg: StereoConfig, H: int, W: int,
                 sh: int, tw: int, nx: int, halo_y: int, px: int, w_ext: int,
                 n_slices: int | None = None, lead: int = 0, nxy: int = 0):
    """H, W are the GLOBAL image dims.  The scalar-prefetch ref holds
    (origin_y, origin_x, dmin): the global coords of the local padded
    array's interior origin (0,0 single-chip; the tile corner under
    shard_map) and the base disparity label.  dmin is a runtime scalar
    — the match image is PRE-SHIFTED by dmin on the XLA side, so the
    kernel's per-slice shifts are the static s = 0..D-1 and the SAME
    Mosaic program serves the left and right views (halves compile
    work; composed-module compile time was superlinear in distinct
    kernels).

    ``nxy`` > 0 = batched mode: the HBM images carry a leading frame
    axis, the grid is (nb*ny*nx,) and ``nxy = ny*nx`` decomposes the
    program id into (frame, tile) — sequence throughput without
    vmapping the pallas_call (unsupported for ANY-space refs)."""
    r = cfg.radius
    size_d = cfg.size_d if n_slices is None else n_slices
    alpha = np.float32(cfg.alpha)
    one = np.float32(1)
    th_color = np.float32(cfg.th_color)
    th_grad = np.float32(cfg.th_grad)
    oob = (one - alpha) * th_color + alpha * th_grad
    eps = np.float32(cfg.eps)
    she = sh + 2 * halo_y

    def kernel(origin_ref, i1_hbm, i2_hbm, best_ref, dmap_ref, v1, v2, sems):
        tile = pl.program_id(0)
        if nxy:
            fb = tile // nxy
            tile = tile % nxy
        ty = tile // nx
        tx = tile % nx
        y0 = ty * sh - halo_y + origin_ref[0]   # global row of ext row 0
        x0 = tx * tw - px + origin_ref[1]       # global col of ext col 0
        dmin = origin_ref[2]
        # DMA this tile's ext region from the zero-padded HBM images
        # (padded origin is (halo_y, lead + px): `lead` gives headroom so
        # the dmin pre-shift placement never needs a negative start)
        src1 = i1_hbm.at[fb] if nxy else i1_hbm
        src2 = i2_hbm.at[fb] if nxy else i2_hbm
        d1 = pltpu.make_async_copy(
            src1.at[pl.ds(ty * sh, she), pl.ds(tx * tw + lead, w_ext)],
            v1, sems.at[0])
        d2 = pltpu.make_async_copy(
            src2.at[pl.ds(ty * sh, she), pl.ds(tx * tw + lead, w_ext)],
            v2, sems.at[1])
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()
        I1 = v1[:]
        I2 = v2[:]

        gx = jax.lax.broadcasted_iota(jnp.int32, (she, w_ext), 1) + x0
        gy = jax.lax.broadcasted_iota(jnp.int32, (she, w_ext), 0) + y0
        in_img = (gx >= 0) & (gx < W) & (gy >= 0) & (gy < H)

        # clamped-area normalizer from global coordinates
        ay = (jnp.minimum(H - 1, gy + r) - jnp.maximum(-1, gy - r - 1))
        ax = (jnp.minimum(W - 1, gx + r) - jnp.maximum(-1, gx - r - 1))
        inv_area = one / (ay * ax).astype(jnp.float32)

        # band restriction only pays in the fori branch (unrolled
        # kernels lose to Mosaic mixed-shape overhead — BENCH.md)
        boxm_mid, boxm_out, top, _mid = _make_boxms(
            cfg.y_sum, she, sh, halo_y, r, inv_area,
            restricted=size_d > unroll_max(cfg))
        in_img_mid = in_img[top : top + _mid]

        # x-derivative, one-sided at the global image edges
        # (costVolume.cu:362-378).  I2 is pre-shifted by dmin, so its
        # sample at local x is the global column gx + dmin.
        def deriv(I, g):
            c1 = jnp.where(g < W - 1, _shift_x_vmem(I, 1), I)
            c2 = jnp.where(g > 0, _shift_x_vmem(I, -1), I)
            return (c2 - c1) * np.float32(0.5)

        der1 = deriv(I1, gx)
        der2 = deriv(I2, gx + dmin)

        mean_i, mean_ii = boxm_mid(I1, I1 * I1)
        var = mean_ii - mean_i * mean_i
        c = one / (var + eps)

        best = jnp.full((sh, tw), np.float32(BEST_COST_INIT), jnp.float32)
        dmap = jnp.zeros((sh, tw), jnp.float32)
        crop = lambda t: t[halo_y : halo_y + sh, px : px + tw]
        cropx = lambda t: t[:, px : px + tw]

        def slice_phase1(s, I2s, d2s):
            """Slice s's raw cost (VPU) and phase-1 box means."""
            d = dmin + s                      # runtime label
            valid = (gx + d >= 0) & (gx + d < W)
            cost = (one - alpha) * jnp.minimum(jnp.abs(I1 - I2s), th_color) + (
                alpha * jnp.minimum(jnp.abs(der1 - d2s), th_grad))
            cost = jnp.where(in_img, jnp.where(valid, cost, oob), 0.0)
            return boxm_mid(cost, I1 * cost)

        def slice_phase2(s, mean_p, mean_ip, best, dmap):
            """Guided a/b, phase-2 box means, q and the WTA update."""
            d = dmin + s
            a = (mean_ip - mean_i * mean_p) * c
            b = mean_p - mean_i * a
            a = jnp.where(in_img_mid, a, 0.0)
            b = jnp.where(in_img_mid, b, 0.0)
            ma, mb = boxm_out(a, b)
            q = cropx(ma) * crop(I1) + cropx(mb)
            upd = best >= q  # ascending d, >= : largest d wins ties
            return jnp.where(upd, q, best), jnp.where(upd, d.astype(jnp.float32), dmap)

        def slice_update(s, I2s, d2s, best, dmap):
            mean_p, mean_ip = slice_phase1(s, I2s, d2s)
            return slice_phase2(s, mean_p, mean_ip, best, dmap)

        pipelined = (cfg.sw_pipeline if cfg.sw_pipeline is not None
                     else _SW_PIPELINE)
        if size_d <= unroll_max(cfg):
            # static unroll: shifts are compile-time rolls
            for s in range(size_d):
                best, dmap = slice_update(
                    s, _shift_x_vmem(I2, s), _shift_x_vmem(der2, s), best, dmap)
        elif pipelined:
            # Software-pipelined fori emission: the loop carries slice
            # s-1's phase-1 means, so each body holds TWO independent
            # matmul groups — phase-1 of slice s and phase-2 of slice
            # s-1 — each with the other's VPU work (cost/x-sums vs
            # coeffs/x-sums/WTA) available to overlap, instead of the
            # strictly serial VPU→MXU→VPU→MXU chain of one slice
            # (BENCH.md roofline: the serialized phases are the gap).
            # Same per-slice math, same ascending WTA order; the skewed
            # trace lets the compiler contract FMAs differently, so
            # best costs can move ~1 ULP and near-ties flip (the
            # documented fast-path accuracy class — tested bounded).
            mp0, mip0 = slice_phase1(0, I2, der2)

            def body(s, carry):
                I2s, d2s, mp, mip, best, dmap = carry
                I2n = _shift_x_vmem(I2s, 1)
                d2n = _shift_x_vmem(d2s, 1)
                mpn, mipn = slice_phase1(s, I2n, d2n)
                best, dmap = slice_phase2(s - 1, mp, mip, best, dmap)
                return (I2n, d2n, mpn, mipn, best, dmap)

            carry = jax.lax.fori_loop(
                1, size_d, body, (I2, der2, mp0, mip0, best, dmap))
            best, dmap = slice_phase2(size_d - 1, *carry[2:4], *carry[4:])
        else:
            # wide ranges: a 128-way unroll grinds the Mosaic compiler
            # for tens of minutes, so loop with a carried match image
            # rolled by ONE column per iteration (static shift, compiled
            # once) — identical wrap semantics to a single roll by s.
            def body(s, carry):
                I2s, d2s, best, dmap = carry
                best, dmap = slice_update(s, I2s, d2s, best, dmap)
                return (_shift_x_vmem(I2s, 1), _shift_x_vmem(d2s, 1), best, dmap)

            _, _, best, dmap = jax.lax.fori_loop(
                0, size_d, body, (I2, der2, best, dmap))

        best_ref[0] = best
        dmap_ref[0] = dmap

    return kernel


def fused_geometry(cfg: StereoConfig) -> tuple[int, int]:
    """(halo_y, px): the kernel's required padding around the interior.
    halo_y is the 2R+1 q-reach rounded to a sublane multiple (Mosaic DMA
    slices must align to the (8,128) tile); px adds the disparity shift
    and derivative reach."""
    r = cfg.radius
    halo_y = ((2 * (r + 1) + 2) + 7) // 8 * 8
    shift = cfg.shift_max
    # the kernel reads the dmin-pre-shifted match image at +s for
    # s = 0..size_d-1, so the column budget must cover BOTH the absolute
    # shift (placement) and the slice reach (reads) — for ranges
    # straddling zero size_d-1 exceeds max|d|
    px = max(shift, cfg.size_d - 1) + 1 + 2 * (r + 1)
    return halo_y, px


def _fused_tiles(p1, p2, origin, cfg, Hg, Wg, out_h, out_w,
                 halo_y, px, sh, tw, n_slices=None, lead=0):
    """Run the kernel over a pre-padded local image pair.

    p1: interior at (halo_y, px); p2: interior PRE-SHIFTED to
    (halo_y, px - dmin).  origin: int32[3] = (global y, global x of
    p1's interior origin, dmin).  Returns (best, dmap) of
    (out_h, out_w).  A leading frame axis on p1/p2 (batched mode)
    yields (nb, out_h, out_w) outputs from one grid.
    """
    w_ext = ((tw + 2 * px + 127) // 128) * 128
    ny = (out_h + sh - 1) // sh
    nx = (out_w + tw - 1) // tw
    she = sh + 2 * halo_y
    nb = p1.shape[0] if p1.ndim == 3 else 0
    n_prog = max(nb, 1) * ny * nx

    kernel = _make_kernel(cfg, Hg, Wg, sh, tw, nx, halo_y, px, w_ext,
                          n_slices, lead, nxy=ny * nx if nb else 0)
    _, vmem_limit = _vmem_params(cfg)
    best, dmap = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_prog,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((she, w_ext), jnp.float32),
                pltpu.VMEM((she, w_ext), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            out_specs=[
                pl.BlockSpec((1, sh, tw), lambda i, ref: (i, 0, 0)),
                pl.BlockSpec((1, sh, tw), lambda i, ref: (i, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_prog, sh, tw), jnp.float32),
            jax.ShapeDtypeStruct((n_prog, sh, tw), jnp.float32),
        ],
    )(origin, p1, p2)

    def untile(t):
        if nb:
            t = t.reshape(nb, ny, nx, sh, tw).transpose(0, 1, 3, 2, 4)
            return t.reshape(nb, ny * sh, nx * tw)[:, :out_h, :out_w]
        t = t.reshape(ny, nx, sh, tw).transpose(0, 2, 1, 3)
        return t.reshape(ny * sh, nx * tw)[:out_h, :out_w]

    return untile(best), untile(dmap)


@functools.partial(jax.jit, static_argnames=("dmin", "cfg"))
def guided_wta_fused(
    gray1: jax.Array,
    gray2: jax.Array,
    dmin: int,
    cfg: StereoConfig = DEFAULT_CONFIG,
):
    """uint8 (H,W) ×2 → (best_cost f32 (H,W), disparity f32 (H,W)).

    One fused kernel for one view: cost vs `gray2`, aggregation guided
    by `gray1`, streaming WTA with labels dmin+s.  A leading frame axis
    ((B,H,W) inputs) runs the whole batch in one grid.
    """
    H, W = gray1.shape[-2:]
    batched = gray1.ndim == 3
    halo_y, px = fused_geometry(cfg)
    if not (-px <= dmin <= px):
        raise ValueError(f"dmin {dmin} exceeds the kernel's shift budget {px}")
    if use_stream(cfg):
        A = _stream_carry(cfg.radius)
        sh, tw = _pick_tiles_stream(H, W, px, cfg.radius, cfg.size_d,
                                    _vmem_params(cfg)[0],
                                    _stream_n_live(cfg),
                                    max_sh=_stream_sh_cap(cfg),
                                    tw_cap=_stream_tw_cap(cfg))
        w_ext = ((tw + 2 * px + 127) // 128) * 128
        nyp = (H + A + 2 * cfg.radius + sh - 1) // sh
        nx = (W + tw - 1) // tw
        height, width = _pad_hw(max(nyp * sh + A, 2 * A + H),
                                max((nx - 1) * tw + w_ext,
                                    W + 2 * px + abs(dmin)))

        def prep_s(g, xoff):
            I = g.astype(jnp.float32)
            if batched:
                P = jnp.zeros((g.shape[0], height, width), jnp.float32)
                return jax.lax.dynamic_update_slice(P, I, (0, 2 * A, xoff))
            P = jnp.zeros((height, width), jnp.float32)
            return jax.lax.dynamic_update_slice(P, I, (2 * A, xoff))

        origin = jnp.array([0, 0, dmin], jnp.int32)
        return _stream_tiles(prep_s(gray1, px), prep_s(gray2, px - dmin),
                             origin, cfg, H, W, H, W, px, sh, tw)
    sh, tw = _pick_tiles(H, W, px, halo_y,
                         vmem_budget=_vmem_params(cfg)[0],
                         n_live=_n_live(cfg))
    w_ext = ((tw + 2 * px + 127) // 128) * 128
    ny = (H + sh - 1) // sh
    nx = (W + tw - 1) // tw
    _h, width = _pad_hw(ny * sh + 2 * halo_y,
                        max((nx - 1) * tw + w_ext, W + 2 * px + abs(dmin)))

    def prep(g, xoff):
        """Zero-pad once; tiles are DMA'd by the kernel (no duplicated
        halo strips in HBM, no per-tile slice graph)."""
        I = g.astype(jnp.float32)
        shape = (_h, width)
        if batched:
            P = jnp.zeros((g.shape[0],) + shape, jnp.float32)
            return jax.lax.dynamic_update_slice(P, I, (0, halo_y, xoff))
        P = jnp.zeros(shape, jnp.float32)
        return jax.lax.dynamic_update_slice(P, I, (halo_y, xoff))

    origin = jnp.array([0, 0, dmin], jnp.int32)
    # the match image is placed dmin columns earlier so the kernel's
    # static slice-s shifts read I2 at gx + dmin + s
    return _fused_tiles(prep(gray1, px), prep(gray2, px - dmin), origin, cfg,
                        H, W, H, W, halo_y, px, sh, tw)


# ---------------------------------------------------------------------
# Streaming-y (strip-carry) kernel
#
# The round-3 finding (BENCH.md): Mosaic schedules no VPU/MXU overlap,
# so the kernel runs at the speed of the work it ISSUES, and the gap to
# the roofline is HALO RECOMPUTE — every (y-strip, x-tile) program of
# the kernels above recomputes 2*halo_y = 48 rows of cost, x-sums and
# coefficients that its y-neighbors also compute.  This kernel variant
# removes the y-halo entirely: TPU grid programs run sequentially on a
# core and VMEM scratch persists across them, so programs walk each
# x-column top-to-bottom and carry the last A (= 2R rounded to the
# 8-sublane tile) rows of every per-slice x-window sum — cost, I·cost,
# a, b, plus the guide's I, I² — in persistent scratch.  Each strip
# then computes exactly ``sh`` NEW rows of every quantity:
#
#   new cost/x-sum rows   Rc(ty) = [ty·sh - A,      ty·sh - A + sh)
#   new mean/a/b rows     Rm(ty) = Rc - R           (lags by R)
#   new q/WTA rows        Rq(ty) = Rc - 2R          (lags by 2R)
#
# The output therefore lags the input by A + 2R rows; the wrapper crops
# the lag.  The DMA window is padded rows [ty·sh, ty·sh + sh + A) — the
# image is placed at padded row 2A, so out-of-image rows above the frame
# (or above a shard's halo) are zeros, and the zero-initialized carries
# at ty == 0 are exactly the true x-sums of those rows (every q row the
# crop keeps reaches at most 2R <= A rows above the first new row).
# Same per-slice math as _make_kernel; the y-sum contraction shapes
# differ (band matmul (sh, sh+A) instead of (she, she)), so WTA
# near-ties may flip — the documented fused fast-path accuracy class.
# ---------------------------------------------------------------------


def _pad_hw(height: int, width: int) -> tuple[int, int]:
    """Round prep-buffer dims to the (8, 128) VMEM tiling.  The
    batched grid mode materializes the logical input view as a Mosaic
    memref slice, which requires tiling-aligned shapes (measured: the
    unbatched kernels' manual sub-slice DMAs never tripped this, the
    sharded path's batched tiles did — r4_shard_tpu)."""
    return ((height + 7) // 8) * 8, ((width + 127) // 128) * 128


def _stream_carry(r: int) -> int:
    """Carry rows A: the 2R cross-strip reach rounded up to the f32
    sublane tile (DMA slices and carry copies stay (8,128)-aligned)."""
    return ((2 * r + 7) // 8) * 8


# Live ext-row-buffer estimates for the streaming kernel, in units of
# (sh + A, w_ext) f32 buffers (calibrated on hardware like _N_LIVE).
_N_LIVE_STREAM_FORI = 30
_N_LIVE_STREAM_UNROLL = 46

# Streaming-kernel cross-program DMA double-buffering default (see
# StereoConfig.dma_buffer); env override for benching.
_DMA_BUFFER = os.environ.get("STEREO_DMA_BUFFER", "0") == "1"


def use_dma_buffer(cfg: StereoConfig) -> bool:
    return _DMA_BUFFER if cfg.dma_buffer is None else cfg.dma_buffer


def _stream_n_live(cfg: StereoConfig, n_slices: int | None = None) -> int:
    size = cfg.size_d if n_slices is None else n_slices
    n = (_N_LIVE_STREAM_FORI if size > unroll_max(cfg)
         else _N_LIVE_STREAM_UNROLL)
    return n + 2 if use_dma_buffer(cfg) else n


def use_stream(cfg: StereoConfig) -> bool:
    if cfg.stream is not None:
        return cfg.stream
    return _STREAM


# Unrolled streaming emissions with roll y-sums crash the Mosaic
# compiler above this strip height.  Bisected r5 (scripts/r5_bisect.py):
# sh = 136/152/160 all compile OK, 168 reproducibly crashes — the edge
# is (160, 168].  The cap stays at the r4-measured 112 anyway: the
# unrolled emission's compile time grows superlinearly in sh (192 s at
# 136, 240 s at 152, 398 s at 160 vs ~272 s total at 112) and the
# r4_shsweep2 strip sweep orders sh>112 strictly worse on issued-work
# ratio, so taller unrolled-roll strips lose on both axes.  mxu y-sums
# and the fori branch are unaffected.
_STREAM_UNROLL_ROLL_SH_CAP = 112

# Streaming tile-width candidate cap (lane dimension).  r5 bisect:
# 2560-wide FORI-emission tiles compile in 4-6 s, 3008 reproducibly
# crashes the Mosaic compile subprocess — cap at the bisected-good
# edge.  Raising it from r4's conservative 1536 lets ~1.6-2.6k-wide
# frames run a single x-tile (measured: 3 MP matching 5.27 -> 5.01
# ms/view, frame 9.36 -> 8.44; 2.4 MP 4.28 -> 4.03 — r5_widecap).
# Emission coverage (r5_bisect2): the single-view UNROLLED emission
# also compiles wide tiles fine (tw=1792/2048 in 55-67 s), so it
# shares the 2560 cap; the DUAL unrolled emission compiles wide tiles
# without crashing but at 795-1220 s per executable — compile-
# prohibitive, so it keeps the 1536 cap on compile-time grounds.
_STREAM_TW_CAP = 2560
_STREAM_TW_CAP_DUAL_UNROLLED = 1536


def _stream_tw_cap(cfg: StereoConfig, n_slices: int | None = None,
                   dual: bool = False) -> int:
    size = cfg.size_d if n_slices is None else n_slices
    unrolled = size <= unroll_max(cfg)
    return (_STREAM_TW_CAP_DUAL_UNROLLED if (dual and unrolled)
            else _STREAM_TW_CAP)


def _stream_sh_cap(cfg: StereoConfig, n_slices: int | None = None) -> int | None:
    size = cfg.size_d if n_slices is None else n_slices
    unrolled = size <= unroll_max(cfg)
    impl = cfg.y_sum or _Y_SUM_IMPL
    return _STREAM_UNROLL_ROLL_SH_CAP if (unrolled and impl == "roll") else None


def stream_fits(cfg: StereoConfig, h: int, w: int) -> bool:
    """Whether ANY streaming tiling fits cfg's VMEM budget for an
    (h, w) frame — the per-slice carry buffers scale with size_d, so
    wide ranges can exceed small budgets outright (e.g. 128 slices at
    the 16 MiB default).  effective_config uses this to keep the
    auto stream flip from selecting an impossible kernel (a 1 MP
    128-disparity default-config frame raised here in r5_midwide).

    Models the path the kernel will actually take: the DUAL stream
    kernel keeps ~2x the carry VMEM (carry_bufs 8*size_d+4,
    _dual_stream_n_live) of the single-view one, so a single-view
    check would approve configs the dual build then rejects."""
    from ..pipeline import use_dual_view   # single source of truth

    dual = use_dual_view(cfg)
    if dual:
        _, px = dual_geometry(cfg)
        n_live = _dual_stream_n_live(cfg)
        carry_bufs = 8 * cfg.size_d + 4
    else:
        _, px = fused_geometry(cfg)
        n_live = _stream_n_live(cfg)
        carry_bufs = None
    try:
        _pick_tiles_stream(h, w, px, cfg.radius, cfg.size_d,
                           _vmem_params(cfg)[0], n_live,
                           carry_bufs=carry_bufs,
                           max_sh=_stream_sh_cap(cfg),
                           tw_cap=_stream_tw_cap(cfg, dual=dual))
        return True
    except ValueError:
        return False


def _pick_tiles_stream(h: int, w: int, px: int, r: int, size_d: int,
                       vmem_budget: int, n_live: int,
                       carry_bufs: int | None = None,
                       max_sh: int | None = None,
                       tw_cap: int | None = None) -> tuple[int, int]:
    """(strip_height, tile_width) for the streaming kernel.

    With the y-halo gone, the issued work per column is ny'·sh rows ≈
    h + A + 2R + ceil waste regardless of sh, so the objective is the
    x-ratio (wte/tw + ceil waste) with a small per-strip charge
    (carry copies + the A-row DMA overlap) that prefers taller strips;
    ties prefer fewer programs."""
    A = _stream_carry(r)
    best = None
    # Tile-width cap: 3008-wide fori-roll tiles reproducibly crash the
    # Mosaic compile (r4_decider (64,3008)/(96,3008); re-confirmed r5).
    # The r5 bisect (scripts/r5_bisect.py) cleared everything below:
    # tw = 1664/1792/2048/2560 all compile in 4-6 s — so the cap sits
    # at the bisected-good 2560 (the crash edge is in (2560, 3008]),
    # letting ~1.6-2.6k-wide frames take a single x-tile.
    w_cand = ((w + 127) // 128) * 128   # aligned whole-width candidate
    cap = _STREAM_TW_CAP if tw_cap is None else tw_cap
    tws = sorted(({w_cand} if w_cand <= cap else set()) | {
        tw for tw in (2560, 2304, 2048, 1792, 1536, 1280, 1024, 896, 768,
                      640, 512, 384, 256)
        if tw <= min(w, cap)})
    # strip-height candidates: a coarse fixed ladder PLUS the minimal
    # 8-aligned height for each strip count — those are exactly the
    # zero-ceil-waste points (e.g. 330 rows: 7x48, 3x112, 2x168),
    # which the fixed ladder misses (measured at Tsukuba: (112,384)
    # beats the ladder's (128,384) — BENCH.md r4)
    rows = h + A + 2 * r
    shs = {s for s in (512, 448, 384, 320, 256, 224, 192, 160, 128, 96,
                       64, 48, 32) if s <= max(32, rows)}
    shs.update(min(512, ((rows + n - 1) // n + 7) // 8 * 8)
               for n in range(1, rows // 32 + 1))
    if max_sh is not None:
        shs = {s for s in shs if s <= max_sh} or {max_sh}
    shs = sorted(shs, reverse=True)
    if carry_bufs is None:
        carry_bufs = 4 * size_d + 2
    for tw in tws:
        wte = ((tw + 2 * px + 127) // 128) * 128
        nx = (w + tw - 1) // tw
        # Big frames with wide tiles run CHEAPER per element at short
        # strips — measured r5_6mp_tiles at 6 MP tw=1536: sh=128 9.54,
        # sh=176 9.71, sh=232 (the unrestricted pick) 10.0 ms/view,
        # monotone AGAINST the ratio ordering; the wide-D (128,1536)
        # pick sits exactly on the measured per-slice constant
        # (BENCH.md r5) while 6 MP's sh=232 ran ~18% above it.  Cap
        # big-frame wide-tile strips at the measured optimum.  Narrow
        # tiles keep tall strips (Tsukuba's full-height (336,384) is
        # the corrected-sweep optimum, r4_shsweep2).
        if tw >= 1024 and h * w >= 2_000_000:
            tw_shs = [s for s in shs if s <= 128] or shs[-1:]
        else:
            tw_shs = shs
        for sh in tw_shs:
            est = ((n_live * (sh + A) + carry_bufs * A) * wte
                   + sh * (sh + A)) * 4
            if est > vmem_budget:
                continue
            nyp = (h + A + 2 * r + sh - 1) // sh
            # sh + A/2 charges the per-strip carry copies and DMA
            # overlap against the sh new rows each strip computes
            work = nx * wte * nyp * (sh + A / 2) / (h * w)
            key = (work, nx * nyp)
            if best is None or key < best[0]:
                best = (key, sh, tw)
    if best is None:
        raise ValueError(
            f"no streaming-kernel tiling fits the {vmem_budget/2**20:.1f} "
            f"MB VMEM budget for image {h}x{w} (px={px}, size_d={size_d})")
    return best[1], best[2]


def _make_stream_kernel(cfg: StereoConfig, H: int, W: int,
                        sh: int, tw: int, nx: int, nyp: int,
                        px: int, w_ext: int,
                        n_slices: int | None = None, lead: int = 0,
                        nxy: int = 0, n_prog: int = 0):
    """Streaming-y single-view kernel.  Grid order is x-column-major
    with strips innermost (tx = tile // nyp, ty = tile % nyp), so the
    persistent carry scratch walks each column top-to-bottom.  Scalar
    prefetch and the dmin pre-shift convention match _make_kernel.

    With ``cfg.dma_buffer`` the input scratch gets two slots and each
    program starts program i+1's tile DMA before its own compute
    (programs run sequentially on the core, so the copy overlaps the
    current strip's compute); outputs are bit-identical either way."""
    r = cfg.radius
    A = _stream_carry(r)
    size_d = cfg.size_d if n_slices is None else n_slices
    alpha = np.float32(cfg.alpha)
    one = np.float32(1)
    th_color = np.float32(cfg.th_color)
    th_grad = np.float32(cfg.th_grad)
    oob = (one - alpha) * th_color + alpha * th_grad
    eps = np.float32(cfg.eps)
    k = 2 * r + 1
    sha = sh + A
    impl = cfg.y_sum or _Y_SUM_IMPL
    dbuf = use_dma_buffer(cfg)

    def kernel(origin_ref, i1_hbm, i2_hbm, best_ref, dmap_ref,
               v1, v2, cg, c1a, c1b, c2a, c2b, sems):
        tile_abs = pl.program_id(0)
        tile = tile_abs % nxy if nxy else tile_abs
        tx = tile // nyp
        ty = tile % nyp
        y0 = ty * sh - 2 * A + origin_ref[0]    # global row of DMA row 0
        x0 = tx * tw - px + origin_ref[1]
        dmin = origin_ref[2]

        def copies(t, slot=None):
            """The two input-tile DMAs of program ``t`` (static or
            traced); ``slot`` picks the double-buffer half."""
            tl = t % nxy if nxy else t
            tx_, ty_ = tl // nyp, tl % nyp
            s1 = i1_hbm.at[t // nxy] if nxy else i1_hbm
            s2 = i2_hbm.at[t // nxy] if nxy else i2_hbm
            dst1, dst2 = (v1, v2) if slot is None else (v1.at[slot],
                                                        v2.at[slot])
            sem1, sem2 = ((sems.at[0], sems.at[1]) if slot is None
                          else (sems.at[slot, 0], sems.at[slot, 1]))
            rows, cols = pl.ds(ty_ * sh, sha), pl.ds(tx_ * tw + lead, w_ext)
            return (pltpu.make_async_copy(s1.at[rows, cols], dst1, sem1),
                    pltpu.make_async_copy(s2.at[rows, cols], dst2, sem2))

        if dbuf:
            slot = tile_abs % 2

            @pl.when(tile_abs == 0)   # warm-up: nobody prefetched us
            def _():
                for c in copies(0, 0):
                    c.start()

            @pl.when(tile_abs + 1 < n_prog)
            def _():                  # prefetch the next program's tiles
                for c in copies(tile_abs + 1, (tile_abs + 1) % 2):
                    c.start()
        else:
            d1, d2 = copies(tile_abs)
            d1.start()
            d2.start()

        @pl.when(ty == 0)   # new column: carries represent rows whose
        def _():            # true x-sums are zero (above the crop reach)
            cg[...] = jnp.zeros_like(cg)
            c1a[...] = jnp.zeros_like(c1a)
            c1b[...] = jnp.zeros_like(c1b)
            c2a[...] = jnp.zeros_like(c2a)
            c2b[...] = jnp.zeros_like(c2b)

        # local row bands of the (sha, w_ext) window:
        #   cost rows  [A, sha)            ↔ global y0 + A + i
        #   q rows     [A - 2r, A - 2r + sh) ↔ global y0 + A - 2r + i
        if dbuf:
            for c in copies(tile_abs, slot):
                c.wait()
            I1c = v1[slot, A:sha]
            I2c = v2[slot, A:sha]
            I1q = v1[slot, A - 2 * r : A - 2 * r + sh]
        else:
            d1.wait()
            d2.wait()
            I1c = v1[A:sha]
            I2c = v2[A:sha]
            I1q = v1[A - 2 * r : A - 2 * r + sh]

        gxc = jax.lax.broadcasted_iota(jnp.int32, (sh, w_ext), 1) + x0
        gyc = jax.lax.broadcasted_iota(jnp.int32, (sh, w_ext), 0) + (y0 + A)
        in_img_c = (gxc >= 0) & (gxc < W) & (gyc >= 0) & (gyc < H)
        gym = gyc - r
        in_img_m = (gxc >= 0) & (gxc < W) & (gym >= 0) & (gym < H)

        def area(gy):
            ay = (jnp.minimum(H - 1, gy + r) - jnp.maximum(-1, gy - r - 1))
            ax = (jnp.minimum(W - 1, gxc + r) - jnp.maximum(-1, gxc - r - 1))
            return one / (ay * ax).astype(jnp.float32)

        ia_m = area(gym)
        ia_q = area(gyc - 2 * r)

        xsum = lambda x: _roll(_forward_window_sum(x, k, 1), r, 1)
        if impl == "roll":
            def ysum2(ca, cb):
                return [_forward_window_sum(t, k, 0)[A - 2 * r : A - 2 * r + sh]
                        for t in (ca, cb)]
        else:
            m_band = _band_matrix_off(sh, sha, A - r, r)

            def ysum2(ca, cb):
                return _y_matmul_many(impl, m_band, [ca, cb], w_ext)

        def deriv(I, g):
            c1_ = jnp.where(g < W - 1, _shift_x_vmem(I, 1), I)
            c2_ = jnp.where(g > 0, _shift_x_vmem(I, -1), I)
            return (c2_ - c1_) * np.float32(0.5)

        der1 = deriv(I1c, gxc)
        der2 = deriv(I2c, gxc + dmin)

        # guide statistics stream (slice-independent carry pair)
        cat_i = jnp.concatenate([cg[0], xsum(I1c)], 0)
        cat_ii = jnp.concatenate([cg[1], xsum(I1c * I1c)], 0)
        cg[0] = cat_i[sh:sha]
        cg[1] = cat_ii[sh:sha]
        mean_i, mean_ii = [t * ia_m for t in ysum2(cat_i, cat_ii)]
        var = mean_ii - mean_i * mean_i
        c = one / (var + eps)

        cropx = lambda t: t[:, px : px + tw]
        I1qc = cropx(I1q)

        def slice_update(s, I2s, d2s, best, dmap):
            d = dmin + s
            valid = (gxc + d >= 0) & (gxc + d < W)
            cost = (one - alpha) * jnp.minimum(
                jnp.abs(I1c - I2s), th_color) + (
                alpha * jnp.minimum(jnp.abs(der1 - d2s), th_grad))
            cost = jnp.where(in_img_c, jnp.where(valid, cost, oob), 0.0)
            cat_c = jnp.concatenate([c1a[s], xsum(cost)], 0)
            cat_ic = jnp.concatenate([c1b[s], xsum(I1c * cost)], 0)
            c1a[s] = cat_c[sh:sha]
            c1b[s] = cat_ic[sh:sha]
            mp, mip = [t * ia_m for t in ysum2(cat_c, cat_ic)]
            a = (mip - mean_i * mp) * c
            b = mp - mean_i * a
            a = jnp.where(in_img_m, a, 0.0)
            b = jnp.where(in_img_m, b, 0.0)
            cat_a = jnp.concatenate([c2a[s], xsum(a)], 0)
            cat_b = jnp.concatenate([c2b[s], xsum(b)], 0)
            c2a[s] = cat_a[sh:sha]
            c2b[s] = cat_b[sh:sha]
            ma, mb = [t * ia_q for t in ysum2(cat_a, cat_b)]
            q = cropx(ma) * I1qc + cropx(mb)
            upd = best >= q   # ascending d, >= : largest d wins ties
            return (jnp.where(upd, q, best),
                    jnp.where(upd, d.astype(jnp.float32), dmap))

        best = jnp.full((sh, tw), np.float32(BEST_COST_INIT), jnp.float32)
        dmap = jnp.zeros((sh, tw), jnp.float32)
        if size_d <= unroll_max(cfg):
            for s in range(size_d):
                best, dmap = slice_update(
                    s, _shift_x_vmem(I2c, s), _shift_x_vmem(der2, s),
                    best, dmap)
        else:
            def body(s, carry):
                I2s, d2s, best, dmap = carry
                best, dmap = slice_update(s, I2s, d2s, best, dmap)
                return (_shift_x_vmem(I2s, 1), _shift_x_vmem(d2s, 1),
                        best, dmap)

            _, _, best, dmap = jax.lax.fori_loop(
                0, size_d, body, (I2c, der2, best, dmap))

        best_ref[0] = best
        dmap_ref[0] = dmap

    return kernel


def _stream_tiles(p1, p2, origin, cfg, Hg, Wg, out_h, out_w,
                  px, sh, tw, n_slices=None, lead=0):
    """Run the streaming kernel over pre-padded local images whose
    interior origin sits at padded row 2A (column convention as
    _fused_tiles).  Returns (best, dmap) of (out_h, out_w); a leading
    frame axis yields (nb, out_h, out_w)."""
    r = cfg.radius
    A = _stream_carry(r)
    size_d = cfg.size_d if n_slices is None else n_slices
    w_ext = ((tw + 2 * px + 127) // 128) * 128
    nyp = (out_h + A + 2 * r + sh - 1) // sh
    nx = (out_w + tw - 1) // tw
    nb = p1.shape[0] if p1.ndim == 3 else 0
    n_prog = max(nb, 1) * nx * nyp

    kernel = _make_stream_kernel(cfg, Hg, Wg, sh, tw, nx, nyp, px, w_ext,
                                 n_slices, lead,
                                 nxy=nx * nyp if nb else 0, n_prog=n_prog)
    dbuf = use_dma_buffer(cfg)
    in_shape = ((2, sh + A, w_ext) if dbuf else (sh + A, w_ext))
    _, vmem_limit = _vmem_params(cfg)
    best, dmap = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
            dimension_semantics=("arbitrary",)),   # sequential grid: the
        # carry scratch is only valid walking each column in order
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_prog,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM(in_shape, jnp.float32),
                pltpu.VMEM(in_shape, jnp.float32),
                pltpu.VMEM((2, A, w_ext), jnp.float32),
                pltpu.VMEM((size_d, A, w_ext), jnp.float32),
                pltpu.VMEM((size_d, A, w_ext), jnp.float32),
                pltpu.VMEM((size_d, A, w_ext), jnp.float32),
                pltpu.VMEM((size_d, A, w_ext), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2) if dbuf else (2,)),
            ],
            out_specs=[
                pl.BlockSpec((1, sh, tw), lambda i, ref: (i, 0, 0)),
                pl.BlockSpec((1, sh, tw), lambda i, ref: (i, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_prog, sh, tw), jnp.float32),
            jax.ShapeDtypeStruct((n_prog, sh, tw), jnp.float32),
        ],
    )(origin, p1, p2)

    lag = A + 2 * r

    def untile(t):
        if nb:
            t = t.reshape(nb, nx, nyp, sh, tw).transpose(0, 2, 3, 1, 4)
            t = t.reshape(nb, nyp * sh, nx * tw)
            return t[:, lag : lag + out_h, :out_w]
        t = t.reshape(nx, nyp, sh, tw).transpose(1, 2, 0, 3)
        return t.reshape(nyp * sh, nx * tw)[lag : lag + out_h, :out_w]

    return untile(best), untile(dmap)


def dual_geometry(cfg: StereoConfig) -> tuple[int, int]:
    """(halo_y, px) for the dual-view kernel.  The shared raw cost
    slice is consumed by BOTH views — the right view reads it rolled by
    d_l — so the column budget covers the chained reach
    max(0, d_max) + max(0, -d_min) (for ranges on one side of zero this
    equals max|d|, the single-view budget)."""
    r = cfg.radius
    halo_y = ((2 * (r + 1) + 2) + 7) // 8 * 8
    reach = max(0, cfg.d_max) + max(0, -cfg.d_min)
    return halo_y, reach + 1 + 2 * (r + 1)


def _make_dual_stream_kernel(cfg: StereoConfig, H: int, W: int,
                             sh: int, tw: int, nx: int, nyp: int,
                             px: int, w_ext: int, nxy: int = 0):
    """Streaming-y DUAL-VIEW kernel: the strip-carry walk of
    _make_stream_kernel applied to the dual kernel's shared-work scheme
    (one DMA, shared derivatives and raw cost; per-view guide chains;
    left labels ascending `>=`, right labels descending strict `>` —
    see _make_dual_kernel).  Carries per slice: 4 phase-1 x-sums
    (cost·{1,I} × both views) + 4 phase-2 x-sums (a/b × both views),
    plus 4 guide carries (I, I² × both views)."""
    r = cfg.radius
    A = _stream_carry(r)
    size_d = cfg.size_d
    dmin = cfg.d_min
    alpha = np.float32(cfg.alpha)
    one = np.float32(1)
    th_color = np.float32(cfg.th_color)
    th_grad = np.float32(cfg.th_grad)
    oob = (one - alpha) * th_color + alpha * th_grad
    eps = np.float32(cfg.eps)
    k = 2 * r + 1
    sha = sh + A
    impl = cfg.y_sum or _Y_SUM_IMPL

    def kernel(origin_ref, i1_hbm, i2_hbm,
               best_l_ref, dmap_l_ref, best_r_ref, dmap_r_ref,
               v1, v2, cg, cp1, cp2, sems):
        tile = pl.program_id(0)
        if nxy:
            fb = tile // nxy
            tile = tile % nxy
        tx = tile // nyp
        ty = tile % nyp
        y0 = ty * sh - 2 * A + origin_ref[0]
        x0 = tx * tw - px + origin_ref[1]
        src1 = i1_hbm.at[fb] if nxy else i1_hbm
        src2 = i2_hbm.at[fb] if nxy else i2_hbm
        d1 = pltpu.make_async_copy(
            src1.at[pl.ds(ty * sh, sha), pl.ds(tx * tw, w_ext)],
            v1, sems.at[0])
        d2 = pltpu.make_async_copy(
            src2.at[pl.ds(ty * sh, sha), pl.ds(tx * tw, w_ext)],
            v2, sems.at[1])
        d1.start()
        d2.start()

        @pl.when(ty == 0)
        def _():
            cg[...] = jnp.zeros_like(cg)
            cp1[...] = jnp.zeros_like(cp1)
            cp2[...] = jnp.zeros_like(cp2)

        d1.wait()
        d2.wait()
        I1c = v1[A:sha]
        I2c = v2[A:sha]
        I1q = v1[A - 2 * r : A - 2 * r + sh]
        I2q = v2[A - 2 * r : A - 2 * r + sh]

        gxc = jax.lax.broadcasted_iota(jnp.int32, (sh, w_ext), 1) + x0
        gyc = jax.lax.broadcasted_iota(jnp.int32, (sh, w_ext), 0) + (y0 + A)
        in_img_c = (gxc >= 0) & (gxc < W) & (gyc >= 0) & (gyc < H)
        gym = gyc - r
        in_img_m = (gxc >= 0) & (gxc < W) & (gym >= 0) & (gym < H)

        def area(gy):
            ay = (jnp.minimum(H - 1, gy + r) - jnp.maximum(-1, gy - r - 1))
            ax = (jnp.minimum(W - 1, gxc + r) - jnp.maximum(-1, gxc - r - 1))
            return one / (ay * ax).astype(jnp.float32)

        ia_m = area(gym)
        ia_q = area(gyc - 2 * r)

        xsum = lambda x: _roll(_forward_window_sum(x, k, 1), r, 1)
        if impl == "roll":
            def ysum4(cats):
                return [_forward_window_sum(t, k, 0)
                        [A - 2 * r : A - 2 * r + sh] for t in cats]
        else:
            m_band = _band_matrix_off(sh, sha, A - r, r)

            def ysum4(cats):
                return _y_matmul_many(impl, m_band, cats, w_ext)

        def deriv(I):
            c1_ = jnp.where(gxc < W - 1, _shift_x_vmem(I, 1), I)
            c2_ = jnp.where(gxc > 0, _shift_x_vmem(I, -1), I)
            return (c2_ - c1_) * np.float32(0.5)

        der1 = deriv(I1c)
        der2 = deriv(I2c)

        # per-view guide statistic streams
        cats_g = [jnp.concatenate([cg[j], sx], 0) for j, sx in enumerate(
            [xsum(I1c), xsum(I1c * I1c), xsum(I2c), xsum(I2c * I2c)])]
        for j in range(4):
            cg[j] = cats_g[j][sh:sha]
        mean_i1, mean_ii1, mean_i2, mean_ii2 = [
            t * ia_m for t in ysum4(cats_g)]
        c1 = one / (mean_ii1 - mean_i1 * mean_i1 + eps)
        c2 = one / (mean_ii2 - mean_i2 * mean_i2 + eps)

        cropx = lambda t: t[:, px : px + tw]
        I1qc = cropx(I1q)
        I2qc = cropx(I2q)

        def phase1(s, raw_l, raw_r):
            """Both views' masked cost slices → phase-1 streamed means."""
            d = dmin + s
            valid_l = (gxc + d >= 0) & (gxc + d < W)
            cost_l = jnp.where(in_img_c, jnp.where(valid_l, raw_l, oob), 0.0)
            valid_r = (gxc - d >= 0) & (gxc - d < W)
            cost_r = jnp.where(in_img_c, jnp.where(valid_r, raw_r, oob), 0.0)
            sxs = [xsum(t) for t in
                   (cost_l, I1c * cost_l, cost_r, I2c * cost_r)]
            cats = [jnp.concatenate([cp1[s, j], sxs[j]], 0) for j in range(4)]
            for j in range(4):
                cp1[s, j] = cats[j][sh:sha]
            return [t * ia_m for t in ysum4(cats)]

        def phase2(s, sums1, best_l, dmap_l, best_r, dmap_r):
            d = dmin + s
            mp_l, mip_l, mp_r, mip_r = sums1
            a_l = (mip_l - mean_i1 * mp_l) * c1
            b_l = mp_l - mean_i1 * a_l
            a_r = (mip_r - mean_i2 * mp_r) * c2
            b_r = mp_r - mean_i2 * a_r
            abcd = [jnp.where(in_img_m, t, 0.0)
                    for t in (a_l, b_l, a_r, b_r)]
            cats = [jnp.concatenate([cp2[s, j], xsum(abcd[j])], 0)
                    for j in range(4)]
            for j in range(4):
                cp2[s, j] = cats[j][sh:sha]
            ma_l, mb_l, ma_r, mb_r = [t * ia_q for t in ysum4(cats)]
            q = cropx(ma_l) * I1qc + cropx(mb_l)
            upd = best_l >= q   # left labels ascending: largest d wins
            best_l = jnp.where(upd, q, best_l)
            dmap_l = jnp.where(upd, jnp.asarray(d, jnp.float32), dmap_l)
            q = cropx(ma_r) * I2qc + cropx(mb_r)
            upd = best_r > q    # right labels descending: strict >
            best_r = jnp.where(upd, q, best_r)
            dmap_r = jnp.where(upd, jnp.asarray(-d, jnp.float32), dmap_r)
            return best_l, dmap_l, best_r, dmap_r

        best_l = jnp.full((sh, tw), np.float32(BEST_COST_INIT), jnp.float32)
        dmap_l = jnp.zeros((sh, tw), jnp.float32)
        best_r = jnp.full((sh, tw), np.float32(BEST_COST_INIT), jnp.float32)
        dmap_r = jnp.zeros((sh, tw), jnp.float32)

        if size_d <= unroll_max(cfg):
            for s in range(size_d):
                d = dmin + s
                I2s = _shift_x_vmem(I2c, d)
                d2s = _shift_x_vmem(der2, d)
                raw = (one - alpha) * jnp.minimum(
                    jnp.abs(I1c - I2s), th_color) + (
                    alpha * jnp.minimum(jnp.abs(der1 - d2s), th_grad))
                raw_r = _roll(raw, d, 1)   # raw_r(x) = raw(x - d)
                sums1 = phase1(s, raw, raw_r)
                best_l, dmap_l, best_r, dmap_r = phase2(
                    s, sums1, best_l, dmap_l, best_r, dmap_r)
        else:
            # wide-range fori branch: carried ±1 rolls for both views;
            # the right view's raw cost recomputed from the
            # counter-rolled left image (see _make_dual_kernel)
            def body(s, carry):
                I2s, d2s, I1s, d1s, best_l, dmap_l, best_r, dmap_r = carry
                raw_l = (one - alpha) * jnp.minimum(
                    jnp.abs(I1c - I2s), th_color) + (
                    alpha * jnp.minimum(jnp.abs(der1 - d2s), th_grad))
                raw_r = (one - alpha) * jnp.minimum(
                    jnp.abs(I1s - I2c), th_color) + (
                    alpha * jnp.minimum(jnp.abs(d1s - der2), th_grad))
                sums1 = phase1(s, raw_l, raw_r)
                best_l, dmap_l, best_r, dmap_r = phase2(
                    s, sums1, best_l, dmap_l, best_r, dmap_r)
                return (_shift_x_vmem(I2s, 1), _shift_x_vmem(d2s, 1),
                        _shift_x_vmem(I1s, -1), _shift_x_vmem(d1s, -1),
                        best_l, dmap_l, best_r, dmap_r)

            carry = jax.lax.fori_loop(
                0, size_d, body,
                (_shift_x_vmem(I2c, dmin), _shift_x_vmem(der2, dmin),
                 _shift_x_vmem(I1c, -dmin), _shift_x_vmem(der1, -dmin),
                 best_l, dmap_l, best_r, dmap_r))
            best_l, dmap_l, best_r, dmap_r = carry[4:]

        best_l_ref[0] = best_l
        dmap_l_ref[0] = dmap_l
        best_r_ref[0] = best_r
        dmap_r_ref[0] = dmap_r

    return kernel


# Live-buffer estimates for the dual streaming kernel, in (sh + A,
# w_ext) f32 units (hardware-calibrated like _N_LIVE).
_N_LIVE_DUAL_STREAM_UNROLL = 60
_N_LIVE_DUAL_STREAM_FORI = 44


def _dual_stream_n_live(cfg: StereoConfig) -> int:
    return (_N_LIVE_DUAL_STREAM_FORI if cfg.size_d > unroll_max(cfg)
            else _N_LIVE_DUAL_STREAM_UNROLL)


def _make_dual_kernel(cfg: StereoConfig, H: int, W: int,
                      sh: int, tw: int, nx: int, halo_y: int, px: int,
                      w_ext: int, nxy: int = 0):
    """Both views in one pass over each (y-strip, x-tile): the two
    grayscale tiles are DMA'd once, derivatives and the raw truncated
    AD+gradient cost slice are computed once, and the right view's raw
    slice is the left's rolled by d_l (cost_R(x, d_r) = cost_L(x+d_r,
    -d_r), SURVEY.md §2.5.7).  Each view keeps its own guide statistics
    and guided chain.

    Tie rules: the reference iterates each view's d-loop ascending with
    `best >= q` (largest label wins ties, guidedFilter.cu:403-411).
    This kernel iterates the LEFT labels ascending, so the right labels
    d_r = -d_l run DESCENDING and the right update must be strict
    `best > q` for the largest d_r to keep winning ties.

    Disparity labels here are compile-time constants (one program
    serves one frame; the runtime-dmin reuse trick of _make_kernel is
    unnecessary because there is no second view to share with)."""
    r = cfg.radius
    size_d = cfg.size_d
    dmin = cfg.d_min
    alpha = np.float32(cfg.alpha)
    one = np.float32(1)
    th_color = np.float32(cfg.th_color)
    th_grad = np.float32(cfg.th_grad)
    oob = (one - alpha) * th_color + alpha * th_grad
    eps = np.float32(cfg.eps)
    she = sh + 2 * halo_y

    def kernel(origin_ref, i1_hbm, i2_hbm,
               best_l_ref, dmap_l_ref, best_r_ref, dmap_r_ref,
               v1, v2, sems):
        tile = pl.program_id(0)
        if nxy:
            fb = tile // nxy
            tile = tile % nxy
        ty = tile // nx
        tx = tile % nx
        y0 = ty * sh - halo_y + origin_ref[0]
        x0 = tx * tw - px + origin_ref[1]
        src1 = i1_hbm.at[fb] if nxy else i1_hbm
        src2 = i2_hbm.at[fb] if nxy else i2_hbm
        d1 = pltpu.make_async_copy(
            src1.at[pl.ds(ty * sh, she), pl.ds(tx * tw, w_ext)],
            v1, sems.at[0])
        d2 = pltpu.make_async_copy(
            src2.at[pl.ds(ty * sh, she), pl.ds(tx * tw, w_ext)],
            v2, sems.at[1])
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()
        I1 = v1[:]
        I2 = v2[:]

        gx = jax.lax.broadcasted_iota(jnp.int32, (she, w_ext), 1) + x0
        gy = jax.lax.broadcasted_iota(jnp.int32, (she, w_ext), 0) + y0
        in_img = (gx >= 0) & (gx < W) & (gy >= 0) & (gy < H)

        ay = (jnp.minimum(H - 1, gy + r) - jnp.maximum(-1, gy - r - 1))
        ax = (jnp.minimum(W - 1, gx + r) - jnp.maximum(-1, gx - r - 1))
        inv_area = one / (ay * ax).astype(jnp.float32)

        my = _band_matrix(she, r)

        def boxms(*xs):
            return [o * inv_area
                    for o in _box_sum_hybrid_many(xs, r, my, cfg.y_sum)]

        def deriv(I, g):
            c1 = jnp.where(g < W - 1, _shift_x_vmem(I, 1), I)
            c2 = jnp.where(g > 0, _shift_x_vmem(I, -1), I)
            return (c2 - c1) * np.float32(0.5)

        der1 = deriv(I1, gx)
        der2 = deriv(I2, gx)

        mean_i1, mean_ii1, mean_i2, mean_ii2 = boxms(
            I1, I1 * I1, I2, I2 * I2)
        c1 = one / (mean_ii1 - mean_i1 * mean_i1 + eps)
        c2 = one / (mean_ii2 - mean_i2 * mean_i2 + eps)

        crop = lambda t: t[halo_y : halo_y + sh, px : px + tw]
        I1c = crop(I1)
        I2c = crop(I2)

        best_l = jnp.full((sh, tw), np.float32(BEST_COST_INIT), jnp.float32)
        dmap_l = jnp.zeros((sh, tw), jnp.float32)
        best_r = jnp.full((sh, tw), np.float32(BEST_COST_INIT), jnp.float32)
        dmap_r = jnp.zeros((sh, tw), jnp.float32)

        def raw_costs(d):
            """Slice d's truncated AD+gradient cost for BOTH views —
            pure VPU work, independent of every other slice."""
            I2s = _shift_x_vmem(I2, d)
            d2s = _shift_x_vmem(der2, d)
            raw = (one - alpha) * jnp.minimum(
                jnp.abs(I1 - I2s), th_color) + (
                alpha * jnp.minimum(jnp.abs(der1 - d2s), th_grad))
            # left view, label d ascending
            valid_l = (gx + d >= 0) & (gx + d < W)
            cost_l = jnp.where(in_img, jnp.where(valid_l, raw, oob), 0.0)
            # right view, label -d descending: raw_r(x) = raw(x - d)
            raw_r = _roll(raw, d, 1)
            valid_r = (gx - d >= 0) & (gx - d < W)
            cost_r = jnp.where(in_img, jnp.where(valid_r, raw_r, oob), 0.0)
            return cost_l, I1 * cost_l, cost_r, I2 * cost_r

        def coeffs(sums1):
            """Guided a/b for both views from one slice's phase-1 means,
            masked for the phase-2 box sums."""
            mp_l, mip_l, mp_r, mip_r = sums1
            a_l = (mip_l - mean_i1 * mp_l) * c1
            b_l = mp_l - mean_i1 * a_l
            a_r = (mip_r - mean_i2 * mp_r) * c2
            b_r = mp_r - mean_i2 * a_r
            return [jnp.where(in_img, t, 0.0) for t in (a_l, b_l, a_r, b_r)]

        def wta(d, sums2, best_l, dmap_l, best_r, dmap_r):
            # d may be a compile-time int (unrolled branch) or a traced
            # loop index (fori branch) — asarray handles both
            ma_l, mb_l, ma_r, mb_r = sums2
            q = crop(ma_l) * I1c + crop(mb_l)
            upd = best_l >= q
            best_l = jnp.where(upd, q, best_l)
            dmap_l = jnp.where(upd, jnp.asarray(d, jnp.float32), dmap_l)
            q = crop(ma_r) * I2c + crop(mb_r)
            upd = best_r > q
            best_r = jnp.where(upd, q, best_r)
            dmap_r = jnp.where(upd, jnp.asarray(-d, jnp.float32), dmap_r)
            return best_l, dmap_l, best_r, dmap_r

        # Disparity slices are processed in groups of G: each guided
        # phase's y-sum matmuls for the WHOLE group ride one
        # lane-concatenated band matmul (bit-exact — matmul columns are
        # independent).  G=1 reproduces the per-slice form; larger G
        # trades VMEM (4G ext operands live per phase) for fewer,
        # wider MXU ops.
        G = max(1, cfg.slice_group or _SLICE_GROUP)
        pipelined = (cfg.sw_pipeline if cfg.sw_pipeline is not None
                     else _SW_PIPELINE) and G == 1
        if size_d > unroll_max(cfg):
            # Wide-range fori branch (slice_group/sw_pipeline are
            # unrolled-emission knobs and do not apply): the loop
            # carries incrementally-rolled match images for BOTH views.
            # The shared rolled raw slice of the unrolled branch needs a
            # dynamic roll by the loop index, so the right view instead
            # recomputes its raw cost from the counter-rolled LEFT image
            # — raw_r(x) = raw(x-d) = F(I1(x-d), I2(x)) — the identical
            # elementary float ops on the identical operand values
            # (bit-exact vs the unrolled branch), with every per-
            # iteration shift a static ±1 column roll.
            def body(s, carry):
                I2s, d2s, I1s, d1s, best_l, dmap_l, best_r, dmap_r = carry
                d = dmin + s
                raw_l = (one - alpha) * jnp.minimum(
                    jnp.abs(I1 - I2s), th_color) + (
                    alpha * jnp.minimum(jnp.abs(der1 - d2s), th_grad))
                valid_l = (gx + d >= 0) & (gx + d < W)
                cost_l = jnp.where(in_img, jnp.where(valid_l, raw_l, oob),
                                   0.0)
                raw_r = (one - alpha) * jnp.minimum(
                    jnp.abs(I1s - I2), th_color) + (
                    alpha * jnp.minimum(jnp.abs(d1s - der2), th_grad))
                valid_r = (gx - d >= 0) & (gx - d < W)
                cost_r = jnp.where(in_img, jnp.where(valid_r, raw_r, oob),
                                   0.0)
                sums1 = boxms(cost_l, I1 * cost_l, cost_r, I2 * cost_r)
                sums2 = boxms(*coeffs(sums1))
                best_l, dmap_l, best_r, dmap_r = wta(
                    d, sums2, best_l, dmap_l, best_r, dmap_r)
                return (_shift_x_vmem(I2s, 1), _shift_x_vmem(d2s, 1),
                        _shift_x_vmem(I1s, -1), _shift_x_vmem(d1s, -1),
                        best_l, dmap_l, best_r, dmap_r)

            carry = jax.lax.fori_loop(
                0, size_d, body,
                (_shift_x_vmem(I2, dmin), _shift_x_vmem(der2, dmin),
                 _shift_x_vmem(I1, -dmin), _shift_x_vmem(der1, -dmin),
                 best_l, dmap_l, best_r, dmap_r))
            best_l, dmap_l, best_r, dmap_r = carry[4:]
        elif pipelined:
            # Software-pipelined emission (bit-exact — identical math,
            # ascending WTA order; only the trace order moves): each
            # y-sum matmul is issued with independent VPU work between
            # it and its consumers — the NEXT slice's cost/x-sums after
            # the phase-1 matmul, and the next slice's phase-1 matmul +
            # deferred WTA after the phase-2 matmul — so Mosaic's
            # scheduler can overlap the in-flight MXU op with VPU work
            # instead of serializing the phases (BENCH.md roofline).
            impl = cfg.y_sum or _Y_SUM_IMPL
            k = 2 * r + 1
            xsum = lambda x: _roll(_forward_window_sum(x, k, 1), r, 1)

            def ysum(sxs):
                if impl == "roll":
                    return [_roll(_forward_window_sum(sx, k, 0), r, 0)
                            * inv_area for sx in sxs]
                return [o * inv_area
                        for o in _y_matmul_many(impl, my, sxs, w_ext)]

            sx1 = [xsum(t) for t in raw_costs(dmin)]
            pend = None          # (d, sums2) with the WTA update deferred
            for s in range(size_d):
                d = dmin + s
                sums1 = ysum(sx1)                  # MXU: phase-1 means
                if s + 1 < size_d:
                    sx1 = [xsum(t) for t in raw_costs(d + 1)]
                if pend is not None:
                    best_l, dmap_l, best_r, dmap_r = wta(
                        *pend, best_l, dmap_l, best_r, dmap_r)
                sums2 = ysum([xsum(t) for t in coeffs(sums1)])  # MXU
                pend = (d, sums2)
            best_l, dmap_l, best_r, dmap_r = wta(
                *pend, best_l, dmap_l, best_r, dmap_r)
        else:
            for g0 in range(0, size_d, G):
                ds = [dmin + s for s in range(g0, min(g0 + G, size_d))]
                phase1 = []
                for d in ds:
                    phase1 += list(raw_costs(d))
                sums1 = boxms(*phase1)
                phase2 = []
                for i in range(len(ds)):
                    phase2 += coeffs(sums1[4 * i : 4 * i + 4])
                sums2 = boxms(*phase2)
                for i, d in enumerate(ds):
                    best_l, dmap_l, best_r, dmap_r = wta(
                        d, sums2[4 * i : 4 * i + 4],
                        best_l, dmap_l, best_r, dmap_r)

        best_l_ref[0] = best_l
        dmap_l_ref[0] = dmap_l
        best_r_ref[0] = best_r
        dmap_r_ref[0] = dmap_r

    return kernel


# Dual-kernel slice-group default (see StereoConfig.slice_group); env
# override for benching.
_SLICE_GROUP = int(os.environ.get("STEREO_SLICE_GROUP", "1"))

# Dual-kernel software-pipelining default (see StereoConfig.sw_pipeline);
# env override for benching.
_SW_PIPELINE = os.environ.get("STEREO_SW_PIPELINE", "0") == "1"

# Streaming-y strip-carry kernel default (see StereoConfig.stream); env
# override for benching.
_STREAM = os.environ.get("STEREO_STREAM", "0") == "1"

# VMEM live-buffer estimate for the dual kernel's unrolled loop (two
# guided chains per slice; calibrated on hardware — see BENCH.md)
_DUAL_N_LIVE = 70


# Dual-kernel fori-branch estimates: 4 loop-carried ext images + the
# shared base buffers + ONE slice's two-view temporaries — far below
# the unrolled branch's 70, so the fori dual affords the big tiles
# that made the single-view fori win big frames (BENCH.md).
_DUAL_N_LIVE_FORI = {"mxu": 46, "mxu3": 46, "mxu2": 46, "roll": 50}


def _dual_n_live(cfg: StereoConfig) -> int:
    """Grouping G slices keeps the group's 4G x-sum operands, the
    lane-concatenated matmul input and its product live together —
    roughly 12 extra ext-tile f32 buffers per slice beyond the first.
    The software pipeline additionally keeps the next slice's 4 x-sums
    and the previous slice's 4 deferred phase-2 means live across the
    skewed iteration.  The fori branch (size_d > unroll_max) keeps only
    the loop-carried state plus one slice's temporaries live."""
    if cfg.size_d > unroll_max(cfg):
        impl = cfg.y_sum or _Y_SUM_IMPL
        return _DUAL_N_LIVE_FORI.get(impl, 50)
    g = max(1, cfg.slice_group or _SLICE_GROUP)
    n = max(_DUAL_N_LIVE, 2 * _n_live(cfg) - 20) + 12 * (g - 1)
    if (cfg.sw_pipeline if cfg.sw_pipeline is not None else _SW_PIPELINE):
        n += 10
    return n

# Per-y-sum-impl live-buffer estimates for the single-view kernel.
# "roll" keeps the log-doubling y-partials live through the unrolled
# d-loop: measured 19.7 MB at (she=176, wte=512) → ~55 ext tiles.
# The matmul forms (incl. the limb splits, whose band products are
# consumed eagerly) measured fine at 45 — (she=176, wte=512) compiled
# and ran for mxu and mxu3 alike.
_N_LIVE = {"mxu": 45, "mxu3": 45, "mxu2": 45, "roll": 56}

# The fori d-loop branch keeps only the loop-carried state (rolled
# match image + derivative, best, dmap) plus one slice's temporaries
# live — far fewer ext tiles than the unrolled branch, so it affords
# bigger tiles (less halo recompute).  Hardware-calibrated at 6 MP:
# (she=176, wte=640) compiles and runs at these estimates.
_N_LIVE_FORI = {"mxu": 32, "mxu3": 32, "mxu2": 32, "roll": 34}


def _n_live(cfg: StereoConfig, n_slices: int | None = None) -> int:
    """``n_slices`` is the kernel's LOCAL slice count (differs from
    cfg.size_d under 'd' sharding) — the unroll-vs-fori branch, and
    hence the live-buffer estimate, follows the local count exactly as
    _make_kernel does.  The software-pipelined fori emission carries
    the previous slice's two phase-1 mean buffers across iterations
    (+2 ext tiles)."""
    impl = cfg.y_sum or _Y_SUM_IMPL
    size = cfg.size_d if n_slices is None else n_slices
    if size > unroll_max(cfg):  # fori d-loop branch
        n = _N_LIVE_FORI.get(impl, 34)
        if (cfg.sw_pipeline if cfg.sw_pipeline is not None else _SW_PIPELINE):
            n += 2
        return n
    return _N_LIVE.get(impl, 56)


# Default fused-kernel VMEM budget in MiB (None = Mosaic's 16 MiB
# scoped default).  cfg.vmem_mb overrides per run.
_VMEM_MB = None


def _vmem_params(cfg: StereoConfig) -> tuple[int, int | None]:
    """(tile-picker budget bytes, vmem_limit_bytes for Mosaic).

    With no override the PICKER budget stays 15.7 MiB (the tile sizes
    below are hardware-calibrated against it) while the Mosaic scoped
    limit is raised to 20 MiB: the limit only caps the compiler's
    stack allocation, and the 4 MiB slack absorbs Mosaic's
    fragmentation on the wide concatenated y-sum matmuls (measured
    16.12 MiB at the 15.36 MiB estimate; v5e carries 128 MiB VMEM, and
    32 MiB limits compile and run fine on this chip).  An explicit
    cfg.vmem_mb override budgets 98% of the requested limit."""
    mb = cfg.vmem_mb if cfg.vmem_mb is not None else _VMEM_MB
    if mb is None:
        return int(15.7 * 2**20), int(20 * 2**20)
    return int(mb * 0.98 * 2**20), int(mb * 2**20)


def _dual_stream(gray_l, gray_r, cfg: StereoConfig, H, W, px, nb):
    """Streaming-y dual-view path of guided_wta_fused_dual."""
    batched = nb > 0
    A = _stream_carry(cfg.radius)
    size_d = cfg.size_d
    sh, tw = _pick_tiles_stream(H, W, px, cfg.radius, size_d,
                                _vmem_params(cfg)[0],
                                _dual_stream_n_live(cfg),
                                carry_bufs=8 * size_d + 4,
                                max_sh=_stream_sh_cap(cfg),
                                tw_cap=_stream_tw_cap(cfg, dual=True))
    w_ext = ((tw + 2 * px + 127) // 128) * 128
    nyp = (H + A + 2 * cfg.radius + sh - 1) // sh
    nx = (W + tw - 1) // tw
    height, width = _pad_hw(max(nyp * sh + A, 2 * A + H),
                            max((nx - 1) * tw + w_ext, W + 2 * px))
    n_prog = max(nb, 1) * nx * nyp

    def prep(g):
        I = g.astype(jnp.float32)
        if batched:
            P = jnp.zeros((nb, height, width), jnp.float32)
            return jax.lax.dynamic_update_slice(P, I, (0, 2 * A, px))
        P = jnp.zeros((height, width), jnp.float32)
        return jax.lax.dynamic_update_slice(P, I, (2 * A, px))

    kernel = _make_dual_stream_kernel(cfg, H, W, sh, tw, nx, nyp, px,
                                      w_ext, nxy=nx * nyp if batched else 0)
    origin = jnp.array([0, 0], jnp.int32)
    _, vmem_limit = _vmem_params(cfg)
    outs = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
            dimension_semantics=("arbitrary",)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_prog,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((sh + A, w_ext), jnp.float32),
                pltpu.VMEM((sh + A, w_ext), jnp.float32),
                pltpu.VMEM((4, A, w_ext), jnp.float32),
                pltpu.VMEM((size_d, 4, A, w_ext), jnp.float32),
                pltpu.VMEM((size_d, 4, A, w_ext), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            out_specs=[
                pl.BlockSpec((1, sh, tw), lambda i, ref: (i, 0, 0))
                for _ in range(4)
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_prog, sh, tw), jnp.float32)
            for _ in range(4)
        ],
    )(origin, prep(gray_l), prep(gray_r))

    lag = A + 2 * cfg.radius

    def untile(t):
        if batched:
            t = t.reshape(nb, nx, nyp, sh, tw).transpose(0, 2, 3, 1, 4)
            t = t.reshape(nb, nyp * sh, nx * tw)
            return t[:, lag : lag + H, :W]
        t = t.reshape(nx, nyp, sh, tw).transpose(1, 2, 0, 3)
        return t.reshape(nyp * sh, nx * tw)[lag : lag + H, :W]

    return tuple(untile(t) for t in outs)


@functools.partial(jax.jit, static_argnames=("cfg",))
def guided_wta_fused_dual(
    gray_l: jax.Array,
    gray_r: jax.Array,
    cfg: StereoConfig = DEFAULT_CONFIG,
):
    """uint8 (H,W) ×2 → (best_l, dmap_l, best_r, dmap_r), all f32 (H,W).

    One kernel pass computes BOTH views (shared DMA, derivatives and
    raw cost slices) — the frame's whole matching stage in one Mosaic
    program.  A leading frame axis ((B,H,W) inputs) runs the whole
    batch in one grid.  size_d > unroll_max(cfg) takes the kernel's
    fori d-loop branch (loop-carried ±1-column rolls for both views;
    the right view's raw cost recomputed from the counter-rolled left
    image — bit-exact vs the unrolled emission)."""
    H, W = gray_l.shape[-2:]
    batched = gray_l.ndim == 3
    nb = gray_l.shape[0] if batched else 0
    halo_y, px = dual_geometry(cfg)
    if use_stream(cfg):
        return _dual_stream(gray_l, gray_r, cfg, H, W, px, nb)
    sh, tw = _pick_tiles(H, W, px, halo_y,
                         vmem_budget=_vmem_params(cfg)[0],
                         n_live=_dual_n_live(cfg))
    w_ext = ((tw + 2 * px + 127) // 128) * 128
    ny = (H + sh - 1) // sh
    nx = (W + tw - 1) // tw
    _h, width = _pad_hw(ny * sh + 2 * halo_y,
                        max((nx - 1) * tw + w_ext, W + 2 * px))
    n_prog = max(nb, 1) * ny * nx

    def prep(g):
        I = g.astype(jnp.float32)
        shape = (_h, width)
        if batched:
            P = jnp.zeros((nb,) + shape, jnp.float32)
            return jax.lax.dynamic_update_slice(P, I, (0, halo_y, px))
        P = jnp.zeros(shape, jnp.float32)
        return jax.lax.dynamic_update_slice(P, I, (halo_y, px))

    kernel = _make_dual_kernel(cfg, H, W, sh, tw, nx, halo_y, px, w_ext,
                               nxy=ny * nx if batched else 0)
    she = sh + 2 * halo_y
    origin = jnp.array([0, 0], jnp.int32)
    _, vmem_limit = _vmem_params(cfg)
    outs = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_prog,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((she, w_ext), jnp.float32),
                pltpu.VMEM((she, w_ext), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            out_specs=[
                pl.BlockSpec((1, sh, tw), lambda i, ref: (i, 0, 0))
                for _ in range(4)
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_prog, sh, tw), jnp.float32)
            for _ in range(4)
        ],
    )(origin, prep(gray_l), prep(gray_r))

    def untile(t):
        if batched:
            t = t.reshape(nb, ny, nx, sh, tw).transpose(0, 1, 3, 2, 4)
            return t.reshape(nb, ny * sh, nx * tw)[:, :H, :W]
        t = t.reshape(ny, nx, sh, tw).transpose(0, 2, 1, 3)
        return t.reshape(ny * sh, nx * tw)[:H, :W]

    return tuple(untile(t) for t in outs)


def guided_wta_fused_local(
    gray1_ext: jax.Array,
    gray2_ext: jax.Array,
    origin_y,
    origin_x,
    dmin: int,
    cfg: StereoConfig,
    global_h: int,
    global_w: int,
    tile_h: int,
    tile_w: int,
    n_slices: int | None = None,
):
    """shard_map-side entry: grayscale tiles ALREADY extended with
    (halo_y, px) halos (real neighbor rows/cols via ppermute, zeros
    beyond the global image), global origin of the tile's (0,0) given
    as traced scalars.  ``dmin`` may be traced (disparity-sharded
    meshes: each device's base label differs); ``n_slices`` overrides
    cfg.size_d for per-range shards.  Returns (best, dmap) for the
    (tile_h, tile_w) interior.  A leading local-batch axis on the ext
    tiles runs every frame in one grid ((B, tile_h, tile_w) out)."""
    halo_y, px = fused_geometry(cfg)
    if isinstance(dmin, int) and not (-px <= dmin <= px):
        raise ValueError(f"dmin {dmin} exceeds the kernel's shift budget {px}")
    batched = gray1_ext.ndim == 3
    assert gray1_ext.shape[-2] == tile_h + 2 * halo_y, gray1_ext.shape
    assert gray1_ext.shape[-1] == tile_w + 2 * px, gray1_ext.shape
    if use_stream(cfg):
        A = _stream_carry(cfg.radius)
        # ext tile rows start at interior row -halo_y ↔ padded 2A-halo_y
        assert 2 * A >= halo_y, (A, halo_y)
        sh, tw = _pick_tiles_stream(tile_h, tile_w, px, cfg.radius,
                                    n_slices or cfg.size_d,
                                    _vmem_params(cfg)[0],
                                    _stream_n_live(cfg, n_slices),
                                    max_sh=_stream_sh_cap(cfg, n_slices),
                                    tw_cap=_stream_tw_cap(cfg, n_slices))
        w_ext = ((tw + 2 * px + 127) // 128) * 128
        nyp = (tile_h + A + 2 * cfg.radius + sh - 1) // sh
        nx = (tile_w + tw - 1) // tw
        # 128-aligned headroom: the kernel's DMA x-start is tx*tw+lead,
        # which Mosaic must prove divisible by the 128-lane tiling
        # (tw candidates are all multiples of 128; px alone is not —
        # measured failure r4_shard_tpu)
        lead = ((px + 127) // 128) * 128
        height, width = _pad_hw(
            max(nyp * sh + A, 2 * A - halo_y + gray1_ext.shape[-2]),
            lead + max((nx - 1) * tw + w_ext, tile_w + 2 * px) + px)

        def prep_s(g, xoff):
            if batched:
                P = jnp.zeros((g.shape[0], height, width), jnp.float32)
                return jax.lax.dynamic_update_slice(
                    P, g.astype(jnp.float32),
                    (jnp.int32(0), jnp.int32(2 * A - halo_y),
                     jnp.int32(xoff)))
            P = jnp.zeros((height, width), jnp.float32)
            return jax.lax.dynamic_update_slice(
                P, g.astype(jnp.float32),
                (jnp.int32(2 * A - halo_y), jnp.int32(xoff)))

        origin = jnp.stack(
            [jnp.int32(origin_y), jnp.int32(origin_x), jnp.int32(dmin)])
        return _stream_tiles(prep_s(gray1_ext, lead),
                             prep_s(gray2_ext, lead - jnp.int32(dmin)),
                             origin, cfg, global_h, global_w,
                             tile_h, tile_w, px, sh, tw, n_slices, lead)
    sh, tw = _pick_tiles(tile_h, tile_w, px, halo_y,
                         vmem_budget=_vmem_params(cfg)[0],
                         n_live=_n_live(cfg, n_slices))
    w_ext = ((tw + 2 * px + 127) // 128) * 128
    ny = (tile_h + sh - 1) // sh
    nx = (tile_w + tw - 1) // tw
    # `lead` columns of headroom keep the dmin pre-shift start index
    # non-negative for any |dmin| <= px (dynamic_update_slice clamps);
    # 128-aligned because the kernel DMA x-start tx*tw+lead must be
    # provably divisible by the lane tiling (r4_shard_tpu)
    lead = ((px + 127) // 128) * 128
    _h, width = _pad_hw(ny * sh + 2 * halo_y,
                        lead + max((nx - 1) * tw + w_ext, tile_w + 2 * px)
                        + px)

    def prep(g, xoff):
        shape = (_h, width)
        if batched:
            P = jnp.zeros((g.shape[0],) + shape, jnp.float32)
            return jax.lax.dynamic_update_slice(
                P, g.astype(jnp.float32),
                (jnp.int32(0), jnp.int32(0), jnp.int32(xoff)))
        P = jnp.zeros(shape, jnp.float32)
        return jax.lax.dynamic_update_slice(
            P, g.astype(jnp.float32), (jnp.int32(0), jnp.int32(xoff)))

    origin = jnp.stack(
        [jnp.int32(origin_y), jnp.int32(origin_x), jnp.int32(dmin)])
    return _fused_tiles(prep(gray1_ext, lead),
                        prep(gray2_ext, lead - jnp.int32(dmin)),
                        origin, cfg, global_h, global_w, tile_h, tile_w,
                        halo_y, px, sh, tw, n_slices, lead)
