"""Fused Pallas post-stage: LR consistency check + occlusion fill.

One Mosaic kernel computes, from the two WTA disparity maps, both the
LR-checked occlusion map (``d_occlusion`` sentinel written into
inconsistent pixels — detect_occlusionOnGPU, occlusion.cu:3-15) and the
filled map (max of nearest-valid-left / nearest-valid-right along the
row — the deterministic semantics of fill_occlusionOnGPU1,
occlusion.cu:134-176).

Why a kernel: every step is ROW-LOCAL, so the grid is plain row strips
with no halo, and all the per-label work stays VMEM-resident.  The XLA
path materializes ``size_d`` shifted copies of the right map through
HBM for the LR select tree — measured 5.08 ms at 3 MP x 128 labels
(BENCH.md "LR-check gather strategy") — plus two ``lax.cummax``
passes for the fill (0.042 ms of the 0.444 ms Tsukuba frame, ~9%,
BENCH.md round-4 per-stage split).  In-kernel the same select tree is
``size_d`` lane rolls over a VMEM tile and the fill is two log-doubling
max scans; nothing round-trips HBM between steps.

Bit-exactness: the post stage is integer selects and comparisons on
exact small-integer-valued floats (WTA labels), plus one float add of
exact integers in the LR test — there is no reassociation anywhere, so
the kernel output is BIT-IDENTICAL to ops/occlusion.py (asserted in
tests/test_pallas_post.py), unlike the matching kernel's documented
near-tie class.  The circular rolls differ from shift_cols' edge
replication only at columns the ``in_range`` mask already discards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import StereoConfig, DEFAULT_CONFIG
from .pallas_guided import _roll, _vmem_params

# select-tree unroll threshold — intentionally NOT cfg.unroll_max
# (see the comment at the use site)
_POST_UNROLL_MAX = 32


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _cummax_keys(key: jax.Array, col: jax.Array, wp: int, reverse: bool):
    """Log-doubling per-row prefix max of int32 keys (invalid = -1).
    ``col`` is the global column index of each tile element; wrapped
    roll positions are masked to -1 so they never win."""
    shift = 1
    while shift < wp:
        if reverse:
            rolled = _roll(key, -shift, 1)            # key[x + shift]
            key = jnp.maximum(key, jnp.where(col < wp - shift, rolled, -1))
        else:
            rolled = _roll(key, shift, 1)             # key[x - shift]
            key = jnp.maximum(key, jnp.where(col >= shift, rolled, -1))
        shift *= 2
    return key


def _post_kernel(dl_ref, dr_ref, occ_ref, fill_ref, *, cfg: StereoConfig,
                 w: int, wp: int, d_occlusion: int, v_min: int):
    dl = dl_ref[:]
    dr = dr_ref[:]
    sh = dl.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (sh, wp), 1)

    # --- LR check (occlusion.cu:3-15): d = (int)dispL[x]; occluded iff
    # x+d outside [0,w) or |d + dispR[x+d]| > d_lr.  dispR[x+d] via a
    # select over the size_d statically-rolled copies of dispR (the
    # measured-fast gather strategy, all VMEM-resident here).
    d = dl.astype(jnp.int32)                          # trunc toward zero
    xs = col + d
    in_range = (xs >= 0) & (xs < w)
    dprime = jnp.zeros_like(dr)
    # The post kernel keeps its OWN unroll threshold (32) and
    # deliberately does NOT follow cfg.unroll_max: that knob is tuned
    # for the HEAVY matching-slice bodies, while a select-tree label
    # costs 3 trivial ops — and routing the r5 default's unroll_max=8
    # here flipped Tsukuba's D=16 tree to the fori emission, whose
    # Mosaic compile measured 821 s vs seconds unrolled
    # (scripts/logs_r5/r5_post_smoke2.log).
    if cfg.size_d <= _POST_UNROLL_MAX:
        for s in range(cfg.size_d):
            lab = cfg.d_min + s
            dprime = jnp.where(d == lab, _roll(dr, -lab, 1), dprime)
    else:
        # wide ranges: one incremental roll per iteration (static
        # shift compiled once) — same emission trick as the matching
        # kernel's fori branch (pallas_guided.py)
        def body(s, carry):
            dprime, rolled = carry
            lab = cfg.d_min + s
            dprime = jnp.where(d == lab, rolled, dprime)
            return dprime, _roll(rolled, -1, 1)

        dprime, _ = jax.lax.fori_loop(
            0, cfg.size_d, body, (dprime, _roll(dr, -cfg.d_min, 1)))
    bad = jnp.abs(d.astype(jnp.float32) + dprime) > jnp.float32(cfg.d_lr)
    occl = (~in_range) | bad
    occ = jnp.where(occl, jnp.float32(d_occlusion), dl)
    occ_ref[:] = occ

    # --- fill (occlusion.cu:134-176, deterministic semantics): packed
    # (position, label-code) keys; per-row prefix max = nearest valid
    # pixel (ops/occlusion.py::_last_valid_packed, here as log-doubling
    # lane rolls).  npack is the next power of two of size_d so the
    # unpack divides become shifts.
    vminf = jnp.float32(v_min)
    occl2 = occ.astype(jnp.int32) < v_min             # occlusion.cu:140-142
    valid = (occ >= vminf) & (col < w)                # float cmp, :152,167
    npack = _next_pow2(cfg.size_d)
    code = occ.astype(jnp.int32) - cfg.d_min          # exact small ints
    key_f = jnp.where(valid, col * npack + code, jnp.int32(-1))
    key_b = jnp.where(valid, (wp - 1 - col) * npack + code, jnp.int32(-1))
    m_f = _cummax_keys(key_f, col, wp, reverse=False)
    m_b = _cummax_keys(key_b, col, wp, reverse=True)
    lv = ((jnp.maximum(m_f, 0) % npack) + cfg.d_min).astype(jnp.float32)
    rv = ((jnp.maximum(m_b, 0) % npack) + cfg.d_min).astype(jnp.float32)
    dleft = jnp.where(m_f >= 0, lv, vminf)
    dright = jnp.where(m_b >= 0, rv, vminf)
    fill_ref[:] = jnp.where(occl2, jnp.maximum(dleft, dright), occ)


def _pick_strip(hp: int, wp: int, budget_bytes: int) -> int:
    """Strip height: ~16 live (sh, wp) f32 buffers against the budget
    (2 inputs, 2 outputs, d/xs/dprime/keys/scans temps; conservative
    so the larger cfg.vmem_mb budgets never ride the VMEM edge —
    this kernel is ≤3% of any frame, strip size barely matters)."""
    sh = budget_bytes // (16 * 4 * wp)
    sh = max(8, min(hp, sh // 8 * 8))
    return sh


@functools.partial(jax.jit, static_argnames=("cfg",))
def lr_fill_fused(dmap_l: jax.Array, dmap_r: jax.Array,
                  cfg: StereoConfig = DEFAULT_CONFIG):
    """(occlusion map, filled map) — bit-identical to
    ops.detect_occlusion + ops.fill_occlusion, one fused kernel."""
    h, w = dmap_l.shape
    wp = -(-w // 128) * 128
    hp = -(-h // 8) * 8
    dl = jnp.pad(dmap_l, ((0, hp - h), (0, wp - w)))
    dr = jnp.pad(dmap_r, ((0, hp - h), (0, wp - w)))
    # budget/limit follow cfg.vmem_mb like every other kernel
    # (review r5: was a hardcoded 16 MiB / 64 MiB pair)
    budget, vmem_limit = _vmem_params(cfg)
    sh = _pick_strip(hp, wp, budget)
    ny = -(-hp // sh)
    if hp % sh:
        pad_rows = ny * sh - hp
        dl = jnp.pad(dl, ((0, pad_rows), (0, 0)))
        dr = jnp.pad(dr, ((0, pad_rows), (0, 0)))

    kernel = functools.partial(
        _post_kernel, cfg=cfg, w=w, wp=wp,
        d_occlusion=cfg.d_occlusion, v_min=cfg.v_min)
    occ, filled = pl.pallas_call(
        kernel,
        grid=(ny,),
        in_specs=[pl.BlockSpec((sh, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((sh, wp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((ny * sh, wp), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
            dimension_semantics=("arbitrary",)),
    )(dl, dr)
    return occ[:h, :w], filled[:h, :w]
