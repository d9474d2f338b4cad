"""Left-right consistency check and occlusion filling.

Reference: detect_occlusionOnGPU (occlusion.cu:3-15) and
fill_occlusionOnGPU1 (occlusion.cu:134-176).

The reference's fill kernel reads and writes the same buffer
concurrently — a data race (SURVEY.md §2.5.9).  This framework defines
the deterministic semantics both implementations compute in the
race-free case: every occluded pixel receives
``max(nearest valid value to its left, nearest valid value to its
right)`` taken from the ORIGINAL map, with ``v_min`` substituted when a
side has no valid pixel.  Implemented as two associative "last valid
value" scans (log-depth, no gathers, no serial row loops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import StereoConfig, DEFAULT_CONFIG
from .shifts import shift_cols


def detect_occlusion(
    disp_left: jax.Array,
    disp_right: jax.Array,
    d_occlusion: int,
    cfg: StereoConfig = DEFAULT_CONFIG,
) -> jax.Array:
    """Write ``d_occlusion`` into LR-inconsistent left-map pixels.

    d = (int)dispL[x] (trunc cast); occluded iff x+d ∉ [0,w) or
    |d + dispR[x+d]| > D_LR (occlusion.cu:8-12).  The short-circuit
    ``||`` means dispR is only ever read in range — replicated by
    clipping the gather index and OR-ing the masks.
    """
    w = disp_left.shape[-1]
    d = disp_left.astype(jnp.int32)  # trunc toward zero
    x = jnp.arange(w, dtype=jnp.int32)
    xs = x[None, :] + d
    in_range = (xs >= 0) & (xs < w)
    # dispR[x + d]: d takes only the size_d labels the WTA can emit, so
    # the gather becomes a select over size_d statically-shifted copies
    # of dispR (gathers are slow on the TPU VPU; shifts fuse).
    labels = tuple(cfg.d_min + s for s in range(cfg.size_d))
    dprime = jnp.zeros_like(disp_right)
    for lab in labels:
        dprime = jnp.where(d == lab, shift_cols(disp_right, lab), dprime)
    bad = jnp.abs(d.astype(jnp.float32) + dprime) > jnp.float32(cfg.d_lr)
    occl = (~in_range) | bad
    return jnp.where(occl, jnp.float32(d_occlusion), disp_left)


def _last_valid_scan(vals: jax.Array, valid: jax.Array, reverse: bool):
    """Per row: value of the nearest valid pixel at <= x (or >= x when
    reversed); returns (value, found) arrays."""
    def combine(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, av), af | bf

    return jax.lax.associative_scan(
        combine, (vals, valid), axis=vals.ndim - 1, reverse=reverse
    )


def fill_occlusion(
    disp: jax.Array, v_min: float, cfg: StereoConfig = DEFAULT_CONFIG
) -> jax.Array:
    """Fill occluded pixels (trunc(disp) < v_min, occlusion.cu:140-142)
    with max(nearest-valid-left, nearest-valid-right); a side with no
    valid pixel contributes v_min (occlusion.cu:147,161)."""
    vminf = jnp.float32(v_min)
    occl = disp.astype(jnp.int32) < v_min
    valid = disp >= vminf  # float compare, occlusion.cu:152,167
    vals = jnp.where(valid, disp, jnp.float32(0))
    lv, lf = _last_valid_scan(vals, valid, reverse=False)
    rv, rf = _last_valid_scan(vals, valid, reverse=True)
    dleft = jnp.where(lf, lv, vminf)
    dright = jnp.where(rf, rv, vminf)
    return jnp.where(occl, jnp.maximum(dleft, dright), disp)
