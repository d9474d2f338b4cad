"""Static column shifts — the gather-free primitive under the cost
volume (costVolume.cu:187's I2[x+d] reads), the LR check and the
sharded tiles."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def shift_cols(arr: jax.Array, d: int) -> jax.Array:
    """out[..., x] = arr[..., x+d] with edge replication (consumers mask
    out-of-range columns via validity/coordinate tests)."""
    if d == 0:
        return arr
    w = arr.shape[-1]
    if d > 0:
        pad = [(0, 0)] * (arr.ndim - 1) + [(0, d)]
        return jnp.pad(arr, pad, mode="edge")[..., d:]
    pad = [(0, 0)] * (arr.ndim - 1) + [(-d, 0)]
    return jnp.pad(arr, pad, mode="edge")[..., :w]
