"""Halo exchange over a mesh axis with `lax.ppermute`.

Non-periodic: edge devices receive ZEROS in the out-of-mesh halo
(ppermute leaves unaddressed outputs zero).  Zero out-of-image halos are
exactly what the sharded stereo math wants — a zero-padded integral
image over the clamped window equals the reference's conditional 4-tap
sum (guidedFilter.cu:305-318), so border tiles need no special casing
beyond the global-coordinate area normalizer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_exchange(arr: jax.Array, halo: int, axis_name: str, n: int, dim: int) -> jax.Array:
    """Extend ``arr`` by ``halo`` on both sides of ``dim`` with strips
    from the previous/next device along ``axis_name`` (mesh size ``n``).

    Must be called inside shard_map.  Edge devices get zeros.
    """
    if halo == 0:
        return arr
    if arr.shape[dim] < halo:
        raise ValueError(f"local dim {arr.shape[dim]} smaller than halo {halo}")
    last = jax.lax.slice_in_dim(arr, arr.shape[dim] - halo, arr.shape[dim], axis=dim)
    first = jax.lax.slice_in_dim(arr, 0, halo, axis=dim)
    if n > 1:
        # my left halo = left neighbor's last strip (shift right: i -> i+1)
        left = jax.lax.ppermute(last, axis_name, [(i, i + 1) for i in range(n - 1)])
        # my right halo = right neighbor's first strip (shift left: i -> i-1)
        right = jax.lax.ppermute(first, axis_name, [(i + 1, i) for i in range(n - 1)])
    else:
        left = jnp.zeros_like(last)
        right = jnp.zeros_like(first)
    return jnp.concatenate([left, arr, right], axis=dim)
