"""Matching cost volume — all disparities at once, gather-free.

Reference kernel costVolumOnGPU2 (costVolume.cu:163-221): one thread per
(pixel, disparity) computing

  cost[d,y,x] = (1-α)·min(|I1[x] - I2[x+d]|, TH_color)
              + α·min(|∇1[x] - ∇2[x+d]|, TH_grad)          (f32; :187)
  out-of-range x+d ⇒ (1-α)·TH_color + α·TH_grad (= 2.5)    (:184)

Volume layout here is (D, H, W) with slice s ↔ d = dmin + s, matching the
reference's id = z·w·h + y·w + x (costVolume.cu:261-263).

Because dmin and D are static, each disparity's column shift is a STATIC
slice+pad — XLA sees D shifted copies and fuses the whole volume into
one elementwise kernel, no gathers, no dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import StereoConfig, DEFAULT_CONFIG
from .boxfilter import strict_mul
from .image import x_derivative
from .shifts import shift_cols


def _shift_x(img: jax.Array, d: int) -> tuple[jax.Array, jax.Array]:
    """Return (img shifted so out[..., x] = img[..., x+d], valid mask as
    a (W,) bool).  Out-of-range columns hold the edge value (masked)."""
    w = img.shape[-1]
    x = jnp.arange(w)
    valid = (x + d >= 0) & (x + d < w)
    return shift_cols(img, d), valid


def cost_volume(
    i1: jax.Array,
    i2: jax.Array,
    dmin: int,
    cfg: StereoConfig = DEFAULT_CONFIG,
    der1: jax.Array | None = None,
    der2: jax.Array | None = None,
) -> jax.Array:
    """uint8 (H,W) ×2 → float32 (D, H, W) truncated AD + gradient cost."""
    if der1 is None:
        der1 = x_derivative(i1)
    if der2 is None:
        der2 = x_derivative(i2)
    g1 = i1.astype(jnp.int32)
    g2 = i2.astype(jnp.int32)
    alpha = jnp.float32(cfg.alpha)
    th_color = jnp.float32(cfg.th_color)
    th_grad = jnp.float32(cfg.th_grad)
    one = jnp.float32(1)
    oob = (one - alpha) * th_color + alpha * th_grad  # 2.5 (costVolume.cu:184)

    slices = []
    for d in cfg.disparities(dmin):
        g2s, vg = _shift_x(g2, d)
        d2s, _ = _shift_x(der2, d)
        diff = jnp.abs(g1 - g2s).astype(jnp.float32)
        grad = jnp.abs(der1 - d2s)
        c = strict_mul(one - alpha, jnp.minimum(diff, th_color)) + strict_mul(
            alpha, jnp.minimum(grad, th_grad))
        slices.append(jnp.where(vg[None, :], c, oob))
    return jnp.stack(slices, axis=0)
