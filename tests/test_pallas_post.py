"""Fused Pallas post-stage (LR check + occlusion fill) vs the XLA ops.

The post stage is integer selects/compares only (no float
reassociation), so unlike the matching kernel the fused post kernel
must be BIT-IDENTICAL to ops.detect_occlusion + ops.fill_occlusion —
asserted exactly here (interpret mode on CPU; Mosaic compiles the same
kernel code on TPU)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
import pytest

from stereo_matching_cuda_tpu import ops
from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG as CFG
from stereo_matching_cuda_tpu.ops.pallas_post import lr_fill_fused


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call

        def interp(*a, **k):
            k.setdefault("interpret", True)
            return orig(*a, **k)

        monkeypatch.setattr(pl, "pallas_call", interp)
    yield


def _maps(cfg, h, w, seed=0):
    rng = np.random.default_rng(seed)
    dl = rng.integers(cfg.d_min, cfg.d_max + 1, size=(h, w)).astype(np.float32)
    dr = rng.integers(-cfg.d_max, -cfg.d_min + 1,
                      size=(h, w)).astype(np.float32)
    return jnp.asarray(dl), jnp.asarray(dr)


def _assert_parity(cfg, dl, dr):
    occ_ref = ops.detect_occlusion(dl, dr, cfg.d_occlusion, cfg)
    fill_ref = ops.fill_occlusion(occ_ref, cfg.v_min, cfg)
    occ_k, fill_k = lr_fill_fused(dl, dr, cfg)
    assert occ_k.shape == occ_ref.shape
    np.testing.assert_array_equal(np.asarray(occ_k), np.asarray(occ_ref))
    np.testing.assert_array_equal(np.asarray(fill_k), np.asarray(fill_ref))


@pytest.mark.parametrize("h,w", [(288, 384), (50, 200), (7, 130), (33, 257)])
def test_parity_default_range(h, w):
    _assert_parity(CFG, *_maps(CFG, h, w, seed=h * w))


@pytest.mark.parametrize("dmin,dmax", [(-63, 0), (-127, 0), (-11, 4)])
def test_parity_other_ranges(dmin, dmax):
    cfg = dataclasses.replace(CFG, d_min=dmin, d_max=dmax)
    _assert_parity(cfg, *_maps(cfg, 40, 300, seed=abs(dmin)))


def test_fully_occluded_rows():
    """Rows with no valid pixel after the LR check must fill with v_min
    on both sides (occlusion.cu:147,161)."""
    dl, dr = _maps(CFG, 24, 256, seed=9)
    # make rows 3..5 entirely LR-inconsistent
    dr = dr.at[3:6].set(jnp.float32(-CFG.d_min + 50))
    _assert_parity(CFG, dl, dr)


def test_nonlabel_left_values():
    """detect_occlusion's select tree leaves dprime=0 for non-label
    disparities; the kernel must reproduce that too."""
    dl, dr = _maps(CFG, 16, 256, seed=11)
    dl = dl.at[0, :7].set(jnp.float32(99.0))      # not a WTA label
    _assert_parity(CFG, dl, dr)


def test_pipeline_post_fused_matches():
    """Full pipeline: post_fused=True output equals post_fused=False
    bit-for-bit (CPU unfused matching either way)."""
    from stereo_matching_cuda_tpu.pipeline import stereo_pipeline

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, size=(40, 160 + 16, 3), dtype=np.uint8)
    left, right = base[:, 16:], base[:, :-16]
    a = stereo_pipeline(jnp.asarray(left), jnp.asarray(right),
                        dataclasses.replace(CFG, post_fused=True))
    b = stereo_pipeline(jnp.asarray(left), jnp.asarray(right),
                        dataclasses.replace(CFG, post_fused=False))
    for k in ("occlusion", "occlusion_filled"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
