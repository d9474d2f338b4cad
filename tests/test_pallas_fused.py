"""Fused Pallas cost+guided+WTA kernel vs the oracle (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
import pytest

from stereo_matching_cuda_tpu import reference as R
from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG as CFG


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call

        def interp(*a, **k):
            k.setdefault("interpret", True)
            return orig(*a, **k)

        monkeypatch.setattr(pl, "pallas_call", interp)
        # fused=True must force the kernel path here even off-TPU
        # (interpret mode runs the same kernel code Mosaic compiles);
        # the product predicate requires a real TPU backend
        from stereo_matching_cuda_tpu import pipeline as P

        monkeypatch.setattr(
            P, "use_fused_path",
            lambda cfg, full_outputs=False: not full_outputs
            and cfg.fused is True)
    yield


def _pair(h, w, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w + 32), dtype=np.uint8).astype(np.float32)
    base = ((base + np.roll(base, 1, 1) + np.roll(base, -1, 1) + np.roll(base, 1, 0)) / 4
            ).astype(np.uint8)
    return base[:, 16 : 16 + w], base[:, 10 : 10 + w]


@pytest.mark.parametrize("shape", [(64, 96), (40, 384), (33, 130)])
def test_fused_matches_oracle(shape):
    from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused

    g1, g2 = _pair(*shape)
    cost = R.cost_volume(g1, g2, CFG.d_min, CFG)
    want_best, want_dmap, _ = R.guided_filter_wta(g1, cost, CFG.d_min, CFG)
    best, dmap = guided_wta_fused(jnp.asarray(g1), jnp.asarray(g2), CFG.d_min, CFG)
    best, dmap = np.asarray(best), np.asarray(dmap)
    n = dmap.size
    mism = int((dmap != want_dmap).sum())
    assert mism <= max(4, n * 2e-3), f"{mism}/{n} disparity mismatches"
    # any flip must be a near-tie, not a wrong window
    np.testing.assert_allclose(best, want_best, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("impl", ["roll", "mxu3", "mxu2"])
def test_fused_y_sum_variants_match_oracle(impl, monkeypatch):
    """Every y-window-sum implementation (BENCH.md) stays in the
    fast-path accuracy class: near-tie flips only vs the oracle."""
    import stereo_matching_cuda_tpu.ops.pallas_guided as pg

    monkeypatch.setattr(pg, "_Y_SUM_IMPL", impl)
    g1, g2 = _pair(48, 130, seed=5)
    cost = R.cost_volume(g1, g2, CFG.d_min, CFG)
    want_best, want_dmap, _ = R.guided_filter_wta(g1, cost, CFG.d_min, CFG)
    best, dmap = pg.guided_wta_fused.__wrapped__(
        jnp.asarray(g1), jnp.asarray(g2), CFG.d_min, CFG)
    best, dmap = np.asarray(best), np.asarray(dmap)
    mism = int((dmap != want_dmap).sum())
    assert mism <= max(4, dmap.size * 2e-3), f"{impl}: {mism} mismatches"
    np.testing.assert_allclose(best, want_best, atol=2e-3, rtol=1e-4)


def test_fused_right_view():
    from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused

    g1, g2 = _pair(48, 80, seed=9)
    cost_r = R.cost_volume(g2, g1, CFG.d_min_right, CFG)
    wb, wd, _ = R.guided_filter_wta(g2, cost_r, CFG.d_min_right, CFG)
    best, dmap = guided_wta_fused(jnp.asarray(g2), jnp.asarray(g1), CFG.d_min_right, CFG)
    mism = int((np.asarray(dmap) != wd).sum())
    assert mism <= max(4, wd.size * 2e-3)


@pytest.mark.skipif(jax.default_backend() == "tpu", reason="CPU interpret only")
def test_fused_tsukuba_near_parity(tsukuba):
    from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused

    left, right = tsukuba
    gl = R.rgb_to_grayscale(left, CFG)
    gr = R.rgb_to_grayscale(right, CFG)
    cost = R.cost_volume(gl, gr, CFG.d_min, CFG)
    _, want_dmap, _ = R.guided_filter_wta(gl, cost, CFG.d_min, CFG)
    _, dmap = guided_wta_fused(jnp.asarray(gl), jnp.asarray(gr), CFG.d_min, CFG)
    mism = int((np.asarray(dmap) != want_dmap).sum())
    assert mism <= want_dmap.size * 2e-4, f"{mism}/{want_dmap.size}"


def test_fused_x_tiled_matches_oracle(monkeypatch):
    """Force (16, 256) tiles on a 64x600 frame (nx=3) — tile boundaries
    must be seamless (mismatches are uniform ties, not edge artifacts)."""
    import stereo_matching_cuda_tpu.ops.pallas_guided as pg

    monkeypatch.setattr(pg, "_pick_tiles", lambda *a, **k: (16, 256))
    g1, g2 = _pair(64, 600)
    cost = R.cost_volume(g1, g2, CFG.d_min, CFG)
    want_best, want_dmap, _ = R.guided_filter_wta(g1, cost, CFG.d_min, CFG)
    best, dmap = pg.guided_wta_fused(jnp.asarray(g1), jnp.asarray(g2), CFG.d_min, CFG)
    dmap = np.asarray(dmap)
    mism = int((dmap != want_dmap).sum())
    assert mism <= dmap.size * 3e-3, f"{mism}/{dmap.size}"
    # no clustering at the x=256/512 tile seams
    bad_cols = np.argwhere(dmap != want_dmap)[:, 1]
    near_seam = ((bad_cols >= 252) & (bad_cols <= 260)) | (
        (bad_cols >= 508) & (bad_cols <= 516))
    assert near_seam.sum() <= max(2, 0.2 * len(bad_cols))


def test_fused_inside_shard_map(tsukuba):
    """Fused kernel composed with spatial sharding (forced on CPU via
    interpret mode): tile origins flow in as scalar-prefetch args."""
    import dataclasses

    from stereo_matching_cuda_tpu.parallel import make_mesh, sharded_stereo_pipeline

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    left, right = tsukuba
    cfg_f = dataclasses.replace(CFG, fused=True)
    mesh = make_mesh(1, 2, 2)
    out = sharded_stereo_pipeline(left[None], right[None], mesh, cfg_f)
    gl = R.rgb_to_grayscale(left, CFG)
    gr = R.rgb_to_grayscale(right, CFG)
    cost = R.cost_volume(gl, gr, CFG.d_min, CFG)
    _, want_dmap, _ = R.guided_filter_wta(gl, cost, CFG.d_min, CFG)
    dmap = np.asarray(out["disparity_left"][0])
    mism = int((dmap != want_dmap).sum())
    assert mism <= want_dmap.size * 2e-4, f"{mism}/{want_dmap.size}"


def test_fused_disparity_sharded(tsukuba):
    """Fused kernel on a disparity-sharded mesh: each device runs 4 of
    the 16 slices with a runtime base label; winners combine across 'd'
    with the ascending `best >= q` rule."""
    import dataclasses

    from stereo_matching_cuda_tpu.parallel import make_mesh, sharded_stereo_pipeline

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    left, right = tsukuba
    cfg_f = dataclasses.replace(CFG, fused=True)
    mesh = make_mesh(1, 1, 2, d=4)
    out = sharded_stereo_pipeline(left[None], right[None], mesh, cfg_f)
    gl = R.rgb_to_grayscale(left, CFG)
    gr = R.rgb_to_grayscale(right, CFG)
    cost = R.cost_volume(gl, gr, CFG.d_min, CFG)
    _, want_dmap, _ = R.guided_filter_wta(gl, cost, CFG.d_min, CFG)
    dmap = np.asarray(out["disparity_left"][0])
    mism = int((dmap != want_dmap).sum())
    assert mism <= want_dmap.size * 2e-4, f"{mism}/{want_dmap.size}"


def test_fused_straddling_disparity_range():
    """Ranges straddling zero make the slice reach (size_d-1) exceed
    max|d|; the px budget must cover it or wrapped roll columns corrupt
    tile interiors (regression for the geometry fix)."""
    import dataclasses

    from stereo_matching_cuda_tpu.ops.pallas_guided import fused_geometry, guided_wta_fused

    cfg_s = dataclasses.replace(CFG, d_min=-8, d_max=8)
    _, px = fused_geometry(cfg_s)
    assert px >= (cfg_s.size_d - 1) + 1 + 2 * (cfg_s.radius + 1)
    g1, g2 = _pair(48, 96, seed=11)
    cost = R.cost_volume(g1, g2, cfg_s.d_min, cfg_s)
    _, want_dmap, _ = R.guided_filter_wta(g1, cost, cfg_s.d_min, cfg_s)
    _, dmap = guided_wta_fused(jnp.asarray(g1), jnp.asarray(g2), cfg_s.d_min, cfg_s)
    dmap = np.asarray(dmap)
    mism = int((dmap != want_dmap).sum())
    assert mism <= max(4, dmap.size * 3e-3), f"{mism}/{dmap.size}"


@pytest.mark.parametrize("shape", [(64, 96), (40, 384)])
def test_dual_view_matches_oracle(shape):
    """The dual-view kernel (shared DMA/derivatives/raw slices, right
    view via cost_R(x,d_r)=cost_L(x+d_r,-d_r) with strict-> descending
    tie rule) must agree with the per-view oracle on both maps."""
    from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused_dual

    g1, g2 = _pair(*shape)
    cost_l = R.cost_volume(g1, g2, CFG.d_min, CFG)
    wb_l, wd_l, _ = R.guided_filter_wta(g1, cost_l, CFG.d_min, CFG)
    cost_r = R.cost_volume(g2, g1, CFG.d_min_right, CFG)
    wb_r, wd_r, _ = R.guided_filter_wta(g2, cost_r, CFG.d_min_right, CFG)
    bl, dl, br, dr = guided_wta_fused_dual(jnp.asarray(g1), jnp.asarray(g2), CFG)
    for got_d, got_b, want_d, want_b, name in [
            (dl, bl, wd_l, wb_l, "left"), (dr, br, wd_r, wb_r, "right")]:
        got_d = np.asarray(got_d)
        mism = int((got_d != want_d).sum())
        assert mism <= max(4, got_d.size * 2e-3), f"{name}: {mism}/{got_d.size}"
        np.testing.assert_allclose(np.asarray(got_b), want_b, atol=2e-3,
                                   rtol=1e-4, err_msg=name)


@pytest.mark.parametrize("impl", ["mxu3", "mxu2", "roll"])
def test_dual_view_y_sum_variants_match_oracle(impl):
    """Every y-window-sum implementation stays in the fast-path
    accuracy class on the DUAL kernel too (cfg.y_sum is the product
    knob the 6 MP / 128-disp configs may select — BENCH.md)."""
    import dataclasses

    from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused_dual

    g1, g2 = _pair(48, 130, seed=9)
    cost_l = R.cost_volume(g1, g2, CFG.d_min, CFG)
    wd_l = R.guided_filter_wta(g1, cost_l, CFG.d_min, CFG)[1]
    cost_r = R.cost_volume(g2, g1, CFG.d_min_right, CFG)
    wd_r = R.guided_filter_wta(g2, cost_r, CFG.d_min_right, CFG)[1]
    cfg = dataclasses.replace(CFG, y_sum=impl)
    _, dl, _, dr = guided_wta_fused_dual(jnp.asarray(g1), jnp.asarray(g2), cfg)
    for got, want, name in [(dl, wd_l, "left"), (dr, wd_r, "right")]:
        mism = int((np.asarray(got) != want).sum())
        assert mism <= max(4, want.size * 2e-3), f"{impl} {name}: {mism}"


def test_dual_view_tsukuba_near_parity(tsukuba):
    from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused_dual

    left, right = tsukuba
    gl = R.rgb_to_grayscale(left, CFG)
    gr = R.rgb_to_grayscale(right, CFG)
    wd_l = R.guided_filter_wta(gl, R.cost_volume(gl, gr, CFG.d_min, CFG),
                               CFG.d_min, CFG)[1]
    wd_r = R.guided_filter_wta(gr, R.cost_volume(gr, gl, CFG.d_min_right, CFG),
                               CFG.d_min_right, CFG)[1]
    _, dl, _, dr = guided_wta_fused_dual(jnp.asarray(gl), jnp.asarray(gr), CFG)
    for got, want, name in [(dl, wd_l, "left"), (dr, wd_r, "right")]:
        mism = int((np.asarray(got) != want).sum())
        assert mism <= want.size * 2e-4, f"{name}: {mism}/{want.size}"


def test_dual_view_straddling_range():
    """Ranges straddling zero chain the roll reach (d_max + |d_min|);
    dual_geometry must budget for it."""
    import dataclasses

    from stereo_matching_cuda_tpu.ops.pallas_guided import (
        dual_geometry, guided_wta_fused_dual)

    cfg_s = dataclasses.replace(CFG, d_min=-8, d_max=8)
    _, px = dual_geometry(cfg_s)
    assert px >= 16 + 1 + 2 * (cfg_s.radius + 1)
    g1, g2 = _pair(48, 96, seed=11)
    wd_l = R.guided_filter_wta(
        g1, R.cost_volume(g1, g2, cfg_s.d_min, cfg_s), cfg_s.d_min, cfg_s)[1]
    wd_r = R.guided_filter_wta(
        g2, R.cost_volume(g2, g1, cfg_s.d_min_right, cfg_s),
        cfg_s.d_min_right, cfg_s)[1]
    _, dl, _, dr = guided_wta_fused_dual(jnp.asarray(g1), jnp.asarray(g2), cfg_s)
    for got, want, name in [(dl, wd_l, "left"), (dr, wd_r, "right")]:
        mism = int((np.asarray(got) != want).sum())
        assert mism <= max(4, want.size * 3e-3), f"{name}: {mism}/{want.size}"


@pytest.mark.parametrize("group", [2, 5, 16])
def test_dual_view_slice_groups_bit_identical(group):
    """Grouping G disparity slices into one lane-concatenated y-sum
    matmul per guided phase is bit-exact (matmul columns are
    independent): every G must reproduce the G=1 outputs EXACTLY,
    including a remainder group (G=5 over 16 slices) and the whole
    d-loop as one group (G=16)."""
    import dataclasses

    from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused_dual

    g1, g2 = _pair(48, 130, seed=7)
    base = guided_wta_fused_dual(jnp.asarray(g1), jnp.asarray(g2), CFG)
    cfg_g = dataclasses.replace(CFG, slice_group=group,
                                vmem_mb=64 if group >= 16 else None)
    got = guided_wta_fused_dual(jnp.asarray(g1), jnp.asarray(g2), cfg_g)
    for a, b, name in zip(base, got, ["best_l", "dmap_l", "best_r", "dmap_r"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"slice_group={group}: {name}")


@pytest.mark.parametrize("y_sum", [None, "roll"])
def test_dual_view_sw_pipeline_bit_identical(y_sum):
    """The software-pipelined dual kernel reorders EMISSION only (next
    slice's cost/x-sums between each y-sum matmul and its consumers,
    WTA updates deferred one slice): the per-slice math and ascending
    update order are unchanged, so outputs must match the unpipelined
    kernel bit-for-bit."""
    import dataclasses

    from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused_dual

    g1, g2 = _pair(48, 130, seed=11)
    cfg0 = dataclasses.replace(CFG, sw_pipeline=False, y_sum=y_sum)
    cfg1 = dataclasses.replace(CFG, sw_pipeline=True, y_sum=y_sum)
    base = guided_wta_fused_dual(jnp.asarray(g1), jnp.asarray(g2), cfg0)
    got = guided_wta_fused_dual(jnp.asarray(g1), jnp.asarray(g2), cfg1)
    for a, b, name in zip(base, got, ["best_l", "dmap_l", "best_r", "dmap_r"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"sw_pipeline: {name}")


def test_dual_view_x_tiled_matches_oracle(monkeypatch):
    """Force (16, 256) tiles on a 64x600 frame (nx=3): the rolled
    right-view slice must stay seamless across x-tile boundaries."""
    import stereo_matching_cuda_tpu.ops.pallas_guided as pg

    monkeypatch.setattr(pg, "_pick_tiles", lambda *a, **k: (16, 256))
    g1, g2 = _pair(64, 600)
    wd_l = R.guided_filter_wta(
        g1, R.cost_volume(g1, g2, CFG.d_min, CFG), CFG.d_min, CFG)[1]
    wd_r = R.guided_filter_wta(
        g2, R.cost_volume(g2, g1, CFG.d_min_right, CFG), CFG.d_min_right, CFG)[1]
    _, dl, _, dr = pg.guided_wta_fused_dual(jnp.asarray(g1), jnp.asarray(g2), CFG)
    for got, want, name in [(dl, wd_l, "left"), (dr, wd_r, "right")]:
        got = np.asarray(got)
        mism = int((got != want).sum())
        assert mism <= want.size * 3e-3, f"{name}: {mism}/{want.size}"
        bad_cols = np.argwhere(got != want)[:, 1]
        near_seam = ((bad_cols >= 252) & (bad_cols <= 260)) | (
            (bad_cols >= 508) & (bad_cols <= 516))
        assert near_seam.sum() <= max(2, 0.2 * len(bad_cols)), name


def test_dual_view_wide_range_fori():
    """size_d > unroll_max takes the dual kernel's fori d-loop branch
    (loop-carried ±1 rolls for both views): both views must stay in the
    fast-path accuracy class vs the oracle on a 64-disparity range."""
    from stereo_matching_cuda_tpu.config import StereoConfig
    from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused_dual

    cfg64 = StereoConfig(d_min=-63, d_max=0)
    g1, g2 = _pair(48, 160)
    wd_l = R.guided_filter_wta(
        g1, R.cost_volume(g1, g2, cfg64.d_min, cfg64), cfg64.d_min, cfg64)[1]
    wd_r = R.guided_filter_wta(
        g2, R.cost_volume(g2, g1, cfg64.d_min_right, cfg64),
        cfg64.d_min_right, cfg64)[1]
    _, dl, _, dr = guided_wta_fused_dual(jnp.asarray(g1), jnp.asarray(g2), cfg64)
    for got, want, name in [(dl, wd_l, "left"), (dr, wd_r, "right")]:
        mism = int((np.asarray(got) != want).sum())
        assert mism <= max(4, want.size * 3e-3), f"{name}: {mism}/{want.size}"


@pytest.mark.parametrize("y_sum", [None, "roll"])
def test_dual_view_fori_bit_identical(y_sum, monkeypatch):
    """The dual fori branch (forced via unroll_max=8 on the default
    16-disparity range — the big-frame strategy shape) performs the
    identical elementary float ops as the unrolled emission, so with
    the tile geometry pinned the outputs must match bit-for-bit."""
    import dataclasses

    import stereo_matching_cuda_tpu.ops.pallas_guided as pg

    monkeypatch.setattr(pg, "_pick_tiles", lambda *a, **k: (16, 128))
    g1, g2 = _pair(48, 130, seed=5)
    cfg0 = dataclasses.replace(CFG, y_sum=y_sum)
    cfg1 = dataclasses.replace(CFG, y_sum=y_sum, unroll_max=8)
    assert CFG.size_d > 8
    base = pg.guided_wta_fused_dual(jnp.asarray(g1), jnp.asarray(g2), cfg0)
    got = pg.guided_wta_fused_dual(jnp.asarray(g1), jnp.asarray(g2), cfg1)
    for a, b, name in zip(base, got, ["best_l", "dmap_l", "best_r", "dmap_r"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"dual fori: {name}")


def test_fused_wide_range_fori_loop():
    """size_d > 32 switches the kernel's d-loop to a fori_loop with an
    incrementally-rolled match image (a 128-way unroll grinds Mosaic
    for tens of minutes)."""
    import dataclasses

    from stereo_matching_cuda_tpu.config import StereoConfig
    from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused

    cfg64 = StereoConfig(d_min=-63, d_max=0)
    g1, g2 = _pair(48, 160, seed=3)
    cost = R.cost_volume(g1, g2, cfg64.d_min, cfg64)
    _, want_dmap, _ = R.guided_filter_wta(g1, cost, cfg64.d_min, cfg64)
    _, dmap = guided_wta_fused(jnp.asarray(g1), jnp.asarray(g2), cfg64.d_min, cfg64)
    dmap = np.asarray(dmap)
    mism = int((dmap != want_dmap).sum())
    assert mism <= max(4, dmap.size * 2e-3), f"{mism}/{dmap.size}"


@pytest.mark.parametrize("impl", ["mxu", "roll", "mxu3"])
def test_fused_fori_forced_on_default_range(impl):
    """cfg.unroll_max below size_d forces the fori branch on the
    DEFAULT 16-disparity range — the big-frame strategy candidate
    (scripts/r2_6mp_fori.py): both views via the runtime-dmin kernel
    must stay in the fast-path accuracy class, for every y-sum impl."""
    import dataclasses

    from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused

    cfg = dataclasses.replace(CFG, unroll_max=8, y_sum=impl)
    assert cfg.size_d > 8
    g1, g2 = _pair(48, 130, seed=13)
    for gl, gr, dmin in [(g1, g2, cfg.d_min), (g2, g1, cfg.d_min_right)]:
        cost = R.cost_volume(gl, gr, dmin, cfg)
        _, want_dmap, _ = R.guided_filter_wta(gl, cost, dmin, cfg)
        _, dmap = guided_wta_fused(jnp.asarray(gl), jnp.asarray(gr), dmin, cfg)
        dmap = np.asarray(dmap)
        mism = int((dmap != want_dmap).sum())
        assert mism <= max(4, dmap.size * 2e-3), \
            f"{impl} dmin={dmin}: {mism}/{dmap.size}"


def test_fused_batched_equals_per_frame():
    """(B,H,W) batched single-view kernel == per-frame calls (the batch
    rides the pallas grid; sequence mode depends on this)."""
    from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused

    pairs = [_pair(40, 96, seed=s) for s in (1, 2, 3)]
    g1 = jnp.asarray(np.stack([p[0] for p in pairs]))
    g2 = jnp.asarray(np.stack([p[1] for p in pairs]))
    bb, bd = guided_wta_fused(g1, g2, CFG.d_min, CFG)
    assert bb.shape == (3, 40, 96)
    for i, (a, b) in enumerate(pairs):
        fb, fd = guided_wta_fused(jnp.asarray(a), jnp.asarray(b), CFG.d_min, CFG)
        np.testing.assert_array_equal(np.asarray(bd[i]), np.asarray(fd), err_msg=f"frame {i}")
        np.testing.assert_array_equal(np.asarray(bb[i]), np.asarray(fb))


def test_dual_batched_equals_per_frame():
    from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused_dual

    pairs = [_pair(40, 96, seed=s) for s in (4, 5)]
    g1 = jnp.asarray(np.stack([p[0] for p in pairs]))
    g2 = jnp.asarray(np.stack([p[1] for p in pairs]))
    outs = guided_wta_fused_dual(g1, g2, CFG)
    for i, (a, b) in enumerate(pairs):
        ref = guided_wta_fused_dual(jnp.asarray(a), jnp.asarray(b), CFG)
        for j in range(4):
            np.testing.assert_array_equal(
                np.asarray(outs[j][i]), np.asarray(ref[j]),
                err_msg=f"frame {i} out {j}")


def test_pick_tiles_fori_branch_gets_bigger_tiles():
    """The fori d-loop branch (size_d > unroll_max) keeps far fewer ext
    tiles live than the unrolled branch, so the picker must afford it
    bigger tiles (less halo recompute) at the same VMEM budget, and the
    unroll/VMEM knobs must keep raising a clear error when nothing
    fits."""
    import dataclasses

    import stereo_matching_cuda_tpu.ops.pallas_guided as pg

    wide = dataclasses.replace(CFG, d_min=-127, d_max=0)   # fori branch
    assert wide.size_d > pg.unroll_max(wide)
    assert CFG.size_d <= pg.unroll_max(CFG)                # unrolled
    assert pg._n_live(wide) < pg._n_live(CFG)

    hy, px = pg.fused_geometry(CFG)
    budget = pg._vmem_params(CFG)[0]
    sh_u, tw_u = pg._pick_tiles(1992, 3008, px, hy, vmem_budget=budget,
                                n_live=pg._n_live(CFG))
    sh_f, tw_f = pg._pick_tiles(1992, 3008, px, hy, vmem_budget=budget,
                                n_live=pg._n_live(
                                    dataclasses.replace(CFG, unroll_max=8)))
    # bigger tiles = strictly less halo overhead per retained pixel
    ovh = lambda sh, tw: ((sh + 2 * hy) *
                          ((tw + 2 * px + 127) // 128 * 128)) / (sh * tw)
    assert ovh(sh_f, tw_f) < ovh(sh_u, tw_u)

    with pytest.raises(ValueError, match="VMEM budget"):
        pg._pick_tiles(4096, 8192, 2000, hy, vmem_budget=budget)

    # under 'd' sharding the kernel unrolls the LOCAL slice count, so
    # the estimate must follow n_slices, not the global cfg.size_d —
    # a d-sharded wide range runs UNROLLED per shard and needs the
    # larger (smaller-tile) unrolled estimate
    assert pg._n_live(wide, n_slices=8) == pg._N_LIVE["mxu"]
    assert pg._n_live(wide, n_slices=64) == pg._N_LIVE_FORI["mxu"]


@pytest.mark.parametrize("impl", ["mxu", "roll", "mxu3"])
def test_fused_fori_sw_pipeline_matches_plain(impl):
    """The software-pipelined fori emission (sw_pipeline=True with
    size_d > unroll_max) runs the same per-slice math in the same
    ascending WTA order as the plain fori loop; only the trace order
    skews (phase-1 of slice s issues alongside phase-2 of slice s-1),
    which lets the compiler contract FMAs differently — best costs may
    differ by ~1 ULP and WTA near-ties may flip (the documented
    fast-path accuracy class), nothing more."""
    import dataclasses

    from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused

    g1, g2 = _pair(48, 130, seed=21)
    cfg0 = dataclasses.replace(CFG, unroll_max=8, y_sum=impl,
                               sw_pipeline=False)
    cfg1 = dataclasses.replace(CFG, unroll_max=8, y_sum=impl,
                               sw_pipeline=True)
    for gl, gr, dmin in [(g1, g2, CFG.d_min), (g2, g1, CFG.d_min_right)]:
        b0, d0 = guided_wta_fused(jnp.asarray(gl), jnp.asarray(gr), dmin, cfg0)
        b1, d1 = guided_wta_fused(jnp.asarray(gl), jnp.asarray(gr), dmin, cfg1)
        np.testing.assert_allclose(np.asarray(b0), np.asarray(b1),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"{impl} best dmin={dmin}")
        mism = int((np.asarray(d0) != np.asarray(d1)).sum())
        assert mism <= max(4, d0.size * 2e-3), \
            f"{impl} dmin={dmin}: {mism}/{d0.size} label flips"


def test_fused_fori_sw_pipeline_wide_range():
    """Pipelined fori on a genuinely wide range (64 disparities) stays
    in the same accuracy class as the plain fori emission."""
    from stereo_matching_cuda_tpu.config import StereoConfig
    from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused

    g1, g2 = _pair(48, 160, seed=22)
    cfg0 = StereoConfig(d_min=-63, d_max=0, sw_pipeline=False)
    cfg1 = StereoConfig(d_min=-63, d_max=0, sw_pipeline=True)
    b0, d0 = guided_wta_fused(jnp.asarray(g1), jnp.asarray(g2), -63, cfg0)
    b1, d1 = guided_wta_fused(jnp.asarray(g1), jnp.asarray(g2), -63, cfg1)
    np.testing.assert_allclose(np.asarray(b0), np.asarray(b1),
                               rtol=1e-6, atol=1e-6)
    mism = int((np.asarray(d0) != np.asarray(d1)).sum())
    assert mism <= max(4, d0.size * 2e-3), f"{mism}/{d0.size} label flips"
