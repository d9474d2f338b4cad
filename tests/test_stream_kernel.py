"""Streaming-y (strip-carry) fused kernel (ops/pallas_guided.py,
_make_stream_kernel): grid programs walk each x-column top-to-bottom
carrying the last A rows of every per-slice x-window sum in persistent
VMEM scratch — zero y-halo recompute, output lagging input by 2R rows.
Interpret mode on CPU; the same kernel compiles via Mosaic on TPU."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
import pytest

from stereo_matching_cuda_tpu import reference as R
from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG

CFG = dataclasses.replace(DEFAULT_CONFIG, stream=True)


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call

        def interp(*a, **k):
            k.setdefault("interpret", True)
            return orig(*a, **k)

        monkeypatch.setattr(pl, "pallas_call", interp)
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


def _oracle(g1, g2, cfg, dmin=None):
    dmin = cfg.d_min if dmin is None else dmin
    cost = R.cost_volume(g1, g2, dmin, cfg)
    return R.guided_filter_wta(g1, cost, dmin, cfg)[:2]


def _fused(g1, g2, cfg, dmin=None):
    import stereo_matching_cuda_tpu.ops.pallas_guided as pg

    dmin = cfg.d_min if dmin is None else dmin
    b, d = pg.guided_wta_fused.__wrapped__(
        jnp.asarray(g1), jnp.asarray(g2), dmin, cfg)
    return np.asarray(b), np.asarray(d)


def test_stream_unrolled_roll_sh_cap():
    """Unrolled streaming emissions with roll y-sums cap the strip
    height at 112 (Mosaic compile crash above it — BENCH.md r4);
    mxu y-sums and the fori branch are uncapped."""
    import stereo_matching_cuda_tpu.ops.pallas_guided as pg

    roll = dataclasses.replace(CFG, y_sum="roll", vmem_mb=32)
    assert pg._stream_sh_cap(roll) == 112
    assert pg._stream_sh_cap(dataclasses.replace(CFG, y_sum="mxu")) is None
    fori = dataclasses.replace(roll, unroll_max=8)
    assert pg._stream_sh_cap(fori) is None
    # the picker respects the cap: at vmem32 the uncapped Tsukuba pick
    # is (168, 384); capped it must stay <= 112
    _, px = pg.dual_geometry(roll)
    sh, _ = pg._pick_tiles_stream(288, 384, px, roll.radius, roll.size_d,
                                  pg._vmem_params(roll)[0],
                                  pg._dual_stream_n_live(roll),
                                  carry_bufs=8 * roll.size_d + 4,
                                  max_sh=pg._stream_sh_cap(roll))
    assert sh <= 112


@pytest.mark.parametrize("shape", [(64, 96), (40, 384), (33, 130)])
def test_stream_matches_oracle(shape):
    g1, g2 = _pair(*shape)
    want_best, want_dmap = _oracle(g1, g2, CFG)
    best, dmap = _fused(g1, g2, CFG)
    mism = int((dmap != want_dmap).sum())
    assert mism <= max(4, dmap.size * 2e-3), f"{mism}/{dmap.size}"
    np.testing.assert_allclose(best, want_best, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("impl", ["roll", "mxu3", "mxu2"])
def test_stream_y_sum_variants(impl):
    cfg = dataclasses.replace(CFG, y_sum=impl)
    g1, g2 = _pair(48, 130, seed=5)
    _, want_dmap = _oracle(g1, g2, cfg)
    _, dmap = _fused(g1, g2, cfg)
    mism = int((dmap != want_dmap).sum())
    assert mism <= max(4, dmap.size * 2e-3), f"{impl}: {mism}"


def test_stream_fori_bit_identical_to_unrolled():
    """The fori branch's incremental ±1 rolls compose to the unrolled
    branch's direct rolls — outputs must be bit-identical."""
    g1, g2 = _pair(64, 96, seed=7)
    b_u, d_u = _fused(g1, g2, CFG)
    cfg_f = dataclasses.replace(CFG, unroll_max=4)
    b_f, d_f = _fused(g1, g2, cfg_f)
    np.testing.assert_array_equal(d_u, d_f)
    np.testing.assert_array_equal(b_u, b_f)


def test_stream_multi_strip_carry(monkeypatch):
    """Force short strips (sh=32) on a 160-row frame so 6+ strips chain
    through the carry scratch — mismatches must be uniform near-ties,
    not clustered at the strip seams (rows 32, 64, ...)."""
    import stereo_matching_cuda_tpu.ops.pallas_guided as pg

    monkeypatch.setattr(pg, "_pick_tiles_stream", lambda *a, **k: (32, 160))
    g1, g2 = _pair(160, 160, seed=13)
    want_best, want_dmap = _oracle(g1, g2, CFG)
    best, dmap = _fused(g1, g2, CFG)
    mism = int((dmap != want_dmap).sum())
    assert mism <= max(6, dmap.size * 3e-3), f"{mism}/{dmap.size}"
    np.testing.assert_allclose(best, want_best, atol=2e-3, rtol=1e-4)
    bad_rows = np.argwhere(dmap != want_dmap)[:, 0]
    near_seam = (np.abs((bad_rows[:, None] % 32) - np.array([[0, 31]]))
                 <= 1).any(1)
    assert near_seam.sum() <= max(2, 0.3 * len(bad_rows)), (
        f"{near_seam.sum()}/{len(bad_rows)} mismatches at strip seams")


def test_stream_x_tiled_seams(monkeypatch):
    """nx > 1: each column restarts its carry at ty == 0; x-tile seams
    must stay seamless."""
    import stereo_matching_cuda_tpu.ops.pallas_guided as pg

    monkeypatch.setattr(pg, "_pick_tiles_stream", lambda *a, **k: (48, 256))
    g1, g2 = _pair(96, 600, seed=17)
    _, want_dmap = _oracle(g1, g2, CFG)
    _, dmap = _fused(g1, g2, CFG)
    mism = int((dmap != want_dmap).sum())
    assert mism <= dmap.size * 3e-3, f"{mism}/{dmap.size}"
    bad_cols = np.argwhere(dmap != want_dmap)[:, 1]
    near_seam = ((bad_cols >= 252) & (bad_cols <= 260)) | (
        (bad_cols >= 508) & (bad_cols <= 516))
    assert near_seam.sum() <= max(2, 0.2 * len(bad_cols))


def test_stream_right_view():
    g1, g2 = _pair(48, 80, seed=9)
    _, want_dmap = _oracle(g2, g1, CFG, CFG.d_min_right)
    _, dmap = _fused(g2, g1, CFG, CFG.d_min_right)
    mism = int((dmap != want_dmap).sum())
    assert mism <= max(4, dmap.size * 2e-3)


def test_stream_batched_matches_per_frame():
    """A leading frame axis runs every frame through one grid; each
    frame's column restarts the carry (fb changes ⇒ ty == 0 first)."""
    import stereo_matching_cuda_tpu.ops.pallas_guided as pg

    frames = [_pair(48, 96, seed=s) for s in (1, 2, 3)]
    g1 = np.stack([f[0] for f in frames])
    g2 = np.stack([f[1] for f in frames])
    bb, db = pg.guided_wta_fused.__wrapped__(
        jnp.asarray(g1), jnp.asarray(g2), CFG.d_min, CFG)
    for i, (f1, f2) in enumerate(frames):
        b1, d1 = _fused(f1, f2, CFG)
        np.testing.assert_array_equal(np.asarray(db[i]), d1)
        np.testing.assert_array_equal(np.asarray(bb[i]), b1)


def test_stream_straddling_disparity_range():
    cfg = dataclasses.replace(CFG, d_min=-8, d_max=8)
    g1, g2 = _pair(48, 96, seed=11)
    _, want_dmap = _oracle(g1, g2, cfg)
    _, dmap = _fused(g1, g2, cfg)
    mism = int((dmap != want_dmap).sum())
    assert mism <= max(4, dmap.size * 3e-3), f"{mism}/{dmap.size}"


@pytest.mark.skipif(jax.default_backend() == "tpu", reason="CPU interpret only")
def test_stream_tsukuba_near_parity(tsukuba):
    left, right = tsukuba
    gl = R.rgb_to_grayscale(left, CFG)
    gr = R.rgb_to_grayscale(right, CFG)
    _, want_dmap = _oracle(gl, gr, CFG)
    _, dmap = _fused(gl, gr, CFG)
    mism = int((dmap != want_dmap).sum())
    assert mism <= want_dmap.size * 2e-4, f"{mism}/{want_dmap.size}"


def test_stream_dma_buffer_bit_identical(monkeypatch):
    """cfg.dma_buffer double-buffers the input-tile DMA across grid
    programs (two-slot input scratch; program i starts program i+1's
    copies before its own compute — see _make_stream_kernel).  Only
    the DMA schedule moves, so outputs are BIT-identical to the
    single-buffer kernel — across multi-strip columns, x-tile seams,
    both d-loop branches, and the batched grid (where the prefetch
    crosses frame boundaries)."""
    import stereo_matching_cuda_tpu.ops.pallas_guided as pg

    monkeypatch.setattr(pg, "_pick_tiles_stream", lambda *a, **k: (32, 256))
    g1, g2 = _pair(96, 600, seed=21)
    for kw in ({}, {"unroll_max": 4}):        # unrolled + fori branches
        cfg0 = dataclasses.replace(CFG, dma_buffer=False, **kw)
        cfg1 = dataclasses.replace(cfg0, dma_buffer=True)
        b0, d0 = _fused(g1, g2, cfg0)
        b1, d1 = _fused(g1, g2, cfg1)
        np.testing.assert_array_equal(d0, d1)
        np.testing.assert_array_equal(b0, b1)
    frames = [_pair(48, 96, seed=s) for s in (4, 5)]
    gb1 = np.stack([f[0] for f in frames])
    gb2 = np.stack([f[1] for f in frames])
    monkeypatch.setattr(pg, "_pick_tiles_stream", lambda *a, **k: (24, 96))
    cfg0 = dataclasses.replace(CFG, dma_buffer=False)
    cfg1 = dataclasses.replace(cfg0, dma_buffer=True)
    out0 = pg.guided_wta_fused.__wrapped__(
        jnp.asarray(gb1), jnp.asarray(gb2), CFG.d_min, cfg0)
    out1 = pg.guided_wta_fused.__wrapped__(
        jnp.asarray(gb1), jnp.asarray(gb2), CFG.d_min, cfg1)
    for t0, t1 in zip(out0, out1):
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


def _dual(g1, g2, cfg):
    import stereo_matching_cuda_tpu.ops.pallas_guided as pg

    outs = pg.guided_wta_fused_dual.__wrapped__(
        jnp.asarray(g1), jnp.asarray(g2), cfg)
    return [np.asarray(t) for t in outs]


@pytest.mark.parametrize("shape", [(64, 96), (40, 384)])
def test_dual_stream_matches_oracle(shape):
    g1, g2 = _pair(*shape)
    wb_l, wd_l = _oracle(g1, g2, CFG)
    wb_r, wd_r = _oracle(g2, g1, CFG, CFG.d_min_right)
    bl, dl, br, dr = _dual(g1, g2, CFG)
    for got_d, got_b, want_d, want_b, name in [
            (dl, bl, wd_l, wb_l, "left"), (dr, br, wd_r, wb_r, "right")]:
        mism = int((got_d != want_d).sum())
        assert mism <= max(4, got_d.size * 2e-3), f"{name}: {mism}"
        np.testing.assert_allclose(got_b, want_b, atol=2e-3, rtol=1e-4,
                                   err_msg=name)


@pytest.mark.parametrize("impl", ["roll", "mxu3"])
def test_dual_stream_y_sum_variants(impl):
    cfg = dataclasses.replace(CFG, y_sum=impl)
    g1, g2 = _pair(48, 130, seed=9)
    _, wd_l = _oracle(g1, g2, cfg)
    _, wd_r = _oracle(g2, g1, cfg, cfg.d_min_right)
    _, dl, _, dr = _dual(g1, g2, cfg)
    for got, want, name in [(dl, wd_l, "left"), (dr, wd_r, "right")]:
        mism = int((got != want).sum())
        assert mism <= max(4, want.size * 2e-3), f"{impl} {name}: {mism}"


def test_dual_stream_fori_matches_oracle():
    """The dual streaming fori branch (counter-rolled right view) must
    stay in the fast-path class too."""
    cfg = dataclasses.replace(CFG, unroll_max=4)
    g1, g2 = _pair(64, 96, seed=7)
    _, wd_l = _oracle(g1, g2, cfg)
    _, wd_r = _oracle(g2, g1, cfg, cfg.d_min_right)
    _, dl, _, dr = _dual(g1, g2, cfg)
    for got, want, name in [(dl, wd_l, "left"), (dr, wd_r, "right")]:
        mism = int((got != want).sum())
        assert mism <= max(4, want.size * 2e-3), f"{name}: {mism}"


def test_dual_stream_multi_strip(monkeypatch):
    """Forced short strips chain both views' carries; strip seams must
    stay seamless on BOTH maps."""
    import stereo_matching_cuda_tpu.ops.pallas_guided as pg

    monkeypatch.setattr(pg, "_pick_tiles_stream", lambda *a, **k: (32, 160))
    g1, g2 = _pair(160, 160, seed=13)
    _, wd_l = _oracle(g1, g2, CFG)
    _, wd_r = _oracle(g2, g1, CFG, CFG.d_min_right)
    _, dl, _, dr = _dual(g1, g2, CFG)
    for got, want, name in [(dl, wd_l, "left"), (dr, wd_r, "right")]:
        mism = int((got != want).sum())
        assert mism <= max(6, want.size * 3e-3), f"{name}: {mism}"
        bad_rows = np.argwhere(got != want)[:, 0]
        near_seam = (np.abs((bad_rows[:, None] % 32)
                            - np.array([[0, 31]])) <= 1).any(1)
        assert near_seam.sum() <= max(2, 0.3 * len(bad_rows)), name


def test_dual_stream_batched_matches_per_frame():
    import stereo_matching_cuda_tpu.ops.pallas_guided as pg

    frames = [_pair(48, 96, seed=s) for s in (1, 2)]
    g1 = np.stack([f[0] for f in frames])
    g2 = np.stack([f[1] for f in frames])
    outs = pg.guided_wta_fused_dual.__wrapped__(
        jnp.asarray(g1), jnp.asarray(g2), CFG)
    for i, (f1, f2) in enumerate(frames):
        single = _dual(f1, f2, CFG)
        for bi, si in zip(outs, single):
            np.testing.assert_array_equal(np.asarray(bi[i]), si)


def test_stream_inside_shard_map(tsukuba):
    """Streaming kernel under spatial sharding: the local entry places
    the halo'd ext tile at padded row 2A - halo_y and the carry-zero
    init stays correct because kept q rows reach at most 2R above the
    first new row."""
    from stereo_matching_cuda_tpu.parallel import make_mesh, sharded_stereo_pipeline

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    left, right = tsukuba
    cfg_f = dataclasses.replace(CFG, fused=True)
    mesh = make_mesh(1, 2, 2)
    out = sharded_stereo_pipeline(left[None], right[None], mesh, cfg_f)
    gl = R.rgb_to_grayscale(left, CFG)
    gr = R.rgb_to_grayscale(right, CFG)
    _, want_dmap = _oracle(gl, gr, CFG)
    dmap = np.asarray(out["disparity_left"][0])
    mism = int((dmap != want_dmap).sum())
    assert mism <= want_dmap.size * 2e-4, f"{mism}/{want_dmap.size}"


def test_stream_disparity_sharded(tsukuba):
    from stereo_matching_cuda_tpu.parallel import make_mesh, sharded_stereo_pipeline

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    left, right = tsukuba
    cfg_f = dataclasses.replace(CFG, fused=True)
    mesh = make_mesh(1, 1, 2, d=4)
    out = sharded_stereo_pipeline(left[None], right[None], mesh, cfg_f)
    gl = R.rgb_to_grayscale(left, CFG)
    gr = R.rgb_to_grayscale(right, CFG)
    _, want_dmap = _oracle(gl, gr, CFG)
    dmap = np.asarray(out["disparity_left"][0])
    mism = int((dmap != want_dmap).sum())
    assert mism <= want_dmap.size * 2e-4, f"{mism}/{want_dmap.size}"


@pytest.mark.parametrize("tile_hw,batched,stream", [
    ((96, 320), True, False), ((96, 320), True, True),
    ((77, 183), False, False), ((77, 183), False, True),
    ((96, 320), False, False),
])
def test_local_entry_mosaic_alignment(monkeypatch, tile_hw, batched, stream):
    """Real-Mosaic requirement interpret mode cannot check (r4 hardware
    bug, r4_shard_tpu): every HBM image handed to pallas_call must be
    (8,128)-tiling-aligned, and the kernel's DMA x-start tx*tw+lead
    must be 128-divisible.  Intercept pallas_call and assert on the
    shapes the local entry actually builds."""
    import jax.experimental.pallas as pl
    import stereo_matching_cuda_tpu.ops.pallas_guided as pg

    seen = []
    orig = pl.pallas_call

    def spy(kernel, *a, **k):
        inner = orig(kernel, *a, **{**k, "interpret": True})

        def run(*args):
            for x in args:
                if hasattr(x, "shape") and x.ndim >= 2 and x.dtype == jnp.float32:
                    seen.append(x.shape)
            return inner(*args)

        return run

    monkeypatch.setattr(pl, "pallas_call", spy)
    th, tw_ = tile_hw
    cfg = dataclasses.replace(DEFAULT_CONFIG, stream=stream)
    halo_y, px = pg.fused_geometry(cfg)
    g = np.random.default_rng(0).integers(
        0, 255, (th + 2 * halo_y, tw_ + 2 * px), np.uint8).astype(np.float32)
    if batched:
        g = g[None]
    leads = []
    if stream:
        orig_tiles = pg._stream_tiles

        def spy_tiles(*a, **k):
            leads.append(k.get("lead", a[12] if len(a) > 12 else 0))
            return orig_tiles(*a, **k)

        monkeypatch.setattr(pg, "_stream_tiles", spy_tiles)
    else:
        orig_tiles = pg._fused_tiles

        def spy_tiles(*a, **k):
            leads.append(k.get("lead", a[13] if len(a) > 13 else 0))
            return orig_tiles(*a, **k)

        monkeypatch.setattr(pg, "_fused_tiles", spy_tiles)
    pg.guided_wta_fused_local(jnp.asarray(g), jnp.asarray(g), 0, 0,
                              cfg.d_min, cfg, th * 2, tw_ * 2, th, tw_)
    imgs = [s for s in seen if s[-1] > 256]       # the two prepped images
    assert imgs, "no prepped HBM images captured"
    for s in imgs:
        assert s[-2] % 8 == 0 and s[-1] % 128 == 0, s
    # the kernel DMA x-start tx*tw+lead must be provably 128-divisible
    # (second hardware failure mode, r4_shard_tpu) — tw candidates are
    # 128-multiples, so lead must be too
    assert leads and all(ld % 128 == 0 for ld in leads), leads
