"""End-to-end stereo pipeline — one jitted XLA graph per frame.

Mirrors the reference driver main() (main.cu:37-214): grayscale both
views → cost volumes (left d∈[D_MIN,D_MAX], right d∈[-D_MAX,-D_MIN]) →
guided-filter aggregation + WTA per view → LR consistency check on the
left map → occlusion fill.  Unlike the reference (1,533 host↔device
copies per frame), the whole frame is a single device computation; the
only transfers are the two input images in and the requested outputs
out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .config import StereoConfig, DEFAULT_CONFIG
from . import ops


def use_fused_path(cfg: StereoConfig, full_outputs: bool = False) -> bool:
    """Whether the pipeline runs the fused Pallas kernel: requires a
    Mosaic (TPU) backend; "auto" also skips it in parity mode and when
    intermediates are requested."""
    return (
        not full_outputs
        and jax.default_backend() == "tpu"
        and (cfg.fused is True or (cfg.fused == "auto" and not cfg.exact_integral))
    )


def use_fused_post(cfg: StereoConfig, full_outputs: bool = False) -> bool:
    """Whether the post stage (LR check + occlusion fill) runs the
    fused Pallas kernel (ops/pallas_post.py).  Auto follows the fused
    matching path; bit-identical to the XLA post stage either way."""
    if cfg.post_fused is not None:
        return cfg.post_fused
    return use_fused_path(cfg, full_outputs)


def _post(dmap_l, dmap_r, cfg: StereoConfig, full_outputs: bool = False):
    """(occlusion map, filled map) — fused kernel or XLA ops."""
    if use_fused_post(cfg, full_outputs):
        from .ops.pallas_post import lr_fill_fused

        return lr_fill_fused(dmap_l, dmap_r, cfg)
    occ = ops.detect_occlusion(dmap_l, dmap_r, cfg.d_occlusion, cfg)
    return occ, ops.fill_occlusion(occ, cfg.v_min, cfg)


def use_dual_view(cfg: StereoConfig) -> bool:
    """Whether the fused path runs the dual-view kernel (both views in
    one Mosaic pass) vs two per-view kernel calls.  Single source of
    truth for the eligibility rule — the profiler keys off it too."""
    from .ops.pallas_guided import unroll_max

    return cfg.dual_view is True or (
        cfg.dual_view == "auto" and cfg.size_d <= unroll_max(cfg))


def _match(gl, gr, cfg: StereoConfig, full_outputs: bool):
    """The matching stage (cost + guided aggregation + WTA, both
    views), shared by the composed and staged pipelines.  Returns
    (best_l, dmap_l, best_r, dmap_r, mean_l, mean_r, cost0_l, cost0_r)
    — the last four are None unless ``full_outputs`` on the unfused
    path."""
    if use_fused_path(cfg, full_outputs):
        from .ops.pallas_guided import guided_wta_fused, guided_wta_fused_dual

        if use_dual_view(cfg):
            best_l, dmap_l, best_r, dmap_r = guided_wta_fused_dual(gl, gr, cfg)
        else:
            best_l, dmap_l = guided_wta_fused(gl, gr, cfg.d_min, cfg)
            best_r, dmap_r = guided_wta_fused(gr, gl, cfg.d_min_right, cfg)
        return best_l, dmap_l, best_r, dmap_r, None, None, None, None
    cost_l = ops.cost_volume(gl, gr, cfg.d_min, cfg)
    cost_r = ops.cost_volume(gr, gl, cfg.d_min_right, cfg)
    best_l, dmap_l, mean_l = ops.guided_filter_wta(gl, cost_l, cfg.d_min, cfg)
    best_r, dmap_r, mean_r = ops.guided_filter_wta(gr, cost_r, cfg.d_min_right, cfg)
    if not full_outputs:
        return best_l, dmap_l, best_r, dmap_r, None, None, None, None
    return best_l, dmap_l, best_r, dmap_r, mean_l, mean_r, cost_l[0], cost_r[0]


@functools.partial(jax.jit, static_argnames=("cfg", "full_outputs"))
def stereo_pipeline(
    rgb_left: jax.Array,
    rgb_right: jax.Array,
    cfg: StereoConfig = DEFAULT_CONFIG,
    full_outputs: bool = False,
) -> dict:
    """uint8 (H,W,C) ×2 → dict of outputs.

    Always returns disparity_left/right, occlusion, occlusion_filled;
    with ``full_outputs`` also the intermediates the reference writes as
    PNGs (gray, mean, best_cost, cost slice 0) — main.cu:162-181.
    """
    cfg = effective_config(cfg, rgb_left.shape[0], rgb_left.shape[1])
    gl = ops.rgb_to_grayscale(rgb_left, cfg)
    gr = ops.rgb_to_grayscale(rgb_right, cfg)
    best_l, dmap_l, best_r, dmap_r, mean_l, mean_r, c0_l, c0_r = _match(
        gl, gr, cfg, full_outputs)
    occ, filled = _post(dmap_l, dmap_r, cfg, full_outputs)
    out = {
        "disparity_left": dmap_l,
        "disparity_right": dmap_r,
        "occlusion": occ,
        "occlusion_filled": filled,
    }
    if full_outputs:
        out.update(
            gray_left=gl, gray_right=gr,
            mean_left=mean_l, mean_right=mean_r,
            best_cost_left=best_l, best_cost_right=best_r,
            cost_left_s0=c0_l, cost_right_s0=c0_r,
        )
    return out


# Above this many pixels the composed one-jit module hits a
# pathological XLA compile on the TPU backend (>50 min at 6 MP while
# the stages alone compile in ~153 s — BENCH.md); the pipeline then
# runs the stages as separate executables chained at the Python level.
_STAGED_PIXELS = 1 << 21

# Big-frame kernel strategy: the analytic roofline flips from
# VPU-bound at Tsukuba scale (dual unrolled kernel + mxu y-sums win)
# to MXU-limited at multi-MP scale, where the fori-branch single-view
# kernels afford far bigger tiles (scripts/roofline.py, BENCH.md).
# Hardware-validated (scripts/r2_6mp_fori.py, r2_3mp_decider.py,
# r2_midsize_decider.py, r2_small_decider.py, r2_1mp_band.py):
# single-view fori + roll y-sums beats the dual unrolled kernel at
# every probed size above Tsukuba scale — 0.25 MP 1.07 vs 1.95,
# 0.5 MP 2.51 vs 3.58, 0.98 MP 4.61 vs 5.92, 1.5 MP 6.08 vs 7.90,
# 2.1 MP 10.3 vs 11.8, 3 MP 12.5 vs 18.0, 6 MP 24.3 vs 31.8 ms/frame
# (one 896×1152 shape measured a noise-level dual win, 5.23 vs 5.36)
# — while the dual unrolled kernel stays the clear winner at Tsukuba
# (0.649 vs 1.092).  Frames at or above _STRATEGY_PIXELS whose kernel
# knobs are all on auto/default get these overrides.  Only applies
# where the dual kernel would otherwise run (size_d within the unroll
# threshold); wide-D configs already run the fori branch with the
# measured band-restricted mxu default.
_BIG_STRATEGY: dict | None = {"unroll_max": 8, "y_sum": "roll"}

# Area gate for _BIG_STRATEGY: between Tsukuba (110,592 px, dual wins
# 0.649 vs 1.092) and the smallest probed fori win (512×512 =
# 262,144 px, 1.07 vs 1.95).
_STRATEGY_PIXELS = 200_000

# Auto VMEM budgets (MiB) for staged-scale frames on the fori kernel
# branch.  Round-3 finding (scripts/r3_bigtile{,2}.py, BENCH.md): the
# kernel runs at the speed of the work it issues, so bigger tiles =
# flatter halo-recompute ratios = direct wins — 6 MP 24.6 → 20.3 ms at
# vmem64, 5.9 MP/128 d 303 → 163 ms at vmem96+roll — and the fori
# branch Mosaic-compiles these tiles in 10-63 s (it is the UNROLLED
# emission whose big-strip compiles take ~30 min, which is why this
# only applies when the kernel takes the fori branch).  Measured
# saturation bounds the budgets: 6 MP at 96 MiB is no better than 64
# (20.7 vs 20.3; fewer, larger programs stop paying) and 128 d at
# 120 MiB regresses hard (200 vs 171 — the VMEM edge).
_BIG_VMEM_MB: int | None = 64      # disparity counts within the unroll cap
_WIDE_VMEM_MB: int | None = 96     # wide ranges (size_d > _UNROLL_MAX)

# Streaming-y strip-carry kernel default: area at or above which
# cfg.stream=None resolves to True.  Round-4 hardware decider
# (scripts/r4_stream{,2,3}.py, r4_decider.py — BENCH.md): the stream
# kernel removes the y-halo recompute and wins every probe at or above
# 512x512 — 512² 0.89 vs 1.05, 704×768 1.40 vs 2.74, 1 MP 4.62 vs
# 6.27, 3 MP 9.36 vs 9.89, 6 MP 17.87 vs 20.26, 5.9 MP/128 d 148.8 vs
# 163.4 ms — with fori-branch compile times (3-24 s).  None disables.
_STREAM_PIXELS: int | None = _STRATEGY_PIXELS

# Sub-200k-px (Tsukuba-class) strategy, round 4 (scripts/r4_tsufori.py
# — BENCH.md): the single-view FORI streaming kernel at vmem32 picks a
# single full-height strip ((336,384) on Tsukuba) and measured
# 0.383 ms/frame (2,613 fps) vs 0.582 for the previous non-stream dual
# unrolled default IN THE SAME PROCESS — while its chain executables
# Mosaic-compile in ~6 s vs ~150 s.  Strictly better on both axes, so
# it is the default; the dual fori stream measured 0.416-0.422, dual
# fori mxu 0.488, and the old unrolled-roll `--fast` profile 0.401-
# 0.449 behind a 272 s compile.  unroll_max=8 forces the fori branch
# (and thereby resolves dual_view "auto" to the two per-view calls).
_SMALL_STRATEGY: dict | None = {
    "unroll_max": 8, "y_sum": "roll", "vmem_mb": 32, "stream": True}

# Wide-range streaming frames take vmem128 (r4_decider: 148.8 ms at
# (128,1536) vs 159.8 at vmem96 — the old kernel's 120 MiB VMEM edge
# does not bind the streaming working set).
_WIDE_STREAM_VMEM_MB: int | None = 128

# Mid-band (0.4-2 MP) streaming frames take vmem32 (r4_midvmem:
# 704x768 1.11 vs 1.77 ms, 896x1152 2.65 vs 4.06, 1 MP 4.92 vs 5.42 —
# fori-class compiles; 512x512 measured best at the 16 MiB default so
# the gate sits above it).  None disables.
_MID_STREAM_VMEM_MB: int | None = 32
_MID_VMEM_PIXELS = 400_000

# WIDE-D mid-band (r5_midwide, 768x1280 structured frame): D=64 at
# vmem16 runs 30.4 ms, vmem32 **15.0**, vmem64 21.6 — the r4 "wide-D
# mid frames unmeasured" gate exclusion is closed: wide ranges up to
# 64 slices take vmem32 like the rest of the mid band.  Above 64
# slices the streaming carry buffers (4*size_d+2 of them) cannot even
# FIT small budgets (a 1 MP 128-disparity default-config frame made
# the tile picker raise), so those take the wide-stream budget (128).
_MID_WIDE_VMEM_MB: int | None = 32
_MID_WIDE_MAX_D = 64


def effective_config(cfg: StereoConfig, h: int, w: int) -> StereoConfig:
    """Resolve the frame-size-dependent kernel strategy.  Only frames
    >= _STRATEGY_PIXELS with every relevant knob still on its auto
    default are rewritten; any explicit user choice wins."""
    import dataclasses

    from .ops.pallas_guided import _UNROLL_MAX, unroll_max

    # captured BEFORE any rewrite: _SMALL_STRATEGY also sets stream,
    # and those flips must stay inside the feasibility net (review r5)
    stream_was_auto = cfg.stream is None
    if (_BIG_STRATEGY and h * w >= _STRATEGY_PIXELS
            and cfg.size_d <= unroll_max(cfg)
            and cfg.dual_view == "auto" and cfg.unroll_max is None
            and cfg.y_sum is None and cfg.fused == "auto"
            and not cfg.exact_integral):
        cfg = dataclasses.replace(cfg, **_BIG_STRATEGY)
    if (_SMALL_STRATEGY and h * w < _STRATEGY_PIXELS
            and _SMALL_STRATEGY["unroll_max"] < cfg.size_d <= unroll_max(cfg)
            and cfg.dual_view == "auto" and cfg.unroll_max is None
            and cfg.y_sum is None and cfg.vmem_mb is None
            and cfg.stream is None and cfg.fused == "auto"
            and not cfg.exact_integral):
        # the lower bound keeps the rewrite on the MEASURED fori branch:
        # at size_d <= 8 an unroll_max=8 override would leave the dual
        # UNROLLED stream+roll kernel (minutes of Mosaic compile,
        # unmeasured perf) — those ranges keep the previous non-stream
        # dual default instead
        cfg = dataclasses.replace(cfg, **_SMALL_STRATEGY)
    if (_STREAM_PIXELS and cfg.stream is None and h * w >= _STREAM_PIXELS
            and cfg.fused in ("auto", True) and not cfg.exact_integral):
        cfg = dataclasses.replace(cfg, stream=True)
    if (_MID_STREAM_VMEM_MB and cfg.vmem_mb is None
            and _MID_VMEM_PIXELS <= h * w < _STAGED_PIXELS
            and cfg.stream is True and cfg.size_d > unroll_max(cfg)
            and cfg.size_d <= _UNROLL_MAX
            and cfg.fused in ("auto", True) and not cfg.exact_integral):
        cfg = dataclasses.replace(cfg, vmem_mb=_MID_STREAM_VMEM_MB)
    if (_MID_WIDE_VMEM_MB and cfg.vmem_mb is None
            and (_STREAM_PIXELS or 0) <= h * w < _STAGED_PIXELS
            and cfg.stream is True and cfg.size_d > _UNROLL_MAX
            and cfg.fused in ("auto", True) and not cfg.exact_integral):
        # wide-D mid band (r5_midwide): vmem32 up to 64 slices
        # (measured 2x win at 1 MP); beyond that the carry buffers
        # need the wide-stream budget just to fit
        mb = (_MID_WIDE_VMEM_MB if cfg.size_d <= _MID_WIDE_MAX_D
              else (_WIDE_STREAM_VMEM_MB or 128))
        cfg = dataclasses.replace(cfg, vmem_mb=mb)
    if (_BIG_VMEM_MB and cfg.vmem_mb is None and h * w >= _STAGED_PIXELS
            and cfg.size_d > unroll_max(cfg)   # fori branch: fast compiles
            and cfg.fused in ("auto", True) and not cfg.exact_integral):
        from .ops.pallas_guided import use_stream

        wide = cfg.size_d > _UNROLL_MAX
        wide_mb = (_WIDE_STREAM_VMEM_MB if use_stream(cfg) and
                   _WIDE_STREAM_VMEM_MB else _WIDE_VMEM_MB)
        over: dict = {"vmem_mb": wide_mb if wide else _BIG_VMEM_MB}
        if wide and cfg.y_sum is None:
            # at the vmem96 tiles the halo ratio flattens enough that
            # the MXU passes become the binding unit again: roll 163.4
            # vs band-mxu 173.2 ms at 5.9 MP/128 d (r3_bigtile2).  Only
            # flipped together with the auto budget — at small tiles
            # (explicit low vmem_mb) band-mxu still wins (BENCH.md r2).
            over["y_sum"] = "roll"
        cfg = dataclasses.replace(cfg, **over)
    if stream_was_auto and cfg.stream is True:
        # safety net: an auto stream flip must never select an
        # impossible kernel — the per-slice carry buffers scale with
        # size_d and can exceed the budget outright (r5_midwide: 1 MP
        # x 128 disparities raised at the 16 MiB default before the
        # wide mid-band budget above existed).  Explicit stream=True
        # still surfaces the picker's error.
        from .ops.pallas_guided import stream_fits

        if not stream_fits(cfg, h, w):
            cfg = dataclasses.replace(cfg, stream=False)
    return cfg


def use_staged_path(cfg: StereoConfig, h: int, w: int) -> bool:
    """Whether compute_disparity runs separately-jitted stages instead
    of the single composed jit (big-frame TPU compile pathology)."""
    if cfg.staged in (True, False):
        return cfg.staged
    return h * w >= _STAGED_PIXELS and jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("cfg",))
def _gray_stage(rgb: jax.Array, cfg: StereoConfig) -> jax.Array:
    return ops.rgb_to_grayscale(rgb, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "full_outputs"))
def _matching_stage(gl, gr, cfg: StereoConfig, full_outputs: bool = False):
    """Both views' (best, dmap) from grayscales; with ``full_outputs``
    also the unfused intermediates (mean images, cost slice 0)."""
    return _match(gl, gr, cfg, full_outputs)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _post_stage(dmap_l, dmap_r, cfg: StereoConfig):
    return _post(dmap_l, dmap_r, cfg)


def stereo_pipeline_staged(
    rgb_left: jax.Array,
    rgb_right: jax.Array,
    cfg: StereoConfig = DEFAULT_CONFIG,
    full_outputs: bool = False,
) -> dict:
    """Same math as stereo_pipeline, but each stage is its own jitted
    executable chained at the Python level (data dependencies serialize
    execution).  Identical outputs; pays inter-stage dispatch latency,
    avoids the composed-module compile pathology at bike scale."""
    cfg = effective_config(cfg, rgb_left.shape[0], rgb_left.shape[1])
    gl = _gray_stage(jnp.asarray(rgb_left), cfg)
    gr = _gray_stage(jnp.asarray(rgb_right), cfg)
    best_l, dmap_l, best_r, dmap_r, mean_l, mean_r, c0_l, c0_r = (
        _matching_stage(gl, gr, cfg, full_outputs))
    occ, filled = _post_stage(dmap_l, dmap_r, cfg)
    out = {
        "disparity_left": dmap_l,
        "disparity_right": dmap_r,
        "occlusion": occ,
        "occlusion_filled": filled,
    }
    if full_outputs:
        out.update(
            gray_left=gl, gray_right=gr,
            mean_left=mean_l, mean_right=mean_r,
            best_cost_left=best_l, best_cost_right=best_r,
            cost_left_s0=c0_l, cost_right_s0=c0_r,
        )
    return out


def compute_disparity(
    rgb_left: np.ndarray,
    rgb_right: np.ndarray,
    cfg: StereoConfig = DEFAULT_CONFIG,
    full_outputs: bool = False,
    keys: tuple | None = None,
) -> dict:
    """Host-convenience wrapper: numpy in → numpy out, blocking.

    Bike-scale frames automatically take the staged path (see
    use_staged_path); the math is identical either way.

    ``keys`` limits which outputs are fetched to the host: every
    fetched array is its own device→host transfer (30–40 ms each on a
    tunneled dev TPU — r4_serve_smoke), so latency-sensitive callers
    ask only for what they return (the serving path goes further:
    compute_disparity_stacked fetches its outputs in ONE transfer).
    The device computes all outputs either way; unfetched ones are
    simply never copied back."""
    if use_staged_path(cfg, rgb_left.shape[0], rgb_left.shape[1]):
        out = stereo_pipeline_staged(
            jnp.asarray(rgb_left), jnp.asarray(rgb_right), cfg, full_outputs)
    else:
        out = stereo_pipeline(
            jnp.asarray(rgb_left), jnp.asarray(rgb_right), cfg, full_outputs)
    if keys is not None:
        missing = [k for k in keys if k not in out]
        if missing:
            raise ValueError(
                f"unknown output keys {missing}; available: {sorted(out)} "
                f"(full_outputs={full_outputs})")
        out = {k: out[k] for k in keys}
    return {k: np.asarray(v) for k, v in out.items()}


def compute_disparity_stacked(
    rgb_left: np.ndarray,
    rgb_right: np.ndarray,
    cfg: StereoConfig = DEFAULT_CONFIG,
    keys: tuple = ("occlusion_filled", "occlusion"),
    compact: bool = False,
) -> dict:
    """compute_disparity(keys=...) with ONE device→host transfer: the
    requested outputs (same shape/dtype — the disparity-map family)
    are stacked on device and fetched together.  On a tunneled
    deployment each blocking fetch is a ~30-40 ms round trip
    (BENCH.md r4/r5 serving), so the serving path uses this.

    ``compact`` additionally casts the stack to int16 on device and
    back to float32 on the host — EXACT for the disparity-map family
    (WTA labels and the d_occlusion sentinel are small integers; the
    widest supported range is d_min=-32667's sentinel) — halving the
    transferred bytes."""
    if use_staged_path(cfg, rgb_left.shape[0], rgb_left.shape[1]):
        out = stereo_pipeline_staged(
            jnp.asarray(rgb_left), jnp.asarray(rgb_right), cfg)
    else:
        out = stereo_pipeline(
            jnp.asarray(rgb_left), jnp.asarray(rgb_right), cfg)
    missing = [k for k in keys if k not in out]
    if missing:
        raise ValueError(
            f"unknown output keys {missing}; available: {sorted(out)}")
    stacked = jnp.stack([out[k] for k in keys])
    # the int16 cast is exact only while every emittable value fits:
    # labels in [d_min, d_max] and the d_occlusion sentinel (d_min-100)
    if compact and cfg.d_occlusion >= -32768 and cfg.d_max <= 32767:
        arr = np.asarray(stacked.astype(jnp.int16)).astype(np.float32)
    else:
        arr = np.asarray(stacked)
    return {k: arr[i] for i, k in enumerate(keys)}


@functools.partial(jax.jit, static_argnames=("cfg",))
def stereo_pipeline_batch(
    rgb_left: jax.Array,
    rgb_right: jax.Array,
    cfg: StereoConfig = DEFAULT_CONFIG,
) -> dict:
    """Sequence throughput on one chip: (B,H,W,C) pairs in one graph.

    The fused Pallas matching stage cannot vmap (ANY-space refs are
    unsupported on Mosaic), so the frames run through a ``lax.map`` of
    the single-frame pipeline — measured FASTER on TPU v5e than
    putting the frame axis on the kernel's own grid (B=8 Tsukuba:
    0.625 vs 0.648 ms/frame full pipeline, 0.541 vs 0.590 kernel-only;
    scripts/r2_batch_probe.py), because per-frame kernels keep the
    smaller single-frame tile schedule.  The grid-batched kernel mode
    still serves the sharded path, where each shard's local batch
    rides the grid (parallel/sharded.py).  For multi-chip sequence
    throughput shard the batch over the 'b' mesh axis
    (parallel.sharded_stereo_pipeline)."""
    if not use_fused_path(cfg):
        return jax.vmap(lambda l, r: stereo_pipeline(l, r, cfg))(
            rgb_left, rgb_right)
    return jax.lax.map(
        lambda lr: stereo_pipeline(lr[0], lr[1], cfg),
        (rgb_left, rgb_right))
