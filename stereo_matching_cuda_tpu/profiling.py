"""Per-stage timing + tracing — the framework's answer to the
reference's committed Nsight CSVs (report/csv_file_nsight_*/, SURVEY.md
§5/§6).

Two tools:

  * ``stage_table(left, right, cfg)`` — per-stage device-time table in
    the same shape as SURVEY.md §6.  Stages are timed as *cumulative
    pipeline prefixes* (grayscale; +cost; +aggregation/WTA; +LR; +fill)
    chained N deep inside one jit (see bench.py for why dispatch-level
    timing is meaningless on this TPU setup) and differenced.
  * ``trace(logdir)`` — a jax.profiler trace context for TensorBoard /
    xprof when real hardware traces are wanted.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp

from .config import StereoConfig, DEFAULT_CONFIG
from . import ops


def _prefix_fn(cfg: StereoConfig, stage: int, fused: bool):
    """Pipeline prefix ending after `stage`; returns a reduced scalar.

    Unfused stages: 0=gray, 1=+cost, 2=+guided/WTA, 3=+LR, 4=+fill.
    Fused stages (the TPU production path, ops/pallas_guided.py):
    0=gray, 1=+fused L, 2=+fused L+R, 3=+LR, 4=+fill.
    """

    def run(l, r):
        gl = ops.rgb_to_grayscale(l, cfg)
        gr = ops.rgb_to_grayscale(r, cfg)
        if stage == 0:
            return gl.astype(jnp.float32).sum() + gr.astype(jnp.float32).sum()
        if fused == "dual":
            from .ops.pallas_guided import guided_wta_fused_dual

            _, dmap_l, _, dmap_r = guided_wta_fused_dual(gl, gr, cfg)
            if stage <= 2:
                return dmap_l.sum() + dmap_r.sum()
        elif fused:
            from .ops.pallas_guided import guided_wta_fused

            _, dmap_l = guided_wta_fused(gl, gr, cfg.d_min, cfg)
            if stage == 1:
                return dmap_l.sum()
            _, dmap_r = guided_wta_fused(gr, gl, cfg.d_min_right, cfg)
            if stage == 2:
                return dmap_l.sum() + dmap_r.sum()
        else:
            cost_l = ops.cost_volume(gl, gr, cfg.d_min, cfg)
            cost_r = ops.cost_volume(gr, gl, cfg.d_min_right, cfg)
            if stage == 1:
                return cost_l.sum() + cost_r.sum()
            _, dmap_l, _ = ops.guided_filter_wta(gl, cost_l, cfg.d_min, cfg)
            _, dmap_r, _ = ops.guided_filter_wta(gr, cost_r, cfg.d_min_right, cfg)
            if stage == 2:
                return dmap_l.sum() + dmap_r.sum()
        from .pipeline import use_fused_post

        if use_fused_post(cfg):
            from .ops.pallas_post import lr_fill_fused

            # one kernel computes both maps — a single post stage
            _, filled = lr_fill_fused(dmap_l, dmap_r, cfg)
            return filled.sum()
        occ = ops.detect_occlusion(dmap_l, dmap_r, cfg.d_occlusion, cfg)
        if stage == 3:
            return occ.sum()
        return ops.fill_occlusion(occ, cfg.v_min, cfg).sum()

    return run


def _chained(fn, n):
    def looped(l, r):
        def step(i, carry):
            li, ri, acc = carry
            v = fn(li, ri)
            # serialize iterations AND keep BOTH operands loop-variant:
            # an invariant right image lets XLA hoist right-only work
            # (e.g. rgb_to_grayscale(r)) out of the chain, undercounting
            # the stage (review r5)
            bump = (v.astype(jnp.uint8) & 1)
            return (li + bump, ri + bump, acc + v)
        _, _, acc = jax.lax.fori_loop(0, n, step, (l, r, jnp.float32(0)))
        return acc
    return jax.jit(looped)


STAGES_UNFUSED = [
    ("rgb_to_grayscale x2", 0),
    ("cost_volume x2", 1),
    ("guided_filter+WTA x2", 2),
    ("detect_occlusion", 3),
    ("fill_occlusion", 4),
]

STAGES_FUSED = [
    ("rgb_to_grayscale x2", 0),
    ("fused cost+guided+WTA L", 1),
    ("fused cost+guided+WTA R", 2),
    ("detect_occlusion", 3),
    ("fill_occlusion", 4),
]

STAGES_DUAL = [
    ("rgb_to_grayscale x2", 0),
    ("fused dual-view cost+guided+WTA", 2),
    ("detect_occlusion", 3),
    ("fill_occlusion", 4),
]


def _staged_stage_table(left, right, cfg: StereoConfig, n: int) -> list[dict]:
    """Big-frame profile: each pipeline stage timed as its OWN chained
    jit (the composed prefix graphs stage_table builds trip the same
    pathological XLA compile the staged product path exists to avoid —
    BENCH.md).  Stage attribution is direct, not prefix-differenced."""
    from .pipeline import _match, use_fused_path, use_dual_view

    if n < 2:
        raise ValueError(f"stage tables need n >= 2 frames, got {n}")
    l = jnp.asarray(left)
    r = jnp.asarray(right)
    gray = jax.jit(lambda x: ops.rgb_to_grayscale(x, cfg))
    gl, gr = gray(l), gray(r)
    match_name = (
        "fused dual-view cost+guided+WTA"
        if use_fused_path(cfg) and use_dual_view(cfg)
        else "fused cost+guided+WTA x2" if use_fused_path(cfg)
        else "cost+guided_filter+WTA x2")
    dmap_l, dmap_r = jax.jit(
        lambda a, b: _match(a, b, cfg, False)[1::2][:2])(gl, gr)

    def chain(fn, x, y):
        def looped(a, b):
            def step(i, carry):
                ai, acc = carry
                v = fn(ai, b)
                # serialize iterations: a data-dependent 0/1 scalar added
                # to the input (a zero-filled constant could be hoisted)
                s = jnp.sum(v.astype(jnp.float32))
                bump = (s.astype(jnp.int32) & 1).astype(ai.dtype)
                return (ai + bump, acc + s)
            _, acc = jax.lax.fori_loop(0, n, step, (a, jnp.float32(0)))
            return acc
        f1 = jax.jit(lambda a, b: jnp.sum(fn(a, b).astype(jnp.float32)))
        fN = jax.jit(looped)
        float(f1(x, y)); float(fN(x, y))
        t1 = min(_t(f1, x, y), _t(f1, x, y))
        tN = min(_t(fN, x, y), _t(fN, x, y))
        return max(0.0, (tN - t1) / (n - 1))

    from .pipeline import use_fused_post

    if use_fused_post(cfg):
        from .ops.pallas_post import lr_fill_fused

        post_rows = [
            ("fused LR+fill (pallas_post)",
             chain(lambda a, b: lr_fill_fused(a, b, cfg)[1],
                   dmap_l, dmap_r)),
        ]
    else:
        # occ only feeds the XLA fill row — computing it in the fused
        # branch would compile+run the full select tree for nothing
        # (~17 ms/frame-class at wide-D, review r5)
        occ = jax.jit(
            lambda a, b: ops.detect_occlusion(a, b, cfg.d_occlusion, cfg))(
            dmap_l, dmap_r)
        post_rows = [
            ("detect_occlusion",
             chain(lambda a, b: ops.detect_occlusion(
                 a, b, cfg.d_occlusion, cfg), dmap_l, dmap_r)),
            ("fill_occlusion",
             chain(lambda a, b: ops.fill_occlusion(a, cfg.v_min, cfg),
                   occ, occ)),
        ]
    rows = [
        ("rgb_to_grayscale x2",
         2 * chain(lambda a, b: ops.rgb_to_grayscale(a, cfg).astype(
             jnp.float32), l, r)),
        (match_name,
         # consume BOTH views' maps: a dmap_l-only chain lets XLA
         # dead-code-eliminate the right view's kernel call, halving
         # the row (r5 fix)
         chain(lambda a, b: (lambda m: m[1] + m[3])(
             _match(a, b, cfg, False)), gl, gr)),
    ] + post_rows
    out = [{"stage": name, "ms": round(t * 1e3, 3)} for name, t in rows]
    out.append({"stage": "TOTAL (sum of stages)",
                "ms": round(sum(t for _, t in rows) * 1e3, 3)})
    return out


def stage_table(left, right, cfg: StereoConfig = DEFAULT_CONFIG,
                n: int | None = None) -> list[dict]:
    """Returns [{stage, ms}] with per-frame device ms attributed to each
    stage (cumulative-prefix differences, chained n-deep).  Times the
    same path the pipeline runs: the fused Pallas kernel on TPU
    (pipeline.use_fused_path), the unfused XLA graph elsewhere; frames
    that the product routes through the staged path are profiled
    per-stage the same way (the composed prefix graph would hit the
    big-frame XLA compile pathology)."""
    from .pipeline import (effective_config, use_fused_path, use_dual_view,
                           use_staged_path)

    # resolve the frame-size auto strategy exactly as the pipeline does,
    # so the profile times the path the product actually runs (the
    # r4 sub-200k flip moved Tsukuba from the dual to the single-view
    # streaming kernel; idempotent for already-resolved configs)
    cfg = effective_config(cfg, left.shape[0], left.shape[1])
    if use_staged_path(cfg, left.shape[0], left.shape[1]):
        return _staged_stage_table(left, right, cfg, n if n is not None else 9)
    if n is None:
        # sub-ms frames need the full >=96-frame differencing window
        # (CLAUDE.md timing rule; n=97 vs the 1-frame chain gives 96):
        # the tunnel's ±4 ms dispatch jitter leaves ±0.5 ms/frame at
        # n=9, swamping 0.4 ms stages (BENCH.md measurement-noise
        # caveat); the r4 default's prefix chains compile in seconds
        # so this is cheap.  An explicitly passed n is always honored.
        n = 97 if left.shape[0] * left.shape[1] < 500_000 else 9
    if n < 2:
        raise ValueError(f"stage_table needs n >= 2 frames, got {n}")
    fused = use_fused_path(cfg)
    if fused and use_dual_view(cfg):
        fused = "dual"
    stages = ({"dual": STAGES_DUAL, True: STAGES_FUSED}.get(fused)
              or STAGES_UNFUSED)
    from .pipeline import use_fused_post

    if use_fused_post(cfg):
        # one kernel computes occ+fill: a single post stage replaces
        # the detect/fill pair (their prefix difference would be 0)
        stages = [s for s in stages if s[1] < 3] + [
            ("fused LR+fill (pallas_post)", 4)]
    l = jnp.asarray(left)
    r = jnp.asarray(right)
    cum = []
    for name, stage in stages:
        f1 = _chained(_prefix_fn(cfg, stage, fused), 1)
        fn_ = _chained(_prefix_fn(cfg, stage, fused), n)
        float(f1(l, r)); float(fn_(l, r))  # compile both
        t1 = min(_t(f1, l, r) for _ in range(3))
        tn = min(_t(fn_, l, r) for _ in range(3))
        cum.append((name, (tn - t1) / (n - 1)))
    rows = []
    prev = 0.0
    for name, t in cum:
        rows.append({"stage": name, "ms": round(max(0.0, t - prev) * 1e3, 3)})
        prev = t
    rows.append({"stage": "TOTAL", "ms": round(cum[-1][1] * 1e3, 3)})
    return rows


def batch_stage_table(left, right, cfg: StereoConfig = DEFAULT_CONFIG,
                      n: int = 9) -> list[dict]:
    """Per-FRAME device ms per stage inside the batched pipeline's
    structure ((B,H,W,C) inputs run through a lax.map of the single-
    frame prefixes, exactly like stereo_pipeline_batch) — the analysis
    surface for sequence-throughput work: a stage whose per-frame cost
    matches the single-frame table is pure per-frame work that batching
    cannot amortize."""
    from .pipeline import effective_config, use_fused_path, use_dual_view

    if left.ndim != 4:
        raise ValueError(f"batch_stage_table needs (B,H,W,C), got {left.shape}")
    from .pipeline import use_staged_path

    if use_staged_path(cfg, left.shape[1], left.shape[2]):
        raise ValueError(
            f"batch_stage_table's composed prefix graphs would trip the "
            f"big-frame XLA compile pathology at {left.shape[1]}x"
            f"{left.shape[2]} (BENCH.md); profile staged-scale frames "
            f"per frame via stage_table instead")
    cfg = effective_config(cfg, left.shape[1], left.shape[2])
    fused = use_fused_path(cfg)
    if fused and use_dual_view(cfg):
        fused = "dual"
    stages = ({"dual": STAGES_DUAL, True: STAGES_FUSED}.get(fused)
              or STAGES_UNFUSED)
    from .pipeline import use_fused_post

    if use_fused_post(cfg):
        stages = [s for s in stages if s[1] < 3] + [
            ("fused LR+fill (pallas_post)", 4)]
    B = left.shape[0]
    l = jnp.asarray(left)
    r = jnp.asarray(right)
    cum = []
    for name, stage in stages:
        one = _prefix_fn(cfg, stage, fused)

        def batched(a, b, one=one):
            return jax.lax.map(lambda ab: one(ab[0], ab[1]), (a, b)).sum()

        f1 = _chained(batched, 1)
        fn_ = _chained(batched, n)
        float(f1(l, r)); float(fn_(l, r))
        t1 = min(_t(f1, l, r), _t(f1, l, r))
        tn = min(_t(fn_, l, r), _t(fn_, l, r))
        cum.append((name, (tn - t1) / (n - 1) / B))
    rows = []
    prev = 0.0
    for name, t in cum:
        rows.append({"stage": name, "ms": round(max(0.0, t - prev) * 1e3, 3)})
        prev = t
    rows.append({"stage": f"TOTAL (per frame, B={B})",
                 "ms": round(cum[-1][1] * 1e3, 3)})
    return rows


def _t(f, l, r):
    t0 = time.time()
    float(f(l, r))
    return time.time() - t0


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (TensorBoard-compatible)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def print_stage_table(rows: list[dict], file=None) -> None:
    width = max(len(r["stage"]) for r in rows)
    for r in rows:
        print(f"{r['stage']:<{width}}  {r['ms']:>10.3f} ms", file=file)
