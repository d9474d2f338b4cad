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

import numpy as np
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
        occ = ops.detect_occlusion(dmap_l, dmap_r, cfg.d_occlusion, cfg)
        if stage == 3:
            return occ.sum()
        return ops.fill_occlusion(occ, cfg.v_min, cfg).sum()

    return run


def _chained(fn, n):
    def looped(l, r):
        def step(i, carry):
            li, acc = carry
            v = fn(li, r)
            li2 = li + (v.astype(jnp.uint8) & 1)  # serialize iterations
            return (li2, acc + v)
        _, acc = jax.lax.fori_loop(0, n, step, (l, jnp.float32(0)))
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


def stage_table(left, right, cfg: StereoConfig = DEFAULT_CONFIG, n: int = 9) -> list[dict]:
    """Returns [{stage, ms}] with per-frame device ms attributed to each
    stage (cumulative-prefix differences, chained n-deep).  Times the
    same path the pipeline runs: the fused Pallas kernel on TPU
    (pipeline.use_fused_path), the unfused XLA graph elsewhere."""
    from .pipeline import use_fused_path

    fused = use_fused_path(cfg)
    if fused:
        from .ops.pallas_guided import unroll_max

        if cfg.dual_view is True or (
                cfg.dual_view == "auto" and cfg.size_d <= unroll_max(cfg)):
            fused = "dual"
    stages = ({"dual": STAGES_DUAL, True: STAGES_FUSED}.get(fused)
              or STAGES_UNFUSED)
    l = jnp.asarray(left)
    r = jnp.asarray(right)
    cum = []
    for name, stage in stages:
        f1 = _chained(_prefix_fn(cfg, stage, fused), 1)
        fn_ = _chained(_prefix_fn(cfg, stage, fused), n)
        float(f1(l, r)); float(fn_(l, r))  # compile both
        t1 = min(_t(f1, l, r), _t(f1, l, r))
        tn = min(_t(fn_, l, r), _t(fn_, l, r))
        cum.append((name, (tn - t1) / (n - 1)))
    rows = []
    prev = 0.0
    for name, t in cum:
        rows.append({"stage": name, "ms": round(max(0.0, t - prev) * 1e3, 3)})
        prev = t
    rows.append({"stage": "TOTAL", "ms": round(cum[-1][1] * 1e3, 3)})
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
