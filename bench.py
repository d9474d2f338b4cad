"""Benchmark harness — one JSON line on stdout for the driver.

Headline metric: Tsukuba full-pipeline frames/s (both views, 16
disparities: grayscale → cost → guided filter → WTA → LR → fill).
Reference baseline (BASELINE.md): GTX 1080, kernels + memcpy =
183.4 ms/frame = 5.45 fps.  The same JSON line carries the 6 MP
("bike"-scale) full-pipeline number (reference: 7,715 ms/frame) in
``extra``.

Timing methodology: on this TPU setup, dispatch is asynchronous and
``block_until_ready`` does not reliably wait (measured impossible
numbers: 5,580 TFLOP/s on a ~394-peak chip), so timing loops around
dispatches are meaningless.  Instead N frames are chained INSIDE one
jitted ``fori_loop`` (each iteration's input is perturbed by the
previous output so nothing can be elided) and the wall time difference
between an N-frame and a 1-frame executable — each forced by a scalar
fetch — gives honest per-frame device time.

The 6 MP frame runs the PRODUCT staged path (pipeline.compute_disparity
routes >=2 MP TPU frames through separately-jitted stages; the composed
6 MP module trips a pathological XLA compile — BENCH.md).  Frames are
chained at the Python level with the same perturb-by-output dependency;
the chain is serialized by data dependencies and additionally pays real
inter-stage dispatch latency.

The big-frame benches (6 MP, 5.9 MP x 128 d) run on STRUCTURED frames —
the synthetic layered scene of utils/synth.py at scale — not noise:
WTA/fill behavior on noise differs from real scenes (no coherent
winners or occlusion runs).  Round-2 and earlier 6 MP numbers were
noise+roll frames.

Set STEREO_BENCH_SKIP_BIG=1 to skip the 6 MP measurement,
STEREO_BENCH_SKIP_BATCH=1 to skip the B=8 sequence-throughput
measurement (BASELINE config #5), and STEREO_BENCH_SKIP_WIDED=1 to
skip the 5.9 MP x 128-disparity measurement (BASELINE config #4).

The former STEREO_BENCH_FAST section is gone: since the round-4
sub-200k strategy flip (pipeline._SMALL_STRATEGY — r4_tsufori), the
DEFAULT path at Tsukuba scale IS the fast profile (single-view fori
stream + roll + vmem32, 0.383 ms at ~6 s chain compiles), so the
headline measurement already covers it.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_TSUKUBA_FPS = 1000.0 / (124.55 + 58.81)   # 5.45 fps (BASELINE.md)
BASELINE_BIKE_MS = 7715.0                          # BASELINE.md 6 MP total


def _load_tsukuba():
    """Returns (left, right, synthetic): the reference Tsukuba pair, or
    seeded random frames (flagged in the output JSON) if the reference
    mount is missing."""
    d = "/root/reference/stereo_matching_cuda/data"
    try:
        from stereo_matching_cuda_tpu.utils.io import read_png

        return (read_png(os.path.join(d, "tsukuba0.png")),
                read_png(os.path.join(d, "tsukuba1.png")), False)
    except Exception:
        rng = np.random.default_rng(0)
        base = rng.integers(0, 256, size=(288, 384 + 16, 3), dtype=np.uint8)
        return base[:, 16:], base[:, :-16], True


def make_looped(cfg, n):
    """jitted fn running the full pipeline n times, serially dependent."""
    import jax
    import jax.numpy as jnp

    from stereo_matching_cuda_tpu.pipeline import stereo_pipeline

    def step(i, carry):
        li, ri = carry
        out = stereo_pipeline(li, ri, cfg)["occlusion_filled"]
        li2 = li + (out[..., None].astype(jnp.uint8) & 1)
        return (li2, ri)

    def run(l, r):
        lo, _ = jax.lax.fori_loop(0, n, step, (l, r))
        return jnp.sum(lo.astype(jnp.float32))

    return jax.jit(run)


def _timeit(f, l, r):
    t0 = time.time()
    float(f(l, r))
    return time.time() - t0


def timed_frames(cfg, l, r, n_small=49, n_big=145, log=lambda *a: None):
    """Per-frame time = (t_big - t_small) / (n_big - n_small), both
    executables chained-in-jit.  Differencing two LARGE chains (not
    N=1) cancels the per-dispatch tunnel overhead, whose ±4 ms jitter
    otherwise swamps a sub-ms frame; min of 5 runs each.  The round-4
    default's 0.38 ms frames need the wider 96-frame window — the
    jitter residue of the old 32-frame window was ±0.1 ms/frame
    (r4_shsweep vs r4_tsufori spread), and the fori-emission chains
    compile in seconds so the longer executables are nearly free."""
    fs = make_looped(cfg, n_small)
    fb = make_looped(cfg, n_big)
    t0 = time.time()
    float(fs(l, r))
    log(f"  N={n_small} first call (incl compile): {time.time()-t0:.1f}s")
    t0 = time.time()
    float(fb(l, r))
    log(f"  N={n_big} first call (incl compile): {time.time()-t0:.1f}s")
    ts = min(_timeit(fs, l, r) for _ in range(5))
    tb = min(_timeit(fb, l, r) for _ in range(5))
    per = (tb - ts) / (n_big - n_small)
    return per, ts, tb


def _structured_pair(h, w, ndisp=16, seed=7):
    """Structured (non-noise) stereo pair: the synthetic layered scene
    (utils/synth.py) at benchmark scale.  WTA/fill behavior on noise
    frames differs from real scenes (no coherent winners, no real
    occlusion runs), so the big-frame benches render actual geometry."""
    from stereo_matching_cuda_tpu.utils.synth import make_scene

    s = make_scene(h, w, ndisp=ndisp, seed=seed)
    return s["left"], s["right"]


def _staged_chain_ms(cfg, left_np, right_np, log, tag, n_big=5):
    """Per-frame ms for the product staged path: Python-level chain of
    frames serialized by a perturb-by-output dependency, differencing
    an n_big-frame chain against a 1-frame chain."""
    import jax
    import jax.numpy as jnp

    from stereo_matching_cuda_tpu.pipeline import stereo_pipeline_staged

    summ = jax.jit(lambda x: jnp.sum(x))
    perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))

    def frame(l, r):
        return stereo_pipeline_staged(l, r, cfg)["occlusion_filled"]

    bl, br = jnp.asarray(left_np), jnp.asarray(right_np)
    t0 = time.time()
    float(summ(frame(bl, br)))
    log(f"  {tag} staged first frame (incl compile): {time.time()-t0:.1f}s")

    def run_chain(n):
        t0 = time.time()
        l = bl
        f = None
        for _ in range(n):
            f = frame(l, br)
            l = perturb(l, f)
        float(summ(f))
        return time.time() - t0

    run_chain(1)
    t1 = min(run_chain(1), run_chain(1))
    tn = min(run_chain(n_big), run_chain(n_big))
    return (tn - t1) / (n_big - 1) * 1e3


def bench_big(log):
    """6 MP full pipeline through the product staged path on a
    structured (layered-scene) pair; returns ms/frame."""
    from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG as cfg
    from stereo_matching_cuda_tpu.pipeline import use_staged_path

    assert use_staged_path(cfg, 1992, 3008), "6 MP must take the staged path"
    big_l, big_r = _structured_pair(1992, 3008)
    per_ms = _staged_chain_ms(cfg, big_l, big_r, log, "6MP", n_big=9)
    log(f"6MP full pipeline (product staged path, structured frames): "
        f"{per_ms:.1f} ms/frame ({1e3/per_ms:.2f} fps; reference bike "
        f"7,715 ms -> {BASELINE_BIKE_MS/per_ms:.0f}x)")
    return per_ms


def bench_wide_d(log):
    """5.9 MP x 128 disparities full pipeline (BASELINE config #4 —
    Middlebury-full-res class; the reference caps at 16 disparities so
    there is no reference number).  Exercises the wide-range fori
    kernel + band-restricted mxu y-sums; returns ms/frame."""
    import dataclasses

    from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
    from stereo_matching_cuda_tpu.pipeline import use_staged_path

    cfg = dataclasses.replace(DEFAULT_CONFIG, d_min=-127, d_max=0)
    h, w = 1988, 2948
    assert use_staged_path(cfg, h, w), "wide-D must take the staged path"
    big_l, big_r = _structured_pair(h, w, ndisp=128)
    per_ms = _staged_chain_ms(cfg, big_l, big_r, log, "5.9MP/128d", n_big=4)
    log(f"5.9MP x 128-disparity full pipeline (staged, structured "
        f"frames): {per_ms:.1f} ms/frame ({1e3/per_ms:.2f} fps)")
    return per_ms


def bench_batch(left_np, right_np, log, B=8, n=9):
    """Sequence-throughput: B Tsukuba frames per step through
    stereo_pipeline_batch (lax.map of the single-frame pipeline —
    measured faster than the grid-batched kernel, see pipeline.py),
    steps chained inside one jitted fori_loop.  Returns ms/frame."""
    import jax
    import jax.numpy as jnp

    from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG as cfg
    from stereo_matching_cuda_tpu.pipeline import stereo_pipeline_batch

    bl = jnp.asarray(np.stack([np.roll(left_np, i, axis=1) for i in range(B)]))
    br = jnp.asarray(np.stack([np.roll(right_np, i, axis=1) for i in range(B)]))

    def make(nsteps):
        def step(i, carry):
            li, ri = carry
            out = stereo_pipeline_batch(li, ri, cfg)["occlusion_filled"]
            li2 = li + (out[..., None].astype(jnp.uint8) & 1)
            return (li2, ri)

        def run(l, r):
            lo, _ = jax.lax.fori_loop(0, nsteps, step, (l, r))
            return jnp.sum(lo.astype(jnp.float32))

        return jax.jit(run)

    n_small = 3
    f1, fn = make(n_small), make(n)
    t0 = time.time()
    float(f1(bl, br)); float(fn(bl, br))
    log(f"  batch B={B} compile+first: {time.time()-t0:.1f}s")
    t1 = min(_timeit(f1, bl, br) for _ in range(3))
    tn = min(_timeit(fn, bl, br) for _ in range(3))
    per_frame_ms = (tn - t1) / (n - n_small) / B * 1e3
    log(f"sequence throughput: B={B} batched, {per_frame_ms:.3f} ms/frame "
        f"= {1e3/per_frame_ms:.0f} frames/s")
    return per_frame_ms


def _device_init_ok(log, timeout_s=600):
    """jax device init hangs indefinitely when the axon TPU tunnel is
    down (observed when the terminal died mid-round), which would hang
    the driver.  Probe device enumeration in a timed subprocess and
    fail fast with a clear message instead."""
    if os.environ.get("JAX_PLATFORMS", "axon") != "axon":
        return True
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].device_kind)"],
            timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        log(f"device init probe timed out after {timeout_s}s")
        return False
    if r.returncode != 0:
        log(f"device init probe failed: {r.stderr.strip()[-300:]}")
        return False
    log(f"device init probe ok: {r.stdout.strip()}")
    return True


def main():
    import jax

    # persistent compile cache: repeat runs skip the multi-minute remote
    # compiles (harmless if the backend ignores it)
    jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp

    from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    if not _device_init_ok(log):
        log("ERROR: TPU device init is hanging (axon tunnel down?); "
            "refusing to hang the driver")
        sys.exit(1)
    left_np, right_np, synthetic = _load_tsukuba()
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    if synthetic:
        log("WARNING: reference mount missing — timing SYNTHETIC frames")

    l = jnp.asarray(left_np)
    r = jnp.asarray(right_np)
    per, ts, tb = timed_frames(DEFAULT_CONFIG, l, r, log=log)
    fps = 1.0 / per if per > 0 else float("inf")
    log(f"tsukuba full pipeline: {per*1e3:.2f} ms/frame chained "
        f"(t49={ts*1e3:.1f} ms, t145={tb*1e3:.1f} ms) -> {fps:.0f} fps")

    extra = {"tsukuba_ms_per_frame": round(per * 1e3, 3)}
    if synthetic:
        extra["synthetic_input"] = True
    if not os.environ.get("STEREO_BENCH_SKIP_BATCH"):
        try:
            batch_ms = bench_batch(np.asarray(left_np), np.asarray(right_np),
                                   log)
            extra["sequence_batch8_ms_per_frame"] = round(batch_ms, 3)
            extra["sequence_batch8_fps"] = round(1e3 / batch_ms, 1)
        except Exception as e:
            log(f"batch bench failed: {e!r}")
            extra["sequence_batch8_error"] = repr(e)
    if not os.environ.get("STEREO_BENCH_SKIP_BIG"):
        try:
            big_ms = bench_big(log)
            extra["six_mp_ms_per_frame"] = round(big_ms, 1)
            extra["six_mp_fps"] = round(1e3 / big_ms, 2)
            extra["six_mp_vs_baseline"] = round(BASELINE_BIKE_MS / big_ms, 1)
        except Exception as e:  # keep the headline metric alive
            log(f"6MP bench failed: {e!r}")
            extra["six_mp_error"] = repr(e)
    if not os.environ.get("STEREO_BENCH_SKIP_WIDED"):
        try:
            wd_ms = bench_wide_d(log)
            extra["wide_d_ms_per_frame"] = round(wd_ms, 1)
            extra["wide_d_config"] = "5.9MP_128disp"
        except Exception as e:
            log(f"wide-D bench failed: {e!r}")
            extra["wide_d_error"] = repr(e)
    if not os.environ.get("STEREO_BENCH_SKIP_3MP"):
        # 3 MP staged frame — captures the r5 single-x-tile pick
        # (BENCH.md: 9.36 -> 8.44 ms)
        try:
            from stereo_matching_cuda_tpu.config import (
                DEFAULT_CONFIG as _cfg3)

            l3, r3 = _structured_pair(1504, 2048)
            mp3_ms = _staged_chain_ms(_cfg3, l3, r3, log, "3MP", n_big=9)
            log(f"3MP full pipeline (staged, structured frames): "
                f"{mp3_ms:.2f} ms/frame")
            extra["three_mp_ms_per_frame"] = round(mp3_ms, 2)
        except Exception as e:
            log(f"3MP bench failed: {e!r}")
            extra["three_mp_error"] = repr(e)

    print(json.dumps({
        "metric": "tsukuba_full_pipeline_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_TSUKUBA_FPS, 2),
        "extra": extra,
    }), flush=True)


if __name__ == "__main__":
    main()
