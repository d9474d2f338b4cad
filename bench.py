"""Benchmark harness — one JSON line on stdout for the driver.

Headline metric: Tsukuba full-pipeline frames/s (both views, 16
disparities, grayscale → cost → guided filter → WTA → LR → fill),
including host→device input transfer, matching the reference baseline's
"kernels + memcpy" accounting (BASELINE.md): GTX 1080 ≈ 183.4 ms/frame
= 5.45 fps.

Extra per-stage and large-frame numbers go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_TSUKUBA_FPS = 1000.0 / (124.55 + 58.81)  # BASELINE.md: 5.45 fps


def _load_tsukuba():
    d = "/root/reference/stereo_matching_cuda/data"
    try:
        from stereo_matching_cuda_tpu.utils.io import read_png

        return read_png(os.path.join(d, "tsukuba0.png")), read_png(
            os.path.join(d, "tsukuba1.png"))
    except Exception:
        rng = np.random.default_rng(0)
        base = rng.integers(0, 256, size=(288, 384 + 16, 3), dtype=np.uint8)
        return base[:, 16:], base[:, :-16]


def bench_fn(fn, args, iters=20, warmup=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
    from stereo_matching_cuda_tpu.pipeline import stereo_pipeline

    left_np, right_np = _load_tsukuba()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    def run(l, r):
        return stereo_pipeline(l, r, DEFAULT_CONFIG)["occlusion_filled"]

    jit_run = jax.jit(run)

    # device-resident steady state (kernel time only)
    l_dev = jnp.asarray(left_np)
    r_dev = jnp.asarray(right_np)
    t_dev = bench_fn(jit_run, (l_dev, r_dev))

    # including H2D of the uint8 inputs (reference counted memcpys)
    def with_h2d(l, r):
        return jit_run(jnp.asarray(l), jnp.asarray(r))

    t_h2d = bench_fn(with_h2d, (left_np, right_np))

    fps = 1.0 / t_h2d
    print(
        f"tsukuba full pipeline: {t_dev*1e3:.2f} ms device-resident, "
        f"{t_h2d*1e3:.2f} ms with H2D  ({fps:.1f} fps)",
        file=sys.stderr,
    )

    # the driver's one JSON line — print before any optional extras so a
    # timeout on the large-frame section can't eat the result
    print(json.dumps({
        "metric": "tsukuba_full_pipeline_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_TSUKUBA_FPS, 2),
    }), flush=True)

    # optional: ~6 MP frame (the reference's "bike" scale).  The compile
    # for this shape can take minutes, so it is opt-in.
    if os.environ.get("STEREO_BENCH_BIG"):
        import dataclasses

        cfg_big = dataclasses.replace(DEFAULT_CONFIG, d_chunk=4)

        def run_big(l, r):
            return stereo_pipeline(l, r, cfg_big)["occlusion_filled"]

        rng = np.random.default_rng(1)
        big_l = rng.integers(0, 256, size=(1992, 3008, 3), dtype=np.uint8)
        big_r = np.roll(big_l, 7, axis=1)
        bl, br = jnp.asarray(big_l), jnp.asarray(big_r)
        t_big = bench_fn(jax.jit(run_big), (bl, br), iters=3, warmup=1)
        print(
            f"6MP full pipeline: {t_big*1e3:.1f} ms ({1.0/t_big:.2f} fps; "
            f"reference bike ≈ 7715 ms → {7.715/t_big:.0f}x)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
