"""Bisect which 6MP pipeline stage explodes remote compile time.

Compiles each stage separately at (1992, 3008) and prints wall time.
Run on the TPU (default env).  Uses the persistent compile cache so a
second run is cheap.
"""

import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG as cfg
from stereo_matching_cuda_tpu import ops

H, W = 1992, 3008
rng = np.random.default_rng(0)
rgb = jnp.asarray(rng.integers(0, 256, (H, W, 3), np.uint8))
gray = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
disp = jnp.asarray(rng.integers(-15, 1, (H, W)).astype(np.float32))


def timed(name, fn, *args):
    t0 = time.time()
    out = jax.jit(fn).lower(*args).compile()
    print(f"{name:24s} compile: {time.time()-t0:7.1f}s", flush=True)
    return out


timed("rgb_to_grayscale", lambda x: ops.rgb_to_grayscale(x, cfg), rgb)
timed("detect_occlusion", lambda a, b: ops.detect_occlusion(a, b, cfg.d_occlusion, cfg), disp, disp)
timed("fill_occlusion", lambda a: ops.fill_occlusion(a, cfg.v_min, cfg), disp)

from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused

t0 = time.time()
jax.jit(lambda a, b: guided_wta_fused(a, b, cfg.d_min, cfg)).lower(gray, gray).compile()
print(f"{'guided_wta_fused':24s} compile: {time.time()-t0:7.1f}s", flush=True)

from stereo_matching_cuda_tpu.pipeline import stereo_pipeline

t0 = time.time()
jax.jit(lambda a, b: stereo_pipeline(a, b, cfg)["occlusion_filled"]).lower(rgb, rgb).compile()
print(f"{'full stereo_pipeline':24s} compile: {time.time()-t0:7.1f}s", flush=True)
