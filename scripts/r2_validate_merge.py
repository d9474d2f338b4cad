"""Validate the merged y-sum decision on TPU: dual kernel square,
single-view kernel band-restricted.

  1. Tsukuba full composed pipeline (default cfg) — expect ~0.66 ms.
  2. 3 MP (1988x2948), 128 disparities, staged full pipeline @ default
     VMEM — expect ~362 ms (band-restricted fori kernel).
  3. Same @ vmem_mb=32 — expect ~254 ms.
"""

import dataclasses
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG, StereoConfig
from stereo_matching_cuda_tpu.pipeline import (
    stereo_pipeline, stereo_pipeline_staged, use_staged_path)
from stereo_matching_cuda_tpu.utils.io import read_png

print(f"device: {jax.devices()[0].device_kind}", flush=True)

summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))


def chained(frame, l, r, n):
    def run(k):
        t0 = time.time()
        li, f = l, None
        for _ in range(k):
            f = frame(li, r)
            li = perturb(li, f)
        float(summ(f))
        return time.time() - t0

    run(1)
    t1 = min(run(1), run(1))
    tn = min(run(n), run(n))
    return (tn - t1) / (n - 1)


# --- 1. Tsukuba composed ------------------------------------------------
D = "/root/reference/stereo_matching_cuda/data"
left = jnp.asarray(np.asarray(read_png(f"{D}/tsukuba0.png")))
right = jnp.asarray(np.asarray(read_png(f"{D}/tsukuba1.png")))

def tsu_frame(l, r):
    return stereo_pipeline(l, r, DEFAULT_CONFIG)["occlusion_filled"]

t0 = time.time()
float(summ(tsu_frame(left, right)))
print(f"  [tsukuba] compile+first {time.time()-t0:.1f}s", flush=True)
per = chained(tsu_frame, left, right, 17)
print(f"  tsukuba full composed: {per*1e3:.3f} ms/frame "
      f"({1/per:.0f} fps)", flush=True)

# --- 2/3. 3 MP 128 d staged --------------------------------------------
H, W = 1988, 2948
rng = np.random.default_rng(2)
base = rng.integers(0, 256, (H, W + 128, 3), np.uint8)
big_l = jnp.asarray(base[:, 128:])
big_r = jnp.asarray(base[:, :-128])

for label, cfg in [
    ("128d @ default vmem", StereoConfig(d_min=-127, d_max=0)),
    ("128d @ vmem 32", StereoConfig(d_min=-127, d_max=0, vmem_mb=32)),
]:
    assert use_staged_path(cfg, H, W)

    def frame(l, r, cfg=cfg):
        return stereo_pipeline_staged(l, r, cfg)["occlusion_filled"]

    t0 = time.time()
    float(summ(frame(big_l, big_r)))
    print(f"  [{label}] compile+first {time.time()-t0:.1f}s", flush=True)
    per = chained(frame, big_l, big_r, 3)
    print(f"  {label}: {per*1e3:.1f} ms/frame ({1/per:.2f} fps)", flush=True)

print("done", flush=True)
