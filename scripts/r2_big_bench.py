"""Full-frame 128-disparity + sequence-throughput benches on TPU
(VERDICT round-1 item #6; BASELINE.json configs #4-#5).

  1. 3 MP Middlebury-class pair, 128 disparities, FULL pipeline
     (grayscale -> fused fori-loop kernel x2 -> LR -> fill) through the
     product staged path.
  2. Sequence throughput: stereo_pipeline_batch (vmapped composed
     pipeline) over B=8 Tsukuba pairs, chained-in-jit.
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
    stereo_pipeline_batch, stereo_pipeline_staged, use_staged_path)
from stereo_matching_cuda_tpu.utils.io import read_png

print(f"device: {jax.devices()[0].device_kind}", flush=True)

# ----------------------------------------------------------------------
print("=== 1. 3 MP, 128 disparities, full pipeline (staged) ===", flush=True)
cfg128 = StereoConfig(d_min=-127, d_max=0)
H, W = 1504, 2000
assert use_staged_path(cfg128, H, W)
rng = np.random.default_rng(2)
base = rng.integers(0, 256, (H, W + 128, 3), np.uint8)
big_l = jnp.asarray(base[:, 128:])
big_r = jnp.asarray(base[:, :-128])

summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))


def frame(l, r):
    return stereo_pipeline_staged(l, r, cfg128)["occlusion_filled"]


t0 = time.time()
float(summ(frame(big_l, big_r)))
print(f"  first frame (incl compile): {time.time()-t0:.1f}s", flush=True)


def run_chain(n):
    t0 = time.time()
    l = big_l
    f = None
    for _ in range(n):
        f = frame(l, big_r)
        l = perturb(l, f)
    float(summ(f))
    return time.time() - t0


run_chain(1)
t1 = min(run_chain(1), run_chain(1))
t3 = min(run_chain(3), run_chain(3))
per = (t3 - t1) / 2 * 1e3
print(f"  3MP/128d full pipeline: {per:.1f} ms/frame ({1e3/per:.2f} fps)",
      flush=True)

# ----------------------------------------------------------------------
print("=== 2. sequence throughput: batch B=8 Tsukuba, one chip ===",
      flush=True)
D = "/root/reference/stereo_matching_cuda/data"
left = np.asarray(read_png(f"{D}/tsukuba0.png"))
right = np.asarray(read_png(f"{D}/tsukuba1.png"))
B = 8
bl = jnp.asarray(np.stack([np.roll(left, i, axis=1) for i in range(B)]))
br = jnp.asarray(np.stack([np.roll(right, i, axis=1) for i in range(B)]))
cfg = DEFAULT_CONFIG


def chained(n):
    def step(i, carry):
        li, acc = carry
        out = stereo_pipeline_batch(li, br, cfg)["occlusion_filled"]
        li2 = li + (out[..., None].astype(jnp.uint8) & 1)
        return (li2, acc + jnp.sum(out))

    def run(l):
        _, acc = jax.lax.fori_loop(0, n, step, (l, jnp.float32(0)))
        return acc

    return jax.jit(run)


f1, f9 = chained(1), chained(9)
t0 = time.time()
float(f1(bl)); float(f9(bl))
print(f"  compile+first: {time.time()-t0:.1f}s", flush=True)


def t(f):
    t0 = time.time()
    float(f(bl))
    return time.time() - t0


t1 = min(t(f1), t(f1))
t9 = min(t(f9), t(f9))
per_step = (t9 - t1) / 8
print(f"  batch B=8: {per_step*1e3:.2f} ms/step = "
      f"{per_step/B*1e3:.3f} ms/frame -> {B/per_step:.0f} frames/s",
      flush=True)
print("done", flush=True)
