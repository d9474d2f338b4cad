"""With lane-concatenated y-sum matmuls, retry the 3-limb bf16 split
(y_sum=mxu3: 3 MXU passes vs HIGHEST's 6, same accuracy class) on the
dual Tsukuba kernel.  N=17 vs N=49 chained differencing, min of 3."""

import dataclasses
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline
from stereo_matching_cuda_tpu.utils.io import read_png

D = "/root/reference/stereo_matching_cuda/data"
left = jnp.asarray(read_png(f"{D}/tsukuba0.png"))
right = jnp.asarray(read_png(f"{D}/tsukuba1.png"))
print(f"device: {jax.devices()[0].device_kind}", flush=True)


def chained(fn, n):
    def looped(l, r):
        def step(i, carry):
            li, acc = carry
            v = fn(li, r)
            li2 = li + (v.astype(jnp.uint8) & 1)
            return (li2, acc + v)
        _, acc = jax.lax.fori_loop(0, n, step, (l, jnp.float32(0)))
        return acc
    return jax.jit(looped)


def t(f, l, r):
    t0 = time.time()
    float(f(l, r))
    return time.time() - t0


def per_ms(fn, label, n1=17, n2=49):
    f1, f2 = chained(fn, n1), chained(fn, n2)
    t0 = time.time()
    float(f1(left, right)); float(f2(left, right))
    cs = time.time() - t0
    t1 = min(t(f1, left, right) for _ in range(3))
    t2 = min(t(f2, left, right) for _ in range(3))
    ms = (t2 - t1) / (n2 - n1) * 1e3
    print(f"  {label:40s} {ms:7.3f} ms/frame  (compile+first {cs:.0f}s)",
          flush=True)
    return ms


for ysum in ["mxu", "mxu3"]:
    cfg = dataclasses.replace(DEFAULT_CONFIG, y_sum=ysum)

    def frame(l, r, cfg=cfg):
        return stereo_pipeline(l, r, cfg)["occlusion_filled"].sum()

    per_ms(frame, f"tsukuba dual composed, y_sum={ysum}")
print("done", flush=True)
