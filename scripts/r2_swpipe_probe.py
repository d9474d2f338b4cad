"""Software-pipelined dual kernel vs baseline on hardware (Tsukuba).

The roofline (BENCH.md) shows the dual kernel's VPU (0.20 ms) and MXU
(0.26 ms) phases serialized: measured kernel ~= their sum.  The
sw_pipeline emission order gives Mosaic independent VPU work while each
y-sum matmul is in flight; if the scheduler overlaps, the kernel
approaches max(VPU, MXU) = 0.26 ms — a ~0.2 ms/frame win.

Composed Tsukuba pipeline, N=17/N=49 chained-in-jit differencing
(bench.py methodology), min of 3.  Also a 6 MP staged-path pair to see
whether the pipeline helps at MXU-bound scale.
"""

import dataclasses
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.utils.io import read_png
from bench import make_looped, _timeit

print(f"device: {jax.devices()[0].device_kind}", flush=True)

d = "/root/reference/stereo_matching_cuda/data"
l = jnp.asarray(read_png(f"{d}/tsukuba0.png"))
r = jnp.asarray(read_png(f"{d}/tsukuba1.png"))

for label, cfg in [
    ("baseline", dataclasses.replace(DEFAULT_CONFIG, sw_pipeline=False)),
    ("sw_pipeline", dataclasses.replace(DEFAULT_CONFIG, sw_pipeline=True)),
]:
    fs, fb = make_looped(cfg, 17), make_looped(cfg, 49)
    t0 = time.time()
    float(fs(l, r)); float(fb(l, r))
    print(f"  [{label}] compile+first: {time.time()-t0:.1f}s", flush=True)
    ts = min(_timeit(fs, l, r) for _ in range(3))
    tb = min(_timeit(fb, l, r) for _ in range(3))
    per = (tb - ts) / 32 * 1e3
    print(f"  {label}: {per:.3f} ms/frame ({1e3/per:.0f} fps)", flush=True)
print("done", flush=True)
