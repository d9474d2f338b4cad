"""Small-frame crossover: dual unrolled vs fori+roll at 0.11/0.25 MP.

The mid-size decider put fori+roll ahead even at 0.5 MP (2.51 vs
3.58 ms) — the crossover sits below that.  Probe Tsukuba itself
(384×288) and 0.25 MP; if fori+roll wins at Tsukuba the headline
default flips too.  Composed pipeline, chained-in-jit N=17/49
(Tsukuba) and N=9/25 (0.25 MP) differencing.
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

FORI_ROLL = dataclasses.replace(DEFAULT_CONFIG, unroll_max=8, y_sum="roll")
# also split the two knobs: is it the fori branch or the roll y-sums?
FORI_MXU = dataclasses.replace(DEFAULT_CONFIG, unroll_max=8)
DUAL_ROLL = dataclasses.replace(DEFAULT_CONFIG, y_sum="roll")

d = "/root/reference/stereo_matching_cuda/data"
tl = jnp.asarray(read_png(f"{d}/tsukuba0.png"))
tr = jnp.asarray(read_png(f"{d}/tsukuba1.png"))

rng = np.random.default_rng(7)
q = rng.integers(0, 256, size=(512, 512, 3), dtype=np.uint8)
ql, qr = jnp.asarray(q), jnp.asarray(np.roll(q, 9, axis=1))

CASES = [
    ("tsukuba dual(default)", tl, tr, DEFAULT_CONFIG, 17, 49),
    ("tsukuba fori+roll", tl, tr, FORI_ROLL, 17, 49),
    ("tsukuba fori+mxu", tl, tr, FORI_MXU, 17, 49),
    ("tsukuba dual+roll", tl, tr, DUAL_ROLL, 17, 49),
    ("0.25MP dual(default)", ql, qr, DEFAULT_CONFIG, 9, 25),
    ("0.25MP fori+roll", ql, qr, FORI_ROLL, 9, 25),
]

for label, l, r, cfg, ns, nb in CASES:
    fs, fb = make_looped(cfg, ns), make_looped(cfg, nb)
    try:
        t0 = time.time()
        float(fs(l, r)); float(fb(l, r))
        print(f"  [{label}] compile+first: {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"  [{label}] FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        continue
    ts = min(_timeit(fs, l, r) for _ in range(3))
    tb = min(_timeit(fb, l, r) for _ in range(3))
    per = (tb - ts) / (nb - ns) * 1e3
    print(f"  {label}: {per:.3f} ms/frame", flush=True)
print("done", flush=True)
