"""Follow-ups on the sw_pipeline loss and the 128-d vmem32 y-sum cell.

Round-2 result: sw_pipeline at default VMEM ran 1.091 ms vs the 0.674
baseline — the +10 live-buffer estimate shrank the Tsukuba tiles
(sh 64 -> 32, +43% halo recompute), swamping any overlap gain.  Probe
whether the pipeline wins once tiles match: vmem_mb=32 affords sh=128
for both.  Also fill the missing 128-disparity cell: vmem32 + roll
y-sums (roll won at default VMEM: 308.7 vs 320.6).
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
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline_staged
from stereo_matching_cuda_tpu.utils.io import read_png
from bench import make_looped, _timeit

print(f"device: {jax.devices()[0].device_kind}", flush=True)

d = "/root/reference/stereo_matching_cuda/data"
l = jnp.asarray(read_png(f"{d}/tsukuba0.png"))
r = jnp.asarray(read_png(f"{d}/tsukuba1.png"))

for label, cfg in [
    ("vmem32 baseline", dataclasses.replace(
        DEFAULT_CONFIG, sw_pipeline=False, vmem_mb=32)),
    ("vmem32 sw_pipeline", dataclasses.replace(
        DEFAULT_CONFIG, sw_pipeline=True, vmem_mb=32)),
]:
    fs, fb = make_looped(cfg, 17), make_looped(cfg, 49)
    t0 = time.time()
    float(fs(l, r)); float(fb(l, r))
    print(f"  [{label}] compile+first: {time.time()-t0:.1f}s", flush=True)
    ts = min(_timeit(fs, l, r) for _ in range(3))
    tb = min(_timeit(fb, l, r) for _ in range(3))
    per = (tb - ts) / 32 * 1e3
    print(f"  {label}: {per:.3f} ms/frame ({1e3/per:.0f} fps)", flush=True)

# 128-disparity missing cell: vmem32 + roll
rng = np.random.default_rng(2)
wl = rng.integers(0, 256, size=(1988, 2948, 3), dtype=np.uint8)
wr = np.roll(wl, 11, axis=1)
lj, rj = jnp.asarray(wl), jnp.asarray(wr)
summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda a, f: a + (f[..., None].astype(jnp.uint8) & 1))
cfg128 = dataclasses.replace(DEFAULT_CONFIG, d_min=-127, d_max=0,
                             vmem_mb=32, y_sum="roll")


def frame(a, b):
    return stereo_pipeline_staged(a, b, cfg128)["occlusion_filled"]


try:
    t0 = time.time()
    float(summ(frame(lj, rj)))
    print(f"  [128d vmem32 roll] compile+first {time.time()-t0:.1f}s",
          flush=True)

    def run_chain(n):
        t0 = time.time()
        a, f = lj, None
        for _ in range(n):
            f = frame(a, rj)
            a = perturb(a, f)
        float(summ(f))
        return time.time() - t0

    run_chain(1)
    t1 = min(run_chain(1), run_chain(1))
    t5 = min(run_chain(5), run_chain(5))
    per = (t5 - t1) / 4 * 1e3
    print(f"  128d vmem32 roll: {per:.1f} ms/frame", flush=True)
except Exception as e:
    print(f"  [128d vmem32 roll] FAILED: {type(e).__name__}: {str(e)[:300]}",
          flush=True)
print("done", flush=True)
