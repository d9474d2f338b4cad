"""Round-3 probe: B=8 sequence throughput on the vmem32 fast profile.

r3_batch_breakdown attributed 93% of the batched frame to the dual
matching kernel itself (gray 0.002 + matching 0.610 of 0.657 ms) — no
per-frame glue exists to amortize, so sequence throughput scales with
kernel speed.  The vmem32 profile runs the single frame at 0.52 ms;
this measures the batched form (lax.map of the per-frame pipeline,
exactly stereo_pipeline_batch) at the same budget.  Mosaic recompiles
the kernel inside each new enclosing XLA module (~30 min each, then
persistent-cached), so this probe is slow once and cheap forever.
"""

import dataclasses
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline_batch
from stereo_matching_cuda_tpu.utils.io import read_png

print(f"device: {jax.devices()[0].device_kind}", flush=True)

D = "/root/reference/stereo_matching_cuda/data"
left = read_png(f"{D}/tsukuba0.png")
right = read_png(f"{D}/tsukuba1.png")
B = 8
bl = jnp.asarray(np.stack([np.roll(left, i, axis=1) for i in range(B)]))
br = jnp.asarray(np.stack([np.roll(right, i, axis=1) for i in range(B)]))
cfg = dataclasses.replace(DEFAULT_CONFIG, vmem_mb=32)


def make(nsteps):
    def step(i, carry):
        li, ri = carry
        out = stereo_pipeline_batch(li, ri, cfg)["occlusion_filled"]
        return (li + (out[..., None].astype(jnp.uint8) & 1), ri)

    def run(l, r):
        lo, _ = jax.lax.fori_loop(0, nsteps, step, (l, r))
        return jnp.sum(lo.astype(jnp.float32))

    return jax.jit(run)


f1, fn = make(3), make(9)
t0 = time.time()
float(f1(bl, br)); float(fn(bl, br))
print(f"  batch vmem32 compiles: {time.time()-t0:.1f}s", flush=True)


def tt(f):
    t0 = time.time(); float(f(bl, br)); return time.time() - t0


t1 = min(tt(f1) for _ in range(3))
tn = min(tt(fn) for _ in range(3))
per = (tn - t1) / 6 / B * 1e3
print(f"  B=8 vmem32 sequence: {per:.3f} ms/frame = {1e3/per:.0f} fps",
      flush=True)
print("done", flush=True)
