"""Round-3 probe: warm-cache first-frame latency (VERDICT #3 capture).

r3_bigtile measured the Tsukuba `--vmem-mb 32` profile at 0.52 ms/frame
(1,929 fps) behind a 1,897 s cold Mosaic compile.  This probe re-runs
the same configs in a fresh process against the populated persistent
compile cache (/tmp/stereo_jax_cache — the CLI enables the same cache
by default) and reports the WARM first-frame latency, completing the
{default, vmem32} x {cold, warm} table for BENCH.md.
"""

import dataclasses
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline, stereo_pipeline_staged
from stereo_matching_cuda_tpu.utils.io import read_png
from stereo_matching_cuda_tpu.utils.synth import make_scene

print(f"device: {jax.devices()[0].device_kind}", flush=True)

D = "/root/reference/stereo_matching_cuda/data"
tl = jnp.asarray(read_png(f"{D}/tsukuba0.png"))
tr = jnp.asarray(read_png(f"{D}/tsukuba1.png"))
summ = jax.jit(lambda x: jnp.sum(x))

# 1. Tsukuba vmem32 (the warm-cache fast profile): first frame + chains
cfg32 = dataclasses.replace(DEFAULT_CONFIG, vmem_mb=32)
t0 = time.time()
float(summ(stereo_pipeline(tl, tr, cfg32)["occlusion_filled"]))
print(f"  tsukuba vmem32 WARM first frame: {time.time()-t0:.1f}s", flush=True)


def make_looped(n, cfg):
    def step(i, carry):
        li, ri = carry
        out = stereo_pipeline(li, ri, cfg)["occlusion_filled"]
        return (li + (out[..., None].astype(jnp.uint8) & 1), ri)

    def run(l, r):
        lo, _ = jax.lax.fori_loop(0, n, step, (l, r))
        return jnp.sum(lo.astype(jnp.float32))

    return jax.jit(run)


fs, fb = make_looped(17, cfg32), make_looped(49, cfg32)
t0 = time.time()
float(fs(tl, tr)); float(fb(tl, tr))
print(f"  tsukuba vmem32 WARM chain compiles: {time.time()-t0:.1f}s",
      flush=True)


def tt(f):
    t0 = time.time(); float(f(tl, tr)); return time.time() - t0


ts = min(tt(fs) for _ in range(3))
tb = min(tt(fb) for _ in range(3))
print(f"  tsukuba vmem32 steady: {(tb-ts)/32*1e3:.3f} ms/frame", flush=True)

# 2. 6 MP auto default (vmem64 via effective_config): warm first frame
s6 = make_scene(1992, 3008, ndisp=16, seed=7)
bl, br = jnp.asarray(s6["left"]), jnp.asarray(s6["right"])
t0 = time.time()
float(summ(stereo_pipeline_staged(bl, br, DEFAULT_CONFIG)["occlusion_filled"]))
print(f"  6MP auto-default WARM first frame: {time.time()-t0:.1f}s",
      flush=True)
print("done", flush=True)
