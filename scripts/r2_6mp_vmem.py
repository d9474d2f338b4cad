"""6 MP dual-view staged pipeline vs VMEM budget.

The tile picker's halo-recompute overhead at 6 MP falls from 2.33x
(default 15.7 MiB budget, (64,384) tiles) to 1.48x at 64 MiB
((256,512) tiles) — measure whether frame time follows.  Python-chained
staging, (t5-t1)/4 differencing, min of 2.
"""

import dataclasses
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import (
    stereo_pipeline_staged, use_staged_path)

print(f"device: {jax.devices()[0].device_kind}", flush=True)

rng = np.random.default_rng(1)
big_l = rng.integers(0, 256, size=(1992, 3008, 3), dtype=np.uint8)
big_r = np.roll(big_l, 7, axis=1)
bl, br = jnp.asarray(big_l), jnp.asarray(big_r)

summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))

for mb in (32, 64, 96):
    cfg = dataclasses.replace(DEFAULT_CONFIG, vmem_mb=mb)
    assert use_staged_path(cfg, 1992, 3008)

    def frame(l, r, cfg=cfg):
        return stereo_pipeline_staged(l, r, cfg)["occlusion_filled"]

    label = f"6MP dual vmem={mb}"
    try:
        t0 = time.time()
        float(summ(frame(bl, br)))
        print(f"  [{label}] compile+first {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"  [{label}] FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        continue

    def run_chain(n):
        t0 = time.time()
        l, f = bl, None
        for _ in range(n):
            f = frame(l, br)
            l = perturb(l, f)
        float(summ(f))
        return time.time() - t0

    run_chain(1)
    t1 = min(run_chain(1), run_chain(1))
    t5 = min(run_chain(5), run_chain(5))
    per = (t5 - t1) / 4 * 1e3
    print(f"  {label}: {per:.1f} ms/frame ({1e3/per:.2f} fps)", flush=True)
print("done", flush=True)
