"""Where do the 6 MP ~32 ms/frame go in the staged pipeline?

Prefix chains over the product stage jits (gray / +dual kernel /
+LR+fill), Python-chained with perturb-by-output, (t5-t1)/4
differencing, min of 2.  Run with the default (TPU) env.
Optionally set STEREO_VMEM_MB to probe a different budget.
"""

import dataclasses
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import (
    _gray_stage, _matching_stage, _post_stage)

cfg = DEFAULT_CONFIG
if os.environ.get("STEREO_VMEM_MB"):
    cfg = dataclasses.replace(cfg, vmem_mb=int(os.environ["STEREO_VMEM_MB"]))

print(f"device: {jax.devices()[0].device_kind} vmem_mb={cfg.vmem_mb}",
      flush=True)

rng = np.random.default_rng(1)
big_l = rng.integers(0, 256, size=(1992, 3008, 3), dtype=np.uint8)
big_r = np.roll(big_l, 7, axis=1)
bl, br = jnp.asarray(big_l), jnp.asarray(big_r)

summ = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))


def frame(stage):
    def run1(l):
        gl, gr = _gray_stage(l, cfg), _gray_stage(br, cfg)
        if stage == 0:
            return gl
        _, dl, _, dr, *_ = _matching_stage(gl, gr, cfg)
        if stage == 1:
            return dl
        _, filled = _post_stage(dl, dr, cfg)
        return filled
    return run1


labels = ["grayscale x2", "+ dual fused kernel", "+ LR + fill"]
prev = 0.0
for stage in range(3):
    fr = frame(stage)
    t0 = time.time()
    float(summ(fr(bl)))
    cs = time.time() - t0

    def run_chain(n):
        t0 = time.time()
        l, f = bl, None
        for _ in range(n):
            f = fr(l)
            l = perturb(l, f)
        float(summ(f))
        return time.time() - t0

    run_chain(1)
    t1 = min(run_chain(1), run_chain(1))
    t5 = min(run_chain(5), run_chain(5))
    ms = (t5 - t1) / 4 * 1e3
    print(f"  {labels[stage]:24s} {ms:7.2f} ms/frame  (+{ms-prev:6.2f})  "
          f"[compile+first {cs:.0f}s]", flush=True)
    prev = ms
print("done", flush=True)
