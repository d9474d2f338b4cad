"""Post-strategy-flip 6 MP probes.

1. Stage breakdown of the NEW default path (single-view fori + roll
   y-sums via pipeline._BIG_STRATEGY): gray / +matching / +LR+fill
   prefix chains — where do the 24.3 ms go?
2. fori+roll at --vmem-mb 32: the tile picker affords (128, 1024)
   tiles (vs (128, 512) default), halving x-halo recompute; does the
   bigger working set pay off like it did at 128 d (219 vs 320 ms)?

Chain-of-5 differencing, min of 2 (bench.py methodology).
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
from stereo_matching_cuda_tpu.pipeline import (
    _gray_stage, _matching_stage, _post_stage, effective_config,
    stereo_pipeline_staged)

print(f"device: {jax.devices()[0].device_kind}", flush=True)

rng = np.random.default_rng(1)
big_l = rng.integers(0, 256, size=(1992, 3008, 3), dtype=np.uint8)
big_r = np.roll(big_l, 7, axis=1)
bl, br = jnp.asarray(big_l), jnp.asarray(big_r)

summ = jax.jit(lambda *xs: sum(jnp.sum(x.astype(jnp.float32)) for x in xs))
perturb = jax.jit(lambda l, s: l + (s.astype(jnp.uint8) & 1)[..., None])

cfg = effective_config(DEFAULT_CONFIG, 1992, 3008)
print(f"effective: unroll_max={cfg.unroll_max} y_sum={cfg.y_sum}", flush=True)


def prefix_gray(l, r):
    return (_gray_stage(l, cfg), _gray_stage(r, cfg))


def prefix_match(l, r):
    gl, gr = prefix_gray(l, r)
    bl_, dl, br_, dr = _matching_stage(gl, gr, cfg)[:4]
    return (dl, dr)


def prefix_full(l, r):
    dl, dr = prefix_match(l, r)
    occ, filled = _post_stage(dl, dr, cfg)
    return (filled,)


def bench(fn, label):
    try:
        t0 = time.time()
        float(summ(*fn(bl, br)))
        print(f"  [{label}] compile+first {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"  [{label}] FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None

    def chain(n):
        t0 = time.time()
        l = bl
        for _ in range(n):
            outs = fn(l, br)
            l = perturb(l, outs[0])
        float(summ(*outs))
        return time.time() - t0

    chain(1)
    t1 = min(chain(1), chain(1))
    t5 = min(chain(5), chain(5))
    per = (t5 - t1) / 4 * 1e3
    print(f"  {label}: {per:.1f} ms/frame", flush=True)
    return per


g = bench(prefix_gray, "gray only")
m = bench(prefix_match, "gray+matching")
f = bench(prefix_full, "full (gray+matching+LR+fill)")
if None not in (g, m, f):
    print(f"  breakdown: gray {g:.1f} | matching {m-g:.1f} | "
          f"LR+fill {f-m:.1f} | total {f:.1f}", flush=True)

# vmem32 variant of the new default
cfg32 = dataclasses.replace(cfg, vmem_mb=32)


def frame32(l, r):
    return (stereo_pipeline_staged(l, r, cfg32)["occlusion_filled"],)


bench(frame32, "fori+roll vmem32 full")
print("done", flush=True)
