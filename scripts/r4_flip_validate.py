"""Round-4 validation of the sub-200k default flip (r4_tsufori) plus
the cross-program DMA double-buffer decider.

1. Hardware parity: the NEW Tsukuba default (single-view fori stream
   roll vmem32, via effective_config) vs its non-stream twin
   (stream=False, same knobs — both fori-class compiles).  Reports
   mismatch counts on both disparity maps and the filled output.
2. B=8 sequence throughput on the new default (bench methodology).
3. dma_buffer decider: 6 MP staged frames and 896x1152 mid frames,
   dma_buffer off vs on (bit-identical outputs; only the DMA schedule
   moves — does overlapping the next strip's tile DMA with compute
   buy anything at many-program grids?).
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
    effective_config, stereo_pipeline, stereo_pipeline_batch,
    stereo_pipeline_staged)
from stereo_matching_cuda_tpu.utils.io import read_png
from stereo_matching_cuda_tpu.utils.synth import make_scene

print(f"device: {jax.devices()[0].device_kind}", flush=True)

D = "/root/reference/stereo_matching_cuda/data"
tsul = read_png(f"{D}/tsukuba0.png")
tsur = read_png(f"{D}/tsukuba1.png")
lj, rj = jnp.asarray(tsul), jnp.asarray(tsur)

# --- 1. parity: new default vs non-stream twin --------------------
eff = effective_config(DEFAULT_CONFIG, *tsul.shape[:2])
print(f"effective Tsukuba config: stream={eff.stream} y_sum={eff.y_sum} "
      f"vmem_mb={eff.vmem_mb} unroll_max={eff.unroll_max}", flush=True)
assert eff.stream is True and eff.unroll_max == 8

twin = dataclasses.replace(eff, stream=False)
t0 = time.time()
out_new = {k: np.asarray(v)
           for k, v in stereo_pipeline(lj, rj, DEFAULT_CONFIG).items()}
print(f"  new default compile+first {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
out_twin = {k: np.asarray(v) for k, v in stereo_pipeline(lj, rj, twin).items()}
print(f"  non-stream twin compile+first {time.time()-t0:.1f}s", flush=True)
for k in ("disparity_left", "disparity_right", "occlusion_filled"):
    m = int((out_new[k] != out_twin[k]).sum())
    print(f"  parity {k}: {m}/{out_new[k].size} mismatches", flush=True)

# --- 2. B=8 sequence throughput on the new default ----------------
B = 8
bl = jnp.asarray(np.stack([np.roll(tsul, i, axis=1) for i in range(B)]))
br = jnp.asarray(np.stack([np.roll(tsur, i, axis=1) for i in range(B)]))


def make(nsteps):
    def step(i, carry):
        li, ri = carry
        out = stereo_pipeline_batch(li, ri, DEFAULT_CONFIG)["occlusion_filled"]
        return (li + (out[..., None].astype(jnp.uint8) & 1), ri)

    def run(l, r):
        lo, _ = jax.lax.fori_loop(0, nsteps, step, (l, r))
        return jnp.sum(lo.astype(jnp.float32))

    return jax.jit(run)


f3, f9 = make(3), make(9)
t0 = time.time()
float(f3(bl, br)); float(f9(bl, br))
print(f"  batch chains compile+first {time.time()-t0:.1f}s", flush=True)


def tt(f):
    t0 = time.time(); float(f(bl, br)); return time.time() - t0


t3 = min(tt(f3) for _ in range(3))
t9 = min(tt(f9) for _ in range(3))
per = (t9 - t3) / 6 / B * 1e3
print(f"B=8 sequence, new default: {per:.3f} ms/frame "
      f"({1e3/per:.0f} fps)", flush=True)

# --- 3. dma_buffer decider ----------------------------------------
summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))


def staged_ms(lnp, rnp, cfg, tag, n_big=5):
    lj_, rj_ = jnp.asarray(lnp), jnp.asarray(rnp)

    def frame(l):
        return stereo_pipeline_staged(l, rj_, cfg)["occlusion_filled"]

    t0 = time.time()
    float(summ(frame(lj_)))
    print(f"  [{tag}] compile+first {time.time()-t0:.1f}s", flush=True)

    def chain(n):
        t0 = time.time()
        l, f = lj_, None
        for _ in range(n):
            f = frame(l)
            l = perturb(l, f)
        float(summ(f))
        return time.time() - t0

    chain(1)
    t1 = min(chain(1), chain(1))
    tn = min(chain(n_big), chain(n_big))
    return (tn - t1) / (n_big - 1) * 1e3


s6 = make_scene(1992, 3008, ndisp=16, seed=7)
sm = make_scene(896, 1152, ndisp=16, seed=7)
for tag, sc in [("6MP", s6), ("896x1152", sm)]:
    h, w = sc["left"].shape[:2]
    base = effective_config(DEFAULT_CONFIG, h, w)
    for db in (False, True):
        cfg = dataclasses.replace(base, dma_buffer=db)
        ms = staged_ms(sc["left"], sc["right"], cfg, f"{tag} dbuf={db}")
        print(f"  {tag} dma_buffer={db}: {ms:.2f} ms/frame", flush=True)

print("done", flush=True)
