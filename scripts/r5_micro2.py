"""Round-5 microbenchmarks, part 2: fused/ILP costs + real slice slope.

r5_microbench.py measured ISOLATED op costs (one serial dependence
tree per iteration).  The real kernel runs FOUR independent box-mean
trees per guided phase (cost, I*cost, a, b), so Mosaic can interleave
them — isolated costs overestimate.  This probe measures:

  (1) boxm1 / boxm4: the kernel's exact roll-impl box-mean composition
      (_roll(_fws(_roll(_fws(x,19,1),9,1),19,0),9,0) * 1/361) on ONE
      array vs FOUR independent row-quarters — the ILP factor;
  (2) xla_add: a trivial XLA-only chained body — separates the ~23 us
      per-pallas-call launch overhead (r5_microbench grid intercept)
      from generic chain overhead;
  (3) slice slope: the REAL single-view fori streaming kernel
      (guided_wta_fused) at D = 8/16/32 with the tile picker pinned to
      (112, 384) — the per-call time is linear in D: slope = true
      per-slice cost at fixed tiles, intercept = setup + launch.
      This decomposes the measured Tsukuba kernel into per-slice vs
      fixed terms with NO model assumptions.

Run (one TPU job at a time, quiet machine):
  cd /root/repo && nohup setsid env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/r5_micro2.py > /tmp/r5_micro2.log 2>&1 &
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")

import stereo_matching_cuda_tpu.ops.pallas_guided as PG
from stereo_matching_cuda_tpu.config import StereoConfig
from stereo_matching_cuda_tpu.ops.pallas_guided import (_forward_window_sum,
                                                        _roll)

M = 1024
VPU_PEAK = 8 * 128 * 4 * 0.94e9


def _boxm(x):
    """The kernel's roll-impl box mean (k=19, r=9), area-normalized."""
    sx = _roll(_forward_window_sum(x, 19, 1), 9, 1)
    return _roll(_forward_window_sum(sx, 19, 0), 9, 0) * (1.0 / 361.0)


def _iter_kernel(shape, n_iter, body):
    def kernel(x_ref, o_ref):
        o_ref[:] = jax.lax.fori_loop(0, n_iter, lambda i, x: body(x),
                                     x_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def _time_chain(call, x, log, m=M):
    def run(v):
        y = jax.lax.fori_loop(0, m, lambda i, c: call(c), v)
        return jnp.sum(y)

    f = jax.jit(run)
    t0 = time.time()
    float(f(x))
    log(f"    compile+first: {time.time()-t0:.1f}s")

    def once():
        t0 = time.time()
        float(f(x))
        return time.time() - t0

    return min(once() for _ in range(5))


def measure_body(name, shape, body, iters, log):
    n_lo, n_hi = iters
    x = jnp.full(shape, 1.0, jnp.float32)
    t_lo = _time_chain(_iter_kernel(shape, n_lo, body), x, log)
    t_hi = _time_chain(_iter_kernel(shape, n_hi, body), x, log)
    per_iter = (t_hi - t_lo) / (M * (n_hi - n_lo))
    per_elt = per_iter / (shape[0] * shape[1])
    ops_equiv = per_elt * VPU_PEAK
    log(f"  {name} @ {shape}: {per_iter*1e6:.3f} us/iter "
        f"= {ops_equiv:.2f} op-equivalents/elt")
    return {"name": name, "shape": list(shape),
            "per_iter_us": per_iter * 1e6, "ops_equiv_per_elt": ops_equiv}


def main():
    t_start = time.time()

    def log(*a):
        print(f"[{time.time()-t_start:7.1f}s]", *a, flush=True)

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    results = {"device": dev.device_kind, "M": M}
    rows = []

    # (1) fused box-mean: one tree vs four independent trees
    shape = (384, 512)

    def boxm1(x):
        return _boxm(x)

    def boxm4(x):
        qs = [x[i * 96:(i + 1) * 96] for i in range(4)]
        return jnp.concatenate([_boxm(q) for q in qs], axis=0)

    def save():
        with open("/tmp/r5_micro2.json", "w") as f:
            json.dump(results, f, indent=1)

    rows.append(measure_body("boxm1", shape, boxm1, (4, 36), log))
    rows.append(measure_body("boxm4", shape, boxm4, (4, 36), log))
    results["bodies"] = rows
    save()

    # (2) XLA-only chain body: per-iteration overhead without pallas
    x = jnp.full(shape, 1.0, jnp.float32)

    def xla_chain(m):
        def run(v):
            y = jax.lax.fori_loop(0, m, lambda i, c: c * 1.0000001 + 1e-30, v)
            return jnp.sum(y)

        f = jax.jit(run)
        float(f(x))

        def once():
            t0 = time.time()
            float(f(x))
            return time.time() - t0

        return min(once() for _ in range(5))

    t = xla_chain(M)
    log(f"  xla mac chain: {t/M*1e6:.2f} us/iter "
        f"(pallas minimal call was ~23 us — the difference is the "
        f"per-pallas-call launch cost)")
    results["xla_mac_us_per_iter"] = t / M * 1e6
    save()

    # (3) real-kernel slice slope at pinned tiles
    log("=== slice slope: guided_wta_fused, pinned tiles (112,384) ===")
    orig_pick = PG._pick_tiles_stream
    PG._pick_tiles_stream = lambda *a, **k: (112, 384)
    try:
        rng = np.random.default_rng(7)
        base = rng.integers(0, 256, size=(288, 384 + 32), dtype=np.uint8)
        sm = base.astype(np.float32)
        sm = ((sm + np.roll(sm, 1, 1) + np.roll(sm, -1, 1)) / 3).astype(
            np.uint8)
        gl = jnp.asarray(sm[:, 16:16 + 384])
        gr = jnp.asarray(sm[:, 10:10 + 384])
        slope_rows = []
        for dmin in (-7, -15, -31):
            cfg = StereoConfig(d_min=dmin, d_max=0, unroll_max=4,
                               y_sum="roll", stream=True, vmem_mb=32,
                               fused=True)

            def call(g):
                best, dmap = PG.guided_wta_fused(g, gr, cfg.d_min, cfg)
                return g + (dmap.astype(jnp.int32) & 1).astype(g.dtype)

            t = _time_chain(call, gl, log, m=256)
            per_call = t / 256
            log(f"  D={cfg.size_d}: {per_call*1e3:.4f} ms/call")
            slope_rows.append((cfg.size_d, per_call))
        ds = np.array([r[0] for r in slope_rows], float)
        ts = np.array([r[1] for r in slope_rows], float)
        slope, intercept = np.polyfit(ds, ts, 1)
        log(f"  per-slice: {slope*1e6:.2f} us, fixed (setup+launch): "
            f"{intercept*1e6:.2f} us  [tiles (112,384), 3 programs]")
        results["slice_slope"] = {
            "tiles": [112, 384], "rows": [(int(d), t * 1e3)
                                          for d, t in slope_rows],
            "per_slice_us": float(slope) * 1e6,
            "fixed_us": float(intercept) * 1e6}
    finally:
        PG._pick_tiles_stream = orig_pick

    save()
    log("DONE r5_micro2")


if __name__ == "__main__":
    main()
