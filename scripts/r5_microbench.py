"""Round-5 VPU microbenchmarks: measured pltpu.roll + per-program costs.

VERDICT r4 #1: the analytic roofline charges `pltpu.roll` at "1 op/elt
— a generous lower bound", so the shipped configs' "51-60% of bound"
bounds nothing.  This probe measures, on real v5e hardware:

  (a) per-element cost of a (roll + add) step on the LANE axis (axis=1)
      and the SUBLANE axis (axis=0) at shifts 1 and 16 (the window
      sum's actual rolls are _roll(x, -p, axis), i.e. hardware shift
      n-p — measured exactly that way), at the shipped Tsukuba
      streaming strip shape (360, 512) and a big-frame (512, 1024);
  (b) per-element cost of a plain add and of a mul-add (VPU-peak
      calibration);
  (c) per-element cost of the full k=19 log-doubling window sum
      (_forward_window_sum — the exact composition every shipped
      kernel runs) on each axis;
  (d) per-PROGRAM fixed overhead: a minimal grid kernel at
      P = 1/4/16/64/192 programs — slope = grid sequencing + block
      DMA cost per program.

Methodology: each kernel variant runs its body N_ITER times inside a
`lax.fori_loop` IN the kernel (serial data dependence: x = f(x)); the
pallas_call is chained M=1024 times inside an outer jitted fori_loop
(carry = kernel output feeds next input), forced by a scalar fetch.
Per-iteration time = (T(n_hi) - T(n_lo)) / (M * (n_hi - n_lo)), min of
5 runs each — the dispatch round-trip and all per-call fixed costs are
IDENTICAL between the two executables (same grid, same shapes, same
DMAs) and cancel in the difference; only the in-kernel loop body count
differs.  Grid overhead instead differences across P at fixed body.

Run (one TPU job at a time, quiet machine):
  cd /root/repo && nohup setsid env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/r5_microbench.py > /tmp/r5_micro.log 2>&1 &
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")

from stereo_matching_cuda_tpu.ops.pallas_guided import (_forward_window_sum,
                                                        _roll)

import os

INTERPRET = os.environ.get("R5_INTERPRET") == "1"   # CPU smoke mode
M = 4 if INTERPRET else 1024   # chain length (per-call costs cancel in diffs)
VPU_PEAK = 8 * 128 * 4 * 0.94e9


def _iter_kernel(shape, n_iter, body):
    """pallas_call: x -> fori_loop(n_iter, body) applied to x, grid=1."""

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
        interpret=INTERPRET,
    )


def _time_call(call, shape, log):
    """Seconds for one chained-M executable call (min of 5)."""
    x = jnp.full(shape, 1e-30, jnp.float32)

    def run(v):
        y = jax.lax.fori_loop(0, M, lambda i, c: call(c), v)
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
    """Per-iteration per-element cost via the n_iter slope."""
    n_lo, n_hi = iters
    t_lo = _time_call(_iter_kernel(shape, n_lo, body), shape, log)
    t_hi = _time_call(_iter_kernel(shape, n_hi, body), shape, log)
    per_iter = (t_hi - t_lo) / (M * (n_hi - n_lo))
    per_elt = per_iter / (shape[0] * shape[1])
    ops_equiv = per_elt * VPU_PEAK
    log(f"  {name} @ {shape}: {per_iter*1e6:.4f} us/iter "
        f"= {ops_equiv:.2f} op-equivalents/elt "
        f"(chain {t_lo*1e3:.1f} -> {t_hi*1e3:.1f} ms)")
    return {"name": name, "shape": list(shape),
            "per_iter_us": per_iter * 1e6, "ops_equiv_per_elt": ops_equiv}


def grid_overhead(p_values, log):
    """Minimal per-program kernel: each program adds 1.0 to its own
    (8, 128) block.  Slope of per-call time vs P = per-program cost."""
    rows = []
    for p in p_values:
        shape = (8 * p, 128)

        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] + 1.0

        call = pl.pallas_call(
            kernel,
            grid=(p,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=INTERPRET,
        )
        t = _time_call(call, shape, log)
        log(f"  grid P={p}: {t/M*1e6:.2f} us/call")
        rows.append((p, t / M))
    ps = np.array([r[0] for r in rows], float)
    ts = np.array([r[1] for r in rows], float)
    slope, intercept = np.polyfit(ps, ts, 1)
    log(f"  per-program cost: {slope*1e6:.3f} us "
        f"(per-call intercept {intercept*1e6:.2f} us)")
    return {"per_program_us": float(slope) * 1e6,
            "intercept_us": float(intercept) * 1e6,
            "rows": [(int(p), t * 1e6) for p, t in rows]}


def main():
    t_start = time.time()

    def log(*a):
        print(f"[{time.time()-t_start:7.1f}s]", *a, flush=True)

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")

    results = {"device": dev.device_kind, "M": M}
    rows = []
    it_fast = (32, 288)    # 1-2-op bodies
    it_slow = (8, 72)      # ~14-op window-sum body

    plans = {
        (360, 512): ["add", "mac", "ra1_1", "ra1_16", "ra0_1", "ra0_16",
                     "xs1", "xs0"],
        (512, 1024): ["add", "ra1_1", "ra0_1", "xs1", "xs0"],
    }
    if INTERPRET:          # CPU smoke: validate tracing only
        it_fast, it_slow = (2, 4), (1, 2)
        plans = {(16, 256): ["add", "mac", "ra1_1", "ra0_16", "xs1", "xs0"]}
    bodies = {
        "add": (lambda x: x + 1.0, it_fast),
        "mac": (lambda x: x * 1.0000001 + 1e-30, it_fast),
        "ra1_1": (lambda x: x + _roll(x, -1, 1), it_fast),
        "ra1_16": (lambda x: x + _roll(x, -16, 1), it_fast),
        "ra0_1": (lambda x: x + _roll(x, -1, 0), it_fast),
        "ra0_16": (lambda x: x + _roll(x, -16, 0), it_fast),
        "xs1": (lambda x: _forward_window_sum(x, 19, 1) * 0.05, it_slow),
        "xs0": (lambda x: _forward_window_sum(x, 19, 0) * 0.05, it_slow),
    }
    for shape, names in plans.items():
        log(f"=== shape {shape} ===")
        for nm in names:
            body, iters = bodies[nm]
            rows.append(measure_body(nm, shape, body, iters, log))

    results["bodies"] = rows

    log("=== per-program overhead ===")
    results["grid"] = grid_overhead([1, 4, 16, 64, 192], log)

    with open("/tmp/r5_micro.json", "w") as f:
        json.dump(results, f, indent=1)
    log("DONE r5_microbench")


if __name__ == "__main__":
    main()
