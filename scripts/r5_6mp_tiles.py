"""Round-5: 6 MP tile probe — is the (232,1536) auto pick leaving ~18%?

r5_post_scale2 localized the 6 MP model residual in the matching
kernel: 16.97 ms measured vs 14.3 modeled at the measured per-slice
constant (225 op-eq/elt) that holds at (112,384)/(128,1024)/(128,1536)
tiles.  Hypothesis: the (232,1536) strip (256-sublane working set at
vmem64) pays a VMEM-pressure/spill class cost.  Force alternative
tiles and measure the per-view kernel directly.  Every row gets a
DISTINCT vmem_mb so the inner-jit trace cache cannot alias rows
(BENCH.md r4_shsweep post-mortem).

Run:
  cd /root/repo && nohup setsid env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/r5_6mp_tiles.py > /tmp/r5_6mp_tiles.log 2>&1 &
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

import stereo_matching_cuda_tpu.ops.pallas_guided as PG
from stereo_matching_cuda_tpu.config import StereoConfig

T0 = time.time()
RESULTS = {}


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


def main():
    from bench import _structured_pair

    log(f"device: {jax.devices()[0].device_kind}")
    h, w = 1992, 3008
    left, right = _structured_pair(h, w)
    from stereo_matching_cuda_tpu import ops
    cfg0 = StereoConfig(unroll_max=8, y_sum="roll", stream=True, vmem_mb=64)
    gl = np.asarray(jax.jit(
        lambda x: ops.rgb_to_grayscale(x, cfg0))(jnp.asarray(left)))
    gr = np.asarray(jax.jit(
        lambda x: ops.rgb_to_grayscale(x, cfg0))(jnp.asarray(right)))
    gl, gr = jnp.asarray(gl), jnp.asarray(gr)

    M = 16
    orig = PG._pick_tiles_stream
    rows = [("auto_232x1536", None, 64),
            ("176x1536", (176, 1536), 63),
            ("128x1536", (128, 1536), 62),
            ("144x1280", (144, 1280), 61),
            ("128x1024", (128, 1024), 60)]
    try:
        for name, tiles, mb in rows:
            cfg = StereoConfig(unroll_max=8, y_sum="roll", stream=True,
                               vmem_mb=mb, fused=True)
            PG._pick_tiles_stream = (orig if tiles is None
                                     else (lambda *a, _t=tiles, **k: _t))

            def call(g):
                best, dmap = PG.guided_wta_fused(g, gr, cfg.d_min, cfg)
                return g + (dmap.astype(jnp.int32) & 1).astype(g.dtype)

            def run(v):
                y = jax.lax.fori_loop(0, M, lambda i, c: call(c), v)
                return jnp.sum(y)

            f = jax.jit(run)
            t0 = time.time()
            float(f(gl))
            comp = time.time() - t0

            def once():
                t0 = time.time()
                float(f(gl))
                return time.time() - t0

            t = min(once() for _ in range(5)) / M
            log(f"  {name}: {t*1e3:.3f} ms/view (compile {comp:.0f}s)")
            RESULTS[name] = t * 1e3
            with open("/tmp/r5_6mp_tiles.json", "w") as fj:
                json.dump(RESULTS, fj, indent=1)
    finally:
        PG._pick_tiles_stream = orig
    log("DONE r5_6mp_tiles")


if __name__ == "__main__":
    main()
