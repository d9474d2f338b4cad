"""Round-5: validate the streaming tile-width cap raise (1536 -> 2560).

The r5 bisect cleared widths up to 2560 (4-6 s compiles; crash edge in
(2560, 3008]).  The ratio model says ~1.6-2.6k-wide frames win a
single x-tile.  Measure the matching kernel per view, old cap vs new,
on 3 MP (1504x2048) and 2.4 MP (1056x2304) structured frames.  Rows
use distinct vmem_mb so the inner-jit trace cache cannot alias them.

Run:
  cd /root/repo && nohup setsid env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/r5_widecap.py > /tmp/r5_widecap.log 2>&1 &
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

    log(f"device: {jax.devices()[0].device_kind} (tw cap now "
        f"{PG._STREAM_TW_CAP})")
    from stereo_matching_cuda_tpu import ops

    M = 32
    for h, w in [(1504, 2048), (1056, 2304)]:
        left, right = _structured_pair(h, w)
        cfg0 = StereoConfig(unroll_max=8, y_sum="roll", stream=True,
                            vmem_mb=64)
        gl = jnp.asarray(np.asarray(jax.jit(
            lambda x: ops.rgb_to_grayscale(x, cfg0))(jnp.asarray(left))))
        gr = jnp.asarray(np.asarray(jax.jit(
            lambda x: ops.rgb_to_grayscale(x, cfg0))(jnp.asarray(right))))
        for name, cap, mb in [("cap1536", 1536, 64), ("cap2560", 2560, 66)]:
            PG._STREAM_TW_CAP = cap
            cfg = StereoConfig(unroll_max=8, y_sum="roll", stream=True,
                               vmem_mb=mb, fused=True)
            px = PG.fused_geometry(cfg)[1]
            pick = PG._pick_tiles_stream(h, w, px, cfg.radius, cfg.size_d,
                                         PG._vmem_params(cfg)[0],
                                         PG._stream_n_live(cfg),
                                         max_sh=PG._stream_sh_cap(cfg))

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
            log(f"  {h}x{w} {name}: pick {pick} -> {t*1e3:.3f} ms/view "
                f"(compile {comp:.0f}s)")
            RESULTS[f"{h}x{w}_{name}"] = {"pick": list(pick),
                                          "ms_per_view": t * 1e3}
            with open("/tmp/r5_widecap.json", "w") as fj:
                json.dump(RESULTS, fj, indent=1)
    PG._STREAM_TW_CAP = 2560
    log("DONE r5_widecap")


if __name__ == "__main__":
    main()
