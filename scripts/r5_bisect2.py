"""Round-5b: stream tile widths for the UNROLLED emissions.

r5_bisect probed widths on the fori emission only (4-6 s compiles, OK
through 2560).  Mosaic crashes are emission-dependent, so the shipped
cap keeps unrolled emissions at the r4-proven 1536 until probed — this
probe tries the single-view and dual unrolled stream emissions at
tw = 1792 and 2048 (roll y-sums, the crash-prone variant).

Run:
  cd /root/repo && nohup setsid env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/r5_bisect2.py > /tmp/r5_bisect2.log 2>&1 &
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


def try_compile(tag, kind, tiles, cfg, h, w):
    rng = np.random.default_rng(3)
    gl = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))
    gr = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))
    orig_s = PG._pick_tiles_stream
    PG._pick_tiles_stream = lambda *a, **k: tiles
    t0 = time.time()
    try:
        if kind == "dual":
            outs = PG.guided_wta_fused_dual(gl, gr, cfg)
        else:
            outs = PG.guided_wta_fused(gl, gr, cfg.d_min, cfg)
        jax.block_until_ready(outs)
        log(f"  {tag}: OK ({time.time()-t0:.0f}s compile+run)")
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:110] if str(e) else type(e).__name__
        log(f"  {tag}: CRASH after {time.time()-t0:.0f}s — {msg}")
        return False
    finally:
        PG._pick_tiles_stream = orig_s


def main():
    log(f"device: {jax.devices()[0].device_kind}")
    mb = 110
    # unrolled single-view (D=8, roll) and dual (D=16 default, roll)
    for kind, dmin, um in [("single", -7, 16), ("dual", -15, 32)]:
        for tw in (1792, 2048):
            cfg = StereoConfig(d_min=dmin, d_max=0, unroll_max=um,
                               y_sum="roll", stream=True, vmem_mb=mb,
                               fused=True,
                               dual_view=(kind == "dual"))
            mb -= 1
            ok = try_compile(f"{kind} unrolled-roll tw={tw}", kind,
                             (64, tw), cfg, 256, tw)
            RESULTS[f"{kind}_tw{tw}"] = ok
            with open("/tmp/r5_bisect2.json", "w") as f:
                json.dump(RESULTS, f, indent=1)
    log("DONE r5_bisect2")


if __name__ == "__main__":
    main()
