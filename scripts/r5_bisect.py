"""Round-5: bisect the Mosaic compile-crash boundaries (VERDICT r4 #7).

Two guards in _pick_tiles_stream sit at first-failure points, not
measured edges:
  (a) unrolled-roll streaming strips: (112,384) dual compiles, (168,384)
      crashes — bisect sh in between;
  (b) stream tile widths: (128,1536) compiles, (64,3008)/(96,3008)
      crash — probe widths between 1536 and 3008.

Each attempt forces the tile pick and tries ONE compile+run on a small
frame; a crash is an exception from the compile helper (caught, logged,
continue).  Findings go to /tmp/r5_bisect.json and BENCH.md.

Run:
  cd /root/repo && nohup setsid env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/r5_bisect.py > /tmp/r5_bisect.log 2>&1 &
"""

import dataclasses
import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

import stereo_matching_cuda_tpu.ops.pallas_guided as PG
from stereo_matching_cuda_tpu.config import StereoConfig

T0 = time.time()
RESULTS = {"strip": {}, "width": {}}


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


def save():
    with open("/tmp/r5_bisect.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def try_compile(tag, kind, tiles, cfg, h, w):
    """Force the stream tile pick and compile+run once."""
    rng = np.random.default_rng(3)
    gl = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))
    gr = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))
    orig_s = PG._pick_tiles_stream
    orig_cap = PG._stream_sh_cap
    PG._pick_tiles_stream = lambda *a, **k: tiles
    PG._stream_sh_cap = lambda *a, **k: None     # disable the guard
    t0 = time.time()
    try:
        if kind == "dual":
            outs = PG.guided_wta_fused_dual(gl, gr, cfg)
        else:
            outs = PG.guided_wta_fused(gl, gr, cfg.d_min, cfg)
        jax.block_until_ready(outs)
        dt = time.time() - t0
        log(f"  {tag}: OK ({dt:.0f}s compile+run)")
        return True
    except Exception as e:
        dt = time.time() - t0
        msg = str(e).splitlines()[0][:120] if str(e) else type(e).__name__
        log(f"  {tag}: CRASH after {dt:.0f}s — {msg}")
        return False
    finally:
        PG._pick_tiles_stream = orig_s
        PG._stream_sh_cap = orig_cap


def main():
    log(f"device: {jax.devices()[0].device_kind}")

    # (a) unrolled-roll dual stream strip height: known OK 112, bad 168.
    # distinct vmem_mb per attempt busts the inner-jit trace cache
    # (BENCH.md r4_shsweep post-mortem)
    lo, hi = 112, 168
    mb = 100
    while hi - lo > 8:
        mid = (lo + hi) // 2 // 8 * 8
        if mid in (lo, hi):
            break
        cfg = StereoConfig(stream=True, y_sum="roll", vmem_mb=mb)
        mb -= 1
        ok = try_compile(f"dual unroll-roll sh={mid}", "dual",
                         (mid, 384), cfg, 288, 384)
        RESULTS["strip"][str(mid)] = ok
        save()
        if ok:
            lo = mid
        else:
            hi = mid
    log(f"strip-height boundary: last OK {lo}, first crash {hi}")
    RESULTS["strip"]["boundary"] = [lo, hi]
    save()

    # (b) stream tile widths beyond 1536 (fori roll, single view).
    # known OK (128,1536); crashes observed at (64,3008)/(96,3008).
    for tw in (1664, 1792, 2048, 2560, 3008):
        cfg = StereoConfig(d_min=-15, d_max=0, unroll_max=4, y_sum="roll",
                           stream=True, vmem_mb=mb)
        mb -= 1
        ok = try_compile(f"fori-roll tw={tw}", "single",
                         (64, tw), cfg, 256, tw)
        RESULTS["width"][str(tw)] = ok
        save()
    log("DONE r5_bisect")


if __name__ == "__main__":
    main()
