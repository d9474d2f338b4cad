"""Round-5: wide-D mid-band VMEM decider (VERDICT r4 #5).

pipeline._MID_STREAM_VMEM_MB only applies to size_d <= _UNROLL_MAX
because 0.4-2 MP wide-D frames were never measured.  This probe runs a
~1 MP frame (768x1280) at D=64 and D=128 with vmem 16/32/64 on the
streaming fori default, chained N=5/17 — ships the gate change or the
committed negative.

Run:
  cd /root/repo && nohup setsid env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/r5_midwide.py > /tmp/r5_midwide.log 2>&1 &
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from stereo_matching_cuda_tpu.config import StereoConfig
from stereo_matching_cuda_tpu.utils.synth import make_scene

T0 = time.time()
RESULTS = {}


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


def save():
    with open("/tmp/r5_midwide.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    from bench import make_looped, _timeit

    log(f"device: {jax.devices()[0].device_kind}")
    h, w = 768, 1280
    s = make_scene(h, w, ndisp=64, seed=11)
    l, r = jnp.asarray(s["left"]), jnp.asarray(s["right"])

    plans = [(-63, (16, 32, 64)),
             # D=128: the streaming carry buffers cannot fit 16/32 MiB
             # (picker raises — the finding that drove the r5 gate fix);
             # measure the two budgets that fit.  vmem128 is what the
             # fixed auto gate ships.
             (-127, (64, 128))]
    for dmin, mbs in plans:
        for mb in mbs:
            cfg = StereoConfig(d_min=dmin, d_max=0, stream=True, vmem_mb=mb)
            fs = make_looped(cfg, 5)
            fb = make_looped(cfg, 17)
            t0 = time.time()
            float(fs(l, r)); float(fb(l, r))
            comp = time.time() - t0
            ts = min(_timeit(fs, l, r) for _ in range(5))
            tb = min(_timeit(fb, l, r) for _ in range(5))
            per = (tb - ts) / 12
            log(f"D={1-dmin} vmem{mb}: {per*1e3:.2f} ms/frame "
                f"(compiles {comp:.0f}s)")
            RESULTS[f"d{1-dmin}_vmem{mb}_ms"] = per * 1e3
            save()
    log("DONE r5_midwide")


if __name__ == "__main__":
    main()
