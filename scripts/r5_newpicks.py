"""Round-5: validate the new stream tile picks (width cap 2560 + the
big-frame wide-tile sh<=128 rule) end-to-end.

For 6 MP / 3 MP / 2.4 MP structured frames: run the full product
staged pipeline at the new auto picks, record ms/frame, and assert
parity vs the OLD picks (forced) within the documented WTA near-tie
class.

Run:
  cd /root/repo && nohup setsid env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/r5_newpicks.py > /tmp/r5_newpicks.log 2>&1 &
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

import stereo_matching_cuda_tpu.ops.pallas_guided as PG
from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import compute_disparity

T0 = time.time()
RESULTS = {}


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


def save():
    with open("/tmp/r5_newpicks.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    from bench import _staged_chain_ms, _structured_pair

    log(f"device: {jax.devices()[0].device_kind}")
    cfg = DEFAULT_CONFIG
    plans = [("6mp", 1992, 3008, (232, 1536)),
             ("3mp", 1504, 2048, (392, 1024)),
             ("2.4mp", 1056, 2304, (368, 768))]
    orig = PG._pick_tiles_stream
    for tag, h, w, old_pick in plans:
        left, right = _structured_pair(h, w)
        # new auto pick: frame time + disparity map
        per = _staged_chain_ms(cfg, left, right, lambda *a: log(*a),
                               tag, n_big=5)
        out_new = compute_disparity(left, right, cfg,
                                    keys=("occlusion_filled",))
        log(f"{tag} NEW auto pick: {per:.2f} ms/frame")
        RESULTS[f"{tag}_new_ms"] = per
        save()
        # old pick (forced): parity only
        PG._pick_tiles_stream = lambda *a, _t=old_pick, **k: _t
        try:
            import dataclasses
            # distinct cfg so the inner-jit trace cache cannot reuse
            # the new-pick executable (r4_shsweep post-mortem)
            cfg_old = dataclasses.replace(cfg, vmem_mb=65)
            out_old = compute_disparity(left, right, cfg_old,
                                        keys=("occlusion_filled",))
        finally:
            PG._pick_tiles_stream = orig
        a = out_new["occlusion_filled"]
        b = out_old["occlusion_filled"]
        mism = int((a != b).sum())
        tol = int(a.size * 2e-3)
        log(f"{tag} parity new-vs-old pick: {mism}/{a.size} "
            f"(tol {tol})")
        RESULTS[f"{tag}_parity_mism"] = mism
        save()
        assert mism <= tol
    log("DONE r5_newpicks")


if __name__ == "__main__":
    main()
