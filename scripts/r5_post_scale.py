"""Round-5: post-stage split at scale + fused-post effect (VERDICT r4 #2).

The wide-D post-stage share was never measured ("the 148.5 ms
headline's glue share is unknown").  This probe captures, at 6 MP/16 d
and 5.9 MP/128 d on structured frames:

  (1) the staged per-stage split with the XLA post (post_fused=False)
      and with the fused post kernel (auto) — before/after;
  (2) the staged full-frame time both ways (bench methodology).

Run:
  cd /root/repo && nohup setsid env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/r5_post_scale.py > /tmp/r5_post_scale.log 2>&1 &
"""

import dataclasses
import json
import time

import jax

import sys
sys.path.insert(0, "/root/repo")

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG, StereoConfig
from stereo_matching_cuda_tpu.profiling import stage_table

T0 = time.time()
RESULTS = {}


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


def save():
    with open("/tmp/r5_post_scale.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    from bench import _staged_chain_ms, _structured_pair

    log(f"device: {jax.devices()[0].device_kind}")

    for tag, (h, w), ndisp, base in [
        ("6mp", (1992, 3008), 16, DEFAULT_CONFIG),
        ("wided", (1988, 2948), 64,
         dataclasses.replace(DEFAULT_CONFIG, d_min=-127, d_max=0)),
    ]:
        left, right = _structured_pair(h, w, ndisp=ndisp)
        for mode, cfg in [("xla_post",
                           dataclasses.replace(base, post_fused=False)),
                          ("fused_post", base)]:
            log(f"=== {tag} {mode}: stage table ===")
            rows = stage_table(left, right, cfg, n=5)
            for r in rows:
                log(f"  {r['stage']}: {r['ms']} ms")
            RESULTS[f"{tag}_{mode}_stages"] = rows
            save()
            per = _staged_chain_ms(cfg, left, right,
                                   lambda *a: log(*a), tag, n_big=5)
            log(f"{tag} {mode}: full staged frame {per:.2f} ms")
            RESULTS[f"{tag}_{mode}_frame_ms"] = per
            save()
    log("DONE r5_post_scale")


if __name__ == "__main__":
    main()
