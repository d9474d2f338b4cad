"""Round-5: clean at-scale stage tables (after the profiler DCE fix).

r5_post_scale's matching rows were halved by a profiler bug (the chain
consumed only dmap_l, so XLA dead-code-eliminated the right view) and
the n=5 window zeroed sub-ms rows.  Rerun the four stage tables with
the fixed profiler and wider windows; frame totals were unaffected and
are not re-measured.

Run:
  cd /root/repo && nohup setsid env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/r5_post_scale2.py > /tmp/r5_post_scale2.log 2>&1 &
"""

import dataclasses
import json
import time

import jax

import sys
sys.path.insert(0, "/root/repo")

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.profiling import stage_table

T0 = time.time()
RESULTS = {}


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


def main():
    from bench import _structured_pair

    log(f"device: {jax.devices()[0].device_kind}")
    for tag, (h, w), ndisp, base, n in [
        ("6mp", (1992, 3008), 16, DEFAULT_CONFIG, 33),
        ("wided", (1988, 2948), 64,
         dataclasses.replace(DEFAULT_CONFIG, d_min=-127, d_max=0), 9),
    ]:
        left, right = _structured_pair(h, w, ndisp=ndisp)
        for mode, cfg in [("xla_post",
                           dataclasses.replace(base, post_fused=False)),
                          ("fused_post", base)]:
            log(f"=== {tag} {mode} (n={n}) ===")
            rows = stage_table(left, right, cfg, n=n)
            for r in rows:
                log(f"  {r['stage']}: {r['ms']} ms")
            RESULTS[f"{tag}_{mode}"] = rows
            with open("/tmp/r5_post_scale2.json", "w") as f:
                json.dump(RESULTS, f, indent=1)
    log("DONE r5_post_scale2")


if __name__ == "__main__":
    main()
