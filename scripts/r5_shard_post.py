"""Round-5: sharded fused post stage on the real TPU chip.

The x-unsharded sharded path now routes LR+fill through the fused
Pallas post kernel (parallel/sharded.py, r5).  Hardware check on the
(1,1,1) mesh: post_fused=True vs post_fused=False sharded runs must
match exactly (integer post stage), and both must match the
single-device pipeline within the WTA near-tie class.

Run:
  cd /root/repo && nohup setsid env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/r5_shard_post.py > /tmp/r5_shard_post.log 2>&1 &
"""

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.parallel import make_mesh, sharded_stereo_pipeline
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline
from stereo_matching_cuda_tpu.utils.io import read_png

print(f"device: {jax.devices()[0].device_kind} x{len(jax.devices())}",
      flush=True)
D = "/root/reference/stereo_matching_cuda/data"
l = jnp.asarray(read_png(f"{D}/tsukuba0.png"))
r = jnp.asarray(read_png(f"{D}/tsukuba1.png"))

mesh = make_mesh(b=1, y=1, x=1)
cfg_f = DEFAULT_CONFIG                                   # auto -> fused post
cfg_x = dataclasses.replace(DEFAULT_CONFIG, post_fused=False)

t0 = time.time()
out_f = sharded_stereo_pipeline(l[None], r[None], mesh, cfg_f)
a_occ = np.asarray(out_f["occlusion"])[0]
a_fil = np.asarray(out_f["occlusion_filled"])[0]
print(f"sharded fused-post compile+run: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
out_x = sharded_stereo_pipeline(l[None], r[None], mesh, cfg_x)
b_occ = np.asarray(out_x["occlusion"])[0]
b_fil = np.asarray(out_x["occlusion_filled"])[0]
print(f"sharded xla-post compile+run: {time.time()-t0:.1f}s", flush=True)

print(f"fused-vs-xla sharded post: occ {int((a_occ != b_occ).sum())}, "
      f"filled {int((a_fil != b_fil).sum())} mismatches of {a_occ.size} "
      f"(must be 0 — same disparity inputs, integer post)", flush=True)
assert (a_occ == b_occ).all() and (a_fil == b_fil).all()

ref = np.asarray(stereo_pipeline(l, r, DEFAULT_CONFIG)["occlusion_filled"])
mism = int((a_fil != ref).sum())
print(f"sharded-vs-single mismatches: {mism}/{ref.size} "
      f"(WTA near-tie class)", flush=True)
print("DONE r5_shard_post", flush=True)
