"""Round-4: sharded pipeline on the real TPU chip (1-device mesh).

Every sharded-path test so far runs on the 8-virtual-device CPU mesh
(conftest) or interpret-mode Pallas; this probe compiles the
shard_map pipeline with the real Mosaic kernel on hardware and
compares against the single-device fused pipeline.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline
from stereo_matching_cuda_tpu.parallel import make_mesh, sharded_stereo_pipeline
from stereo_matching_cuda_tpu.utils.io import read_png

print(f"device: {jax.devices()[0].device_kind} x{len(jax.devices())}",
      flush=True)
D = "/root/reference/stereo_matching_cuda/data"
l = jnp.asarray(read_png(f"{D}/tsukuba0.png"))
r = jnp.asarray(read_png(f"{D}/tsukuba1.png"))

mesh = make_mesh(b=1, y=1, x=1)
t0 = time.time()
out = sharded_stereo_pipeline(l[None], r[None], mesh, DEFAULT_CONFIG)
filled_sh = np.asarray(out["occlusion_filled"])[0]
print(f"sharded (1,1,1) TPU compile+run: {time.time()-t0:.1f}s", flush=True)

ref = np.asarray(stereo_pipeline(l, r, DEFAULT_CONFIG)["occlusion_filled"])
mism = int((filled_sh != ref).sum())
print(f"sharded-vs-single mismatches: {mism}/{ref.size}", flush=True)
print("done", flush=True)
