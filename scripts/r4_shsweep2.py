"""Round-4 strip-height sweep, CORRECTED (see r4_shsweep post-mortem:
identical StereoConfigs hit the inner-jit trace cache and ignore the
monkeypatched tile picker).  Every row here carries a DISTINCT
vmem_mb (28-32 MiB — tile-picker-equivalent budgets) so each forced
(sh, 384) pick genuinely traces and compiles.  Single-view fori
stream roll kernel, quiet machine, 96-frame window, min of 5.
"""

import dataclasses
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

import stereo_matching_cuda_tpu.ops.pallas_guided as pg
from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline
from stereo_matching_cuda_tpu.utils.io import read_png

print(f"device: {jax.devices()[0].device_kind}", flush=True)

D = "/root/reference/stereo_matching_cuda/data"
lj = jnp.asarray(read_png(f"{D}/tsukuba0.png"))
rj = jnp.asarray(read_png(f"{D}/tsukuba1.png"))


def sv(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, unroll_max=8,
                               dual_view=False, stream=True,
                               y_sum="roll", **kw)


# distinct vmem_mb per row => distinct cfg => fresh trace => the
# forced tiles take effect (the budgets are all >= the 22 MB working
# set of the tallest strip, so the budget itself is inert)
CONFIGS = [
    ("auto (336,384) [shipped]", sv(vmem_mb=32), None),
    ("sh=232", sv(vmem_mb=31), (232, 384)),
    ("sh=168", sv(vmem_mb=30), (168, 384)),
    ("sh=136", sv(vmem_mb=29), (136, 384)),
    ("sh=88", sv(vmem_mb=28), (88, 384)),
]

orig_pick = pg._pick_tiles_stream
N_S, N_B = 49, 145

for label, cfg, forced in CONFIGS:
    pg._pick_tiles_stream = (
        (lambda *a, **k: forced) if forced else orig_pick)

    def make_looped(n, cfg=cfg):
        def step(i, carry):
            li, ri = carry
            out = stereo_pipeline(li, ri, cfg)["occlusion_filled"]
            return (li + (out[..., None].astype(jnp.uint8) & 1), ri)

        def run(l, r):
            lo, _ = jax.lax.fori_loop(0, n, step, (l, r))
            return jnp.sum(lo.astype(jnp.float32))

        return jax.jit(run)

    try:
        fs, fb = make_looped(N_S), make_looped(N_B)
        t0 = time.time()
        float(fs(lj, rj)); float(fb(lj, rj))
        print(f"  [{label}] chains compile {time.time()-t0:.1f}s",
              flush=True)
    except Exception as e:
        print(f"  [{label}] FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        continue

    def tt(f):
        t0 = time.time(); float(f(lj, rj)); return time.time() - t0

    ts = min(tt(fs) for _ in range(5))
    tb = min(tt(fb) for _ in range(5))
    per = (tb - ts) / (N_B - N_S) * 1e3
    print(f"  {label}: {per:.3f} ms/frame ({1e3/per:.1f} fps)", flush=True)

pg._pick_tiles_stream = orig_pick
print("done", flush=True)
