"""Round-3 probe: mid-size regression check after the picker change.

The issued-work tile picker (round 3) changes some 16 MiB picks for
mid-size frames (0.2-2.1 MP composed path, fori+roll via
_BIG_STRATEGY).  r2 measured these shapes at the old picks — this
re-measures the same shapes at the new defaults (composed jit,
chain-of-9 fori differencing).  r2 numbers: 0.5 MP 2.51 · 1.0 MP
5.23-5.36 · 1.5 MP 6.08 · 3 MP 12.5 ms/frame (BENCH.md threshold
table; 3 MP now also gets the staged path's auto vmem64? No — 3 MP
(1504x2000) exceeds the 2.1 MP staged gate, so it runs staged with
vmem64: expect a WIN, not parity).
"""

import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG as CFG
from stereo_matching_cuda_tpu.pipeline import (
    effective_config, stereo_pipeline, stereo_pipeline_staged,
    use_staged_path)
from stereo_matching_cuda_tpu.ops.pallas_guided import (
    _n_live, _pick_tiles, _vmem_params, fused_geometry)
from stereo_matching_cuda_tpu.utils.synth import make_scene

print(f"device: {jax.devices()[0].device_kind}", flush=True)

SHAPES = [("0.5MP", 640, 800, "r2: 2.51"),
          ("1.0MP", 896, 1152, "r2: 5.23 dual / 5.36 fori"),
          ("1.5MP", 1024, 1472, "r2: 6.08"),
          ("3.0MP", 1504, 2000, "r2: 12.5")]

summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))

for label, h, w, note in SHAPES:
    s = make_scene(h, w, ndisp=16, seed=7)
    lj, rj = jnp.asarray(s["left"]), jnp.asarray(s["right"])
    cfg = effective_config(CFG, h, w)
    staged = use_staged_path(cfg, h, w)
    hy, px = fused_geometry(cfg)
    try:
        sh, tw = _pick_tiles(h, w, px, hy, vmem_budget=_vmem_params(cfg)[0],
                             n_live=_n_live(cfg))
    except ValueError:
        sh = tw = -1

    if staged:
        def frame(l, r, cfg=cfg):
            return stereo_pipeline_staged(l, r, cfg)["occlusion_filled"]

        t0 = time.time()
        float(summ(frame(lj, rj)))
        print(f"  [{label} staged tiles=({sh},{tw}) vmem={cfg.vmem_mb}] "
              f"compile {time.time()-t0:.0f}s", flush=True)

        def run_chain(n):
            t0 = time.time()
            l, f = lj, None
            for _ in range(n):
                f = frame(l, rj)
                l = perturb(l, f)
            float(summ(f))
            return time.time() - t0

        run_chain(1)
        t1 = min(run_chain(1), run_chain(1))
        t5 = min(run_chain(5), run_chain(5))
        per = (t5 - t1) / 4 * 1e3
    else:
        def make_looped(n, cfg=cfg):
            def step(i, carry):
                li, ri = carry
                out = stereo_pipeline(li, ri, cfg)["occlusion_filled"]
                return (li + (out[..., None].astype(jnp.uint8) & 1), ri)

            def run(l, r):
                lo, _ = jax.lax.fori_loop(0, n, step, (l, r))
                return jnp.sum(lo.astype(jnp.float32))

            return jax.jit(run)

        fs, fb = make_looped(3), make_looped(11)
        t0 = time.time()
        float(fs(lj, rj)); float(fb(lj, rj))
        print(f"  [{label} composed tiles=({sh},{tw}) vmem={cfg.vmem_mb}] "
              f"compile {time.time()-t0:.0f}s", flush=True)

        def tt(f):
            t0 = time.time(); float(f(lj, rj)); return time.time() - t0

        ts = min(tt(fs) for _ in range(3))
        tb = min(tt(fb) for _ in range(3))
        per = (tb - ts) / 8 * 1e3
    print(f"  {label}: {per:.2f} ms/frame ({note})", flush=True)
print("done", flush=True)
