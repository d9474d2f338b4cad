"""Round-4 decider: settle the streaming-kernel default per frame
class.

Known (r4_stream{,2,3}): 6 MP stream roll vmem64 auto (256,1024)
17.87 ms vs r3 best 20.26; 128 d stream roll vmem96 159.8 vs 163.4;
Tsukuba dual-stream probes in r4_stream3.  Open questions this probe
answers:

  - mid-size frames (0.25 / 0.5 / 1 / 1.5 / 3 MP): stream vs the
    shipped fori+roll non-stream default at the 16 MiB budget — the
    _BIG_STRATEGY band has never seen the streaming kernel
  - 6 MP single-column tiles (tw=W, x-ratio 1.064): does the carry
    working set allow sh large enough to beat (256,1024)'s 1.18?
  - 128 d at vmem128: the streaming working set differs from the r3
    kernel that hit a VMEM edge at 120 MiB

Chain-of-5 differencing for big frames, fori-loop chain-of-17/49 for
small; staged product path; structured frames.
"""

import dataclasses
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

import stereo_matching_cuda_tpu.ops.pallas_guided as pg
from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG
from stereo_matching_cuda_tpu.pipeline import (
    effective_config, stereo_pipeline, stereo_pipeline_staged,
    use_staged_path)
from stereo_matching_cuda_tpu.utils.synth import make_scene

print(f"device: {jax.devices()[0].device_kind}", flush=True)

SIZES = [(512, 512), (704, 768), (896, 1152), (1024, 1504), (1504, 2048)]
scenes = {s: make_scene(*s, ndisp=16, seed=7) for s in SIZES}
s6 = make_scene(1992, 3008, ndisp=16, seed=7)
sw = make_scene(1988, 2948, ndisp=128, seed=7)

summ = jax.jit(lambda x: jnp.sum(x))
perturb = jax.jit(lambda l, f: l + (f[..., None].astype(jnp.uint8) & 1))


def six(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, unroll_max=8,
                               dual_view=False, stream=True, **kw)


def wide(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, d_min=-127, d_max=0,
                               stream=True, **kw)


def tsu(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, stream=True, **kw)


from stereo_matching_cuda_tpu.utils.io import read_png

D = "/root/reference/stereo_matching_cuda/data"
tsul = read_png(f"{D}/tsukuba0.png")
tsur = read_png(f"{D}/tsukuba1.png")

CONFIGS = [
    # r4_stream3: roll (112,384) vmem32 = 0.449 ms — probe the
    # zero-waste 2-strip height and the picker's own choices
    ("tsukuba dual stream roll (168,384) vmem32", tsul, tsur,
     tsu(y_sum="roll", vmem_mb=32), (168, 384)),
    ("tsukuba dual stream roll vmem32 auto", tsul, tsur,
     tsu(y_sum="roll", vmem_mb=32), None),
    ("tsukuba dual stream roll default-vmem auto", tsul, tsur,
     tsu(y_sum="roll"), None),
]
for (h, w) in SIZES:
    sc = scenes[(h, w)]
    base = effective_config(DEFAULT_CONFIG, h, w)
    CONFIGS += [
        (f"{h}x{w} non-stream default", sc["left"], sc["right"],
         base, None),
        (f"{h}x{w} stream", sc["left"], sc["right"],
         dataclasses.replace(base, stream=True), None),
    ]
CONFIGS += [
    ("6MP stream roll (64,3008) vmem64", s6["left"], s6["right"],
     six(y_sum="roll", vmem_mb=64), (64, 3008)),
    ("6MP stream roll (96,3008) vmem96", s6["left"], s6["right"],
     six(y_sum="roll", vmem_mb=96), (96, 3008)),
    ("128d stream roll vmem128", sw["left"], sw["right"],
     wide(y_sum="roll", vmem_mb=128), None),
]

orig_pick = pg._pick_tiles_stream

for label, lnp, rnp, cfg, forced in CONFIGS:
    h, w = lnp.shape[:2]
    staged = use_staged_path(cfg, h, w)
    pg._pick_tiles_stream = (
        (lambda *a, **k: forced) if forced else orig_pick)
    stream = pg.use_stream(cfg)
    dual = cfg.dual_view == "auto" and cfg.size_d <= pg.unroll_max(cfg)
    geom = pg.dual_geometry if dual else pg.fused_geometry
    _, px = geom(cfg)
    desc = ""
    if stream:
        try:
            if forced:
                sh, tw = forced
            elif dual:
                sh, tw = orig_pick(h, w, px, cfg.radius, cfg.size_d,
                                   pg._vmem_params(cfg)[0],
                                   pg._dual_stream_n_live(cfg),
                                   carry_bufs=8 * cfg.size_d + 4,
                                   max_sh=pg._stream_sh_cap(cfg))
            else:
                sh, tw = orig_pick(h, w, px, cfg.radius, cfg.size_d,
                                   pg._vmem_params(cfg)[0],
                                   pg._stream_n_live(cfg),
                                   max_sh=pg._stream_sh_cap(cfg))
        except ValueError as e:
            print(f"  [{label}] no tiling: {e}", flush=True)
            continue
        A = pg._stream_carry(cfg.radius)
        nyp = (h + A + 2 * cfg.radius + sh - 1) // sh
        nx = (w + tw - 1) // tw
        wte = ((tw + 2 * px + 127) // 128) * 128
        ratio = nx * wte * nyp * sh / (h * w)
        desc = f" tiles=({sh},{tw}) nyp={nyp} nx={nx} ratio={ratio:.2f}"
    lj, rj = jnp.asarray(lnp), jnp.asarray(rnp)

    def frame(l, r, cfg=cfg, staged=staged):
        fn = stereo_pipeline_staged if staged else stereo_pipeline
        return fn(l, r, cfg)["occlusion_filled"]

    try:
        t0 = time.time()
        float(summ(frame(lj, rj)))
        print(f"  [{label}{desc}] compile+first {time.time()-t0:.1f}s",
              flush=True)
    except Exception as e:
        print(f"  [{label}{desc}] FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        continue

    def run_chain(n):
        t0 = time.time()
        l, f = lj, None
        for _ in range(n):
            f = frame(l, rj)
            l = perturb(l, f)
        float(summ(f))
        return time.time() - t0

    if h <= 512:
        def make_looped(n, cfg=cfg):
            def step(i, carry):
                li, ri = carry
                out = stereo_pipeline(li, ri, cfg)["occlusion_filled"]
                return (li + (out[..., None].astype(jnp.uint8) & 1), ri)

            def run(l, r):
                lo, _ = jax.lax.fori_loop(0, n, step, (l, r))
                return jnp.sum(lo.astype(jnp.float32))

            return jax.jit(run)

        fs, fb = make_looped(17), make_looped(49)
        t0 = time.time()
        float(fs(lj, rj)); float(fb(lj, rj))
        print(f"    chain compile {time.time()-t0:.1f}s", flush=True)

        def tt(f):
            t0 = time.time(); float(f(lj, rj)); return time.time() - t0

        ts = min(tt(fs) for _ in range(3))
        tb = min(tt(fb) for _ in range(3))
        per = (tb - ts) / 32 * 1e3
    else:
        run_chain(1)
        t1 = min(run_chain(1), run_chain(1))
        t5 = min(run_chain(5), run_chain(5))
        per = (t5 - t1) / 4 * 1e3
    print(f"  {label}: {per:.2f} ms/frame ({1e3/per:.2f} fps)", flush=True)

pg._pick_tiles_stream = orig_pick
print("done", flush=True)
