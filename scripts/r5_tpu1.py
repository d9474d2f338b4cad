"""Round-5 TPU probe 1: fused post-stage on hardware + more slice slopes.

  (1) pallas_post hardware parity: lr_fill_fused vs the XLA post ops on
      real Tsukuba disparity maps — must be 0 mismatches (the kernel is
      integer-exact by construction; interpret-mode tests already pass).
  (2) post-stage timing: XLA detect+fill vs the fused kernel, chained
      M=512 (per-call minus the measured ~22.6 us chain overhead).
  (3) full-pipeline Tsukuba timing with post_fused auto (the new
      default) vs post_fused=False — bench-style N=49/145 chains.
  (4) slice slopes at two more tile shapes (transfer check for the
      measured-cost roofline): (128,1024) D=8/16/32 on a 768x1024
      frame; (128,1536) D=32/64/128 on a 512x1536 frame.

Run:
  cd /root/repo && nohup setsid env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/r5_tpu1.py > /tmp/r5_tpu1.log 2>&1 &
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

import stereo_matching_cuda_tpu.ops.pallas_guided as PG
from stereo_matching_cuda_tpu import ops
from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG, StereoConfig
from stereo_matching_cuda_tpu.ops.pallas_post import lr_fill_fused
from stereo_matching_cuda_tpu.pipeline import stereo_pipeline
from stereo_matching_cuda_tpu.utils.io import read_png

T0 = time.time()
RESULTS = {}


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


def save():
    with open("/tmp/r5_tpu1.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def _chain_time(call, x, m, runs=5):
    def run(v):
        y = jax.lax.fori_loop(0, m, lambda i, c: call(c), v)
        return jnp.sum(y)

    f = jax.jit(run)
    t0 = time.time()
    float(f(x))
    log(f"    compile+first: {time.time()-t0:.1f}s")

    def once():
        t0 = time.time()
        float(f(x))
        return time.time() - t0

    return min(once() for _ in range(runs))


def tsukuba():
    d = "/root/reference/stereo_matching_cuda/data"
    return read_png(f"{d}/tsukuba0.png"), read_png(f"{d}/tsukuba1.png")


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}")
    wide_only = "--wide-only" in sys.argv
    left, right = tsukuba()
    cfg = DEFAULT_CONFIG

    # real disparity maps from the default pipeline (fused matching)
    from stereo_matching_cuda_tpu.pipeline import effective_config
    ecfg = effective_config(cfg, left.shape[0], left.shape[1])
    out = stereo_pipeline(jnp.asarray(left), jnp.asarray(right),
                          dataclasses.replace(ecfg, post_fused=False))
    dmap_l = jnp.asarray(np.asarray(out["disparity_left"]))
    dmap_r = jnp.asarray(np.asarray(out["disparity_right"]))
    occ_want = np.asarray(out["occlusion"])
    fill_want = np.asarray(out["occlusion_filled"])

    if not wide_only:
        _main_sections(ecfg, left, right, dmap_l, dmap_r, occ_want,
                       fill_want)

    # (4) slice slopes at two more tile shapes
    _slopes(wide_only)
    log("DONE r5_tpu1")


def _main_sections(ecfg, left, right, dmap_l, dmap_r, occ_want, fill_want):
    # (1) hardware parity
    occ_k, fill_k = lr_fill_fused(dmap_l, dmap_r, ecfg)
    m1 = int((np.asarray(occ_k) != occ_want).sum())
    m2 = int((np.asarray(fill_k) != fill_want).sum())
    log(f"pallas_post HW parity: occ {m1}, filled {m2} mismatches "
        f"of {occ_want.size}")
    RESULTS["post_parity"] = {"occ_mism": m1, "fill_mism": m2}
    save()
    assert m1 == 0 and m2 == 0

    # (2) post-stage timing, chained M=512
    M = 512

    def post_xla(d):
        occ = ops.detect_occlusion(d, dmap_r, ecfg.d_occlusion, ecfg)
        filled = ops.fill_occlusion(occ, ecfg.v_min, ecfg)
        return d + (filled.astype(jnp.int32) & 1).astype(d.dtype)

    def post_fused(d):
        occ, filled = lr_fill_fused(d, dmap_r, ecfg)
        return d + (filled.astype(jnp.int32) & 1).astype(d.dtype)

    t_xla = _chain_time(post_xla, dmap_l, M) / M
    t_fus = _chain_time(post_fused, dmap_l, M) / M
    log(f"post stage per call (incl ~22.6us chain overhead): "
        f"XLA {t_xla*1e6:.1f} us, fused {t_fus*1e6:.1f} us")
    RESULTS["post_time_us"] = {"xla": t_xla * 1e6, "fused": t_fus * 1e6,
                               "chain_overhead_note": "~22.6us included"}
    save()

    # (3) full pipeline: bench-style N=49/145 chains, both post modes
    from bench import make_looped, _timeit

    for name, c in [("post_fused_auto", ecfg),
                    ("post_fused_off",
                     dataclasses.replace(ecfg, post_fused=False))]:
        fs = make_looped(c, 49)
        fb = make_looped(c, 145)
        l, r = jnp.asarray(left), jnp.asarray(right)
        t0 = time.time()
        float(fs(l, r))
        float(fb(l, r))
        log(f"  {name}: chains compiled in {time.time()-t0:.1f}s")
        ts = min(_timeit(fs, l, r) for _ in range(5))
        tb = min(_timeit(fb, l, r) for _ in range(5))
        per = (tb - ts) / (145 - 49)
        log(f"  {name}: {per*1e3:.4f} ms/frame ({1/per:.0f} fps)")
        RESULTS[f"tsukuba_{name}_ms"] = per * 1e3
        save()


def _slopes(wide_only):
    orig_pick = PG._pick_tiles_stream
    rng = np.random.default_rng(7)

    def slope(label, h, w, tiles, dmins, m, vmem_mb=64):
        PG._pick_tiles_stream = lambda *a, **k: tiles
        try:
            base = rng.integers(0, 256, size=(h, w + 32), dtype=np.uint8)
            sm = base.astype(np.float32)
            sm = ((sm + np.roll(sm, 1, 1) + np.roll(sm, -1, 1)) / 3
                  ).astype(np.uint8)
            gl = jnp.asarray(sm[:, 16:16 + w])
            gr = jnp.asarray(sm[:, 10:10 + w])
            rows = []
            for dmin in dmins:
                c = StereoConfig(d_min=dmin, d_max=0, unroll_max=4,
                                 y_sum="roll", stream=True, vmem_mb=vmem_mb,
                                 fused=True)

                def call(g):
                    best, dmap = PG.guided_wta_fused(g, gr, c.d_min, c)
                    return g + (dmap.astype(jnp.int32) & 1).astype(g.dtype)

                t = _chain_time(call, gl, m) / m
                log(f"  {label} D={c.size_d}: {t*1e3:.4f} ms/call")
                rows.append((c.size_d, t))
            ds = np.array([r[0] for r in rows], float)
            ts = np.array([r[1] for r in rows], float)
            sl, ic = np.polyfit(ds, ts, 1)
            # issued elements per call for per-elt normalization
            A = PG._stream_carry(c.radius)
            sh, tw = tiles
            px = PG.fused_geometry(c)[1]
            w_ext = ((tw + 2 * px + 127) // 128) * 128
            nyp = (h + A + 2 * c.radius + sh - 1) // sh
            nx = (w + tw - 1) // tw
            ext_elts = nyp * nx * (sh + A) * w_ext
            ops_equiv = sl / ext_elts * 8 * 128 * 4 * 0.94e9
            log(f"  {label}: per-slice {sl*1e6:.2f} us, fixed "
                f"{ic*1e6:.1f} us, {nyp*nx} programs x {(sh+A)}x{w_ext} "
                f"-> {ops_equiv:.0f} op-equiv/elt/slice")
            RESULTS[f"slope_{label}"] = {
                "tiles": list(tiles), "rows": [(int(d), t * 1e3)
                                               for d, t in rows],
                "per_slice_us": float(sl) * 1e6,
                "fixed_us": float(ic) * 1e6,
                "ops_equiv_per_elt_slice": float(ops_equiv)}
            save()
        finally:
            PG._pick_tiles_stream = orig_pick

    if not wide_only:
        slope("mid1024", 768, 1024, (128, 1024), (-7, -15, -31), 128)
    # forced (128,1536) tiles at D=128 carry ~44 MB of per-slice VMEM
    # scratch — needs the 128 MiB budget (the 64 MiB try OOM'd)
    slope("wide1536", 512, 1536, (128, 1536), (-31, -63, -127), 48,
          vmem_mb=128)


if __name__ == "__main__":
    main()
