"""Round-2 TPU probe (run on TPU, default env, background).

Three measurements feeding VERDICT.md round-2 items:
  1. Fused-path per-stage breakdown on Tsukuba (chained-in-jit prefix
     differencing) — where do the non-kernel ms go?  (VERDICT Weak #4/#5)
  2. LR-check gather strategy microbench: select-over-static-shifts
     (ops/occlusion.py) vs take_along_axis (parallel/sharded.py) at
     D=16 (Tsukuba) and D=128 (3 MP).  (VERDICT #7)
  3. 6 MP compile-pathology bisect: which stage PAIR explodes the
     composed-module XLA compile, and does lax.optimization_barrier
     between stages fix it.  (VERDICT #1)

Everything uses the persistent compile cache; order is cheap → costly
so partial output is still useful.  Timing = chained-in-jit (BENCH.md).
"""

import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stereo_matching_cuda_tpu.config import DEFAULT_CONFIG, StereoConfig
from stereo_matching_cuda_tpu import ops
from stereo_matching_cuda_tpu.ops.pallas_guided import guided_wta_fused
from stereo_matching_cuda_tpu.ops.shifts import shift_cols
from stereo_matching_cuda_tpu.utils.io import read_png

cfg = DEFAULT_CONFIG
D = "/root/reference/stereo_matching_cuda/data"
left = jnp.asarray(read_png(f"{D}/tsukuba0.png"))
right = jnp.asarray(read_png(f"{D}/tsukuba1.png"))

print(f"device: {jax.devices()[0].device_kind}", flush=True)


def chained(fn, n):
    """fn(l, r) -> scalar; run n serially-dependent copies in one jit."""
    def looped(l, r):
        def step(i, carry):
            li, acc = carry
            v = fn(li, r)
            li2 = li + (v.astype(jnp.uint8) & 1)
            return (li2, acc + v)
        _, acc = jax.lax.fori_loop(0, n, step, (l, jnp.float32(0)))
        return acc
    return jax.jit(looped)


def t(f, l, r):
    t0 = time.time()
    float(f(l, r))
    return time.time() - t0


def per_frame_ms(fn, l, r, n=17):
    f1 = chained(fn, 1)
    fn_ = chained(fn, n)
    float(f1(l, r)); float(fn_(l, r))
    t1 = min(t(f1, l, r), t(f1, l, r))
    tn = min(t(fn_, l, r), t(fn_, l, r))
    return (tn - t1) / (n - 1) * 1e3


# ----------------------------------------------------------------------
print("\n=== 1. fused-path stage breakdown (Tsukuba) ===", flush=True)


def prefix(stage):
    def run1(l, r):
        gl = ops.rgb_to_grayscale(l, cfg)
        gr = ops.rgb_to_grayscale(r, cfg)
        if stage == 0:
            return gl.astype(jnp.float32).sum() + gr.astype(jnp.float32).sum()
        bl, dl = guided_wta_fused(gl, gr, cfg.d_min, cfg)
        if stage == 1:
            return dl.sum()
        br, dr = guided_wta_fused(gr, gl, cfg.d_min_right, cfg)
        if stage == 2:
            return dl.sum() + dr.sum()
        occ = ops.detect_occlusion(dl, dr, cfg.d_occlusion, cfg)
        if stage == 3:
            return occ.sum()
        return ops.fill_occlusion(occ, cfg.v_min, cfg).sum()
    return run1


prev = 0.0
for stage, name in enumerate(
        ["grayscale x2", "+fused L", "+fused L+R", "+LR check", "+fill"]):
    cum = per_frame_ms(prefix(stage), left, right, n=17)
    print(f"  {name:14s} cumulative {cum:7.3f} ms  delta {cum-prev:7.3f} ms",
          flush=True)
    prev = cum

# ----------------------------------------------------------------------
print("\n=== 2. LR-check gather strategy ===", flush=True)


def lr_select_shifts(c: StereoConfig):
    def run1(dl, dr):
        return ops.detect_occlusion(dl, dr, c.d_occlusion, c).sum()
    return run1


def lr_take_along(c: StereoConfig):
    def run1(dl, dr):
        w = dl.shape[-1]
        d = dl.astype(jnp.int32)
        x = jnp.arange(w, dtype=jnp.int32)
        xs = x[None, :] + d
        in_range = (xs >= 0) & (xs < w)
        dprime = jnp.take_along_axis(dr, jnp.clip(xs, 0, w - 1), axis=-1)
        bad = jnp.abs(d.astype(jnp.float32) + dprime) > jnp.float32(c.d_lr)
        occl = (~in_range) | bad
        return jnp.where(occl, jnp.float32(c.d_occlusion), dl).sum()
    return run1


for label, h, w, c in [
        ("D=16  384x288 ", 288, 384, cfg),
        ("D=128 3MP     ", 1504, 2048,
         StereoConfig(d_min=-127, d_max=0)),
]:
    rng = np.random.default_rng(0)
    dl = jnp.asarray(
        rng.integers(c.d_min, c.d_max + 1, (h, w)).astype(np.float32))
    dr = jnp.asarray(
        rng.integers(-c.d_max, -c.d_min + 1, (h, w)).astype(np.float32))
    ms_sel = per_frame_ms(lr_select_shifts(c), dl, dr, n=33)
    ms_tak = per_frame_ms(lr_take_along(c), dl, dr, n=33)
    print(f"  {label} select-shifts {ms_sel:7.3f} ms   "
          f"take_along_axis {ms_tak:7.3f} ms", flush=True)

# ----------------------------------------------------------------------
print("\n=== 3. 6 MP compile bisect (pairs + optimization_barrier) ===",
      flush=True)

H, W = 1992, 3008
rng = np.random.default_rng(1)
rgb_l = jnp.asarray(rng.integers(0, 256, (H, W, 3), np.uint8))
rgb_r = jnp.asarray(np.roll(np.asarray(rgb_l), 7, axis=1))
gray_l = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
gray_r = jnp.asarray(np.roll(np.asarray(gray_l), 7, axis=1))


def ctime(name, fn, *args):
    t0 = time.time()
    jax.jit(fn).lower(*args).compile()
    print(f"  {name:34s} compile {time.time()-t0:7.1f}s", flush=True)


def post(dl, dr):
    return ops.fill_occlusion(
        ops.detect_occlusion(dl, dr, cfg.d_occlusion, cfg), cfg.v_min, cfg)


ob = jax.lax.optimization_barrier

# cheap singles first (mostly cache-warm from round 1)
ctime("fused x1", lambda a, b: guided_wta_fused(a, b, cfg.d_min, cfg)[1],
      gray_l, gray_r)

# THE candidate product fix: full pipeline, barriers between stages
def full_barrier(l, r):
    gl = ob(ops.rgb_to_grayscale(l, cfg))
    gr = ob(ops.rgb_to_grayscale(r, cfg))
    _, dl = guided_wta_fused(gl, gr, cfg.d_min, cfg)
    _, dr = guided_wta_fused(gr, gl, cfg.d_min_right, cfg)
    dl, dr = ob((dl, dr))
    return post(dl, dr)


ctime("FULL with barriers", full_barrier, rgb_l, rgb_r)

# pairwise bisect
ctime("gray x2 + fused x1",
      lambda l, r: guided_wta_fused(
          ops.rgb_to_grayscale(l, cfg), ops.rgb_to_grayscale(r, cfg),
          cfg.d_min, cfg)[1],
      rgb_l, rgb_r)
ctime("fused x2",
      lambda a, b: guided_wta_fused(a, b, cfg.d_min, cfg)[1]
      + guided_wta_fused(b, a, cfg.d_min_right, cfg)[1],
      gray_l, gray_r)
ctime("fused x1 + post",
      lambda a, b: post(guided_wta_fused(a, b, cfg.d_min, cfg)[1],
                        guided_wta_fused(a, b, cfg.d_min, cfg)[1] * 0 - 1),
      gray_l, gray_r)
ctime("fused x2 + post",
      lambda a, b: post(guided_wta_fused(a, b, cfg.d_min, cfg)[1],
                        guided_wta_fused(b, a, cfg.d_min_right, cfg)[1]),
      gray_l, gray_r)
ctime("gray x2 + fused x2",
      lambda l, r: (lambda gl, gr: guided_wta_fused(gl, gr, cfg.d_min, cfg)[1]
                    + guided_wta_fused(gr, gl, cfg.d_min_right, cfg)[1])(
          ops.rgb_to_grayscale(l, cfg), ops.rgb_to_grayscale(r, cfg)),
      rgb_l, rgb_r)

print("\nprobe done", flush=True)
