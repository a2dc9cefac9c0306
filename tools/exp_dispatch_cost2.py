#!/usr/bin/env python
"""Which ingredient of the real flush serializes the pipeline?
Times patch_exec._run (64 rect cmds, P=128) over 30 chained frames:

  A  donated fb carry, params/sels device-resident (reused)
  B  donated fb carry, fresh params transfer each frame
  C  non-donated jit, params device-resident
  D  non-donated jit, fresh params each frame
  E  B + a second executor._run (full scan, 2 cmds) per frame — the
     exact two-dispatch frame shape of the segmented flush
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import libnativecpurenderer_tpu as R  # noqa: E402
from libnativecpurenderer_tpu.ops import commands as C  # noqa: E402
from libnativecpurenderer_tpu.ops import executor  # noqa: E402
from libnativecpurenderer_tpu.ops import patch_exec  # noqa: E402

W, H = 1920, 1080
K = 64


def build_cmds(ctx, rng):
    ctx._cmds.clear()
    for _ in range(K):
        x = float(rng.uniform(0, W - 110))
        y = float(rng.uniform(0, H - 110))
        ctx.draw_rect(x, y, 100, 80, 0.5, 0.2, 0.8, 0.7)
    kinds, params = ctx._cmds.snapshot()
    segs = patch_exec.plan_segments(kinds, params, W, H,
                                    ctx._store.device.shape)
    _, P, RR, lo, hi, sels = segs[0]
    b = patch_exec.len_bucket(K)
    sp = np.zeros(b, np.int32)
    sp[:K] = sels
    pp = np.zeros((b, C.PARAM_W), np.float32)
    pp[:K] = params
    ctx._cmds.clear()
    return sp, pp, P, RR


def main():
    rng = np.random.default_rng(0)
    ctx = R.RenderContext(W, H, True)
    atlas = ctx._store.device
    sp, pp, P, RR = build_cmds(ctx, rng)
    spd = jnp.asarray(sp)
    ppd = jnp.asarray(pp)
    nnd = jnp.int32(K)

    nondonated = jax.jit(patch_exec.render_patch_list,
                         static_argnums=(5, 6))

    # full-scan segment inputs (for E)
    ctx.fill_color(0.1, 0.1, 0.1, 0.3)
    ctx.draw_vertical_grd(0, H - 200, W, 200, 0, 0, 0, 0, 0, 0, 0, 0.8)
    fkinds, fparams = ctx._cmds.snapshot()
    fb_ = C.bucket_for(2)
    fkp = np.zeros(fb_, np.int32)
    fkp[:2] = fkinds
    fpp = np.zeros((fb_, C.PARAM_W), np.float32)
    fpp[:2] = fparams
    fkpd, fppd = jnp.asarray(fkp), jnp.asarray(fpp)
    ctx._cmds.clear()

    def frame_A(fbuf, f):
        return patch_exec._run(fbuf, spd, ppd, nnd, atlas, P, RR)

    def frame_B(fbuf, f):
        sp2 = jnp.asarray(sp)
        pp2 = jnp.asarray(pp + np.float32(f * 1e-6))
        return patch_exec._run(fbuf, sp2, pp2, jnp.int32(K), atlas, P, RR)

    def frame_C(fbuf, f):
        return nondonated(fbuf, spd, ppd, nnd, atlas, P, RR)

    def frame_D(fbuf, f):
        sp2 = jnp.asarray(sp)
        pp2 = jnp.asarray(pp + np.float32(f * 1e-6))
        return nondonated(fbuf, sp2, pp2, jnp.int32(K), atlas, P, RR)

    def frame_E(fbuf, f):
        fkp2 = jnp.asarray(fkp)
        fpp2 = jnp.asarray(fpp)
        fbuf = executor._run(fbuf, fkp2, fpp2, atlas, 0, 0)
        sp2 = jnp.asarray(sp)
        pp2 = jnp.asarray(pp + np.float32(f * 1e-6))
        return patch_exec._run(fbuf, sp2, pp2, jnp.int32(K), atlas, P, RR)

    frames = 30
    for name, fn in (("A donated+resident", frame_A),
                     ("B donated+fresh", frame_B),
                     ("C plain+resident", frame_C),
                     ("D plain+fresh", frame_D),
                     ("E two-dispatch (real shape)", frame_E)):
        fbuf = jnp.zeros((H, W, 4), jnp.float32)
        fbuf = fn(fbuf, 0)
        float(np.asarray(fbuf[0, 0, 0]))
        fbuf = jnp.zeros((H, W, 4), jnp.float32)
        t0 = time.perf_counter()
        for f in range(frames):
            fbuf = fn(fbuf, f)
        float(np.asarray(fbuf[0, 0, 0]))
        dt = (time.perf_counter() - t0) / frames
        print(f"{name}: {dt * 1e3:.2f} ms/frame")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
