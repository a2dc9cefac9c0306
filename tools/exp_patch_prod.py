#!/usr/bin/env python
"""Isolate production patch-executor costs: per-route timing of
patch_exec._run plus the FULL-scan segment cost."""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import libnativecpurenderer_tpu as R  # noqa: E402
from libnativecpurenderer_tpu.ops import commands as C  # noqa: E402
from libnativecpurenderer_tpu.ops import executor  # noqa: E402
from libnativecpurenderer_tpu.ops import patch_exec  # noqa: E402

W, H = 1920, 1080
K = 64
P, RR = 128, 256


def timeit(fn, n=50, reps=3):
    o = fn()
    float(np.asarray(o[0, 0, 0]))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn()
        float(np.asarray(o[0, 0, 0]))
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    return best


def main():
    rng = np.random.default_rng(0)
    tex = R.Texture._from_array(rng.random((120, 120, 4)), True)
    ctx = R.RenderContext(W, H, True)
    atlas = ctx._store.device
    dtype = np.float32

    def cmds_rect():
        ctx._cmds.clear()
        for i in range(K):
            x = float(rng.uniform(0, W - 110))
            y = float(rng.uniform(0, H - 110))
            ctx.draw_rect(x, y, 100, 80, 0.5, 0.2, 0.8, 0.7)
        return ctx._cmds.snapshot()

    def cmds_tex():
        ctx._cmds.clear()
        for i in range(K):
            x = float(rng.uniform(0, W - 130))
            y = float(rng.uniform(0, H - 130))
            ctx.draw_texture(tex, x, y, 100, 100)   # identity -> TEX_FAST
        return ctx._cmds.snapshot()

    def cmds_tex_rot():
        ctx._cmds.clear()
        for i in range(K):
            ctx.save_state()
            ctx.translate(float(rng.uniform(100, W - 100)),
                          float(rng.uniform(100, H - 100)))
            ctx.rotate(0.5)
            ctx.draw_texture(tex, -40, -40, 80, 80)  # TEX, non-separable
            ctx.restore_state()
        return ctx._cmds.snapshot()

    for name, mk in (("rect(arith)", cmds_rect), ("tex fast", cmds_tex),
                     ("tex rotated", cmds_tex_rot)):
        kinds, params = mk()
        segs = patch_exec.plan_segments(kinds, params, W, H, atlas.shape)
        assert len(segs) == 1 and segs[0][0] == "patch", segs
        _, Pp, Rp, lo, hi, sels = segs[0]
        b = patch_exec.len_bucket(K)
        sp = np.zeros(b, np.int32)
        sp[:K] = sels
        pp = np.zeros((b, C.PARAM_W), dtype)
        pp[:K] = params
        spd = jnp.asarray(sp)
        ppd = jnp.asarray(pp)
        nn = jnp.int32(K)
        fb = jnp.zeros((H, W, 4), jnp.float32)

        def run(fb=fb, spd=spd, ppd=ppd, nn=nn, Pp=Pp, Rp=Rp):
            return patch_exec.render_patch_list(
                jnp.zeros((H, W, 4), jnp.float32), spd, ppd, nn, atlas,
                Pp, Rp)
        import jax
        runj = jax.jit(run)
        dt = timeit(runj)
        print(f"patch {name}: P={Pp} R={Rp} {dt*1e3:.2f} ms/64 = "
              f"{dt/K*1e6:.1f} us/cmd")
        sys.stdout.flush()

    # FULL segment: 2 commands padded to bucket 8 (old scan)
    ctx._cmds.clear()
    ctx.fill_color(0.1, 0.1, 0.1, 0.3)
    ctx.draw_vertical_grd(0, H - 200, W, 200, 0, 0, 0, 0, 0, 0, 0, 0.8)
    kinds, params = ctx._cmds.snapshot()
    b = C.bucket_for(2)
    kp = np.zeros(b, np.int32)
    kp[:2] = kinds
    pp = np.zeros((b, C.PARAM_W), dtype)
    pp[:2] = params
    kpd, ppd = jnp.asarray(kp), jnp.asarray(pp)

    import jax

    @jax.jit
    def run_full():
        return executor.render_command_list(
            jnp.zeros((H, W, 4), jnp.float32), kpd, ppd, atlas)
    dt = timeit(run_full)
    print(f"full scan 2 cmds (bucket {b}): {dt*1e3:.2f} ms")
    ctx._cmds.clear()


if __name__ == "__main__":
    main()
