#!/usr/bin/env python
"""Where do the segmented flush's 127 ms/frame go?  Times each host phase
(plan, pad+transfer, dispatch) cumulatively over the bench_canvas frame."""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import libnativecpurenderer_tpu as R  # noqa: E402
from libnativecpurenderer_tpu import config  # noqa: E402
from libnativecpurenderer_tpu.ops import commands as C  # noqa: E402
from libnativecpurenderer_tpu.ops import executor  # noqa: E402
from libnativecpurenderer_tpu.ops import patch_exec  # noqa: E402
from tools.bench_canvas import draw_frame, W, H  # noqa: E402

T = {"plan": 0.0, "pad": 0.0, "xfer": 0.0, "dispatch": 0.0, "n_seg": 0,
     "n_xfer": 0}


def flush_timed(ctx):
    kinds, params = ctx._cmds.snapshot()
    atlas = ctx._store.device
    t0 = time.perf_counter()
    segs = patch_exec.plan_segments(kinds, params, ctx.width, ctx.height,
                                    atlas.shape)
    T["plan"] += time.perf_counter() - t0
    T["n_seg"] += len(segs)
    for seg in segs:
        if seg[0] == "patch":
            _, P, RR, lo, hi, sels = seg
            nseg = hi - lo
            t0 = time.perf_counter()
            b = patch_exec.len_bucket(nseg)
            sp = np.zeros(b, np.int32)
            sp[:nseg] = sels
            pp = np.zeros((b, C.PARAM_W), ctx._dtype)
            pp[:nseg] = params[lo:hi]
            T["pad"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            spd = jnp.asarray(sp)
            ppd = jnp.asarray(pp)
            nnd = jnp.int32(nseg)
            T["xfer"] += time.perf_counter() - t0
            T["n_xfer"] += 3
            t0 = time.perf_counter()
            ctx._fb = patch_exec._run(ctx._fb, spd, ppd, nnd, atlas, P, RR)
            T["dispatch"] += time.perf_counter() - t0
        else:
            _, lo, hi = seg
            t0 = time.perf_counter()
            b = C.bucket_for(hi - lo)
            kp = np.zeros(b, np.int32)
            kp[: hi - lo] = kinds[lo:hi]
            pp = np.zeros((b, C.PARAM_W), ctx._dtype)
            pp[: hi - lo] = params[lo:hi]
            T["pad"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            kpd = jnp.asarray(kp)
            ppd = jnp.asarray(pp)
            T["xfer"] += time.perf_counter() - t0
            T["n_xfer"] += 2
            t0 = time.perf_counter()
            ctx._fb = executor._run(ctx._fb, kpd, ppd, atlas, 0, 0)
            T["dispatch"] += time.perf_counter() - t0
    ctx._cmds.clear()


def main():
    config.set_flush_mode("auto")
    ctx = R.RenderContext(W, H, True)
    rng = np.random.default_rng(0)
    texs = [R.Texture._from_array(rng.random((128, 128, 4)), True)
            for _ in range(4)]
    draw_frame(ctx, texs, 0.0)
    flush_timed(ctx)
    float(np.asarray(ctx._fb[0, 0, 0]))
    for k in T:
        T[k] = 0
    frames = 30
    t0 = time.perf_counter()
    for i in range(frames):
        draw_frame(ctx, texs, i * 0.016)
        flush_timed(ctx)
    float(np.asarray(ctx._fb[0, 0, 0]))
    total = time.perf_counter() - t0
    print(f"total {total / frames * 1e3:.1f} ms/frame over {frames}")
    for k, v in T.items():
        if k.startswith("n_"):
            print(f"  {k}: {v / frames:.1f}/frame")
        else:
            print(f"  {k}: {v / frames * 1e3:.2f} ms/frame")


if __name__ == "__main__":
    main()
