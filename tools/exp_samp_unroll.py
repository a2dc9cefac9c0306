#!/usr/bin/env python
"""How much of the patch loop's ~52 us/sampling-command is loop/dispatch
structure vs real work?

Compares, on the bench_canvas 42-command sampling span (fixed inputs):
  A. production _patch_span (fori_loop, dynamic count)
  B. unrolled straight-line: same per-command math, python-for at trace
     time (XLA sees 42 independent slice/compute/DUS chains)
  C. unrolled + batched einsum: group same-sel runs, stack regions,
     one batched one-hot sample per group, sequential DUS blends

Run: nohup python tools/exp_samp_unroll.py > /tmp/exp_samp_unroll.log 2>&1 &
"""

import functools
import math
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
from jax import lax                                     # noqa: E402

import libnativecpurenderer_tpu as R                    # noqa: E402
from libnativecpurenderer_tpu.ops import commands as C  # noqa: E402
from libnativecpurenderer_tpu.ops import patch_exec     # noqa: E402

W, H = 1920, 1080


def record():
    ctx = R.RenderContext(W, H, True)
    rng = np.random.default_rng(0)
    texs = [R.Texture._from_array(rng.random((128, 128, 4)), True)
            for _ in range(4)]
    rng = np.random.default_rng(42)
    for i in range(30):
        tex = texs[i % len(texs)]
        x = float(rng.uniform(0, W - 140) + 40 * math.sin(2 + i))
        y = float(rng.uniform(0, H - 140))
        ctx.draw_splitted_texture(tex, x, y, 100.0, 50.0,
                                  0.1, 0.9, 0.0, 1.0)
    for i in range(12):
        tex = texs[i % len(texs)]
        ctx.draw_texture(tex, float(rng.uniform(0, W - 120)),
                         float(rng.uniform(0, H - 120)), 80.0, 80.0)
    n = ctx._cmds.n
    kinds = np.array(ctx._cmds.kinds[:n], np.int32)
    params = np.asarray(ctx._cmds.params[:n], np.float32)
    segs = patch_exec.plan_segments(kinds, params, W, H,
                                    ctx._store.device.shape)
    assert len(segs) == 1 and segs[0][0] == "patch", segs
    _, P, Rr, lo, hi, sels, with_region = segs[0]
    return ctx, kinds, params, P, Rr, sels


def measure(name, fn, fb0, reps=(8, 24)):
    walls = {}
    for n in reps:
        float(jnp.sum(run_n(fn, fb0, n)[:1, :1, 0]))
    for n in reps:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(run_n(fn, fb0, n)[:1, :1, 0]))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        walls[n] = best
    per = (walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0])
    print(f"{name:10s} {per * 1e3:7.3f} ms/span", flush=True)


@functools.partial(jax.jit, static_argnums=(0, 2))
def run_n(fn, fb0, n):
    def body(i, fb):
        return fn(fb)
    return lax.fori_loop(0, n, body, fb0)


def main():
    ctx, kinds, params, P, Rr, sels = record()
    n = len(kinds)
    print(f"{n} sampling cmds, P={P} R={Rr} sels={sorted(set(sels))}",
          flush=True)
    atlas = ctx._store.device
    dtype = atlas.dtype
    nbase = patch_exec.len_bucket(n)
    packed = np.zeros((nbase + 1, patch_exec.PACKED_W), np.float32)
    packed[:n, : C.PARAM_W] = params
    packed[:n, C.PARAM_W] = sels
    packed[nbase, 0] = 0
    packed[nbase, 1] = n
    packed_d = jnp.asarray(packed)
    sels_d = packed_d[:, C.PARAM_W].astype(jnp.int32)
    params_d = packed_d[:, : C.PARAM_W]

    fb0 = jnp.zeros((H, W, 4), dtype)

    # A: production span
    def prod(fb):
        lo = packed_d[nbase, 0].astype(jnp.int32)
        cnt = packed_d[nbase, 1].astype(jnp.int32)
        return patch_exec._patch_span(fb, sels_d, params_d, lo, cnt,
                                      atlas, P, Rr, True, dtype)

    measure("fori-span", prod, fb0)

    # B: unrolled — same helpers, traced per command with STATIC indices
    branches = patch_exec._build_region_branches  # signature probe
    def unrolled(fb):
        for i in range(n):
            fb = patch_exec._patch_step_static(fb, int(sels[i]),
                                               params_d[i], atlas, P, Rr,
                                               dtype)
        return fb

    if hasattr(patch_exec, "_patch_step_static"):
        measure("unrolled", unrolled, fb0)
    else:
        print("unrolled: needs patch_exec._patch_step_static", flush=True)


if __name__ == "__main__":
    main()
