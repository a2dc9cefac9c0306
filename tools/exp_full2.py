#!/usr/bin/env python
"""Clean device-time of the FULL raster path, f32 vs u8 output, plus the
batched u8 variant — exp_prep2's sync-free method: N iterations inside one
jitted fori_loop over pre-staged mvps, per-frame = (wall96 - wall32) / 64.

If u8 device time << bench wall (3.27 ms/frame), the pipeline has become
dispatch-bound and batching frames per launch is the next lever.

Run: nohup python tools/exp_full2.py > /tmp/exp_full2.log 2>&1 &
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402

W, H = 1920, 1080
CFG = dict(tile_w=128, tile_h=8, span_x=2, span_y=10, capacity=512,
           flat=True, kcc=16)
NSTAGE = 16


def measure(name, loop_fn):
    for n in (32, 96):
        float(loop_fn(n))
    walls = {}
    for n in (32, 96):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop_fn(n))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        walls[n] = best
    per = (walls[96] - walls[32]) / 64.0
    print(f"{name:10s} {per * 1e3:7.3f} ms/frame "
          f"(w32 {walls[32] * 1e3:6.1f}  w96 {walls[96] * 1e3:6.1f})",
          flush=True)
    return per


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    colors = jnp.asarray(colors_np, jnp.float32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = jnp.stack([jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                                  jnp.float32) for i in range(NSTAGE)])
    float(jnp.sum(mvps))

    def full(u8):
        @functools.partial(jax.jit, static_argnums=(1,))
        def loop(mvps, n):
            def body(i, acc):
                out = raster3d.render_gouraud_pallas.__wrapped__(
                    verts, faces, colors, W, H, mvps[i % NSTAGE],
                    u8=u8, **CFG)[0]
                return acc + jnp.sum(out.astype(jnp.float32))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return lambda n: loop(mvps, n)

    measure("full_f32", full(False))
    measure("full_u8", full(True))

    for B in (2, 4, 8):
        @functools.partial(jax.jit, static_argnums=(1,))
        def loopb(mvps, n, B=B):
            def body(i, acc):
                sel = (i * B + jnp.arange(B)) % NSTAGE
                out = raster3d.render_gouraud_pallas_batch.__wrapped__(
                    verts, faces, colors, W, H, mvps[sel],
                    u8=True, **CFG)[0]
                return acc + jnp.sum(out.astype(jnp.float32))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        def per_frame(n, B=B, loopb=loopb):
            return loopb(mvps, n)
        pb = measure(f"batch{B}_u8", per_frame)
        print(f"  -> per frame {pb * 1e3 / B:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
