#!/usr/bin/env python
"""Textured deferred raster at 1080p/10k-tri: where does the time go?

Stages: full render_textured_binned vs the same without the final texel
gather (uvq produced, constant shade).  Subtraction method.

Run: nohup python tools/exp_textured.py > /tmp/exp_textured.log 2>&1 &
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
NSTAGE = 8


def measure(name, loop_fn):
    for n in (16, 48):
        float(loop_fn(n))
    walls = {}
    for n in (16, 48):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop_fn(n))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        walls[n] = best
    per = (walls[48] - walls[16]) / 32.0
    print(f"{name:12s} {per * 1e3:7.3f} ms/frame", flush=True)


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    # UVs from object-space xy
    uvs_np = (verts_np[:, :2] - verts_np[:, :2].min(0)) / np.ptp(
        verts_np[:, :2], 0)
    uvs = jnp.asarray(uvs_np, jnp.float32)
    tex_np = np.zeros((256, 256, 4), np.float32)
    ys, xs = np.mgrid[0:256, 0:256]
    tex_np[..., 0] = ((xs // 16 + ys // 16) % 2)
    tex_np[..., 3] = 1.0
    tex = jnp.asarray(tex_np)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = jnp.stack([jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                                  jnp.float32) for i in range(NSTAGE)])
    float(jnp.sum(mvps))

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop_full(mvps, n):
        def body(i, acc):
            fb, z, ovf = raster3d.render_textured_binned.__wrapped__(
                verts, faces, uvs, tex, W, H, mvps[i % NSTAGE],
                tile_w=128, tile_h=16, capacity=512, span_x=3, span_y=6)
            return acc + jnp.sum(fb[:8])
        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    measure("textured", lambda n: loop_full(mvps, n))


if __name__ == "__main__" and "--pallas" not in sys.argv:
    main()


def pallas_variant():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    uvs_np = (verts_np[:, :2] - verts_np[:, :2].min(0)) / np.ptp(
        verts_np[:, :2], 0)
    uvs = jnp.asarray(uvs_np, jnp.float32)
    tex_np = np.zeros((256, 256, 4), np.float32)
    ys, xs = np.mgrid[0:256, 0:256]
    tex_np[..., 0] = ((xs // 16 + ys // 16) % 2)
    tex_np[..., 3] = 1.0
    tex = jnp.asarray(tex_np)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = jnp.stack([jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                                  jnp.float32) for i in range(NSTAGE)])
    float(jnp.sum(mvps))

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop_p(mvps, n):
        def body(i, acc):
            fb, z, ovf = raster3d.render_textured_pallas.__wrapped__(
                verts, faces, uvs, tex, W, H, mvps[i % NSTAGE])
            return acc + jnp.sum(fb[:8])
        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    measure("tex-pallas", lambda n: loop_p(mvps, n))


if __name__ == "__main__" and "--pallas" in sys.argv:
    pallas_variant()
