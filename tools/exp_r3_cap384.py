#!/usr/bin/env python
"""Tile-SHAPE ladder round 2: production flags (opaque u8, z_clip off).

The chunk walk is at VPU speed-of-light for its op count (ROADMAP), so
the remaining lever is fewer pair-pixels.  The bench mesh's triangles
are ~14 px tall/wide: on (128, 8) tiles each touches ~4 tiles (39k pairs
post-cull), on (32, 32) ~2 — and the edge-vs-tile corner cull gets
sharper as tiles approach triangle size.  Squarer tiles also shrink the
emission slot count (span_x*span_y per tri) and with it the sort, the
#2 profile line (0.315 ms/frame).

Subtraction timing per exp_tilecfg (96-32 frames in one fori_loop jit).

Run: nohup python tools/exp_r3_tileshape.py > /tmp/exp_tileshape.log 2>&1 &
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402

W, H = 1920, 1080
NSTAGE = 16

CFGS = [
    dict(tile_w=32, tile_h=32, span_x=5, span_y=3, kcc=16, opaque=True,
         z_clip=False, capacity=384),
]


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

    for cfg in CFGS:
        kw = dict(capacity=512, flat=True, u8=True)
        kw.update(cfg)

        @functools.partial(jax.jit, static_argnums=(1,))
        def loop(mvps, n, kw=kw):
            def body(i, acc):
                out, _, ovf = raster3d.render_gouraud_pallas.__wrapped__(
                    verts, faces, colors, W, H, mvps[i % NSTAGE], **kw)
                return (acc[0]
                        + jnp.sum(out, dtype=jnp.uint32
                                  ).astype(jnp.float32),
                        acc[1] | ovf)
            return lax.fori_loop(0, n, body,
                                 (jnp.float32(0.0), jnp.asarray(False)))

        try:
            r = loop(mvps, 8)
            if bool(r[1]):
                print(f"{cfg}: OVERFLOW", flush=True)
                continue
            for n in (32, 96):
                float(loop(mvps, n)[0])
            walls = {}
            for n in (32, 96):
                best = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(loop(mvps, n)[0])
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                walls[n] = best
            per = (walls[96] - walls[32]) / 64.0
            print(f"{cfg}: {per * 1e3:.3f} ms/frame", flush=True)
        except Exception as e:
            print(f"{cfg}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
