#!/usr/bin/env python
"""Half-tile ladder: (32,16) tiles with mega amortising the 2x program
count.  Round-3 killed small tiles ((16,16) 3.39 vs (32,32) 1.64)
because per-program fixed cost dominated at 4x programs — but that was
PRE-mega.  With mega=16 the program count stays at 255 and the walk
touches HALF the pixels per pair (bench triangles ~14 px, so most of a
(32,32) tile's 1024-slot walk is never-covered lanes).  Expected: kernel
0.84 -> ~0.55-0.65 if slot-count scaling holds; sort grows ~250k slots.

Checksums must match the (32,32) control bit-exactly (tile shape does
not change the rendered frame — prior ladders confirmed cross-config
checksum identity).

Run: nohup python tools/exp_r4_halftile.py > /tmp/halftile.log 2>&1 &
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
BASE = dict(flat=True, kcc=32, u8=True, opaque=True, z_clip=False,
            resident_out=True)
CFGS = [
    dict(tile_w=32, tile_h=32, span_x=5, span_y=3, capacity=1024,
         mega=8),                                   # control (champion)
    dict(tile_w=32, tile_h=16, span_x=5, span_y=5, capacity=1024,
         mega=16),
    dict(tile_w=32, tile_h=16, span_x=5, span_y=5, capacity=2048,
         mega=16),
    dict(tile_w=64, tile_h=16, span_x=3, span_y=5, capacity=1024,
         mega=8),
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

    chk0 = None
    for cfg in CFGS:
        kw = dict(BASE)
        kw.update(cfg)

        @functools.partial(jax.jit, static_argnums=(1,))
        def loop(mvps, n, kw=dict(kw)):
            pre = (raster3d.pregather_mesh(verts, faces), colors[faces])

            def body(i, acc):
                out, _, ovf = raster3d.render_gouraud_pallas.__wrapped__(
                    verts, faces, colors, W, H, mvps[i % NSTAGE],
                    pre=pre, **kw)
                return (acc[0]
                        + jnp.sum(out, dtype=jnp.uint32
                                  ).astype(jnp.float32),
                        acc[1] | ovf)
            return lax.fori_loop(0, n, body,
                                 (jnp.float32(0.0), jnp.asarray(False)))

        tag = (f"({cfg['tile_w']},{cfg['tile_h']})span"
               f"({cfg['span_x']},{cfg['span_y']})Kb{cfg['capacity']}"
               f"m{cfg['mega']}")
        try:
            t0 = time.time()
            r = loop(mvps, NSTAGE)
            chk = float(r[0])
            print(f"{tag}: compile {time.time() - t0:.0f}s chk {chk:.0f}"
                  f"{' OVERFLOW' if bool(r[1]) else ''}", flush=True)
            if bool(r[1]):
                continue
            if chk0 is None:
                chk0 = chk
            elif chk != chk0:
                print(f"{tag}: CHECKSUM MISMATCH", flush=True)
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
            print(f"{tag}: {(walls[96] - walls[32]) / 64 * 1e3:.3f} "
                  "ms/frame", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
