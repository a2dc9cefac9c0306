#!/usr/bin/env python
"""tiled=True A/B at the flat champion (round-5-queue item 2).

exp_r4_champprof3 attribution at the out8 champion (1.046 ms/frame
while total): kernel 0.844 + sort 0.067 + detile transpose 0.033 +
reshapes 0.032 + ~0.07 misc.  tiled=True removes the detile
transpose+reshape chain from the device program entirely — the frame
leaves the device in the kernel's per-tile (NT, P, 4) u8 layout and
the VideoCap encode worker detiles on host (native MediaDetileU8,
overlapped with encode; tests/test_media.py proves the MP4s decode
byte-identical).

Checksum contract: tiled slots past the viewport carry real rasterised
values (edge triangles cover them), so the tiled loop sums through
raster3d.viewport_mask — bit-comparable to the detiled control's sum
(tests/test_pallas_raster.py::test_u8_tiled_matches_detiled).

Run: nohup python tools/exp_r4g_tiled.py > /tmp/tiled.log 2>&1 &
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
BASE = dict(tile_w=32, tile_h=32, span_x=5, span_y=3, capacity=1024,
            flat=True, kcc=32, u8=True, opaque=True, z_clip=False,
            resident_out=True, mega=8, out8=True)
CFGS = [
    ("control", {}),
    ("tiled", dict(tiled=True)),
    ("tiled_nomega", dict(tiled=True, mega=0)),
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
    vmask = raster3d.viewport_mask(W, H, BASE["tile_w"], BASE["tile_h"])

    chk0 = None
    for tag, extra in CFGS:
        kw = dict(BASE)
        kw.update(extra)
        tiled = kw.get("tiled", False)

        @functools.partial(jax.jit, static_argnums=(1,))
        def loop(mvps, n, kw=dict(kw), tiled=tiled):
            pre = (raster3d.pregather_mesh(verts, faces), colors[faces])

            def body(i, acc):
                out, _, ovf = raster3d.render_gouraud_pallas.__wrapped__(
                    verts, faces, colors, W, H, mvps[i % NSTAGE],
                    pre=pre, **kw)
                if tiled:
                    out = jnp.where(vmask[..., None], out, 0)
                return (acc[0]
                        + jnp.sum(out, dtype=jnp.uint32
                                  ).astype(jnp.float32),
                        acc[1] | ovf)
            return lax.fori_loop(0, n, body,
                                 (jnp.float32(0.0), jnp.asarray(False)))

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
