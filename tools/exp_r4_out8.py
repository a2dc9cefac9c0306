#!/usr/bin/env python
"""out8 + ktail A/B at the flat champion.

exp_r4_champprof2 attribution at the mega=8 champion (1.059 ms/frame
while-loop total): kernel 0.844, sort 0.067, DETILE CHAIN 0.086
(copy.42 relayout 0.021 + transpose copy.43 0.033 + reshapes 0.032).

- out8: kernel out (NT, P/128, 128) sublane-major -> born in XLA's
  native T(8,128) layout; expected to drop the relayout copy and fold a
  reshape (~0.02-0.05 ms/frame).
- ktail: run remainders walked in small chunks instead of one padded
  kcc=32 chunk; ~16%% of walked slots are padding at ~50-pair mean runs
  (expected ~0.05-0.1 off the 0.84 kernel, minus added loop overhead).

Both bit-exact (tests/test_pallas_raster.py::test_u8_out8_ktail_match).

Run: nohup python tools/exp_r4_out8.py > /tmp/out8.log 2>&1 &
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
            resident_out=True, mega=8)
CFGS = [
    ("control", {}),
    ("out8", dict(out8=True)),
    ("ktail8", dict(ktail=8)),
    ("ktail16", dict(ktail=16)),
    ("out8+ktail8", dict(out8=True, ktail=8)),
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
    for tag, extra in CFGS:
        kw = dict(BASE)
        kw.update(extra)

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
