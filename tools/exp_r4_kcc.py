#!/usr/bin/env python
"""kcc ladder at the post-hoist/unstable-sort champion: with the prep
tail down to ~0.25 ms the kernel (0.859) is 77% of frame time.  kcc8/12
measured worse than 16 at (32,32) pre-mega (ROADMAP round-3 tileshape
ladder); kcc24/32 were never tried at this shape — fewer chunks amortise
the per-chunk reduce/row-gather machinery over the same walked slots
(mean run ~50 pairs/tile -> 2 chunks at kcc32 vs 4 at kcc16, same pad
waste at this run length).

Run: nohup python tools/exp_r4_kcc.py > /tmp/kcc.log 2>&1 &
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
            flat=True, u8=True, opaque=True, z_clip=False,
            resident_out=True, mega=8)
CFGS = [dict(kcc=16), dict(kcc=24), dict(kcc=32),
        dict(kcc=32, mega=12, capacity=2048)]
# round 2 of the ladder (post transposed-emission): kcc32 won round 1
# (1.073 vs 16's 1.131); probe further up + re-baseline 32
if "--hi" in sys.argv:
    CFGS = [dict(kcc=32), dict(kcc=48), dict(kcc=64)]


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

        tag = ",".join(f"{k}={v}" for k, v in cfg.items())
        try:
            t0 = time.time()
            r = loop(mvps, NSTAGE)
            chk = float(r[0])
            print(f"{tag}: compile {time.time() - t0:.0f}s chk {chk:.0f}"
                  f"{' OVERFLOW' if bool(r[1]) else ''}", flush=True)
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
