#!/usr/bin/env python
"""Fine-tune the production megaloop around the exp_r4_megaprod winner
(mega=8, Kb=1024: 1.480 vs control 1.635 ms/frame).  NT=2040 divisors
near 8: 4, 6, 8, 10, 12; Kb trades SMEM block size vs window headroom.

Run: nohup python tools/exp_r4_megatune.py > /tmp/megatune.log 2>&1 &
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
    dict(),                                       # control: champion
    dict(mega=4, capacity=1024),
    dict(mega=6, capacity=1024),
    dict(mega=8, capacity=1024),                  # megaprod winner
    dict(mega=8, capacity=2048),
    dict(mega=10, capacity=1024),
    dict(mega=12, capacity=1024),
    dict(mega=12, capacity=2048),
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

    chk_control = None
    for cfg in CFGS:
        kw = dict(tile_w=32, tile_h=32, span_x=5, span_y=3, capacity=512,
                  flat=True, kcc=16, u8=True, opaque=True, z_clip=False,
                  resident_out=True)
        kw.update(cfg)

        @functools.partial(jax.jit, static_argnums=(1,))
        def loop(mvps, n, kw=dict(kw)):
            def body(i, acc):
                out, _, ovf = raster3d.render_gouraud_pallas.__wrapped__(
                    verts, faces, colors, W, H, mvps[i % NSTAGE], **kw)
                return (acc[0]
                        + jnp.sum(out, dtype=jnp.uint32
                                  ).astype(jnp.float32),
                        acc[1] | ovf)
            return lax.fori_loop(0, n, body,
                                 (jnp.float32(0.0), jnp.asarray(False)))

        tag = f"mega={cfg.get('mega', 0)},Kb={kw['capacity']}"
        try:
            t0 = time.time()
            r = loop(mvps, NSTAGE)
            ovf = bool(r[1])
            chk = float(r[0])
            print(f"{tag}: compile {time.time() - t0:.0f}s chk {chk:.0f}"
                  f"{' OVERFLOW' if ovf else ''}", flush=True)
            if ovf:
                continue
            if chk_control is None:
                chk_control = chk
            elif chk != chk_control:
                print(f"{tag}: CHECKSUM MISMATCH vs control "
                      f"({chk:.0f} != {chk_control:.0f})", flush=True)
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
            print(f"{tag}: {per * 1e3:.3f} ms/frame", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
