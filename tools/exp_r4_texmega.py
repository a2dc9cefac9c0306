#!/usr/bin/env python
"""Textured-path mega-loop A/B (VERDICT r3 item 4): the tex_resolve
kernel rides the same flat-pair path as the color kernel, and the mega
machinery is already wired (pallas_raster kernel_tex_mega, (mega,1,P)
out blocks).  Champion config: (64,32) span(3,4) nw16 B=12 = 3.16-3.66
ms/frame.  NT/frame = 30*34 = 1020; mega must divide 1020 (4, 6, 10,
12, 20); window demand scales with mega * mean_run.

Run: nohup python tools/exp_r4_texmega.py > /tmp/texmega.log 2>&1 &
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402

W, H = 1920, 1080
B = 12
NREP = 4          # sequences per timed call

CFGS = [
    dict(),                                       # control: tex champion
    dict(mega=4, capacity=1024),
    dict(mega=6, capacity=1024),
    dict(mega=12, capacity=2048),
    dict(mega=20, capacity=2048),
]


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    rng = np.random.default_rng(0)
    uvs_np = rng.random((verts_np.shape[0], 2)).astype(np.float32)
    tex_np = rng.integers(0, 256, (256, 256, 4), np.uint8)
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    uvs = jnp.asarray(uvs_np)
    tex_u8 = jnp.asarray(tex_np)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = jnp.stack([jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                                  jnp.float32) for i in range(B)])
    float(jnp.sum(mvps))

    chk_control = None
    for cfg in CFGS:
        kw = dict(tile_w=64, tile_h=32, capacity=512, span_x=3, span_y=4,
                  kcc=16, tex_nw=16)
        kw.update(cfg)

        @functools.partial(jax.jit, static_argnums=(1,))
        def loop(mvps, n, kw=dict(kw)):
            def body(i, acc):
                out, ovf = raster3d.render_textured_pallas_batch.__wrapped__(
                    verts, faces, uvs, tex_u8, W, H, mvps, **kw)
                return (acc[0]
                        + jnp.sum(out, dtype=jnp.uint32
                                  ).astype(jnp.float32),
                        acc[1] | jnp.any(ovf))
            return lax.fori_loop(0, n, body,
                                 (jnp.float32(0.0), jnp.asarray(False)))

        tag = f"mega={cfg.get('mega', 0)},Kb={kw['capacity']}"
        try:
            t0 = time.time()
            r = loop(mvps, 1)
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
            for n in (1, NREP + 1):
                float(loop(mvps, n)[0])
            walls = {}
            for n in (1, NREP + 1):
                best = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(loop(mvps, n)[0])
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                walls[n] = best
            per = (walls[NREP + 1] - walls[1]) / (NREP * B)
            print(f"{tag}: {per * 1e3:.3f} ms/frame", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
