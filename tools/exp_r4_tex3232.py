#!/usr/bin/env python
"""Textured (32,32)-tile retry with the geometric fallback tiers.

The round-3 texladder measured (32,32) tiles at 9.27 ms/frame — but
that predates the tier ladder: its misses (narrow tiles bound u tighter
but the old 128/cap tiers made every missed tile cost the full static
gather).  (32,32) walks ~25% fewer pair-slots than (64,32) on the bench
mesh (tighter edge cull on smaller tiles), so if misses are now cheap
the champion could move.  Also probes span(5,3) vs (5,4).

Run: nohup python tools/exp_r4_tex3232.py > /tmp/tex3232.log 2>&1 &
"""

import functools
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402

W, H = 1920, 1080
CFGS = [
    ("(64,32)sp(3,4) control", dict(tile_w=64, tile_h=32, span_x=3,
                                    span_y=4)),
    ("(32,32)sp(5,3)", dict(tile_w=32, tile_h=32, span_x=5, span_y=3)),
    ("(32,32)sp(5,4)", dict(tile_w=32, tile_h=32, span_x=5, span_y=4)),
]


def main():
    verts_np, faces_np, _ = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    uvs_np = ((verts_np[:, :2] - verts_np[:, :2].min(0))
              / np.ptp(verts_np[:, :2], 0))
    uvs = jnp.asarray(uvs_np, jnp.float32)
    rng = np.random.default_rng(1)
    tex_u8 = jnp.asarray(rng.integers(0, 256, (256, 256, 4)), jnp.uint8)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    frames, batch = 24, 12
    tmvps = [jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                         jnp.float32) for i in range(frames)]
    grouped = [jnp.stack(tmvps[i:i + batch])
               for i in range(0, frames, batch)]
    float(jnp.sum(grouped[0]))

    chk0 = None
    for vtag, vkw in CFGS:
        lfn = functools.partial(raster3d.render_textured_pallas_loop,
                                capacity=512, kcc=16, **vkw)

        def run_loop(reps=10):
            outs = []
            for _ in range(reps):
                outs.extend(lfn(verts, faces, uvs, tex_u8, W, H,
                                mvps=m)[0] for m in grouped)
            return float(jnp.sum(jnp.stack(
                [jnp.sum(o.astype(jnp.float32)) for o in outs])))

        tag = f"texloop {vtag}"
        try:
            t0 = time.time()
            chk = run_loop(1)
            print(f"{tag}: compile {time.time() - t0:.0f}s chk {chk:.0f}",
                  flush=True)
            if chk0 is None:
                chk0 = chk
            elif chk != chk0:
                print(f"{tag}: CHECKSUM MISMATCH ({chk:.0f} != "
                      f"{chk0:.0f})", flush=True)
                continue
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                run_loop()
                dt = (time.perf_counter() - t0) / 10 / frames
                best = dt if best is None else min(best, dt)
            print(f"{tag}: {best * 1e3:.3f} ms/frame", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:400]}",
                  flush=True)


if __name__ == "__main__":
    main()
