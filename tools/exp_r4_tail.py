#!/usr/bin/env python
"""Tail levers A/B (post pregather-hoist): (a) flat champion with the
unstable pair sort (values unique -> bit-identical, cheaper network?),
(b) textured fused-loop with the geometric fallback tier ladder
(exp_r4_texprof2 attributed 0.70 ms/frame to the old 128 tier's static
gather cost at ~20-60 actually-missed tiles) + unstable sort.

Expected: flat <= 1.229 ms/frame, texloop well under 3.22.  Checksums
must match the pre-change values (flat chk 4398801920 on the 16-stage
rotation; texloop chk 4829970432).

Run: nohup python tools/exp_r4_tail.py > /tmp/tail.log 2>&1 &
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
NSTAGE = 16
KW = dict(tile_w=32, tile_h=32, span_x=5, span_y=3, capacity=1024,
          flat=True, kcc=16, u8=True, opaque=True, z_clip=False,
          resident_out=True, mega=8)


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

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(mvps, n):
        pre = (raster3d.pregather_mesh(verts, faces), colors[faces])

        def body(i, acc):
            out, _, ovf = raster3d.render_gouraud_pallas.__wrapped__(
                verts, faces, colors, W, H, mvps[i % NSTAGE],
                pre=pre, **KW)
            return (acc[0]
                    + jnp.sum(out, dtype=jnp.uint32).astype(jnp.float32),
                    acc[1] | ovf)
        return lax.fori_loop(0, n, body,
                             (jnp.float32(0.0), jnp.asarray(False)))

    t0 = time.time()
    r = loop(mvps, NSTAGE)
    print(f"flat: compile {time.time() - t0:.0f}s chk {float(r[0]):.0f}"
          f"{' OVERFLOW' if bool(r[1]) else ''} (expect 4398801920)",
          flush=True)
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
    print(f"flat: {(walls[96] - walls[32]) / 64 * 1e3:.3f} ms/frame",
          flush=True)

    # textured fused-loop, bench workload
    uvs_np = ((verts_np[:, :2] - verts_np[:, :2].min(0))
              / np.ptp(verts_np[:, :2], 0))
    uvs = jnp.asarray(uvs_np, jnp.float32)
    rng = np.random.default_rng(1)
    tex_u8 = jnp.asarray(rng.integers(0, 256, (256, 256, 4)), jnp.uint8)
    frames, batch = 24, 12
    tmvps = [jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                         jnp.float32) for i in range(frames)]
    grouped = [jnp.stack(tmvps[i:i + batch])
               for i in range(0, frames, batch)]
    lfn = functools.partial(raster3d.render_textured_pallas_loop,
                            capacity=512, kcc=16)

    def run_loop(reps=10):
        outs = []
        for _ in range(reps):
            outs.extend(lfn(verts, faces, uvs, tex_u8, W, H, mvps=m)[0]
                        for m in grouped)
        return float(jnp.sum(jnp.stack(
            [jnp.sum(o.astype(jnp.float32)) for o in outs])))

    t0 = time.time()
    chk = run_loop(1)
    print(f"texloop: compile {time.time() - t0:.0f}s chk {chk:.0f} "
          f"(expect 4829970432)", flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        run_loop()
        dt = (time.perf_counter() - t0) / 10 / frames
        best = dt if best is None else min(best, dt)
    print(f"texloop: {best * 1e3:.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
