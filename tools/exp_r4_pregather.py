#!/usr/bin/env python
"""Pre-gather hoist A/B at the mega=8 champion: frame-invariant
``v4[faces]`` / ``colors[faces]`` gathers hoisted out of the device
fori body (raster3d.pregather_mesh + render_gouraud_pallas pre=) vs the
in-call gathers XLA re-runs every iteration (~0.07 ms/frame attributed
by exp_r4_champprof2).  Also races the textured fused-loop entry, whose
prep gained the same hoist, against its pre-hoist cost is not separable
there (the hoist landed inside the entry) — so the textured number is a
fresh champion measure, not an A/B.

Checksums must MATCH bit-exactly: the hoisted clip rows are the same
4-element dots ((v4 @ mvp.T)[faces] == v4[faces] @ mvp.T row-for-row);
CPU interpret tests already assert array equality.

Run: nohup python tools/exp_r4_pregather.py > /tmp/pregather.log 2>&1 &
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


def measure(loop, mvps):
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
    return (walls[96] - walls[32]) / 64.0


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
    for hoist in (False, True):
        @functools.partial(jax.jit, static_argnums=(1,))
        def loop(mvps, n, hoist=hoist):
            pre = ((raster3d.pregather_mesh(verts, faces), colors[faces])
                   if hoist else None)

            def body(i, acc):
                out, _, ovf = raster3d.render_gouraud_pallas.__wrapped__(
                    verts, faces, colors, W, H, mvps[i % NSTAGE],
                    pre=pre, **KW)
                return (acc[0]
                        + jnp.sum(out, dtype=jnp.uint32
                                  ).astype(jnp.float32),
                        acc[1] | ovf)
            return lax.fori_loop(0, n, body,
                                 (jnp.float32(0.0), jnp.asarray(False)))

        tag = f"hoist={hoist}"
        t0 = time.time()
        r = loop(mvps, NSTAGE)
        ovf = bool(r[1])
        chk = float(r[0])
        print(f"{tag}: compile {time.time() - t0:.0f}s chk {chk:.0f}"
              f"{' OVERFLOW' if ovf else ''}", flush=True)
        if chk_control is None:
            chk_control = chk
        elif chk != chk_control:
            print(f"{tag}: CHECKSUM MISMATCH ({chk:.0f} != "
                  f"{chk_control:.0f})", flush=True)
        per = measure(loop, mvps)
        print(f"{tag}: {per * 1e3:.3f} ms/frame", flush=True)

    # textured fused-loop fresh measure (hoist landed in-entry): the
    # EXACT bench_textured workload — mesh_10k + planar UVs + (256,256)
    # u8 texture, 12-frame groups, 10 whole-sequence reps per sync
    rng = np.random.default_rng(1)
    uvs_np = ((verts_np[:, :2] - verts_np[:, :2].min(0))
              / np.ptp(verts_np[:, :2], 0))
    uvs = jnp.asarray(uvs_np, jnp.float32)
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
    print(f"texloop: compile {time.time() - t0:.0f}s chk {chk:.0f}",
          flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        run_loop()
        dt = (time.perf_counter() - t0) / 10 / frames
        best = dt if best is None else min(best, dt)
    print(f"texloop: {best * 1e3:.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
