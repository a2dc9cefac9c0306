#!/usr/bin/env python
"""Textured window-count ladder (VERDICT r4 item: textured <= 2.2 ms).

The in-kernel footprint resolve runs a STATIC tex_nw-window loop per
tile (~0.9 ms/frame of the 1.935 ms tex kernel at nw16); the fallback
that finishes unresolved pixels now has a cheap 16-tile tier.  Fewer
windows = leaner kernel + more fallback — this ladder measures where
the sum bottoms out on the bench workload (planar UVs, rotating mesh).

Output is bit-identical across NW by construction (the fallback gathers
the same texel the window path would have) — checksums must agree.

Run: nohup python tools/exp_r4_texnw.py > /tmp/texnw.log 2>&1 &
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402

W, H, B = 1920, 1080, 12
NREP = 4


def main():
    verts_np, faces_np, _ = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    uvs_np = ((verts_np[:, :2] - verts_np[:, :2].min(0))
              / np.ptp(verts_np[:, :2], 0))
    uvs = jnp.asarray(uvs_np, jnp.float32)
    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.integers(0, 255, (256, 256, 4)), jnp.uint8)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvp_sets = []
    for r in range(NREP):
        mvp_sets.append(jnp.stack([
            jnp.asarray(proj @ view @ mesh.rotation_y(
                (r * B + i) * 0.03), jnp.float32) for i in range(B)]))

    cfgs = [("batch", raster3d.render_textured_pallas_batch, nw)
            for nw in (16, 12, 8, 4)]
    cfgs += [("loop", raster3d.render_textured_pallas_loop, nw)
             for nw in (16, 8)]
    for name, fn, nw in cfgs:
        t0 = time.time()
        try:
            outs = [fn(verts, faces, uvs, tex, W, H, mvps=mv, tex_nw=nw)
                    for mv in mvp_sets]
        except Exception as e:  # noqa: BLE001
            print(f"{name} nw={nw}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        chk = int(np.sum([np.asarray(o[0], np.int64).sum()
                          for o in outs]))
        ovf = any(bool(o[1]) for o in outs)
        print(f"{name} nw={nw}: compile+warm {time.time() - t0:.0f}s "
              f"chk {chk} ovf {ovf}", flush=True)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(verts, faces, uvs, tex, W, H, mvps=mv, tex_nw=nw)
                    for mv in mvp_sets]
            s = int(np.asarray(outs[-1][0], np.int64).sum())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            assert s >= 0
        print(f"{name} nw={nw}: {best / (B * NREP) * 1e3:.3f} ms/frame",
              flush=True)


if __name__ == "__main__":
    main()
