#!/usr/bin/env python
"""Is the flat kernel's measured 2.8 ms/frame device time or dispatch?

serial==constrow==nocopy==th8==th16 (~2.7-2.85 ms) in exp_row_dma — the
timing is invariant to kernel content, which smells like a per-launch
floor.  Decompose:
  single      : 1 pallas launch per frame (the exp_row_dma measurement)
  batch4/8/16 : B frames in ONE launch (render_binned_pallas_flat_batch's
                raster_tiles_flat with tiles_per_frame) — if per-frame
                time collapses, the single-launch number was dispatch
  zero        : counts forced 0, single launch — per-tile fixed cost
                (grid step + SMEM block DMA + out stores)

Run: nohup python tools/exp_batch_kernel.py > /tmp/exp_batch_kernel.log 2>&1 &
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402
from libnativecpurenderer_tpu.ops import pallas_raster      # noqa: E402

W, H = 1920, 1080
TW, TH, KB, SX, SY, KCC = 128, 16, 512, 3, 6, 32
FRAMES = 32


def checksum(arrs):
    return float(jnp.sum(jnp.stack([jnp.sum(a.astype(jnp.float32))
                                    for a in arrs])))


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = [jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03), jnp.float32)
            for i in range(FRAMES)]
    checksum(mvps)
    attrs = jnp.asarray(colors_np[faces_np], jnp.float32)

    ntx = (W + TW - 1) // TW
    nty = (H + TH - 1) // TH
    nt = ntx * nty

    @jax.jit
    def prep(mvp):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                   tri["valid"])
        zsc = tri["z"] * ia[:, None]
        sorted_pad, starts, counts, ovf = raster3d.bin_triangles_flat(
            tri["sxy"], vl, W, H, TW, TH, KB, SX, SY)
        table = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl, attrs)
        return sorted_pad, starts, counts, table

    staged = [prep(m) for m in mvps]
    checksum([s[3] for s in staged])
    tids = jnp.arange(nt, dtype=jnp.int32)
    ox = tids % ntx * TW
    oy = tids // ntx * TH

    def scalars_for(starts, counts, base_block=0):
        return jnp.concatenate(
            [counts.astype(jnp.int32), ox, oy,
             base_block + starts // KB, starts % KB])

    # pre-build launch inputs on device
    singles = []
    zeros = []
    for sp, st, ct, tb in staged:
        singles.append((sp, tb, scalars_for(st, ct)))
        zeros.append((sp, tb, scalars_for(st, jnp.zeros_like(ct))))
    checksum([s[2] for s in singles] + [z[2] for z in zeros])

    launch = functools.partial(pallas_raster.raster_tiles_flat,
                               nt=nt, tile_h=TH, tile_w=TW, Kb=KB,
                               interpret=False, kcc=KCC, tiles_per_frame=0)

    def timeit(name, fn, args_list):
        outs = [fn(*a) for a in args_list]          # warm
        checksum([o[1] for o in outs])
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(*a) for a in args_list]
            chk = checksum([o[1] for o in outs])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:12s} {best / FRAMES * 1e3:7.3f} ms/frame "
              f"({len(args_list)} launches, chk {chk:.1f})", flush=True)

    timeit("single", lambda sp, tb, sc: launch(sp, tb, sc), singles)
    timeit("zero", lambda sp, tb, sc: launch(sp, tb, sc), zeros)

    for B in (4, 8, 16):
        nblk = staged[0][0].shape[0] // KB
        batches = []
        for b0 in range(0, FRAMES, B):
            sps = jnp.concatenate([staged[i][0]
                                   for i in range(b0, b0 + B)])
            tbs = jnp.stack([staged[i][3] for i in range(b0, b0 + B)])
            # batched layout: [counts.. | ox.. | oy.. | blk.. | off..]
            # across B*nt tiles (frame-major within each section)
            scs = jnp.concatenate(
                [scalars_for(staged[i][1], staged[i][2],
                             (i - b0) * nblk).reshape(5, nt)
                 for i in range(b0, b0 + B)], axis=1)
            sc = scs.reshape(-1)
            batches.append((sps, tbs, sc))
        checksum([b[2] for b in batches])
        bl = functools.partial(pallas_raster.raster_tiles_flat,
                               nt=B * nt, tile_h=TH, tile_w=TW, Kb=KB,
                               interpret=False, kcc=KCC, tiles_per_frame=nt)
        timeit(f"batch{B}", lambda sp, tb, sc, _bl=bl: _bl(sp, tb, sc),
               batches)


if __name__ == "__main__":
    main()
