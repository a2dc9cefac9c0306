#!/usr/bin/env python
"""Measure the in-kernel footprint texel resolve
(render_textured_pallas_batch, tex_resolve kernel) on the bench
workload: 1080p / 10k-tri / 256x256 u8 texture, 24 frames in 12-frame
batches.  Sweeps (tile shape, window count): the footprint windows are
texture-row aligned, so wide (128, 8) tiles mis-fit rotated-UV meshes
(20.6% unresolved measured on the rotating bench mesh); square (32, 32)
tiles bound both UV extents.

Run: nohup python tools/exp_tex_resolve.py > /tmp/exp_tex_resolve.log 2>&1 &
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from libnativecpurenderer_tpu.models import mesh  # noqa: E402
from libnativecpurenderer_tpu.ops import pallas_raster, raster3d  # noqa: E402

W, H = 1920, 1080
FRAMES = 24
BATCH = 12

CFGS = [
    # span 3x3 at (32,32) and 2x6 at (64,16) OVERFLOW on the bench mesh
    # (near-camera triangles wider than 96/128 px; the y-split only
    # splits tall ones).  With the tile-compacted fallback the miss
    # fraction costs ~2 ns/row over cap*1024 rows, so mid-90s%% resolve
    # suffices.
    dict(tile_w=64, tile_h=16, span_x=3, span_y=6, kcc=16, tex_nw=16),
    dict(tile_w=64, tile_h=16, span_x=3, span_y=6, kcc=16, tex_nw=8),
    dict(tile_w=128, tile_h=8, span_x=2, span_y=10, kcc=16, tex_nw=16),
    dict(tile_w=32, tile_h=32, span_x=5, span_y=4, kcc=16, tex_nw=16),
]


def checksum(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    verts_np, faces_np, _ = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    uvs_np = (verts_np[:, :2] - verts_np[:, :2].min(0)) / np.ptp(
        verts_np[:, :2], 0)
    uvs = jnp.asarray(uvs_np, jnp.float32)
    rng = np.random.default_rng(1)
    tex_u8 = jnp.asarray(rng.integers(0, 256, (256, 256, 4)), jnp.uint8)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = [jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                        jnp.float32) for i in range(FRAMES)]
    grouped = [jnp.stack(mvps[i:i + BATCH])
               for i in range(0, FRAMES, BATCH)]
    checksum(jnp.stack(grouped))
    fuv_all = uvs[faces]

    for kw in CFGS:
        kwf = dict(kw)
        try:
            bfn = functools.partial(raster3d.render_textured_pallas_batch,
                                    capacity=512, **kwf)
            t0 = time.time()
            out0, ovf = bfn(verts, faces, uvs, tex_u8, W, H, grouped[0])
            s0 = checksum(out0)
            ct = time.time() - t0
            if bool(ovf):
                print(f"{kw}: OVERFLOW", flush=True)
                continue

            @jax.jit
            def fb_stats(mv, _kw=dict(kw)):
                tw_, th_, sx, sy, kcc_ = (_kw["tile_w"], _kw["tile_h"],
                                          _kw["span_x"], _kw["span_y"],
                                          _kw["kcc"])

                def prep(mvp):
                    tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
                    A, B, C, ia, sg, vl = raster3d.edge_coeffs(
                        tri["sxy"], tri["z"], tri["valid"])
                    zsc = tri["z"] * ia[:, None]
                    sp, st, ct_, _ = raster3d.bin_triangles_flat(
                        tri["sxy"], vl, W, H, tw_, th_, 512, sx, sy,
                        edges=(A, B, C, sg))
                    iw = tri["inv_w"][..., None]
                    attrs = jnp.concatenate([fuv_all * iw, iw,
                                             jnp.ones_like(iw)], axis=-1)
                    table = pallas_raster.build_table(
                        A, B, C, zsc, ia, sg, vl, attrs)
                    return sp, st, ct_, table
                sps, st, ct_, tables = jax.vmap(prep)(mv)
                packed_tex = raster3d.pack_texture_u8(tex_u8).reshape(
                    256, 256)
                tex_l = packed_tex.reshape(512, 128)
                _, fbidx = pallas_raster.render_binned_tex_resolve_batch(
                    sps, st, ct_, tables, tex_l,
                    jnp.zeros(4, jnp.float32), W, H, tw_, th_, 512,
                    (256, 256), False, kcc_, _kw["tex_nw"])
                return jnp.sum(fbidx != -1), jnp.sum(fbidx >= 0)

            nh, nu = fb_stats(grouped[0])
            frac = int(nu) / max(int(nh), 1)
            best = None
            for _rep in range(3):
                t0 = time.time()
                outs = [bfn(verts, faces, uvs, tex_u8, W, H, m)[0]
                        for m in grouped]
                s = checksum(jnp.stack(
                    [jnp.sum(o.astype(jnp.float32)) for o in outs]))
                dt = (time.time() - t0) / FRAMES * 1e3
                best = dt if best is None else min(best, dt)
            print(f"{kw}: {best:.3f} ms/frame unres={frac:.4%} "
                  f"sum={s:.4e} (compile {ct:.0f}s)", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:140]
            print(f"{kw}: FAIL {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
