#!/usr/bin/env python
"""Decompose render_textured_pallas_batch time: prep+kernel (idx plane)
vs the packed texel gather vs the full path.  The first TPU run of the
full path measured 21.8 ms/frame vs 8.9 for the old per-frame f32 path
— find which stage is pathological.

Run: nohup python tools/exp_tex_idx.py > /tmp/exp_tex_idx.log 2>&1 &
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

from libnativecpurenderer_tpu.models import mesh  # noqa: E402
from libnativecpurenderer_tpu.ops import pallas_raster, raster3d  # noqa: E402

W, H = 1920, 1080
FRAMES = 24
BATCH = 12
KW = dict(tile_w=128, tile_h=8, capacity=512, span_x=2, span_y=10,
          kcc=16)


def checksum(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
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

    # ---- stage 1: prep + kernel -> idx plane only -------------------
    @jax.jit
    def idx_only(mv):
        fuv_all = uvs[faces]

        def prep(mvp):
            tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
            A, B, C, ia, sg, vl = raster3d.edge_coeffs(
                tri["sxy"], tri["z"], tri["valid"])
            zsc = tri["z"] * ia[:, None]
            sp, st, ct, ovf = raster3d.bin_triangles_flat(
                tri["sxy"], vl, W, H, KW["tile_w"], KW["tile_h"],
                KW["capacity"], KW["span_x"], KW["span_y"],
                edges=(A, B, C, sg))
            iw = tri["inv_w"][..., None]
            attrs = jnp.concatenate([fuv_all * iw, iw,
                                     jnp.ones_like(iw)], axis=-1)
            table = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl,
                                              attrs)
            return sp, st, ct, table, ovf

        sps, st, ct, tables, ovfs = jax.vmap(prep)(mv)
        idx = pallas_raster.render_binned_tex_idx_batch(
            sps, st, ct, tables, W, H, KW["tile_w"], KW["tile_h"],
            KW["capacity"], (256, 256), False, KW["kcc"])
        return idx

    idx0 = idx_only(grouped[0])
    checksum(idx0)
    print("idx_only compiled", flush=True)
    for rep in range(3):
        t0 = time.time()
        outs = [idx_only(m) for m in grouped]
        s = checksum(jnp.stack([jnp.sum(o.astype(jnp.float32))
                                for o in outs]))
        dt = time.time() - t0
        print(f"idx_only rep{rep}: {dt / FRAMES * 1e3:.3f} ms/frame "
              f"sum={s:.3e}", flush=True)

    # ---- stage 2: gather only (fixed idx plane) ---------------------
    packed = raster3d.pack_texture_u8(tex_u8)

    @jax.jit
    def gather_only(idx):
        texel = jnp.take(packed, jnp.maximum(idx, 0).reshape(-1),
                         axis=0).reshape(idx.shape)
        rgba = lax.bitcast_convert_type(texel, jnp.uint8)
        rgba = jnp.where((idx >= 0)[..., None], rgba,
                         jnp.zeros(4, jnp.uint8)[None, None, None, :])
        return rgba

    r0 = gather_only(idx0)
    checksum(r0)
    for rep in range(3):
        t0 = time.time()
        outs = [gather_only(idx0) for _ in grouped]
        s = checksum(jnp.stack(
            [jnp.sum(o.astype(jnp.float32)) for o in outs]))
        dt = time.time() - t0
        print(f"gather_only rep{rep}: {dt / FRAMES * 1e3:.3f} ms/frame "
              f"sum={s:.3e}", flush=True)

    # ---- stage 2b: 2D row gather via one-hot-free take on rows ------
    @jax.jit
    def gather_rows(idx):
        # gather (4,) u8 rows like the old path: is row-gather faster
        # than element-gather on this backend?
        t4 = tex_u8.reshape(-1, 4)
        texel = jnp.take(t4, jnp.maximum(idx, 0).reshape(-1),
                         axis=0).reshape(idx.shape + (4,))
        return jnp.where((idx >= 0)[..., None], texel,
                         jnp.zeros(4, jnp.uint8)[None, None, None, :])

    r1 = gather_rows(idx0)
    checksum(r1)
    for rep in range(3):
        t0 = time.time()
        outs = [gather_rows(idx0) for _ in grouped]
        s = checksum(jnp.stack(
            [jnp.sum(o.astype(jnp.float32)) for o in outs]))
        dt = time.time() - t0
        print(f"gather_rows rep{rep}: {dt / FRAMES * 1e3:.3f} ms/frame "
              f"sum={s:.3e}", flush=True)

    # ---- full path --------------------------------------------------
    bfn = functools.partial(raster3d.render_textured_pallas_batch, **KW)
    out0, ovf = bfn(verts, faces, uvs, tex_u8, W, H, grouped[0])
    checksum(out0)
    print(f"full ovf={bool(ovf)}", flush=True)
    for rep in range(3):
        t0 = time.time()
        outs = [bfn(verts, faces, uvs, tex_u8, W, H, m)[0]
                for m in grouped]
        s = checksum(jnp.stack(
            [jnp.sum(o.astype(jnp.float32)) for o in outs]))
        dt = time.time() - t0
        print(f"full rep{rep}: {dt / FRAMES * 1e3:.3f} ms/frame "
              f"sum={s:.3e}", flush=True)


if __name__ == "__main__":
    main()
