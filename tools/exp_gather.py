#!/usr/bin/env python
"""Texel-gather lowering shoot-out on a fixed (B, H, W) i32 index plane.

exp_tex_idx measured the flat packed-i32 element gather at 19.5 ms/frame
(expected ~1 at the backend's 7-9 GB/s gather rate) while a u8 row
gather ran 5.7 — so the gather LOWERING, not the byte volume, dominates.
Time every plausible (table dtype, table rank, index form) combination
to find the fast path.

Run: nohup python tools/exp_gather.py > /tmp/exp_gather.log 2>&1 &
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

from libnativecpurenderer_tpu.models import mesh  # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d  # noqa: E402

W, H = 1920, 1080
FRAMES = 24
BATCH = 12
TH, TW = 256, 256


def checksum(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    rng = np.random.default_rng(1)
    tex_u8 = jnp.asarray(rng.integers(0, 256, (TH, TW, 4)), jnp.uint8)
    packed_i32 = raster3d.pack_texture_u8(tex_u8)           # (TH*TW,)
    packed_f32 = lax.bitcast_convert_type(
        packed_i32.reshape(TH, TW), jnp.float32).reshape(-1)
    tex_f32 = tex_u8.astype(jnp.float32)

    # realistic coherent index plane: reuse the real renderer's idx
    verts_np, faces_np, _ = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    uvs_np = (verts_np[:, :2] - verts_np[:, :2].min(0)) / np.ptp(
        verts_np[:, :2], 0)
    uvs = jnp.asarray(uvs_np, jnp.float32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = jnp.stack([jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                                  jnp.float32) for i in range(BATCH)])
    from libnativecpurenderer_tpu.ops import pallas_raster

    @jax.jit
    def make_idx(mv):
        fuv_all = uvs[faces]

        def prep(mvp):
            tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
            A, B, C, ia, sg, vl = raster3d.edge_coeffs(
                tri["sxy"], tri["z"], tri["valid"])
            zsc = tri["z"] * ia[:, None]
            sp, st, ct, ovf = raster3d.bin_triangles_flat(
                tri["sxy"], vl, W, H, 128, 8, 512, 2, 10,
                edges=(A, B, C, sg))
            iw = tri["inv_w"][..., None]
            attrs = jnp.concatenate([fuv_all * iw, iw,
                                     jnp.ones_like(iw)], axis=-1)
            table = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl,
                                              attrs)
            return sp, st, ct, table

        sps, st, ct, tables = jax.vmap(prep)(mv)
        return pallas_raster.render_binned_tex_idx_batch(
            sps, st, ct, tables, W, H, 128, 8, 512, (TH, TW), False, 16)

    idx = make_idx(mvps)                                  # (B, H, W) i32
    checksum(idx)
    safe = jnp.maximum(idx, 0)
    vi, ui = safe // TW, safe % TW
    checksum(vi), checksum(ui)

    def timeit(name, fn, *args):
        out = fn(*args)
        s0 = checksum(out)
        best = None
        for _ in range(3):
            t0 = time.time()
            outs = [fn(*args) for _ in range(FRAMES // BATCH)]
            checksum(jnp.stack([jnp.sum(o.astype(jnp.float32))
                                for o in outs]))
            dt = (time.time() - t0) / FRAMES * 1e3
            best = dt if best is None else min(best, dt)
        print(f"{name:28s}: {best:7.3f} ms/frame sum={s0:.6e}",
              flush=True)

    # 1. baseline: flat i32 element gather (the measured 19.5)
    timeit("flat_i32_take",
           jax.jit(lambda i: jnp.take(packed_i32, i.reshape(-1),
                                      axis=0).reshape(i.shape)), safe)

    # 2. same bytes, f32 table (dtype-dependent lowering?)
    timeit("flat_f32_take",
           jax.jit(lambda i: jnp.take(packed_f32, i.reshape(-1),
                                      axis=0).reshape(i.shape)), safe)

    # 3. 2D advanced indexing, i32 table (the old path's index form)
    t2d_i32 = packed_i32.reshape(TH, TW)
    timeit("2d_i32_vu",
           jax.jit(lambda v, u: t2d_i32[v, u]), vi, ui)

    # 4. 2D advanced indexing, f32 table
    t2d_f32 = packed_f32.reshape(TH, TW)
    timeit("2d_f32_vu",
           jax.jit(lambda v, u: t2d_f32[v, u]), vi, ui)

    # 5. old path exactly: per-channel f32 gathers from (TH, TW)
    timeit("4x_channel_f32_vu",
           jax.jit(lambda v, u: tex_f32[v, u]), vi, ui)

    # 6. row gather f32 (65536, 4)
    t4_f32 = tex_f32.reshape(-1, 4)
    timeit("rows_f32_take",
           jax.jit(lambda i: jnp.take(t4_f32, i.reshape(-1),
                                      axis=0).reshape(i.shape + (4,))),
           safe)

    # 7. flat take WITHOUT reshape to 1D (keep (B, H, W) index rank)
    timeit("flat_i32_take_3d",
           jax.jit(lambda i: jnp.take(packed_i32, i, axis=0)), safe)

    # 8. lax.gather spelled directly, 2D operand, batched minor index
    timeit("flat_f32_take_3d",
           jax.jit(lambda i: jnp.take(packed_f32, i, axis=0)), safe)

    # 9. per-row dynamic-slice-free: one-hot over TW via matmul is known
    #    pathological; instead try take along axis with (H*W,) u16-ish
    #    sorted segments? -- skipped; instead: gather u8 flat (1 byte)
    flat_u8 = tex_u8.reshape(-1)
    timeit("flat_u8_take_r(idx*4)",
           jax.jit(lambda i: jnp.take(flat_u8, i.reshape(-1) * 4,
                                      axis=0).reshape(i.shape)), safe)


if __name__ == "__main__":
    main()
