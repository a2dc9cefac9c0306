#!/usr/bin/env python
"""Experiment: replace the kernel's serial scalar row copies with a
one-hot MXU matmul gather (vector id loads + eye-transpose + dot).

NEGATIVE RESULT (2026-08-16, v5e): 5.36 ms/frame vs 4.08 for the
scalar-copy kernel at 1080p/10k-tri — the (kcc, F_pad~10k) one-hot
materialisation plus the f32 dot per chunk cost more than the 32 serial
VMEM row copies they replace (and this version also has an unresolved
output mismatch, likely the pltpu.roll window semantics).  A narrower
dot would need a per-tile compacted subtable, which itself requires the
gather being avoided — circular.  Lessons kept for reference:
  * Mosaic dynamic vector loads need 128-aligned lane offsets;
    pltpu.roll does dynamic lane rotates without that constraint.
  * lanes->sublanes for a small vector can be done with an eye-masked
    lane reduction (kcc x kcc) instead of the unsupported reshape.
  * An MXU row-select dot must use FINITE sentinel rows: 0 * NaN = NaN
    poisons the whole contraction."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh                 # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d, pallas_raster  # noqa: E402
from libnativecpurenderer_tpu.ops.raster3d import (               # noqa: E402
    IDX_BITS, SKY_KEY, Z_LEVELS)

W, H = 1920, 1080
TW, TH, Kb, SX, SY, KCC = 128, 16, 512, 3, 6, 32
ROW_W = 32
D = 4


def make_kernel_mxu(tile_h, tile_w, Kb, kcc, Fp):
    P = tile_h * tile_w

    def kernel(scal_ref, blk0_ref, blk1_ref, table_ref, keys_ref, rgba_ref):
        i = pl.program_id(0)
        nt = pl.num_programs(0)
        count = scal_ref[i]
        ox = scal_ref[nt + i]
        oy = scal_ref[2 * nt + i]
        woff = scal_ref[4 * nt + i]
        nchunks = (count + kcc - 1) // kcc

        p_idx = lax.broadcasted_iota(jnp.int32, (1, P), 1)
        x1 = (ox + p_idx % tile_w).astype(jnp.float32)
        y1 = (oy + p_idx // tile_w).astype(jnp.float32)
        X = jnp.broadcast_to(x1, (kcc, P))
        Y = jnp.broadcast_to(y1, (kcc, P))
        slot0 = lax.broadcasted_iota(jnp.int32, (kcc, P), 0)
        eye = (lax.broadcasted_iota(jnp.int32, (kcc, kcc), 0)
               == lax.broadcasted_iota(jnp.int32, (kcc, kcc), 1))
        table = table_ref[0]                                   # (Fp, ROW_W)
        # full two-block id window, loaded once per tile (static, aligned)
        both = jnp.concatenate([blk0_ref[0, :, :], blk1_ref[0, :, :]],
                               axis=1)                         # (1, 2Kb)

        def body(c, carry):
            kacc, r0, r1, r2, r3 = carry
            off = woff + c * kcc
            # dynamic lane rotate brings [off, off+kcc) to the front —
            # Mosaic vector loads need 128-aligned dynamic offsets, rolls
            # don't
            rolled = pltpu.roll(both, 2 * Kb - off, 1)
            packed = rolled[:, :kcc]                           # (1, kcc)
            tid_row = packed & ((1 << IDX_BITS) - 1)
            # lanes->sublanes via eye-masked lane reduction (kcc x kcc)
            tid_b = jnp.broadcast_to(tid_row, (kcc, kcc))
            tid_col = jnp.sum(jnp.where(eye, tid_b, 0), axis=1,
                              keepdims=True)                   # (kcc, 1)
            onehot = (jnp.broadcast_to(tid_col, (kcc, Fp))
                      == lax.broadcasted_iota(jnp.int32, (kcc, Fp), 1)
                      ).astype(jnp.float32)
            rows = jax.lax.dot_general(
                onehot, table, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (kcc, ROW_W)

            def col(j):
                return rows[:, j:j + 1]

            e0 = col(0) * X + col(1) * Y + col(2)
            e1 = col(3) * X + col(4) * Y + col(5)
            e2 = col(6) * X + col(7) * Y + col(8)
            sg = col(12)
            cov = (e0 * sg >= 0.0) & (e1 * sg >= 0.0) & (e2 * sg >= 0.0)
            zz = e0 * col(9) + e1 * col(10) + e2 * col(11)
            cov &= (zz >= 0.0) & (zz <= 1.0)
            zq = jnp.clip(zz * Z_LEVELS, 0, Z_LEVELS).astype(jnp.int32)
            ids = c * kcc + slot0
            keys = jnp.where(cov, (zq << IDX_BITS) | ids,
                             jnp.int32(SKY_KEY))
            cmin = jnp.min(keys, axis=0, keepdims=True)
            win = (keys == cmin) & cov
            ia = col(13)
            w0 = e0 * ia
            w1 = e1 * ia
            w2 = e2 * ia
            upd = cmin < kacc
            outs = []
            for d, rd in enumerate((r0, r1, r2, r3)):
                cd = (w0 * col(14 + d) + w1 * col(14 + D + d)
                      + w2 * col(14 + 2 * D + d))
                cd = jnp.where(win, cd, 0.0)
                cdm = jnp.sum(cd, axis=0, keepdims=True)
                outs.append(jnp.where(upd, cdm, rd))
            return (jnp.where(upd, cmin, kacc),
                    outs[0], outs[1], outs[2], outs[3])

        sky = jnp.full((1, P), SKY_KEY, jnp.int32)
        zero = jnp.zeros((1, P), jnp.float32)
        kacc, r0, r1, r2, r3 = lax.fori_loop(
            0, nchunks, body, (sky, zero, zero, zero, zero))
        keys_ref[0] = kacc
        rgba_ref[0] = jnp.concatenate([r0, r1, r2, r3], axis=0)

    return kernel


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def raster_tiles_mxu(sorted_pad, table, scalars, nt, tile_h, tile_w, Kb,
                     kcc):
    P = tile_h * tile_w
    nblocks = sorted_pad.shape[0] // Kb
    blocks = sorted_pad.reshape(nblocks, 1, Kb)
    Fp = table.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, Kb), lambda i, s: (s[3 * nt + i], 0, 0)),
            pl.BlockSpec((1, 1, Kb),
                         lambda i, s: (s[3 * nt + i] + 1, 0, 0)),
            pl.BlockSpec((1, Fp, ROW_W), lambda i, s: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, P), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((1, D, P), lambda i, s: (i, 0, 0)),
        ],
    )
    return pl.pallas_call(
        make_kernel_mxu(tile_h, tile_w, Kb, kcc, Fp),
        out_shape=(
            jax.ShapeDtypeStruct((nt, 1, P), jnp.int32),
            jax.ShapeDtypeStruct((nt, D, P), jnp.float32),
        ),
        grid_spec=grid_spec,
    )(scalars, blocks, blocks, table[None])


@functools.partial(jax.jit, static_argnums=(3, 4))
def render_mxu(verts, faces, colors, width, height, mvp):
    dtype = verts.dtype
    bg = jnp.zeros(4, dtype)
    tri = raster3d.setup_triangles(verts, faces, mvp, width, height)
    A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                               tri["valid"])
    zsc = tri["z"] * ia[:, None]
    sorted_pad, starts, counts, ovf = raster3d.bin_triangles_flat(
        tri["sxy"], vl, width, height, TW, TH, Kb, SX, SY)
    table = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl,
                                      colors[faces])
    # the MXU dot contracts over ALL rows with 0/1 weights; 0 * NaN = NaN
    # would poison every output, so invalid/pad rows use a FINITE
    # never-covers sentinel instead: C coeffs -1 with sign +1 makes the
    # edge test fail for every pixel.
    sent = jnp.zeros((ROW_W,), jnp.float32)
    sent = sent.at[jnp.array([2, 5, 8])].set(-1.0).at[12].set(1.0)
    table = jnp.where(jnp.isnan(table[:, 0:1]), sent[None, :], table)
    Fp = ((table.shape[0] + 127) // 128) * 128
    table = jnp.concatenate(
        [table, jnp.broadcast_to(sent, (Fp - table.shape[0], ROW_W))])
    ntx = (width + TW - 1) // TW
    nty = (height + TH - 1) // TH
    nt = ntx * nty
    tids = jnp.arange(nt, dtype=jnp.int32)
    scalars = jnp.concatenate([
        counts.astype(jnp.int32), tids % ntx * TW, tids // ntx * TH,
        starts // Kb, starts % Kb])
    keys_l, rgba = raster_tiles_mxu(sorted_pad, table, scalars, nt, TH,
                                    TW, Kb, KCC)
    keys, rgba2 = pallas_raster._detile(
        keys_l.reshape(nt, -1), rgba, nty, ntx, TH, TW, height, width,
        bg, dtype)
    return rgba2, (keys >> IDX_BITS).astype(dtype) / Z_LEVELS, ovf


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    colors = jnp.asarray(colors_np, jnp.float32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = [jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                        jnp.float32) for i in range(60)]
    float(sum(jnp.sum(m) for m in mvps))

    ref = functools.partial(raster3d.render_gouraud_pallas, tile_w=TW,
                            tile_h=TH, capacity=Kb, span_x=SX, span_y=SY,
                            kcc=KCC, flat=True)
    r0 = ref(verts, faces, colors, W, H, mvps[0])
    m0 = render_mxu(verts, faces, colors, W, H, mvps[0])
    print("overflow", bool(r0[2]), bool(m0[2]), flush=True)
    print("maxdiff rgba", float(jnp.max(jnp.abs(r0[0] - m0[0]))),
          "z", float(jnp.max(jnp.abs(r0[1] - m0[1]))), flush=True)

    def timeit(name, f):
        outs = [f(verts, faces, colors, W, H, m)[0] for m in mvps]
        float(sum(jnp.sum(o) for o in outs))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [f(verts, faces, colors, W, H, m)[0] for m in mvps]
            float(sum(jnp.sum(o) for o in outs))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:24s} {best / 60 * 1e3:6.2f} ms/frame "
              f"= {60 / best:.1f} fps", flush=True)

    timeit("mxu-gather", render_mxu)
    timeit("scalar-copy (current)", ref)


if __name__ == "__main__":
    main()
