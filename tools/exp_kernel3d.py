#!/usr/bin/env python
"""3D-layout flat kernel: compute in (kcc, th, tw), write DETILED outputs
directly via 2D out blocks — kills the ~0.4 ms XLA detile pass.

Outputs: keys (H, W) i32 [block (th, tw) at (i//ntx, i%ntx)] and rgba
PLANAR (4, H, W) f32 [block (4, th, tw)].  Background = 0 (accumulator
init), matching bench's bg.  Broadcast rules per ROADMAP: no both-dims
(1,1)->(M,N) broadcasts — cols go (kcc,1)->(kcc,1,1)->(kcc,th,1) (sublane
step) and rely on implicit lane broadcast in arithmetic.

Run: nohup python tools/exp_kernel3d.py > /tmp/exp_kernel3d.log 2>&1 &
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402
from libnativecpurenderer_tpu.ops import pallas_raster      # noqa: E402
from libnativecpurenderer_tpu.ops.pallas_raster import (    # noqa: E402
    ROW_W, D)
from libnativecpurenderer_tpu.ops.raster3d import (         # noqa: E402
    IDX_BITS, SKY_KEY, Z_LEVELS)

W, H = 1920, 1080
TW, TH, KB, SX, SY, KCC = 128, 8, 512, 2, 10, 16
NTX = W // TW
NTY = H // TH
NT = NTX * NTY
NSTAGE = 16


def make_kernel_3d(tile_h, tile_w, Kb, kcc, ntx):
    def kernel(scal_ref, blk0_ref, blk1_ref, table_ref, keys_ref, rgba_ref,
               rows_s):
        i = pl.program_id(0)
        nt = pl.num_programs(0)
        count = scal_ref[i]
        nchunks = (count + kcc - 1) // kcc
        woff = scal_ref[4 * nt + i]
        ox = ((i % ntx) * tile_w).astype(jnp.float32)
        oy = ((i // ntx) * tile_h).astype(jnp.float32)

        X1 = ox + lax.broadcasted_iota(
            jnp.int32, (1, tile_h, tile_w), 2).astype(jnp.float32)
        Y1 = oy + lax.broadcasted_iota(
            jnp.int32, (1, tile_h, tile_w), 1).astype(jnp.float32)
        X = jnp.broadcast_to(X1, (kcc, tile_h, tile_w))
        Y = jnp.broadcast_to(Y1, (kcc, tile_h, tile_w))
        slot0 = lax.broadcasted_iota(jnp.int32, (kcc, tile_h, tile_w), 0)

        def body(c, carry):
            kacc, r0, r1, r2, r3 = carry
            for j in range(kcc):
                idx = woff + c * kcc + j
                p0 = blk0_ref[0, 0, jnp.minimum(idx, Kb - 1)]
                p1 = blk1_ref[0, 0, jnp.clip(idx - Kb, 0, Kb - 1)]
                tid = jnp.where(idx < Kb, p0, p1) & ((1 << IDX_BITS) - 1)
                rows_s[pl.ds(j, 1), :] = table_ref[0, pl.ds(tid, 1), :]
            rows = rows_s[:, :]

            def col(j):
                c2 = rows[:, j:j + 1]                    # (kcc, 1)
                return jnp.broadcast_to(c2[:, :, None],
                                        (kcc, tile_h, 1))

            e0 = col(0) * X + col(1) * Y + col(2)
            e1 = col(3) * X + col(4) * Y + col(5)
            e2 = col(6) * X + col(7) * Y + col(8)
            sg = col(12)
            m = jnp.minimum(jnp.minimum(e0 * sg, e1 * sg), e2 * sg)
            zz = e0 * col(9) + e1 * col(10) + e2 * col(11)
            cov = (m >= 0.0) & (zz >= 0.0) & (zz <= 1.0)
            zq = (zz * Z_LEVELS).astype(jnp.int32)
            ids = c * kcc + slot0
            keys = jnp.where(cov, (zq << IDX_BITS) | ids,
                             jnp.int32(SKY_KEY))
            cmin = jnp.min(keys, axis=0, keepdims=True)
            win = (keys == cmin) & cov
            upd = cmin < kacc
            outs = []
            for d, rd in enumerate((r0, r1, r2, r3)):
                cd = (e0 * col(14 + d) + e1 * col(14 + D + d)
                      + e2 * col(14 + 2 * D + d))
                cd = jnp.where(win, cd, 0.0)
                cdm = jnp.sum(cd, axis=0, keepdims=True)
                outs.append(jnp.where(upd, cdm, rd))
            return (jnp.where(upd, cmin, kacc),
                    outs[0], outs[1], outs[2], outs[3])

        sky = jnp.full((1, tile_h, tile_w), SKY_KEY, jnp.int32)
        zero = jnp.zeros((1, tile_h, tile_w), jnp.float32)
        kacc, r0, r1, r2, r3 = lax.fori_loop(
            0, nchunks, body, (sky, zero, zero, zero, zero))
        keys_ref[:, :] = kacc[0]
        rgba_ref[0] = r0[0]
        rgba_ref[1] = r1[0]
        rgba_ref[2] = r2[0]
        rgba_ref[3] = r3[0]
    return kernel


@functools.partial(jax.jit, static_argnums=(3,))
def launch3d(sorted_pad, table, scalars, kcc):
    nblocks = sorted_pad.shape[0] // KB
    blocks = sorted_pad.reshape(nblocks, 1, KB)
    table = table[None]
    nt = NT
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, KB), lambda i, s: (s[3 * nt + i], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, KB), lambda i, s: (s[3 * nt + i] + 1, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, table.shape[1], ROW_W),
                         lambda i, s: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TH, TW), lambda i, s: (i // NTX, i % NTX)),
            pl.BlockSpec((D, TH, TW), lambda i, s: (0, i // NTX, i % NTX)),
        ],
        scratch_shapes=[pltpu.VMEM((kcc, ROW_W), jnp.float32)],
    )
    keys, rgba = pl.pallas_call(
        make_kernel_3d(TH, TW, KB, kcc, NTX),
        out_shape=(
            jax.ShapeDtypeStruct((H, W), jnp.int32),
            jax.ShapeDtypeStruct((D, H, W), jnp.float32),
        ),
        grid_spec=grid_spec,
    )(scalars, blocks, blocks, table)
    return keys, rgba


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    colors_j = jnp.asarray(colors_np, jnp.float32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = jnp.stack([jnp.asarray(
        proj @ view @ mesh.rotation_y(i * 0.03), jnp.float32)
        for i in range(NSTAGE)])
    float(jnp.sum(mvps))
    attrs = colors_j[faces]

    @jax.jit
    def prep_all(mvp):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                   tri["valid"])
        zsc = tri["z"] * ia[:, None]
        sp, st, ct, ovf = raster3d.bin_triangles_flat(
            tri["sxy"], vl, W, H, TW, TH, KB, SX, SY)
        tb = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl, attrs)
        tids = jnp.arange(NT, dtype=jnp.int32)
        scalars = jnp.concatenate(
            [ct.astype(jnp.int32), tids % NTX * TW, tids // NTX * TH,
             st // KB, st % KB])
        return sp, tb, scalars

    staged = [prep_all(mvps[i]) for i in range(NSTAGE)]
    float(jnp.sum(staged[0][1]))
    sps = jnp.stack([s[0] for s in staged])
    tbs = jnp.stack([s[1] for s in staged])
    scs = jnp.stack([s[2] for s in staged])
    float(jnp.sum(scs))

    # correctness vs the product kernel
    ref_keys, ref_rgba = pallas_raster.render_binned_pallas_flat(
        staged[0][0], staged[0][2][3 * NT:4 * NT] * KB
        + staged[0][2][4 * NT:5 * NT],
        staged[0][2][:NT], staged[0][1], jnp.zeros(4, jnp.float32),
        W, H, TW, TH, KB, False, KCC)
    k3, r3 = launch3d(staged[0][0], staged[0][1], staged[0][2], KCC)
    ok_r = np.allclose(np.nan_to_num(np.asarray(r3)),
                       np.nan_to_num(np.moveaxis(np.asarray(ref_rgba),
                                                 2, 0)), atol=0)
    print(f"bit-exact rgba vs product: {ok_r}", flush=True)

    def mk_loop(stage):
        @functools.partial(jax.jit, static_argnums=(0,))
        def loop(n):
            def body(i, acc):
                j = i % NSTAGE
                out = stage(j)
                return acc + jnp.ravel(out)[0].astype(jnp.float32)
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return loop

    def s_k3d(j):
        keys, rgba = launch3d(sps[j], tbs[j], scs[j], KCC)
        return rgba

    def s_serial(j):
        keys, rgba = pallas_raster.render_binned_pallas_flat(
            sps[j], scs[j][3 * NT:4 * NT] * KB + scs[j][4 * NT:5 * NT],
            scs[j][:NT], tbs[j], jnp.zeros(4, jnp.float32),
            W, H, TW, TH, KB, False, KCC)
        return rgba

    def measure(name, loop_fn):
        for n in (32, 96):
            float(loop_fn(n))
        walls = {}
        for n in (32, 96):
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop_fn(n))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            walls[n] = best
        per = (walls[96] - walls[32]) / 64.0
        print(f"{name:9s} {per * 1e3:7.3f} ms/frame", flush=True)

    measure("k3d", mk_loop(s_k3d))
    measure("serial+dt", mk_loop(s_serial))


if __name__ == "__main__":
    main()
