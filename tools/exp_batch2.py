#!/usr/bin/env python
"""Batched (host-floor-amortised) decomposition of the flat raster kernel.

exp_batch_kernel established wall = max(host dispatch ~1.2 ms/launch,
device time): single-launch numbers are floor-polluted.  Re-measure the
kernel variants with 16 frames per launch so wall/frame ~= device time:

  b16_zero    : counts=0            -> per-frame device FIXED cost
  b16_serial  : full kernel         -> total device kernel time
  b16_nocopy  : no row fetch        -> fixed + chunk arithmetic
  b16_th8     : th=8 kcc=16 serial  -> smaller-tile total

Run: nohup python tools/exp_batch2.py > /tmp/exp_batch2.log 2>&1 &
"""

import functools
import sys
import time

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
    ROW_W, D, _make_kernel_flat)
from libnativecpurenderer_tpu.ops.raster3d import (         # noqa: E402
    IDX_BITS, SKY_KEY, Z_LEVELS)

W, H = 1920, 1080
FRAMES = 32
BATCH = 16


def checksum(arrs):
    return float(jnp.sum(jnp.stack([jnp.sum(a.astype(jnp.float32))
                                    for a in arrs])))


def make_kernel_nocopy(tile_h, tile_w, Kb, kcc):
    P = tile_h * tile_w

    def kernel(scal_ref, blk0_ref, blk1_ref, table_ref, keys_ref, rgba_ref,
               rows_s):
        i = pl.program_id(0)
        nt = pl.num_programs(0)
        count = scal_ref[i]
        nchunks = (count + kcc - 1) // kcc
        ox = scal_ref[nt + i]
        oy = scal_ref[2 * nt + i]
        p_idx = lax.broadcasted_iota(jnp.int32, (1, P), 1)
        x1 = (ox + p_idx % tile_w).astype(jnp.float32)
        y1 = (oy + p_idx // tile_w).astype(jnp.float32)
        X = jnp.broadcast_to(x1, (kcc, P))
        Y = jnp.broadcast_to(y1, (kcc, P))
        slot0 = lax.broadcasted_iota(jnp.int32, (kcc, P), 0)

        def body(c, carry):
            kacc, r0, r1, r2, r3 = carry
            rows = rows_s[:, :]

            def col(j):
                return rows[:, j:j + 1]

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

        sky = jnp.full((1, P), SKY_KEY, jnp.int32)
        zero = jnp.zeros((1, P), jnp.float32)
        kacc, r0, r1, r2, r3 = lax.fori_loop(
            0, nchunks, body, (sky, zero, zero, zero, zero))
        keys_ref[0] = kacc
        rgba_ref[0] = jnp.concatenate([r0, r1, r2, r3], axis=0)
    return kernel


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def launch(sorted_pad, table, scalars, nt, tile_h, tile_w, Kb, kcc,
           variant):
    P = tile_h * tile_w
    nblocks = sorted_pad.shape[0] // Kb
    blocks = sorted_pad.reshape(nblocks, 1, Kb)
    if table.ndim == 2:
        table = table[None]
    tpf = nt // BATCH
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, Kb), lambda i, s: (s[3 * nt + i], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Kb), lambda i, s: (s[3 * nt + i] + 1, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, table.shape[1], ROW_W),
                         lambda i, s: (i // tpf, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, P), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((1, D, P), lambda i, s: (i, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((kcc, ROW_W), jnp.float32)],
    )
    builder = (make_kernel_nocopy if variant == "nocopy"
               else _make_kernel_flat)
    keys, rgba = pl.pallas_call(
        builder(tile_h, tile_w, Kb, kcc),
        out_shape=(
            jax.ShapeDtypeStruct((nt, 1, P), jnp.int32),
            jax.ShapeDtypeStruct((nt, D, P), jnp.float32),
        ),
        grid_spec=grid_spec,
    )(scalars, blocks, blocks, table)
    return keys, rgba


def stage(mvps, attrs, tw, th, kb, sx, sy, verts, faces):
    ntx = (W + tw - 1) // tw
    nty = (H + th - 1) // th
    nt = ntx * nty

    @jax.jit
    def prep(mvp):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                   tri["valid"])
        zsc = tri["z"] * ia[:, None]
        sp, st, ct, ovf = raster3d.bin_triangles_flat(
            tri["sxy"], vl, W, H, tw, th, kb, sx, sy)
        table = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl, attrs)
        return sp, st, ct, table, ovf

    staged = [prep(m) for m in mvps]
    checksum([s[3] for s in staged])
    ovf = bool(jnp.any(jnp.stack([s[4] for s in staged])))
    print(f"th={th} overflow={ovf}", flush=True)
    tids = jnp.arange(nt, dtype=jnp.int32)
    ox = tids % ntx * tw
    oy = tids // ntx * th
    nblk = staged[0][0].shape[0] // kb

    batches = []
    for b0 in range(0, FRAMES, BATCH):
        sps = jnp.concatenate([staged[i][0]
                               for i in range(b0, b0 + BATCH)])
        tbs = jnp.stack([staged[i][3] for i in range(b0, b0 + BATCH)])
        scs = []
        for zero_ct in (False, True):
            rows = []
            for i in range(b0, b0 + BATCH):
                ct = (jnp.zeros_like(staged[i][2]) if zero_ct
                      else staged[i][2].astype(jnp.int32))
                rows.append(jnp.stack(
                    [ct, ox, oy,
                     (i - b0) * nblk + staged[i][1] // kb,
                     staged[i][1] % kb]))
            scs.append(jnp.concatenate(
                [jnp.concatenate([r[j] for r in rows]) for j in range(5)]))
        batches.append((sps, tbs, scs[0], scs[1]))
    checksum([b[2] for b in batches] + [b[3] for b in batches])
    return batches, nt


def timeit(name, fn, args_list):
    outs = [fn(*a) for a in args_list]
    checksum([o[1] for o in outs])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in args_list]
        chk = checksum([o[1] for o in outs])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:12s} {best / FRAMES * 1e3:7.3f} ms/frame (chk {chk:.1f})",
          flush=True)


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

    # th16 kcc32
    batches, nt = stage(mvps, attrs, 128, 16, 512, 3, 6, verts, faces)
    ln = functools.partial(launch, nt=BATCH * nt, tile_h=16, tile_w=128,
                           Kb=512, kcc=32)
    timeit("b16_serial", lambda sp, tb, sc, sz: ln(sp, tb, sc,
                                                   variant="serial"),
           batches)
    timeit("b16_zero", lambda sp, tb, sc, sz: ln(sp, tb, sz,
                                                 variant="serial"),
           batches)
    timeit("b16_nocopy", lambda sp, tb, sc, sz: ln(sp, tb, sc,
                                                   variant="nocopy"),
           batches)

    # th8 kcc16
    batches8, nt8 = stage(mvps, attrs, 128, 8, 512, 2, 10, verts, faces)
    ln8 = functools.partial(launch, nt=BATCH * nt8, tile_h=8, tile_w=128,
                            Kb=512, kcc=16)
    timeit("b16_th8", lambda sp, tb, sc, sz: ln8(sp, tb, sc,
                                                 variant="serial"),
           batches8)
    timeit("b16_th8_zero", lambda sp, tb, sc, sz: ln8(sp, tb, sz,
                                                      variant="serial"),
           batches8)


if __name__ == "__main__":
    main()
