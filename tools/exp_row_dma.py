#!/usr/bin/env python
"""Kernel experiment: is the flat raster kernel bound by its serial dynamic
row copies, and do async DMAs fix it?

Variants (kernel-only timing, same staged inputs, 1080p/10k-tri, flat bins
th=16 tw=128 Kb=512 kcc=32 unless stated):
  serial   : product kernel (_make_kernel_flat) — baseline
  constrow : row copy with CONSTANT index (isolates the dynamic-index cost;
             output is wrong, timing only)
  nocopy   : no row copies at all (arith + fixed cost floor; wrong output)
  dma      : per-chunk rows fetched by kcc async VMEM->VMEM copies, issued
             back-to-back then waited (overlaps the per-copy latency)
  dma2     : double-buffered: issue chunk c+1's copies, then compute chunk c
             (unroll-by-2 so scratch indices stay static; over-reading past
             the run is safe in the flat layout — spill rows lose ties)

Run on the TPU:  nohup python tools/exp_row_dma.py > /tmp/exp_row_dma.log 2>&1 &
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
TW, TH, KB, SX, SY = 128, 16, 512, 3, 6
FRAMES = 30


def checksum(arrs):
    return float(jnp.sum(jnp.stack([jnp.sum(a.astype(jnp.float32))
                                    for a in arrs])))


def _chunk_compute(rows, X, Y, slot0, c, kcc, carry):
    """Shared chunk math (identical to the product kernel body)."""
    kacc, r0, r1, r2, r3 = carry

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
    keys = jnp.where(cov, (zq << IDX_BITS) | ids, jnp.int32(SKY_KEY))
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
    return (jnp.where(upd, cmin, kacc), outs[0], outs[1], outs[2], outs[3])


def _mk_prelude(scal_ref, tile_h, tile_w, kcc):
    P = tile_h * tile_w
    i = pl.program_id(0)
    nt = pl.num_programs(0)
    count = scal_ref[i]
    nchunks = (count + kcc - 1) // kcc
    ox = scal_ref[nt + i]
    oy = scal_ref[2 * nt + i]
    woff = scal_ref[4 * nt + i]
    p_idx = lax.broadcasted_iota(jnp.int32, (1, P), 1)
    x1 = (ox + p_idx % tile_w).astype(jnp.float32)
    y1 = (oy + p_idx // tile_w).astype(jnp.float32)
    X = jnp.broadcast_to(x1, (kcc, P))
    Y = jnp.broadcast_to(y1, (kcc, P))
    slot0 = lax.broadcasted_iota(jnp.int32, (kcc, P), 0)
    return P, nchunks, woff, X, Y, slot0


def make_kernel_constrow(tile_h, tile_w, Kb, kcc):
    def kernel(scal_ref, blk0_ref, blk1_ref, table_ref, keys_ref, rgba_ref,
               rows_s):
        P, nchunks, woff, X, Y, slot0 = _mk_prelude(scal_ref, tile_h,
                                                    tile_w, kcc)

        def body(c, carry):
            for j in range(kcc):
                rows_s[pl.ds(j, 1), :] = table_ref[0, pl.ds(j, 1), :]
            return _chunk_compute(rows_s[:, :], X, Y, slot0, c, kcc, carry)

        sky = jnp.full((1, P), SKY_KEY, jnp.int32)
        zero = jnp.zeros((1, P), jnp.float32)
        kacc, r0, r1, r2, r3 = lax.fori_loop(
            0, nchunks, body, (sky, zero, zero, zero, zero))
        keys_ref[0] = kacc
        rgba_ref[0] = jnp.concatenate([r0, r1, r2, r3], axis=0)
    return kernel


def make_kernel_nocopy(tile_h, tile_w, Kb, kcc):
    def kernel(scal_ref, blk0_ref, blk1_ref, table_ref, keys_ref, rgba_ref,
               rows_s):
        P, nchunks, woff, X, Y, slot0 = _mk_prelude(scal_ref, tile_h,
                                                    tile_w, kcc)

        def body(c, carry):
            return _chunk_compute(rows_s[:, :], X, Y, slot0, c, kcc, carry)

        sky = jnp.full((1, P), SKY_KEY, jnp.int32)
        zero = jnp.zeros((1, P), jnp.float32)
        kacc, r0, r1, r2, r3 = lax.fori_loop(
            0, nchunks, body, (sky, zero, zero, zero, zero))
        keys_ref[0] = kacc
        rgba_ref[0] = jnp.concatenate([r0, r1, r2, r3], axis=0)
    return kernel


def make_kernel_dma(tile_h, tile_w, Kb, kcc):
    def kernel(scal_ref, blk0_ref, blk1_ref, table_ref, keys_ref, rgba_ref,
               rows_s, sems):
        P, nchunks, woff, X, Y, slot0 = _mk_prelude(scal_ref, tile_h,
                                                    tile_w, kcc)

        def tid_at(idx):
            p0 = blk0_ref[0, 0, jnp.minimum(idx, Kb - 1)]
            p1 = blk1_ref[0, 0, jnp.clip(idx - Kb, 0, Kb - 1)]
            return jnp.where(idx < Kb, p0, p1) & ((1 << IDX_BITS) - 1)

        def body(c, carry):
            for j in range(kcc):
                tid = tid_at(woff + c * kcc + j)
                pltpu.make_async_copy(
                    table_ref.at[0, pl.ds(tid, 1), :],
                    rows_s.at[pl.ds(j, 1), :],
                    sems.at[j]).start()
            for j in range(kcc):
                pltpu.make_async_copy(
                    table_ref.at[0, pl.ds(0, 1), :],
                    rows_s.at[pl.ds(j, 1), :],
                    sems.at[j]).wait()
            return _chunk_compute(rows_s[:, :], X, Y, slot0, c, kcc, carry)

        sky = jnp.full((1, P), SKY_KEY, jnp.int32)
        zero = jnp.zeros((1, P), jnp.float32)
        kacc, r0, r1, r2, r3 = lax.fori_loop(
            0, nchunks, body, (sky, zero, zero, zero, zero))
        keys_ref[0] = kacc
        rgba_ref[0] = jnp.concatenate([r0, r1, r2, r3], axis=0)
    return kernel


def make_kernel_dma2(tile_h, tile_w, Kb, kcc):
    """Double-buffered: two scratch buffers with STATIC indices via an
    unroll-by-2 chunk loop.  Over-reading a partial/absent last chunk is
    safe (spill rows belong to the next tile's run and lose ties)."""
    def kernel(scal_ref, blk0_ref, blk1_ref, table_ref, keys_ref, rgba_ref,
               rows_a, rows_b, sem_a, sem_b):
        P, nchunks, woff, X, Y, slot0 = _mk_prelude(scal_ref, tile_h,
                                                    tile_w, kcc)

        def tid_at(idx):
            p0 = blk0_ref[0, 0, jnp.minimum(idx, Kb - 1)]
            p1 = blk1_ref[0, 0, jnp.clip(idx - Kb, 0, Kb - 1)]
            return jnp.where(idx < Kb, p0, p1) & ((1 << IDX_BITS) - 1)

        def issue(c, rows_ref, sem):
            for j in range(kcc):
                tid = tid_at(woff + c * kcc + j)
                pltpu.make_async_copy(
                    table_ref.at[0, pl.ds(tid, 1), :],
                    rows_ref.at[pl.ds(j, 1), :],
                    sem.at[j]).start()

        def wait(rows_ref, sem):
            for j in range(kcc):
                pltpu.make_async_copy(
                    table_ref.at[0, pl.ds(0, 1), :],
                    rows_ref.at[pl.ds(j, 1), :],
                    sem.at[j]).wait()

        npairs = (nchunks + 1) // 2   # unroll-by-2 macro steps

        @pl.when(nchunks > 0)
        def _():
            issue(0, rows_a, sem_a)

        def body(cc, carry):
            c0 = 2 * cc
            # chunk c0 (buffer A): issue B for c0+1, then compute A
            @pl.when(c0 + 1 < 2 * npairs)
            def _():
                issue(c0 + 1, rows_b, sem_b)
            wait(rows_a, sem_a)
            carry = _chunk_compute(rows_a[:, :], X, Y, slot0, c0, kcc,
                                   carry)
            # chunk c0+1 (buffer B): issue A for c0+2, then compute B
            @pl.when(c0 + 2 < 2 * npairs)
            def _():
                issue(c0 + 2, rows_a, sem_a)
            wait(rows_b, sem_b)
            carry = _chunk_compute(rows_b[:, :], X, Y, slot0, c0 + 1, kcc,
                                   carry)
            return carry

        sky = jnp.full((1, P), SKY_KEY, jnp.int32)
        zero = jnp.zeros((1, P), jnp.float32)
        kacc, r0, r1, r2, r3 = lax.fori_loop(
            0, npairs, body, (sky, zero, zero, zero, zero))
        keys_ref[0] = kacc
        rgba_ref[0] = jnp.concatenate([r0, r1, r2, r3], axis=0)
    return kernel


SCRATCH = {
    "serial": lambda kcc: [pltpu.VMEM((kcc, ROW_W), jnp.float32)],
    "constrow": lambda kcc: [pltpu.VMEM((kcc, ROW_W), jnp.float32)],
    "nocopy": lambda kcc: [pltpu.VMEM((kcc, ROW_W), jnp.float32)],
    "dma": lambda kcc: [pltpu.VMEM((kcc, ROW_W), jnp.float32),
                        pltpu.SemaphoreType.DMA((kcc,))],
    "dma2": lambda kcc: [pltpu.VMEM((kcc, ROW_W), jnp.float32),
                         pltpu.VMEM((kcc, ROW_W), jnp.float32),
                         pltpu.SemaphoreType.DMA((kcc,)),
                         pltpu.SemaphoreType.DMA((kcc,))],
}
BUILDERS = {
    "serial": _make_kernel_flat,
    "constrow": make_kernel_constrow,
    "nocopy": make_kernel_nocopy,
    "dma": make_kernel_dma,
    "dma2": make_kernel_dma2,
}


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def launch(sorted_pad, table, scalars, nt, tile_h, tile_w, Kb, kcc,
           variant):
    P = tile_h * tile_w
    nblocks = sorted_pad.shape[0] // Kb
    blocks = sorted_pad.reshape(nblocks, 1, Kb)
    table = table[None]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, Kb), lambda i, s: (s[3 * nt + i], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Kb), lambda i, s: (s[3 * nt + i] + 1, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, table.shape[1], ROW_W),
                         lambda i, s: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, P), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((1, D, P), lambda i, s: (i, 0, 0)),
        ],
        scratch_shapes=SCRATCH[variant](kcc),
    )
    builder = BUILDERS[variant]
    kern = builder(tile_h, tile_w, Kb, kcc)
    keys, rgba = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((nt, 1, P), jnp.int32),
            jax.ShapeDtypeStruct((nt, D, P), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=False,
    )(scalars, blocks, blocks, table)
    return keys, rgba


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    colors = jnp.asarray(colors_np, jnp.float32)
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
        tids = jnp.arange(nt, dtype=jnp.int32)
        scalars = jnp.concatenate(
            [counts.astype(jnp.int32), tids % ntx * TW, tids // ntx * TH,
             starts // KB, starts % KB])
        return sorted_pad, table, scalars

    staged = [prep(m) for m in mvps]
    checksum([s[1] for s in staged])

    ref_out = None
    for kcc in (32, 16):
        variants = (["serial", "constrow", "nocopy", "dma", "dma2"]
                    if kcc == 32 else ["serial", "dma", "dma2"])
        for variant in variants:
            try:
                fn = functools.partial(launch, nt=nt, tile_h=TH, tile_w=TW,
                                       Kb=KB, kcc=kcc, variant=variant)
                outs = [fn(*staged[i]) for i in range(FRAMES)]  # warm
                chk = checksum([o[1] for o in outs])
                if variant == "serial" and kcc == 32:
                    ref_out = [jax.device_get(o[1]) for o in outs[:2]]
                if variant in ("dma", "dma2"):
                    import numpy as np
                    for fi in range(2):
                        got = jax.device_get(outs[fi][1])
                        ok = np.array_equal(
                            np.nan_to_num(got), np.nan_to_num(ref_out[fi]))
                        print(f"  {variant}/kcc{kcc} frame{fi} "
                              f"bit-exact={ok}", flush=True)
                best = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    outs = [fn(*staged[i]) for i in range(FRAMES)]
                    chk = checksum([o[1] for o in outs])
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                print(f"{variant:9s} kcc={kcc:2d}: "
                      f"{best / FRAMES * 1e3:7.2f} ms/frame  (chk {chk:.1f})",
                      flush=True)
            except Exception as e:
                print(f"{variant:9s} kcc={kcc:2d}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
