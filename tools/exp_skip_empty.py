#!/usr/bin/env python
"""Does skipping EMPTY tiles beat the per-tile fixed floor?

Variant of the flat u8 kernel: the output buffer arrives PREFILLED with
the packed background (one cheap XLA broadcast, aliased in-out), and the
whole kernel body sits under pl.when(count > 0) — empty tiles do no
accumulator init, no command walk, no store.  On the bench scene ~half
of 1080p tiles are empty; the zero-work floor was ~1.1-1.25 ms/frame.

Measures per-frame device time with the fori-loop subtraction method.

Run: nohup python tools/exp_skip_empty.py > /tmp/exp_skip_empty.log 2>&1 &
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
    ROW_W, D, KCC)
from libnativecpurenderer_tpu.ops.raster3d import (         # noqa: E402
    IDX_BITS, SKY_KEY, Z_LEVELS)

W, H = 1920, 1080
TW, TH, KB, SX, SY, KCCv = 128, 8, 512, 2, 10, 16
NSTAGE = 16


def _make_kernel_skip(tile_h, tile_w, Kb, kcc):
    P = tile_h * tile_w

    def kernel(scal_ref, blk0_ref, blk1_ref, table_ref, prefill_ref,
               packed_ref, rows_s):
        i = pl.program_id(0)
        nt = pl.num_programs(0)
        count = scal_ref[i]

        @pl.when(count > 0)
        def _():
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

            bgp = scal_ref[5 * nt]

            def q(v):
                return jnp.clip(v * 255.0, 0.0, 255.0).astype(jnp.int32)

            packed = q(r0) | (q(r1) << 8) | (q(r2) << 16) | (q(r3) << 24)
            packed_ref[0] = jnp.where(kacc != jnp.int32(SKY_KEY), packed,
                                      bgp)

    return kernel


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def raster_skip(sorted_pad, table, scalars, nt, tile_h, tile_w, Kb,
                kcc=KCC):
    P = tile_h * tile_w
    nblocks = sorted_pad.shape[0] // Kb
    blocks = sorted_pad.reshape(nblocks, 1, Kb)
    if table.ndim == 2:
        table = table[None]
    bgp = scalars[5 * nt]
    prefill = jnp.full((nt, 1, P), bgp, jnp.int32)
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
            pl.BlockSpec((1, 1, P), lambda i, s: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, P), lambda i, s: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((kcc, ROW_W), jnp.float32),
        ],
    )
    packed = pl.pallas_call(
        _make_kernel_skip(tile_h, tile_w, Kb, kcc),
        out_shape=[jax.ShapeDtypeStruct((nt, 1, P), jnp.int32)],
        grid_spec=grid_spec,
        input_output_aliases={4: 0},   # prefill -> out (after scalars)
    )(scalars, blocks, blocks, table, prefill)[0]
    return packed


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
    ntx = W // TW
    nty = H // TH
    nt = ntx * nty

    def prep(mvp):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                   tri["valid"])
        zsc = tri["z"] * ia[:, None]
        sp, starts, counts, ovf = raster3d.bin_triangles_flat(
            tri["sxy"], vl, W, H, TW, TH, KB, SX, SY)
        attrs = colors[faces]
        table = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl, attrs)
        tids = jnp.arange(nt, dtype=jnp.int32)
        scal = jnp.concatenate(
            [counts.astype(jnp.int32), tids % ntx * TW, tids // ntx * TH,
             starts // KB, starts % KB, jnp.zeros(1, jnp.int32)])
        return sp, table, scal

    # correctness vs product u8 path
    mvp0 = mvps[0]
    sp, table, scal = prep(mvp0)
    got = raster_skip(sp, table, scal, nt, TH, TW, KB, KCCv)
    got = np.asarray(got).reshape(nt, -1)
    from libnativecpurenderer_tpu.ops.pallas_raster import _detile_packed
    got_img = np.asarray(_detile_packed(jnp.asarray(got), nty, ntx, TH,
                                        TW, H, W))
    want, _, _ = raster3d.render_gouraud_pallas.__wrapped__(
        verts, faces, colors, W, H, mvp0, tile_w=TW, tile_h=TH,
        capacity=KB, span_x=SX, span_y=SY, kcc=KCCv, flat=True, u8=True)
    want = np.asarray(want)
    print("bit-exact vs product u8:", bool((got_img == want).all()),
          flush=True)

    # staged inputs for clean timing
    staged = [prep(mvps[i]) for i in range(NSTAGE)]
    sps = jnp.stack([s[0] for s in staged])
    tables = jnp.stack([s[1] for s in staged])
    scals = jnp.stack([s[2] for s in staged])
    float(jnp.sum(sps) + jnp.sum(tables))

    @functools.partial(jax.jit, static_argnums=(3,))
    def loop(sps, tables, scals, n):
        def body(i, acc):
            k = i % NSTAGE
            out = raster_skip(sps[k], tables[k], scals[k], nt, TH, TW,
                              KB, KCCv)
            return acc + jnp.sum(out, dtype=jnp.uint32).astype(jnp.float32)
        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    for n in (32, 96):
        float(loop(sps, tables, scals, n))
    walls = {}
    for n in (32, 96):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(sps, tables, scals, n))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        walls[n] = best
    per = (walls[96] - walls[32]) / 64.0
    print(f"skip-empty kernel (no prep): {per * 1e3:.3f} ms/frame "
          f"(w32 {walls[32]*1e3:.1f} w96 {walls[96]*1e3:.1f})", flush=True)


if __name__ == "__main__" and "--debug" not in sys.argv:
    main()


def debug_diff():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    colors = jnp.asarray(colors_np, jnp.float32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvp0 = jnp.asarray(proj @ view, jnp.float32)
    ntx = W // TW
    nty = H // TH
    nt = ntx * nty
    tri = raster3d.setup_triangles(verts, faces, mvp0, W, H)
    A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                               tri["valid"])
    zsc = tri["z"] * ia[:, None]
    sp, starts, counts, ovf = raster3d.bin_triangles_flat(
        tri["sxy"], vl, W, H, TW, TH, KB, SX, SY)
    attrs = colors[faces]
    table = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl, attrs)
    tids = jnp.arange(nt, dtype=jnp.int32)
    scal = jnp.concatenate(
        [counts.astype(jnp.int32), tids % ntx * TW, tids // ntx * TH,
         starts // KB, starts % KB, jnp.zeros(1, jnp.int32)])
    got = np.asarray(raster_skip(sp, table, scal, nt, TH, TW, KB, KCCv))
    want = np.asarray(pallas_raster.raster_tiles_flat(
        sp, table, scal, nt, TH, TW, KB, False, KCCv, 0, True))
    cnp = np.asarray(counts)
    diff_tiles = np.where((got != want).any(axis=(1, 2)))[0]
    print("diff tiles:", len(diff_tiles), "of", nt, flush=True)
    if len(diff_tiles):
        t0 = diff_tiles[:10]
        print("counts of first diff tiles:", cnp[t0])
        for t in t0[:3]:
            d = np.where(got[t, 0] != want[t, 0])[0]
            print(f"tile {t}: {len(d)} px differ; first vals "
                  f"got={got[t,0,d[0]]:x} want={want[t,0,d[0]]:x}")


if __name__ == "__main__" and "--debug" in sys.argv:
    debug_diff()
