#!/usr/bin/env python
"""Round-3 dynrows production-shape experiment.

Insight from exp_r3_kernel/fatframes/ff64: the kernel's serial per-chunk
row gather (scalar SMEM id read + one-row VMEM copy per pair) is the
dominant per-pair tax (~5.6 us per 1k rows); every finer-tile or
frame-grouped variant lost its theoretical win to MORE gathers.  So move
the gather OUT of the kernel: prep pre-gathers table rows into sorted
pair order (rows = take(table, sorted & IDX_MASK)), and the kernel walks
each run with ONE dynamic contiguous (kcc, ROW_W) sublane slice per
chunk from a frame-resident VMEM block.  The packed id blocks disappear
entirely — slot ids are iota, and tie-break order (ascending triangle
id within the run) is unchanged, so output stays bit-exact.

CAP rows per frame (pairs beyond CAP-guard -> overflow flag, caller
falls back).  EMPIRICAL LIMIT (bisected here): a single Pallas input
array larger than 24 MiB fails remote compile (helper exit 1) — so the
frame batch is capped at B*CAP*ROW_W*4 <= 24 MiB: B=4 at (128,8)/49152,
B=6 at (64,8)/28672.  Variants sweep tile width / frame grouping / kcc,
then an end-to-end fused-sequence program (prep + take + kernel + u8
reduce, bench.py-style) for the best candidates.

Run: nohup python tools/exp_r3_dynprod.py > /tmp/exp_r3_dynprod.log 2>&1 &
"""

import functools
import os
import sys
import time
import traceback

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
from libnativecpurenderer_tpu.ops.pallas_raster import ROW_W, D  # noqa
from libnativecpurenderer_tpu.ops.raster3d import (         # noqa: E402
    IDX_BITS, IDX_MASK, SKY_KEY, Z_LEVELS)

W, H = 1920, 1080
TH = 8
KB = 512
FRAMES = 24
BATCH = 12


def checksum(arrs):
    return float(jnp.sum(jnp.stack([jnp.sum(jnp.ravel(a)[:256].astype(
        jnp.float32)) for a in arrs])))


def make_dyn_kernel(tw: int, g: int, kcc: int):
    GK = g * kcc
    P = tw * TH

    def kernel(scal_ref, *refs):
        rows_refs = refs[:g]
        keys_ref = refs[g]
        i = pl.program_id(0)
        npg = pl.num_programs(0)

        counts = [scal_ref[q * npg + i] for q in range(g)]
        ox = scal_ref[g * npg + i]
        oy = scal_ref[(g + 1) * npg + i]
        woffs = [scal_ref[(g + 2 + q) * npg + i] for q in range(g)]
        cmax = counts[0]
        for q in range(1, g):
            cmax = jnp.maximum(cmax, counts[q])
        nchunks = (cmax + kcc - 1) // kcc

        p_idx = lax.broadcasted_iota(jnp.int32, (1, P), 1)
        x1 = (ox + p_idx % tw).astype(jnp.float32)
        y1 = (oy + p_idx // tw).astype(jnp.float32)
        X = jnp.broadcast_to(x1, (GK, P))
        Y = jnp.broadcast_to(y1, (GK, P))
        slot0 = lax.broadcasted_iota(jnp.int32, (GK, P), 0) % kcc

        def body(c, carry):
            kacc, rs = carry[0], carry[1:]
            if g == 1:
                rows = rows_refs[0][0, pl.ds(woffs[0] + c * kcc, kcc), :]
            else:
                rows = jnp.concatenate(
                    [rows_refs[q][0, pl.ds(woffs[q] + c * kcc, kcc), :]
                     for q in range(g)], axis=0)

            def col(j):
                return rows[:, j:j + 1]

            e0 = col(0) * X + col(1) * Y + col(2)
            e1 = col(3) * X + col(4) * Y + col(5)
            e2 = col(6) * X + col(7) * Y + col(8)
            m = jnp.minimum(jnp.minimum(e0, e1), e2)
            zz = e0 * col(9) + e1 * col(10) + e2 * col(11)
            cov = m >= 0.0
            zq = (zz * Z_LEVELS).astype(jnp.int32)
            ids = c * kcc + slot0
            keys = jnp.where(cov, (zq << IDX_BITS) | ids,
                             jnp.int32(SKY_KEY))

            if g == 1:
                cmin_g = jnp.min(keys, axis=0, keepdims=True)   # (1, P)
                win = (keys == cmin_g) & cov
                upd = cmin_g < kacc
                outs = []
                for d, rd in enumerate(rs):
                    cd = (e0 * col(14 + d) + e1 * col(14 + D + d)
                          + e2 * col(14 + 2 * D + d))
                    cdm = jnp.sum(jnp.where(win, cd, 0.0), axis=0,
                                  keepdims=True)
                    outs.append(jnp.where(upd, cdm, rd))
                return (jnp.where(upd, cmin_g, kacc), *outs)
            kg = keys.reshape(g, kcc, P)
            cmin_g = jnp.min(kg, axis=1)                        # (g, P)
            win = (kg == cmin_g[:, None, :]) & cov.reshape(g, kcc, P)
            upd = cmin_g < kacc
            outs = []
            for d, rd in enumerate(rs):
                cd = (e0 * col(14 + d) + e1 * col(14 + D + d)
                      + e2 * col(14 + 2 * D + d))
                cdm = jnp.sum(jnp.where(win, cd.reshape(g, kcc, P), 0.0),
                              axis=1)
                outs.append(jnp.where(upd, cdm, rd))
            return (jnp.where(upd, cmin_g, kacc), *outs)

        sky = jnp.full((g, P), SKY_KEY, jnp.int32)
        zero = jnp.zeros((g, P), jnp.float32)
        res = lax.fori_loop(0, nchunks, body, (sky,) + (zero,) * 3)
        kacc, rs = res[0], res[1:]
        bgp = scal_ref[(2 * g + 2) * npg]

        def q8(v):
            return jnp.clip(v * 255.0, 0.0, 255.0).astype(jnp.int32)

        packed = (q8(rs[0]) | (q8(rs[1]) << 8) | (q8(rs[2]) << 16)
                  | (jnp.full((g, P), 255, jnp.int32) << 24))
        keys_ref[0] = jnp.where(kacc != jnp.int32(SKY_KEY), packed, bgp)

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def launch_dyn(rows, scalars, tw, g, kcc):
    """rows: (B, CAP, ROW_W) f32 pair-ordered; scalars [c_q... | ox | oy
    | woff_q... | bg] with npg = (B/g)*NT programs."""
    Bn = rows.shape[0]
    ntx = W // tw
    nt = ntx * (H // TH)
    npg = (Bn // g) * nt
    P = tw * TH

    in_specs = []
    for q in range(g):
        in_specs.append(pl.BlockSpec(
            (1, rows.shape[1], ROW_W),
            (lambda i, s, _q=q, _nt=nt: (i // _nt * g + _q, 0, 0))))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npg,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, g, P), lambda i, s: (i, 0, 0))],
    )
    return pl.pallas_call(
        make_dyn_kernel(tw, g, kcc),
        out_shape=[jax.ShapeDtypeStruct((npg, g, P), jnp.int32)],
        grid_spec=grid_spec,
    )(scalars, *([rows] * g))[0]


def build_scalars(starts, counts, tw, g):
    Bn = starts.shape[0]
    ntx = W // tw
    nt = ntx * (H // TH)
    npg = (Bn // g) * nt
    tids = np.arange(nt, dtype=np.int32)
    ox = np.tile(tids % ntx * tw, Bn // g)
    oy = np.tile(tids // ntx * TH, Bn // g)
    cs, offs = [], []
    for q in range(g):
        fsel = np.arange(Bn // g) * g + q
        cs.append(counts[fsel].reshape(-1))
        offs.append(starts[fsel].reshape(-1))
    parts = cs + [ox, oy] + offs + [np.zeros(1, np.int32)]
    assert all(p.shape[0] == npg for p in parts[:-1])
    return jnp.asarray(np.concatenate(
        [np.asarray(p, np.int32) for p in parts]))


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    attrs = jnp.asarray(colors_np[faces_np], jnp.float32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = [jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                        jnp.float32) for i in range(FRAMES)]
    checksum(mvps)

    def prep_for(tw, sx, sy, cap):
        @jax.jit
        def prep(mvp):
            tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
            A, Bc, C, ia, sg, vl = raster3d.edge_coeffs(
                tri["sxy"], tri["z"], tri["valid"])
            zsc = tri["z"] * ia[:, None]
            sp, st, ct, ovf = raster3d.bin_triangles_flat(
                tri["sxy"], vl, W, H, tw, TH, KB, sx, sy,
                edges=(A, Bc, C, sg))
            tb = pallas_raster.build_table(A, Bc, C, zsc, ia, sg, vl,
                                           attrs)
            rows = jnp.take(tb, sp[:cap] & IDX_MASK, axis=0)
            return rows, st, ct, ovf
        return prep

    def timeit(name, fn, args_list, per=FRAMES):
        try:
            outs = [fn(*a) for a in args_list]
            checksum(outs)
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [fn(*a) for a in args_list]
                checksum(outs)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"{name:18s} {best / per * 1e3:7.3f} ms/frame",
                  flush=True)
            return outs
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}"[:600],
                  flush=True)
            return None

    first128 = True
    for tag, tw, sx, sy, cap, g, kcc, bsz in ([] if
            os.environ.get("E2E_ONLY") else [
            ("D128_g1_kcc16", 128, 2, 10, 49152, 1, 16, 4),
            ("D128_g2_kcc16", 128, 2, 10, 49152, 2, 16, 4),
            ("D64_g2_kcc8", 64, 3, 8, 28672, 2, 8, 6),
            ("D64_g4_kcc8", 64, 3, 8, 28672, 4, 8, 4)]):
        prep = prep_for(tw, sx, sy, cap)
        preps = [prep(m) for m in mvps]
        if any(bool(p[3]) for p in preps):
            print(f"{tag}: binning OVERFLOW", flush=True)
            continue
        groups = []
        for gi in range(FRAMES // bsz):
            ps = preps[gi * bsz:(gi + 1) * bsz]
            rows = jnp.stack([p[0] for p in ps])
            starts = np.stack([np.asarray(p[1]) for p in ps])
            cnts = np.stack([np.asarray(p[2]) for p in ps])
            scal = build_scalars(starts, cnts, tw, g)
            groups.append((rows, scal))
        checksum([g0[0] for g0 in groups])
        fn = functools.partial(launch_dyn, tw=tw, g=g, kcc=kcc)
        outs = timeit(tag, fn, groups)

        if tw == 128 and first128 and outs is not None:
            first128 = False
            ref8, _, _ = raster3d.render_gouraud_pallas(
                verts, faces, jnp.asarray(colors_np, jnp.float32), W, H,
                mvps[1], tile_w=128, tile_h=8, capacity=KB, span_x=2,
                span_y=10, flat=True, kcc=16, u8=True, opaque=True,
                z_clip=False)
            ntx = W // tw
            nt = ntx * (H // TH)
            packed = np.asarray(outs[0])
            fr1 = packed[nt:2 * nt, 0] if g == 1 else packed[:nt, 1]
            fr1 = fr1.reshape(H // TH, ntx, TH, tw)
            fr1 = np.transpose(fr1, (0, 2, 1, 3)).reshape(H, W)
            rgba = fr1.view(np.uint8).reshape(H, W, 4)
            ref = np.asarray(ref8)
            same = np.array_equal(rgba[..., :3], ref[..., :3])
            print(f"  bit-exact vs production (rgb): {same}", flush=True)
            if not same:
                diff = (rgba[..., :3] != ref[..., :3]).any(-1)
                print(f"  differing pixels: {int(diff.sum())}", flush=True)

    # ---- end-to-end fused sequence (prep + take + kernel + u8 reduce),
    # bench.py-style: ONE jitted program over all frames.  Prep runs at
    # the full 12-frame batch (B=4 prep measured +1.7 ms/frame of
    # per-op overhead); the rows array is then SLICED into bsz-frame
    # pieces so each Pallas operand stays under the 24 MiB limit. ----
    def fused_total(tag, tw, sx, sy, cap, g, kcc, bsz=4):
        ntx = W // tw
        nt = ntx * (H // TH)
        npg = (bsz // g) * nt
        tids0 = np.arange(nt, dtype=np.int32)
        ox_j = jnp.asarray(np.tile(tids0 % ntx * tw, bsz // g))
        oy_j = jnp.asarray(np.tile(tids0 // ntx * TH, bsz // g))

        G = FRAMES // BATCH
        stacked = jnp.stack(
            [jnp.stack(mvps[gi * BATCH:(gi + 1) * BATCH])
             for gi in range(G)])

        @jax.jit
        def seq(mv):
            def step(gi, acc):
                def one(mvp):
                    tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
                    A, Bc, C, ia, sg, vl = raster3d.edge_coeffs(
                        tri["sxy"], tri["z"], tri["valid"])
                    zsc = tri["z"] * ia[:, None]
                    sp, st, ct, ovf = raster3d.bin_triangles_flat(
                        tri["sxy"], vl, W, H, tw, TH, KB, sx, sy,
                        edges=(A, Bc, C, sg))
                    tb = pallas_raster.build_table(A, Bc, C, zsc, ia, sg,
                                                   vl, attrs)
                    rows = jnp.take(tb, sp[:cap] & IDX_MASK, axis=0)
                    return rows, st, ct, ovf
                rows, st, ct, ovf = jax.vmap(one)(mv[gi])  # B=12 prep
                s = jnp.float32(0.0)
                for sl in range(BATCH // bsz):
                    rsl = lax.slice_in_dim(rows, sl * bsz,
                                           (sl + 1) * bsz, axis=0)
                    cs, offs = [], []
                    for q in range(g):
                        fsel = sl * bsz + jnp.arange(bsz // g) * g + q
                        cs.append(ct[fsel].reshape(-1))
                        offs.append(st[fsel].reshape(-1))
                    scal = jnp.concatenate(
                        [jnp.asarray(x, jnp.int32) for x in
                         (cs + [ox_j, oy_j] + offs
                          + [jnp.zeros(1, jnp.int32)])])
                    out = launch_dyn.__wrapped__(rsl, scal, tw, g, kcc)
                    s = s + jnp.sum(
                        jnp.sum(lax.bitcast_convert_type(out, jnp.uint8)
                                .reshape(bsz // g, -1), axis=1,
                                dtype=jnp.uint32).astype(jnp.float32))
                return (acc[0] + s, acc[1] | jnp.any(ovf))
            return lax.fori_loop(0, G, step,
                                 (jnp.float32(0.0), jnp.asarray(False)))

        try:
            float(seq(stacked)[0])                   # warm
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                reps = 3
                accs = [seq(stacked)[0] for _ in range(reps)]
                float(jnp.sum(jnp.stack(accs)))      # one sync for all reps
                dt = (time.perf_counter() - t0) / reps
                best = dt if best is None else min(best, dt)
            print(f"{tag:18s} {best / FRAMES * 1e3:7.3f} ms/frame e2e "
                  f"({FRAMES / best:.1f} fps)", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}"[:600],
                  flush=True)
            traceback.print_exc()

    fused_total("E2E_D128_g1", 128, 2, 10, 49152, 1, 16)
    fused_total("E2E_D128_g2", 128, 2, 10, 49152, 2, 16)
    fused_total("E2E_D64_g4", 64, 3, 8, 28672, 4, 8)


if __name__ == "__main__":
    main()
