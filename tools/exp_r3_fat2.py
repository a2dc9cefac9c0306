#!/usr/bin/env python
"""Round-3 combined kernel: G tile-groups per program (amortise the
~0.33 us/program fixed cost — exp_r3_fatprog floors: 2025 -> 675
programs saves ~0.67 ms/frame) x optional lockstep subtiles (g sublane
groups of (tw, 8) subtiles — exp_r3_emission: finer bins cut pair-px
2.6x).  Every (group, subtile) keeps its OWN 2-block SMEM window
(per-tile windows never overflow, unlike a shared group window).

Variants (tw * g = 128 always):
  F3_g1_kcc16 : G=3 fat only            (expect ~ -0.6 vs v0_base)
  F3_g2_kcc8  : G=3 x lockstep (64,8)   (fat + 34% less vector work)
  F5_g1_kcc16 : G=5 fat only
  F5_g2_kcc8  : G=5 x lockstep
F3_g1 checked bit-exact vs the production path.

Run: nohup python tools/exp_r3_fat2.py > /tmp/exp_r3_fat2.log 2>&1 &
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
from libnativecpurenderer_tpu.ops.pallas_raster import ROW_W, D  # noqa
from libnativecpurenderer_tpu.ops.raster3d import (         # noqa: E402
    IDX_BITS, SKY_KEY, Z_LEVELS)

W, H = 1920, 1080
TH = 8
KB = 512
FRAMES = 24
BATCH = 12
NTY = H // TH


def checksum(arrs):
    return float(jnp.sum(jnp.stack([jnp.sum(jnp.ravel(a)[:256].astype(
        jnp.float32)) for a in arrs])))


def make_kernel(G, g, tw, kcc):
    P = tw * TH
    GK = g * kcc
    NS = G * g          # subtiles per program

    def kernel(scal_ref, *refs):
        blk_refs = refs[:2 * NS]
        table_ref = refs[2 * NS]
        out_ref = refs[2 * NS + 1]
        rows_s = refs[2 * NS + 2]
        i = pl.program_id(0)
        npg = pl.num_programs(0)
        ox0 = scal_ref[2 * NS * npg + i]
        oy = scal_ref[(2 * NS + 1) * npg + i]
        bgp = scal_ref[(3 * NS + 2) * npg]

        p_idx = lax.broadcasted_iota(jnp.int32, (1, P), 1)
        x1 = (p_idx % tw).astype(jnp.float32)
        y1 = (oy + p_idx // tw).astype(jnp.float32)
        Y = jnp.broadcast_to(y1, (GK, P))
        sub = lax.broadcasted_iota(jnp.int32, (GK, 1), 0)
        slot0 = sub % kcc

        def qz(v):
            return jnp.clip(v * 255.0, 0.0, 255.0).astype(jnp.int32)

        for q in range(G):
            counts = [scal_ref[(q * g + s) * npg + i] for s in range(g)]
            woffs = [scal_ref[(NS + q * g + s) * npg + i]
                     for s in range(g)]
            cmax = counts[0]
            for s in range(1, g):
                cmax = jnp.maximum(cmax, counts[s])
            nchunks = (cmax + kcc - 1) // kcc
            xoff = ox0 + q * g * tw + (sub // kcc) * tw
            X = xoff.astype(jnp.float32) + jnp.broadcast_to(x1, (GK, P))

            def body(c, carry, q=q, woffs=woffs, X=X):
                kacc, rs = carry[0], carry[1:]
                for s in range(g):
                    b0 = blk_refs[2 * (q * g + s)]
                    b1 = blk_refs[2 * (q * g + s) + 1]
                    for j in range(kcc):
                        idx = woffs[s] + c * kcc + j
                        p0 = b0[0, 0, jnp.minimum(idx, KB - 1)]
                        p1 = b1[0, 0, jnp.clip(idx - KB, 0, KB - 1)]
                        tid = (jnp.where(idx < KB, p0, p1)
                               & ((1 << IDX_BITS) - 1))
                        rows_s[pl.ds(s * kcc + j, 1), :] = \
                            table_ref[0, pl.ds(tid, 1), :]
                rows = rows_s[:, :]

                def col(jc):
                    return rows[:, jc:jc + 1]

                e0 = col(0) * X + col(1) * Y + col(2)
                e1 = col(3) * X + col(4) * Y + col(5)
                e2 = col(6) * X + col(7) * Y + col(8)
                m = jnp.minimum(jnp.minimum(e0, e1), e2)
                zz = e0 * col(9) + e1 * col(10) + e2 * col(11)
                cov = m >= 0.0
                zq = (zz * Z_LEVELS).astype(jnp.int32)
                ids2 = c * kcc + slot0
                keys = jnp.where(cov, (zq << IDX_BITS) | ids2,
                                 jnp.int32(SKY_KEY))
                if g == 1:
                    cmin_g = jnp.min(keys, axis=0, keepdims=True)
                    cmin = jnp.broadcast_to(cmin_g, (GK, P))
                else:
                    mins = [jnp.min(keys[s * kcc:(s + 1) * kcc], axis=0,
                                    keepdims=True) for s in range(g)]
                    cmin_g = jnp.concatenate(mins, axis=0)
                    cmin = jnp.concatenate(
                        [jnp.broadcast_to(mins[s], (kcc, P))
                         for s in range(g)], axis=0)
                win = (keys == cmin) & cov
                upd = cmin_g < kacc
                outs = []
                for d, rd in enumerate(rs):
                    cd = (e0 * col(14 + d) + e1 * col(14 + D + d)
                          + e2 * col(14 + 2 * D + d))
                    cd = jnp.where(win, cd, 0.0)
                    if g == 1:
                        cdm = jnp.sum(cd, axis=0, keepdims=True)
                    else:
                        cdm = jnp.concatenate(
                            [jnp.sum(cd[s * kcc:(s + 1) * kcc], axis=0,
                                     keepdims=True) for s in range(g)],
                            axis=0)
                    outs.append(jnp.where(upd, cdm, rd))
                return (jnp.where(upd, cmin_g, kacc), *outs)

            sky = jnp.full((g, P), SKY_KEY, jnp.int32)
            zero = jnp.zeros((g, P), jnp.float32)
            res = lax.fori_loop(0, nchunks, body, (sky,) + (zero,) * 3)
            kacc, rs = res[0], res[1:]
            packed = (qz(rs[0]) | (qz(rs[1]) << 8) | (qz(rs[2]) << 16)
                      | (jnp.full((g, P), 255, jnp.int32) << 24))
            out_ref[0, q * g:(q + 1) * g] = jnp.where(
                kacc != jnp.int32(SKY_KEY), packed, bgp)

    return kernel


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def launch(sorted_pad, table, scalars, G, g, tw, kcc):
    P = tw * TH
    NS = G * g
    ntx_s = W // tw
    npg = (ntx_s // NS) * NTY * BATCH
    nblocks = sorted_pad.shape[0] // KB
    blocks = sorted_pad.reshape(nblocks, 1, KB)
    in_specs = []
    for qs in range(NS):
        for d in range(2):
            in_specs.append(pl.BlockSpec(
                (1, 1, KB),
                (lambda i, s, _qs=qs, _d=d:
                 (s[(2 * NS + 2 + _qs) * npg + i] + _d, 0, 0)),
                memory_space=pltpu.SMEM))
    in_specs.append(pl.BlockSpec((1, table.shape[1], ROW_W),
                                 lambda i, s: (i // (npg // BATCH), 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npg,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, NS, P), lambda i, s: (i, 0, 0))],
        scratch_shapes=[pltpu.VMEM((g * kcc, ROW_W), jnp.float32)],
    )
    return pl.pallas_call(
        make_kernel(G, g, tw, kcc),
        out_shape=[jax.ShapeDtypeStruct((npg, NS, P), jnp.int32)],
        grid_spec=grid_spec,
    )(scalars, *([blocks] * (2 * NS)), table)[0]


def build_scalars(starts, counts, G, g, tw, frame_blocks):
    """Per program: counts[NS] | woffs[NS] | ox0 | oy | blk[NS] | bg.
    Subtile (program, qs) has absolute id py*ntx_s + px*NS + qs."""
    NS = G * g
    Bn = starts.shape[0]
    ntx_s = W // tw
    npg_f = (ntx_s // NS) * NTY
    pid = np.arange(npg_f, dtype=np.int32)
    py, px = pid // (ntx_s // NS), pid % (ntx_s // NS)
    cs, wos, blks = [], [], []
    for qs in range(NS):
        sid = py * ntx_s + px * NS + qs
        sq = starts[:, sid]
        cs.append(counts[:, sid].reshape(-1))
        blk = sq // KB
        wos.append((sq % KB).reshape(-1))
        blks.append((np.arange(Bn, dtype=np.int32)[:, None] * frame_blocks
                     + blk).reshape(-1))
    ox0 = np.tile(px * NS * tw, Bn)
    oy = np.tile(py * TH, Bn)
    parts = cs + wos + [ox0, oy] + blks + [np.zeros(1, np.int32)]
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

    def prep_for(tw, sx, sy):
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
            return sp, st, ct, tb
        return prep

    def timeit(name, fn, args_list):
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
            print(f"{name:14s} {best / FRAMES * 1e3:7.3f} ms/frame",
                  flush=True)
            return outs
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}"[:400],
                  flush=True)
            return None

    prepped = {}
    for tw, sx, sy in [(128, 2, 10), (64, 3, 8)]:
        prep = prep_for(tw, sx, sy)
        preps = [prep(m) for m in mvps]
        checksum([p[0] for p in preps])
        prepped[tw] = preps

    for tag, G, g, tw, kcc in [
            ("F3_g1_kcc16", 3, 1, 128, 16),
            ("F3_g2_kcc8", 3, 2, 64, 8),
            ("F5_g1_kcc16", 5, 1, 128, 16),
            ("F5_g2_kcc8", 5, 2, 64, 8)]:
        preps = prepped[tw]
        frame_blocks = preps[0][0].shape[0] // KB
        groups = []
        for gi in range(FRAMES // BATCH):
            ps = preps[gi * BATCH:(gi + 1) * BATCH]
            sps = jnp.concatenate([p[0] for p in ps])
            starts = np.stack([np.asarray(p[1]) for p in ps])
            cnts = np.stack([np.asarray(p[2]) for p in ps])
            scal = build_scalars(starts, cnts, G, g, tw, frame_blocks)
            tabs = jnp.stack([p[3] for p in ps])
            groups.append((sps, tabs, scal))
        checksum([gg[0] for gg in groups])
        fn = functools.partial(launch, G=G, g=g, tw=tw, kcc=kcc)
        outs = timeit(tag, fn, groups)
        if outs is not None and tag == "F3_g1_kcc16":
            ref8, _, _ = raster3d.render_gouraud_pallas(
                verts, faces, jnp.asarray(colors_np, jnp.float32), W, H,
                mvps[0], tile_w=128, tile_h=8, capacity=KB, span_x=2,
                span_y=10, flat=True, kcc=16, u8=True, opaque=True,
                z_clip=False)
            NS = G * g
            P = tw * TH
            ntx_s = W // tw
            npg_f = (ntx_s // NS) * NTY
            fr0 = np.asarray(outs[0][:npg_f])
            fr0 = fr0.reshape(NTY, ntx_s // NS, NS, TH, tw)
            fr0 = np.transpose(fr0, (0, 3, 1, 2, 4)).reshape(H, W)
            rgba = fr0.view(np.uint8).reshape(H, W, 4)
            same = np.array_equal(rgba, np.asarray(ref8))
            print(f"  bit-exact vs production: {same}", flush=True)
            if not same:
                diff = (rgba != np.asarray(ref8)).any(-1)
                print(f"  differing pixels: {int(diff.sum())}", flush=True)


if __name__ == "__main__":
    main()
