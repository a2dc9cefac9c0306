#!/usr/bin/env python
"""Round-3 lockstep subtile kernel: G x-adjacent (tw, 8) subtiles walk
their own pair runs in sublane groups of one program, sharing the
128-lane vector width.  Median triangle bbox is ~20x16 px, so (128, 8)
tiles waste ~2/3 of the lanes; (64, 8) bins emit 26.1k pairs * 512 px =
13.4M px vs 34M at (128, 8) (tools/exp_r3_emission.py).

Math is IDENTICAL per pixel to the production kernel (same e/zz/cd
expressions, min-reduce over the pixel's subtile bin = same winner set,
slot order still ascends with triangle id) -> bit-exact output expected;
verified here against render_gouraud_pallas on one frame.

Variants:
  A_64x8_g2_kcc8   : 2 sublane groups, (16, 512) chunk arrays
  B_32x8_g4_kcc8   : 4 groups, (32, 256) chunk arrays (sort cost of the
                     400k emission measured separately -- kernel-only here)
  C_64x8_g2_kcc16
  Z_fixedcost      : A with all counts=0 (per-program fixed cost)

Run: nohup python tools/exp_r3_lockstep.py > /tmp/exp_r3_lockstep.log 2>&1 &
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
KB = 512
FRAMES = 24
BATCH = 12


def checksum(arrs):
    return float(jnp.sum(jnp.stack([jnp.sum(jnp.ravel(a)[:256].astype(
        jnp.float32)) for a in arrs])))


def make_lockstep_kernel(tw, g, kcc):
    """G x-adjacent (tw, 8) subtiles per program, each on its own kcc
    sublane group."""
    P = tw * 8          # pixels per subtile, flattened y*tw + x
    GK = g * kcc

    def kernel(scal_ref, *refs):
        blk_refs = refs[:2 * g]
        table_ref = refs[2 * g]
        keys_ref = refs[2 * g + 1]
        rows_s = refs[2 * g + 2]
        i = pl.program_id(0)
        npg = pl.num_programs(0)

        counts = [scal_ref[q * npg + i] for q in range(g)]
        ox = scal_ref[g * npg + i]
        oy = scal_ref[(g + 1) * npg + i]
        woffs = [scal_ref[(g + 2 + 2 * q + 1) * npg + i] for q in range(g)]
        cmax = counts[0]
        for q in range(1, g):
            cmax = jnp.maximum(cmax, counts[q])
        nchunks = (cmax + kcc - 1) // kcc

        p_idx = lax.broadcasted_iota(jnp.int32, (1, P), 1)
        sub = lax.broadcasted_iota(jnp.int32, (GK, 1), 0)
        xq = ox + (sub // kcc) * tw                       # (GK, 1)
        x1 = (p_idx % tw).astype(jnp.float32)
        y1 = (oy + p_idx // tw).astype(jnp.float32)
        X = xq.astype(jnp.float32) + jnp.broadcast_to(x1, (GK, P))
        Y = jnp.broadcast_to(y1, (GK, P))
        slot0 = sub % kcc                                 # (GK, 1)

        def body(c, carry):
            kacc, rs = carry[0], carry[1:]
            for q in range(g):
                b0 = blk_refs[2 * q]
                b1 = blk_refs[2 * q + 1]
                for j in range(kcc):
                    idx = woffs[q] + c * kcc + j
                    p0 = b0[0, 0, jnp.minimum(idx, KB - 1)]
                    p1 = b1[0, 0, jnp.clip(idx - KB, 0, KB - 1)]
                    tid = (jnp.where(idx < KB, p0, p1)
                           & ((1 << IDX_BITS) - 1))
                    rows_s[pl.ds(q * kcc + j, 1), :] = \
                        table_ref[0, pl.ds(tid, 1), :]
            rows = rows_s[:, :]

            def col(j):
                return rows[:, j:j + 1]

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
            # per-group min over the group's kcc sublanes, broadcast back
            mins = [jnp.min(keys[q * kcc:(q + 1) * kcc], axis=0,
                            keepdims=True) for q in range(g)]
            cmin_g = jnp.concatenate(mins, axis=0)        # (g, P)
            cmin = jnp.concatenate(
                [jnp.broadcast_to(mins[q], (kcc, P)) for q in range(g)],
                axis=0)                                    # (GK, P)
            win = (keys == cmin) & cov
            upd = cmin_g < kacc
            outs = []
            for d, rd in enumerate(rs):
                cd = (e0 * col(14 + d) + e1 * col(14 + D + d)
                      + e2 * col(14 + 2 * D + d))
                cd = jnp.where(win, cd, 0.0)
                cdm = jnp.concatenate(
                    [jnp.sum(cd[q * kcc:(q + 1) * kcc], axis=0,
                             keepdims=True) for q in range(g)], axis=0)
                outs.append(jnp.where(upd, cdm, rd))
            return (jnp.where(upd, cmin_g, kacc), *outs)

        sky = jnp.full((g, P), SKY_KEY, jnp.int32)
        zero = jnp.zeros((g, P), jnp.float32)
        res = lax.fori_loop(0, nchunks, body, (sky,) + (zero,) * 3)
        kacc, rs = res[0], res[1:]
        bgp = scal_ref[(g + 2 + 2 * g) * npg]

        def qz(v):
            return jnp.clip(v * 255.0, 0.0, 255.0).astype(jnp.int32)

        packed = (qz(rs[0]) | (qz(rs[1]) << 8) | (qz(rs[2]) << 16)
                  | (jnp.full((g, P), 255, jnp.int32) << 24))
        keys_ref[0] = jnp.where(kacc != jnp.int32(SKY_KEY), packed, bgp)

    return kernel


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def launch_lockstep(sorted_pad, table, scalars, tw, g, kcc):
    ntx_s = W // tw                      # subtile grid
    nty = H // 8
    npg = (ntx_s // g) * nty * BATCH
    P = tw * 8
    nblocks = sorted_pad.shape[0] // KB
    blocks = sorted_pad.reshape(nblocks, 1, KB)

    in_specs = []
    for q in range(g):
        for d in range(2):
            in_specs.append(pl.BlockSpec(
                (1, 1, KB),
                (lambda i, s, _q=q, _d=d:
                 (s[(g + 2 + 2 * _q) * npg + i] + _d, 0, 0)),
                memory_space=pltpu.SMEM))
    in_specs.append(pl.BlockSpec((1, table.shape[1], ROW_W),
                                 lambda i, s: (i // (npg // BATCH), 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npg,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, g, P), lambda i, s: (i, 0, 0))],
        scratch_shapes=[pltpu.VMEM((g * kcc, ROW_W), jnp.float32)],
    )
    return pl.pallas_call(
        make_lockstep_kernel(tw, g, kcc),
        out_shape=[jax.ShapeDtypeStruct((npg, g, P), jnp.int32)],
        grid_spec=grid_spec,
    )(scalars, *([blocks] * (2 * g)), table)[0]


def build_scalars(starts, counts, tw, g, frame_blocks, zero_counts=False):
    """starts/counts: (B, NST) per-subtile; -> flat scalar array.
    Layout per program i (npg programs): [c_q ... | ox | oy |
    (blk_q, off_q) ... | bg]."""
    Bn = starts.shape[0]
    ntx_s = W // tw
    nty = H // 8
    npg_f = (ntx_s // g) * nty
    npg = npg_f * Bn
    pid = np.arange(npg_f, dtype=np.int32)
    py, pg = pid // (ntx_s // g), pid % (ntx_s // g)
    sub_ids = [(py * ntx_s + pg * g + q) for q in range(g)]
    cs, oxs, oys, blks, offs = [], [], [], [], []
    for q in range(g):
        cq = counts[:, sub_ids[q]].reshape(-1)
        cs.append(np.zeros_like(cq) if zero_counts else cq)
        sq = starts[:, sub_ids[q]]
        ab = (np.arange(Bn, dtype=np.int32)[:, None] * frame_blocks
              + sq // KB).reshape(-1)
        blks.append(ab)
        offs.append((sq % KB).reshape(-1))
    ox = np.tile(pg * g * tw, Bn)
    oy = np.tile(py * 8, Bn)
    parts = cs + [ox, oy]
    for q in range(g):
        parts += [blks[q], offs[q]]
    parts.append(np.zeros(1, np.int32))
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
                tri["sxy"], vl, W, H, tw, 8, KB, sx, sy,
                edges=(A, Bc, C, sg))
            tb = pallas_raster.build_table(A, Bc, C, zsc, ia, sg, vl,
                                           attrs)
            return sp, st, ct, tb, ovf
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
            print(f"{name:18s} {best / FRAMES * 1e3:7.3f} ms/frame",
                  flush=True)
            return outs
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}"[:600],
                  flush=True)
            return None

    for tag, tw, g, kcc, sx, sy in [
            ("A_64x8_g2_kcc8", 64, 2, 8, 3, 8),
            ("B_32x8_g4_kcc8", 32, 4, 8, 5, 8),
            ("C_64x8_g2_kcc16", 64, 2, 16, 3, 8)]:
        prep = prep_for(tw, sx, sy)
        preps = [prep(m) for m in mvps]
        ovf = any(bool(p[4]) for p in preps)
        if ovf:
            print(f"{tag}: OVERFLOW in binning", flush=True)
            continue
        frame_blocks = preps[0][0].shape[0] // KB
        groups = []
        for gi in range(FRAMES // BATCH):
            ps = preps[gi * BATCH:(gi + 1) * BATCH]
            sps = jnp.concatenate([p[0] for p in ps])
            starts = np.stack([np.asarray(p[1]) for p in ps])
            cnts = np.stack([np.asarray(p[2]) for p in ps])
            scal = build_scalars(starts, cnts, tw, g, frame_blocks)
            tabs = jnp.stack([p[3] for p in ps])
            groups.append((sps, tabs, scal))
        checksum([g0[0] for g0 in groups])
        fn = functools.partial(launch_lockstep, tw=tw, g=g, kcc=kcc)
        outs = timeit(tag, fn, groups)

        if tag.startswith("A") and outs is not None:
            # correctness vs production path, frame 0
            ref8, _, ovf2 = raster3d.render_gouraud_pallas(
                verts, faces, jnp.asarray(colors_np, jnp.float32), W, H,
                mvps[0], tile_w=128, tile_h=8, capacity=KB, span_x=2,
                span_y=10, flat=True, kcc=16, u8=True, opaque=True,
                z_clip=False)
            packed = outs[0]                # (npg, g, P) for group 0
            ntx_s = W // tw
            npg_f = (ntx_s // g) * (H // 8)
            fr0 = np.asarray(packed[:npg_f])       # frame 0 programs
            fr0 = fr0.reshape(H // 8, ntx_s // g, g, 8, tw)
            fr0 = np.transpose(fr0, (0, 3, 1, 2, 4)).reshape(H, W)
            rgba = fr0.view(np.uint8).reshape(H, W, 4)
            same = np.array_equal(rgba, np.asarray(ref8))
            print(f"  bit-exact vs production: {same}", flush=True)
            if not same:
                diff = (rgba != np.asarray(ref8)).any(-1)
                print(f"  differing pixels: {int(diff.sum())}", flush=True)

        # fixed-cost probe for A
        if tag.startswith("A"):
            zgroups = [(s, t, build_scalars(
                np.stack([np.asarray(p[1]) for p in preps[:BATCH]]),
                np.stack([np.asarray(p[2]) for p in preps[:BATCH]]),
                tw, g, frame_blocks, zero_counts=True))
                for (s, t, _sc) in groups]
            timeit("Z_fixedcost", fn, zgroups)


if __name__ == "__main__":
    main()
