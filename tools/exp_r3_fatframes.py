#!/usr/bin/env python
"""Round-3 fat-FRAMES kernel: g frames of the batch share one program per
tile, each frame's pair run walked in its own kcc-sublane group.

Motivation: the production kernel's per-program fixed cost is ~0.5
ms/frame at 2025 programs/frame (exp_r3_lockstep Z_fixedcost), and
grouping by x-adjacent SUBTILES (exp_r3_lockstep) or by x-adjacent TILES
(exp_r3_fat2) measured worse — the multi-window body cost ate the
savings.  Grouping by FRAME keeps the tile geometry identical for every
group (one X/Y iota, one ox/oy), halves (g=2) the program count per
frame, and keeps the chunk walk the same shape as production kcc16:
(g*kcc, P) arrays with per-frame reductions done via a free
(g, kcc, P) sublane-split reshape rather than lockstep's
concat-of-slices (suspected relayout cost).

Adjacent frames' counts are highly correlated (rotation step 0.03), so
nchunks = ceil(max_q(count)/kcc) wastes little; a frame walking past its
own run spills into its next tile's pairs, which is semantically
harmless (any triangle covering this tile's pixels is in this tile's own
run at a smaller slot and wins the tie — see _make_kernel_flat).

Variants: FF_g2_kcc8 (GK=16, same array shapes as production),
FF_g2_kcc16 (GK=32), FF_g4_kcc8 (GK=32), plus a zero-counts fixed-cost
probe for g2.

Run: nohup python tools/exp_r3_fatframes.py > /tmp/exp_r3_fatframes.log 2>&1 &
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
# --t32: retarget at the CHAMPION tile shape (32,32)/(5,3) — at that
# shape the per-program fixed cost is ~0.29 us x 2040 programs ≈ 0.58
# ms/frame (from the (16,16) ladder point), so g=2 frame-grouping has
# ~0.29 ms of headroom IF the max-coupled chunk walk stays cheap (it
# did not at (64,8): exp_r3_ff64).  g=1 runs as the in-harness control.
if "--t32" in sys.argv:
    TW, TH = 32, 32
    SPX, SPY = 5, 3
else:
    TW, TH = 128, 8
    SPX, SPY = 2, 10
P = TH * TW
KB = 512
FRAMES = 24
BATCH = 12
NTX = (W + TW - 1) // TW
NTY = (H + TH - 1) // TH
NT = NTX * NTY


def checksum(arrs):
    return float(jnp.sum(jnp.stack([jnp.sum(jnp.ravel(a)[:256].astype(
        jnp.float32)) for a in arrs])))


def make_ff_kernel(g: int, kcc: int):
    GK = g * kcc

    def kernel(scal_ref, *refs):
        blk_refs = refs[:2 * g]
        tab_refs = refs[2 * g:3 * g]
        keys_ref = refs[3 * g]
        rows_s = refs[3 * g + 1]
        i = pl.program_id(0)
        npg = pl.num_programs(0)

        counts = [scal_ref[q * npg + i] for q in range(g)]
        ox = scal_ref[g * npg + i]
        oy = scal_ref[(g + 1) * npg + i]
        woffs = [scal_ref[(g + 3 + 2 * q) * npg + i] for q in range(g)]
        cmax = counts[0]
        for q in range(1, g):
            cmax = jnp.maximum(cmax, counts[q])
        nchunks = (cmax + kcc - 1) // kcc

        p_idx = lax.broadcasted_iota(jnp.int32, (1, P), 1)
        x1 = (ox + p_idx % TW).astype(jnp.float32)
        y1 = (oy + p_idx // TW).astype(jnp.float32)
        X = jnp.broadcast_to(x1, (GK, P))
        Y = jnp.broadcast_to(y1, (GK, P))
        slot0 = lax.broadcasted_iota(jnp.int32, (GK, P), 0) % kcc

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
                        tab_refs[q][0, pl.ds(tid, 1), :]
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
            ids = c * kcc + slot0
            keys = jnp.where(cov, (zq << IDX_BITS) | ids,
                             jnp.int32(SKY_KEY))

            # per-frame min via sublane-split reshape (g, kcc, P)
            kg = keys.reshape(g, kcc, P)
            cmin_g = jnp.min(kg, axis=1)                   # (g, P)
            win = (kg == cmin_g[:, None, :]) & cov.reshape(g, kcc, P)
            upd = cmin_g < kacc
            outs = []
            for d, rd in enumerate(rs):
                cd = (e0 * col(14 + d) + e1 * col(14 + D + d)
                      + e2 * col(14 + 2 * D + d))
                cdm = jnp.sum(jnp.where(win, cd.reshape(g, kcc, P), 0.0),
                              axis=1)                      # (g, P)
                outs.append(jnp.where(upd, cdm, rd))
            return (jnp.where(upd, cmin_g, kacc), *outs)

        sky = jnp.full((g, P), SKY_KEY, jnp.int32)
        zero = jnp.zeros((g, P), jnp.float32)
        res = lax.fori_loop(0, nchunks, body, (sky,) + (zero,) * 3)
        kacc, rs = res[0], res[1:]
        bgp = scal_ref[(3 * g + 2) * npg]

        def q8(v):
            return jnp.clip(v * 255.0, 0.0, 255.0).astype(jnp.int32)

        packed = (q8(rs[0]) | (q8(rs[1]) << 8) | (q8(rs[2]) << 16)
                  | (jnp.full((g, P), 255, jnp.int32) << 24))
        keys_ref[0] = jnp.where(kacc != jnp.int32(SKY_KEY), packed, bgp)

    return kernel


@functools.partial(jax.jit, static_argnums=(3, 4))
def launch_ff(sorted_cat, tables, scalars, g, kcc):
    """sorted_cat: (B*Spad,) concatenated frame pair arrays; tables:
    (B, F+1, ROW_W); scalars laid out [c_q... | ox | oy | (blk_q, off_q)...
    | bg] with npg = (B/g)*NT programs."""
    Bn = tables.shape[0]
    npg = (Bn // g) * NT
    nblocks = sorted_cat.shape[0] // KB
    blocks = sorted_cat.reshape(nblocks, 1, KB)

    in_specs = []
    for q in range(g):
        for dd in range(2):
            in_specs.append(pl.BlockSpec(
                (1, 1, KB),
                (lambda i, s, _q=q, _d=dd:
                 (s[(g + 2 + 2 * _q) * npg + i] + _d, 0, 0)),
                memory_space=pltpu.SMEM))
    for q in range(g):
        in_specs.append(pl.BlockSpec(
            (1, tables.shape[1], ROW_W),
            (lambda i, s, _q=q: (i // NT * g + _q, 0, 0))))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npg,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, g, P), lambda i, s: (i, 0, 0))],
        scratch_shapes=[pltpu.VMEM((g * kcc, ROW_W), jnp.float32)],
    )
    return pl.pallas_call(
        make_ff_kernel(g, kcc),
        out_shape=[jax.ShapeDtypeStruct((npg, g, P), jnp.int32)],
        grid_spec=grid_spec,
    )(scalars, *([blocks] * (2 * g)), *([tables] * g))[0]


def build_scalars(starts, counts, g, frame_blocks, zero_counts=False):
    """starts/counts: (B, NT) -> flat i32 scalar array for launch_ff."""
    Bn = starts.shape[0]
    npg = (Bn // g) * NT
    tids = np.arange(NT, dtype=np.int32)
    ox = np.tile(tids % NTX * TW, Bn // g)
    oy = np.tile(tids // NTX * TH, Bn // g)
    cs, blks, offs = [], [], []
    for q in range(g):
        fsel = np.arange(Bn // g) * g + q
        cq = counts[fsel].reshape(-1)
        cs.append(np.zeros_like(cq) if zero_counts else cq)
        sq = starts[fsel]
        blks.append((fsel[:, None] * frame_blocks + sq // KB).reshape(-1))
        offs.append((sq % KB).reshape(-1))
    parts = cs + [ox, oy]
    for q in range(g):
        parts += [blks[q], offs[q]]
    parts.append(np.zeros(1, np.int32))          # packed bg = 0
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

    @jax.jit
    def prep(mvp):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        A, Bc, C, ia, sg, vl = raster3d.edge_coeffs(
            tri["sxy"], tri["z"], tri["valid"])
        zsc = tri["z"] * ia[:, None]
        sp, st, ct, ovf = raster3d.bin_triangles_flat(
            tri["sxy"], vl, W, H, TW, TH, KB, SPX, SPY,
            edges=(A, Bc, C, sg))
        tb = pallas_raster.build_table(A, Bc, C, zsc, ia, sg, vl, attrs)
        return sp, st, ct, tb, ovf

    preps = [prep(m) for m in mvps]
    assert not any(bool(p[4]) for p in preps)
    frame_blocks = preps[0][0].shape[0] // KB

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

    cfgs = [("FF_g2_kcc8", 2, 8), ("FF_g2_kcc16", 2, 16),
            ("FF_g4_kcc8", 4, 8)]
    if "--t32" in sys.argv:
        cfgs = [("FF_g1_kcc16", 1, 16), ("FF_g2_kcc16", 2, 16),
                ("FF_g2_kcc8", 2, 8)]
    for tag, g, kcc in cfgs:
        groups = []
        for gi in range(FRAMES // BATCH):
            ps = preps[gi * BATCH:(gi + 1) * BATCH]
            sps = jnp.concatenate([p[0] for p in ps])
            starts = np.stack([np.asarray(p[1]) for p in ps])
            cnts = np.stack([np.asarray(p[2]) for p in ps])
            scal = build_scalars(starts, cnts, g, frame_blocks)
            tabs = jnp.stack([p[3] for p in ps])
            groups.append((sps, tabs, scal))
        checksum([g0[0] for g0 in groups])
        fn = functools.partial(launch_ff, g=g, kcc=kcc)
        outs = timeit(tag, fn, groups)

        if tag == "FF_g2_kcc8" and outs is not None:
            ref8, _, _ = raster3d.render_gouraud_pallas(
                verts, faces, jnp.asarray(colors_np, jnp.float32), W, H,
                mvps[1], tile_w=128, tile_h=8, capacity=KB, span_x=2,
                span_y=10, flat=True, kcc=16, u8=True, opaque=True,
                z_clip=False)
            packed = np.asarray(outs[0])        # (npg, g, P) group 0
            fr1 = packed[:NT, 1]                # frame 1 = pair 0, q=1
            fr1 = fr1.reshape(NTY, NTX, TH, TW)
            fr1 = np.transpose(fr1, (0, 2, 1, 3)).reshape(NTY * TH,
                                                          NTX * TW)
            rgba = fr1[:H, :W].view(np.uint8).reshape(H, W, 4)
            ref = np.asarray(ref8)
            same = np.array_equal(rgba[..., :3], ref[..., :3])
            print(f"  bit-exact vs production (rgb): {same}", flush=True)
            if not same:
                diff = (rgba[..., :3] != ref[..., :3]).any(-1)
                print(f"  differing pixels: {int(diff.sum())}", flush=True)

            zg = [(s, t, build_scalars(
                np.stack([np.asarray(p[1]) for p in
                          preps[gi * BATCH:(gi + 1) * BATCH]]),
                np.stack([np.asarray(p[2]) for p in
                          preps[gi * BATCH:(gi + 1) * BATCH]]),
                g, frame_blocks, zero_counts=True))
                for gi, (s, t, _sc) in enumerate(groups)]
            timeit("Z_fixedcost_g2", fn, zg)


if __name__ == "__main__":
    main()
