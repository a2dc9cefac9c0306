"""Pallas TPU kernel: fused per-tile triangle visibility + Gouraud shading.

The XLA formulation of the per-tile pass materialises its (K, P) edge/key
temporaries to HBM (~86 ms/frame at 1080p/10k-tri) and runs the full static
bin capacity K for every tile though mean occupancy is ~25.  This kernel
keeps all temporaries in VMEM and drives the inner loop with a
scalar-prefetched per-tile count, so work is proportional to occupancy.

Iteration history (measured on v5e):
  * scalar-per-triangle with SMEM row reads: correct but ~36 ms/frame —
    the per-tile (K, 32) SMEM block fill is serial and slow (~65 MB of
    SMEM traffic per frame dominates).
  * this version: rows stay in VMEM (pipelined block DMA); each inner step
    evaluates a chunk of KCC triangles as (KCC, P) vector ops using only
    Mosaic-supported broadcast forms — (KCC,1)x(KCC,P) lane broadcasts for
    coefficients and (1,P)->(KCC,P) sublane broadcasts for the pixel grid.

Row table layout (padded to ROW_W=32 floats), *edge-major* so each edge's
(x, y, const) coefficients are a contiguous (KCC, 1) column slice:
  0:3  A0 B0 C0      (edge 0: e0 = A0*x + B0*y + C0)
  3:6  A1 B1 C1
  6:9  A2 B2 C2
  9:12 z*inv_area per vertex
  12   sign   13 inv_area
  14:14+3D vertex attributes (D=4 RGBA)
NO_TRI bin slots resolve to a NaN row whose coverage test is vacuously
false, so chunk remainders need no masking.

Packed keys carry the BIN SLOT (position in the tile's bin list); slots
ascend with triangle id (bins are sorted) so depth/tie ordering matches the
global-id packing, and ids are recovered with one (NT, K) lookup after.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster3d import IDX_BITS, NO_TRI, SKY_KEY, Z_LEVELS

KCC = 32        # triangles per inner chunk
ROW_W = 32      # padded row width
D = 4           # RGBA


def _make_kernel(tile_h: int, tile_w: int, K: int, kcc: int = KCC):
    P = tile_h * tile_w

    def kernel(scal_ref, bins_ref, table_ref, keys_ref, rgba_ref, rows_s):
        i = pl.program_id(0)
        nt = pl.num_programs(0)
        count = scal_ref[i]
        nchunks = (count + kcc - 1) // kcc
        ox = scal_ref[nt + i]
        oy = scal_ref[2 * nt + i]

        # flat pixel grid (1, P), broadcast once to chunk shape (KCC, P)
        p_idx = lax.broadcasted_iota(jnp.int32, (1, P), 1)
        x1 = (ox + p_idx % tile_w).astype(jnp.float32)
        y1 = (oy + p_idx // tile_w).astype(jnp.float32)
        X = jnp.broadcast_to(x1, (kcc, P))
        Y = jnp.broadcast_to(y1, (kcc, P))
        slot0 = lax.broadcasted_iota(jnp.int32, (kcc, P), 0)

        def body(c, carry):
            kacc, r0, r1, r2, r3 = carry
            # gather this chunk's triangle rows from the VMEM-resident
            # table (the XLA-side (NT, K, 32) pre-gather measured ~25
            # ms/frame of pathological HBM gather traffic; KCC unrolled
            # VMEM row copies are ~free)
            for j in range(kcc):
                tid = bins_ref[0, 0, c * kcc + j]
                rows_s[pl.ds(j, 1), :] = table_ref[0, pl.ds(tid, 1), :]
            rows = rows_s[:, :]                             # (KCC, 32)

            def col(j):
                return rows[:, j:j + 1]                     # (KCC, 1)

            e0 = col(0) * X + col(1) * Y + col(2)           # (KCC, P)
            e1 = col(3) * X + col(4) * Y + col(5)
            e2 = col(6) * X + col(7) * Y + col(8)
            # min-form inside test on sign-folded edges (build_table):
            # 2 mins + 1 cmp, no per-chunk sign muls
            m = jnp.minimum(jnp.minimum(e0, e1), e2)
            zz = e0 * col(9) + e1 * col(10) + e2 * col(11)
            cov = (m >= 0.0) & (zz >= 0.0) & (zz <= 1.0)
            # cov bounds zz to [0, 1] already; uncovered lanes' casts are
            # garbage but discarded by the select, so no clip needed
            zq = (zz * Z_LEVELS).astype(jnp.int32)
            ids = c * kcc + slot0
            keys = jnp.where(cov, (zq << IDX_BITS) | ids,
                             jnp.int32(SKY_KEY))

            cmin = jnp.min(keys, axis=0, keepdims=True)     # (1, P)
            win = (keys == cmin) & cov                      # (KCC, P)
            upd = cmin < kacc
            outs = []
            for d, rd in enumerate((r0, r1, r2, r3)):
                # attr columns carry attr*inv_area (build_table): the raw
                # edge values are the barycentric weights directly
                cd = (e0 * col(14 + d) + e1 * col(14 + D + d)
                      + e2 * col(14 + 2 * D + d))
                cd = jnp.where(win, cd, 0.0)
                cdm = jnp.sum(cd, axis=0, keepdims=True)    # (1, P)
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


def _make_kernel_flat(tile_h: int, tile_w: int, Kb: int, kcc: int = KCC,
                      u8: bool = False, opaque: bool = False,
                      z_clip: bool = True, tex_dims=None,
                      tex_resolve: bool = False, tex_nw: int = 8,
                      tex_split: bool = False,
                      resident_out: bool = False, mxu: int = 0,
                      mega: int = 0, wf: int = 0,
                      tex_dyn: bool = False, out8: bool = False,
                      ktail: int = 0, tex_when: int = 0,
                      tex_skip: bool = False):
    """Flat-bins variant: triangle ids come straight from the sorted pair
    array (two SMEM blocks selected by scalar-prefetched block index), not
    from a pre-gathered (NT, K) bins array.  Chunk-remainder reads spill
    into the next tile's run — harmless: a triangle covering a pixel of
    tile t has t inside its AABB, so it also sits in t's own run at a
    smaller slot and wins any tie (see raster3d.bin_triangles_flat).

    ``u8=True`` fuses the video-path quantisation into the epilogue: the
    single output is RGBA packed into one i32 per pixel (r | g<<8 | b<<16
    | a<<24, each clip(v*255, 0, 255) truncated) with the packed
    background (scalar slot 5*NT) filled in for sky pixels, and no keys
    output.  (Output-byte savings turned out NOT to move device time —
    the kernel is VPU-compute-bound, see ROADMAP — but u8 frames are the
    encoder deliverable, so the fused quantise stays.)

    ``opaque=True`` (u8 only) drops the alpha-attribute accumulation from
    the chunk walk (~11% of its vector ops) and emits a=255; valid when
    every vertex alpha is 1, e.g. opaque meshes on the video path.

    ``tex_dims=(th, tw)`` is the textured video path: the walk carries
    THREE attributes [u*w^-1, v*w^-1, w^-1] (affine: [u, v, 1]) and the
    epilogue resolves the winner's texel INDEX directly —
    idx = clip(int(v*th)) * tw + clip(int(u*tw)), sky = -1 — as the
    single i32 output plane.  The caller does ONE packed-u32 texel
    gather per pixel instead of four f32 channel gathers (the ~4 ms
    per-frame gather was the textured path's dominant cost, ROADMAP).
    Same clamped-nearest semantics as render_textured_pallas's XLA
    epilogue (reference DrawTexture family, cpp:560-573).

    ``tex_resolve=True`` (with tex_dims) fetches the texels IN-KERNEL
    instead of emitting indices: the packed-i32 texture rides along as a
    VMEM-resident input laid out (th*bpr, 128) (bpr = ceil(tw/128) lane
    blocks per texture row), and the epilogue resolves each pixel through
    a per-tile FOOTPRINT of ``tex_nw`` 128-texel windows: window w sits
    at texture row v0 + w//BW, lane-block ub0 + w%BW, where (v0, ub0) is
    the min corner of the tile's hit-pixel UV bbox and BW (blocks per
    row, so NW//BW rows) adapts per tile to the bbox aspect — all scalar
    arithmetic on vector-min/max reductions.  Per-pixel fetches are
    Mosaic ``tpu.dynamic_gather`` ops along lanes (constraint: operand
    lane dim must be exactly 128 — tools/exp_dyngather.py), with the
    (1, P)<->(P/128, 128) moves done by aligned lane slices + sublane
    concat one way and masked sublane sum-reduces back (a straight
    slice+lane-concat of sublane rows fails layout: exp_dyngather2).
    Pixels whose UV falls outside the tile's footprint (footprint
    overflow: high UV-frequency tiles) are left for the caller: output 2
    carries their padded-layout texel index (>= 0) so an XLA gather can
    finish JUST those, -2 = resolved here, -1 = sky.  Output 1 is the
    packed rgba plane with bg filled for sky and 0 for unresolved.

    ``mxu`` (table from build_table_mxu) evaluates the chunk's edge/z/
    attr planes with ONE (q*kcc, 4) x (4, P) matmul on the MXU instead
    of ~2(4+D) broadcast-FMA VPU ops (the walk is VPU-compute-bound,
    ROADMAP).  1 = precision HIGHEST (6-pass bf16, near-f32: +-1 u8
    quantisation slips vs the FMA walk).  2 = DEFAULT (single bf16
    pass) is a MEASUREMENT-ONLY speed bound: bf16 rounds the pixel
    COORDINATES themselves (spacing 8 at x in [1024, 2048)), moving
    coverage boundaries by multiple pixels at 1080p — never ship it.

    ``mega`` = TPG > 0 (u8 only; forces resident-out stores): each grid
    program walks TPG CONSECUTIVE tiles with an in-kernel fori — the
    per-program fixed cost (~0.5 ms/frame at the champion's 2040
    programs, exp_r3_fatframes zero-counts floor) amortises over TPG
    tiles.  Consecutive tiles' runs are contiguous in the sorted pair
    array, so the two scalar-prefetched SMEM id blocks are windowed per
    PROGRAM (block index of the program's FIRST tile; per-tile offsets
    made window-relative by the caller) and a program whose TPG runs
    exceed the 2*Kb window raises the host-side overflow flag
    (raster3d.mega_window_overflow) -> callers fall back.  Bit-exact vs
    the grid kernel: same chunk math, same tie order, same stores.

    ``wf`` = tiles per program for the WHOLE-FRAME DMA design (u8 only;
    forces resident-out): like mega, each program fori-loops ``wf``
    consecutive tiles, but the two id blocks are fetched by an explicit
    in-kernel async copy from the HBM-resident sorted array into SMEM
    scratch, re-issued only when the tile's block index advances.  This
    removes the mega design's per-PROGRAM window constraint entirely
    (each tile sees the 2-block window anchored at its OWN start block,
    the grid kernel's invariant) — so wf carries NO extra overflow
    condition and Kb stays at the grid champion's value while the
    program count drops arbitrarily.  Motivation: exp_r4_megaprod
    measured the SMEM window blowup eating the mega win beyond TPG=8
    (mega=120/Kb=8192: 1.499 ms vs mega=8/Kb=1024: 1.480)."""
    P = tile_h * tile_w

    def kernel(scal_ref, blk0_ref, blk1_ref, table_ref, keys_ref, rgba_ref,
               rows_s, tex_ref=None, tile_i=None, nt_tiles=None,
               store_i=None, acc_s=None):
        if tile_i is None:
            i = pl.program_id(0)
            nt = pl.num_programs(0)
        else:
            i = tile_i          # mega mode: tile index from the loop
            nt = nt_tiles
        # mega tex mode stores into a per-program (mega, 1, P) out block
        # at the LOCAL tile index (the u8 mega path stores into the
        # whole-frame resident block at the GLOBAL index instead)
        si = store_i
        count = scal_ref[i]
        ox = scal_ref[nt + i]
        oy = scal_ref[2 * nt + i]
        woff = scal_ref[4 * nt + i]

        p_idx = lax.broadcasted_iota(jnp.int32, (1, P), 1)
        x1 = (ox + p_idx % tile_w).astype(jnp.float32)
        y1 = (oy + p_idx // tile_w).astype(jnp.float32)

        nacc = 3 if (tex_dims or (u8 and opaque)) else 4
        if mxu:
            # pixel-plane matrix [x; y; 1; 0]: lane 4q+3 of every table
            # row is 0, so the pad row contributes nothing
            P4 = jnp.concatenate(
                [x1, y1, jnp.ones((1, P), jnp.float32),
                 jnp.zeros((1, P), jnp.float32)], axis=0)      # (4, P)
            nq = 4 + nacc
            prec = (lax.Precision.HIGHEST if mxu == 1
                    else lax.Precision.DEFAULT)

        def make_body(ck, base):
            """Chunk-walk body over (ck, P) slot chunks whose run slots
            start at ``base`` (``ktail`` walks the run remainder in
            smaller chunks — same math, same slot ids, so the min-reduce
            is bit-identical; slots past the run spill into the next
            tile's run and can only LOSE ties, see class docstring)."""
            slot0 = lax.broadcasted_iota(jnp.int32, (ck, P), 0)
            if not mxu:
                X = jnp.broadcast_to(x1, (ck, P))
                Y = jnp.broadcast_to(y1, (ck, P))

            def body(c, carry):
                kacc, rs = carry[0], carry[1:]
                # unrolled constant-index copies beat a count-bounded
                # fori_loop here (measured 242 vs 234 fps at 1080p/10k —
                # per-iteration loop overhead exceeds the ~40% copy
                # savings)
                for j in range(ck):
                    idx = woff + base + c * ck + j
                    p0 = blk0_ref[0, 0, jnp.minimum(idx, Kb - 1)]
                    # clamp keeps reads in-bounds even when a run
                    # overflows the two-block window (callers see the
                    # overflow flag)
                    p1 = blk1_ref[0, 0, jnp.clip(idx - Kb, 0, Kb - 1)]
                    tid = (jnp.where(idx < Kb, p0, p1)
                           & ((1 << IDX_BITS) - 1))
                    rows_s[pl.ds(j, 1), :] = table_ref[0, pl.ds(tid, 1),
                                                       :]
                rows = rows_s[pl.ds(0, ck), :]

                def col(j):
                    return rows[:, j:j + 1]

                if mxu:
                    # per-quantity (kcc, 4) x (4, P) dots: rows carry
                    # affine triples at lanes 4q..4q+2 (build_table_mxu).
                    # A single (nq*kcc, 4) x (4, P) dot over a
                    # sublane-concat of the slabs is ~nq-fold fewer MXU
                    # passes, but Mosaic's remote compiler CRASHES on any
                    # sublane concatenate feeding dot_general
                    # (tools/exp_r4_mxu_bisect.py 2026-08-18: E/E2 fail,
                    # E1/E3/F compile+run) — so each quantity gets its
                    # own dot on the lane-sliced LHS
                    V = [lax.dot_general(
                            rows[:, 4 * q:4 * (q + 1)], P4,
                            (((1,), (0,)), ((), ())),
                            precision=prec,
                            preferred_element_type=jnp.float32)
                         for q in range(nq)]               # nq x (ck, P)
                    e0, e1, e2, zz = V[0], V[1], V[2], V[3]
                else:
                    e0 = col(0) * X + col(1) * Y + col(2)
                    e1 = col(3) * X + col(4) * Y + col(5)
                    e2 = col(6) * X + col(7) * Y + col(8)
                    zz = e0 * col(9) + e1 * col(10) + e2 * col(11)
                m = jnp.minimum(jnp.minimum(e0, e1), e2)
                if z_clip:
                    cov = (m >= 0.0) & (zz >= 0.0) & (zz <= 1.0)
                else:
                    # caller verified every vertex z in [0, 1] (see
                    # render_gouraud_pallas z_clip=False): interior zz is
                    # a convex combination, and int truncation-toward-
                    # zero keeps ulp spill inside [0, Z_LEVELS]
                    cov = m >= 0.0
                zq = (zz * Z_LEVELS).astype(jnp.int32)
                ids = base + c * ck + slot0
                keys = jnp.where(cov, (zq << IDX_BITS) | ids,
                                 jnp.int32(SKY_KEY))

                cmin = jnp.min(keys, axis=0, keepdims=True)
                win = (keys == cmin) & cov
                upd = cmin < kacc
                outs = []
                for d, rd in enumerate(rs):
                    if mxu:
                        cd = V[4 + d]
                    else:
                        cd = (e0 * col(14 + d) + e1 * col(14 + D + d)
                              + e2 * col(14 + 2 * D + d))
                    cd = jnp.where(win, cd, 0.0)
                    cdm = jnp.sum(cd, axis=0, keepdims=True)
                    outs.append(jnp.where(upd, cdm, rd))
                return (jnp.where(upd, cmin, kacc), *outs)
            return body

        sky = jnp.full((1, P), SKY_KEY, jnp.int32)
        zero = jnp.zeros((1, P), jnp.float32)
        if ktail:
            # full kcc-chunks, then the run remainder in ktail-chunks:
            # kcc=32 pads the mean ~50-pair run by ~12 never-useful
            # slots; the small-tail walk trims that padding while the
            # full chunks keep the big-chunk machinery amortisation
            nfull = count // kcc
            rem = count - nfull * kcc
            res = lax.fori_loop(0, nfull, make_body(kcc, 0),
                                (sky,) + (zero,) * nacc)
            res = lax.fori_loop(0, (rem + ktail - 1) // ktail,
                                make_body(ktail, nfull * kcc), res)
        else:
            nchunks = (count + kcc - 1) // kcc
            res = lax.fori_loop(0, nchunks, make_body(kcc, 0),
                                (sky,) + (zero,) * nacc)
        kacc, rs = res[0], res[1:]

        if tex_dims:
            th_t, tw_t = tex_dims
            # same op structure as the XLA epilogue in
            # render_textured_pallas: guarded divide, *dim, truncate,
            # clamp (clamped-nearest; negative casts clamp to 0)
            denom = rs[2]
            safe = jnp.where(denom != 0.0, denom, 1.0)
            ui = jnp.clip((rs[0] / safe * tw_t).astype(jnp.int32),
                          0, tw_t - 1)
            vi = jnp.clip((rs[1] / safe * th_t).astype(jnp.int32),
                          0, th_t - 1)
            if not tex_resolve:
                idx_out = jnp.where(kacc != jnp.int32(SKY_KEY),
                                    vi * tw_t + ui, jnp.int32(-1))
                if si is None:
                    keys_ref[0] = idx_out
                else:
                    keys_ref[pl.ds(si, 1), 0] = idx_out
                return
            bpr = (tw_t + 127) // 128
            n_sub = P // 128
            NW = tex_nw

            def tex_epilogue():
                hit1 = kacc != jnp.int32(SKY_KEY)
                big = jnp.int32(1 << 20)
                ub1 = ui // 128
                v0 = jnp.minimum(jnp.min(jnp.where(hit1, vi, big)),
                                 th_t - 1)
                ub0 = jnp.minimum(jnp.min(jnp.where(hit1, ub1, big)),
                                  bpr - 1)
                bw = jnp.clip(jnp.max(jnp.where(hit1, ub1, -1)) - ub0 + 1,
                              1, NW)
                fh = NW // bw
                if tex_split:
                    # bimodal-v footprint: the bench mesh's miss tiles are
                    # almost all tiles whose winner surface mixes two
                    # v-clusters (ring band crossing a sphere, silhouette
                    # grazing) — a SINGLE rect anchored at v0 misses the
                    # far cluster.  When the v spread exceeds the window
                    # rows, split them between two clusters anchored at
                    # vmin and vmax (host sim /tmp/fp_sim.py: NW=32+split
                    # resolves ~100% vs 95-99% single-rect; all misses are
                    # v-misses since bpr blocks always fit bw).  With
                    # spread <= fh this degenerates to the single rect
                    # bit-for-bit (fhA = fh, cluster B empty).
                    vmaxs = jnp.max(jnp.where(hit1, vi, -1))
                    single = (vmaxs - v0 + 1) <= fh
                    fhA = jnp.where(single, fh, fh // 2)
                    fhB = fh - fhA
                    vB0 = jnp.clip(vmaxs - fhB + 1, 0, th_t - 1)
                else:
                    fhA = fh
                    vB0 = jnp.int32(0)

                def to_sub(v):
                    return jnp.concatenate(
                        [v[:, k * 128:(k + 1) * 128] for k in range(n_sub)],
                        axis=0)

                vi_s = to_sub(vi)
                ui_s = to_sub(ui)
                # i1 vectors can't ride the slice+concat (invalid vreg
                # cast); move the mask as i32
                hit_s = to_sub(hit1.astype(jnp.int32)) != 0
                dvA = vi_s - v0
                du = ui_s // 128 - ub0
                lane = ui_s % 128
                if tex_split:
                    # window rows [0, fhA) anchor at v0 (cluster A), rows
                    # [fhA, fh) anchor at vB0 (cluster B); a pixel in both
                    # clusters' overlap resolves through A
                    dvB = vi_s - vB0
                    useA = (dvA >= 0) & (dvA < fhA)
                    useB = (dvB >= 0) & (dvB < fh - fhA) & ~useA
                    dv = jnp.where(useA, dvA, fhA + dvB)
                    in_v = useA | useB
                else:
                    dv = dvA
                    in_v = (dvA >= 0) & (dvA < fh)
                blk = dv * bw + du
                resolved = hit_s & in_v & (du >= 0) & (du < bw)

                def wstep(w, acc):
                    wrow = w // bw
                    if tex_split:
                        wv = jnp.where(wrow < fhA, v0 + wrow,
                                       vB0 + (wrow - fhA))
                    else:
                        wv = v0 + wrow
                    off = jnp.clip(wv * bpr + ub0 + w % bw,
                                   0, th_t * bpr - 1)
                    row = tex_ref[pl.ds(off, 1), :]          # (1, 128)
                    g = jnp.take_along_axis(
                        jnp.broadcast_to(row, (n_sub, 128)), lane, axis=1)
                    return jnp.where(blk == w, g, acc)

                acc = jnp.zeros((n_sub, 128), jnp.int32)
                if tex_when:
                    # grouped PREDICATED unroll: windows run in groups of
                    # ``tex_when``, each group wrapped in a pl.when on
                    # whether ANY resolved pixel still needs a window at or
                    # past the group start.  Same skip argument as tex_dyn
                    # (every consumed acc position has blk < w_need, so
                    # skipped groups only differ at never-consumed
                    # positions — bit-exact), but the group INTERIOR stays a
                    # static unroll, so the row reads keep the pipelining
                    # the per-iteration fori serialised (tex_dyn measured
                    # 3.51 vs 3.22 ms/frame, ROADMAP).  acc lives in a VMEM
                    # scratch because pl.when has no carried results.
                    w_need = jnp.max(jnp.where(resolved, blk,
                                               jnp.int32(-1))) + 1
                    acc_s[...] = acc
                    for g0 in range(0, NW, tex_when):
                        @pl.when(w_need > g0)
                        def _(g0=g0):
                            a = acc_s[...]
                            for w in range(g0, min(g0 + tex_when, NW)):
                                a = wstep(jnp.int32(w), a)
                            acc_s[...] = a
                    acc = acc_s[...]
                elif tex_dyn:
                    # per-tile DYNAMIC window count: w_need is the exact
                    # supremum of windows any resolved pixel reads (blk <
                    # w_need by construction), so iterations w >= w_need
                    # only touch acc at never-consumed positions — skipping
                    # them is bit-exact.  Most tiles' hit-UV bboxes span far
                    # fewer than NW windows (mean ~6 of 16 on the rotating
                    # bench mesh, exp_fp_hist.py), so the static unroll pays
                    # ~NW/w_need more row reads + lane gathers than needed.
                    w_need = jnp.max(jnp.where(resolved, blk,
                                               jnp.int32(-1))) + 1
                    acc = lax.fori_loop(0, w_need, wstep, acc)
                else:
                    for w in range(NW):
                        acc = wstep(jnp.int32(w), acc)

                bgp = scal_ref[5 * nt]
                if out8:
                    # sublane-major (n_sub, 128) outputs: the selects run on
                    # the to_sub forms that already exist (hit_s, vi_s,
                    # ui_s, acc, resolved), so BOTH from_sub masked
                    # sum-reduce conversions disappear AND the out array is
                    # born in XLA's native T(8,128) layout (same win as the
                    # flat path's out8, see that branch)
                    packed_out = jnp.where(hit_s,
                                           jnp.where(resolved, acc, 0), bgp)
                    fbidx_out = jnp.where(
                        hit_s, jnp.where(resolved, jnp.int32(-2),
                                         vi_s * (bpr * 128) + ui_s),
                        jnp.int32(-1))
                    if si is None:
                        keys_ref[0] = packed_out
                        rgba_ref[0] = fbidx_out
                    else:
                        keys_ref[pl.ds(si, 1)] = packed_out[None]
                        rgba_ref[pl.ds(si, 1)] = fbidx_out[None]
                    return
                i0 = lax.broadcasted_iota(jnp.int32, (n_sub, 128), 0)

                def from_sub(v):
                    rows_1 = [jnp.sum(jnp.where(i0 == k, v, 0), axis=0,
                                      keepdims=True) for k in range(n_sub)]
                    return jnp.concatenate(rows_1, axis=1)

                acc1 = from_sub(acc)
                res1 = from_sub(resolved.astype(jnp.int32)) != 0
                packed_out = jnp.where(hit1, jnp.where(res1, acc1, 0), bgp)
                fbidx_out = jnp.where(
                    hit1, jnp.where(res1, jnp.int32(-2),
                                    vi * (bpr * 128) + ui),
                    jnp.int32(-1))
                if si is None:
                    keys_ref[0] = packed_out
                    rgba_ref[0] = fbidx_out
                else:
                    keys_ref[pl.ds(si, 1), 0] = packed_out
                    rgba_ref[pl.ds(si, 1), 0] = fbidx_out

            if tex_skip:
                # EMPTY-TILE SHORTCUT: a tile with count == 0 walks no
                # chunks, so kacc stays SKY everywhere and the epilogue
                # provably produces (bgp, -1) — skip the whole footprint
                # resolve (to_sub moves, NW window walks, reductions)
                # behind ONE branch.  Unlike the per-window tex_when
                # branches this costs a single scf.if on a path where
                # the savings are total, not marginal.
                oshape = (n_sub, 128) if out8 else (1, P)
                bgp0 = scal_ref[5 * nt]

                @pl.when(count == 0)
                def _():
                    pk0 = jnp.full(oshape, bgp0, jnp.int32)
                    fb0 = jnp.full(oshape, -1, jnp.int32)
                    if si is None:
                        keys_ref[0] = pk0
                        rgba_ref[0] = fb0
                    elif out8:
                        keys_ref[pl.ds(si, 1)] = pk0[None]
                        rgba_ref[pl.ds(si, 1)] = fb0[None]
                    else:
                        keys_ref[pl.ds(si, 1), 0] = pk0
                        rgba_ref[pl.ds(si, 1), 0] = fb0

                @pl.when(count != 0)
                def _():
                    tex_epilogue()
            else:
                tex_epilogue()
            return
        elif u8:
            bgp = scal_ref[5 * nt]

            def q(v):
                return jnp.clip(v * 255.0, 0.0, 255.0).astype(jnp.int32)

            a8 = ((jnp.full((1, P), 255, jnp.int32) << 24) if opaque
                  else (q(rs[3]) << 24))
            packed = q(rs[0]) | (q(rs[1]) << 8) | (q(rs[2]) << 16) | a8
            out = jnp.where(kacc != jnp.int32(SKY_KEY), packed, bgp)
            if resident_out:
                # whole-frame out block (index map pinned to 0): the
                # block stays VMEM-resident across every grid step and
                # writes back ONCE, so the per-program out-block swap
                # machinery disappears; each program stores its own
                # tile row at a dynamic leading index
                if out8:
                    # (nt, P//128, 128) out: the tile's P packed pixels
                    # land sublane-major, so the array already has XLA's
                    # native T(8,128) layout — without this the
                    # (nt, 1, P) T(1,128) pallas out pays a relayout
                    # copy before the detile reshape (0.021 ms/frame at
                    # the 1080p champion, exp_r4_champprof2 copy.42)
                    rows8 = jnp.concatenate(
                        [out[:, k * 128:(k + 1) * 128]
                         for k in range(P // 128)], axis=0)
                    keys_ref[pl.ds(i, 1)] = rows8[None]
                else:
                    keys_ref[pl.ds(i, 1), 0] = out
            else:
                keys_ref[0] = out
        else:
            keys_ref[0] = kacc
            rgba_ref[0] = jnp.concatenate(list(rs), axis=0)

    if tex_resolve:
        if mega:
            def kernel_tex_mega(scal_ref, blk0_ref, blk1_ref, table_ref,
                                tex_ref, packed_ref, fbidx_ref, rows_s,
                                acc_s=None):
                p = pl.program_id(0)
                nt = pl.num_programs(0) * mega

                def tile_body(t, acc):
                    kernel(scal_ref, blk0_ref, blk1_ref, table_ref,
                           packed_ref, fbidx_ref, rows_s, tex_ref=tex_ref,
                           tile_i=p * mega + t, nt_tiles=nt, store_i=t,
                           acc_s=acc_s)
                    return acc
                lax.fori_loop(0, mega, tile_body, jnp.int32(0))
            return kernel_tex_mega

        def kernel_tex(scal_ref, blk0_ref, blk1_ref, table_ref, tex_ref,
                       packed_ref, fbidx_ref, rows_s, acc_s=None):
            return kernel(scal_ref, blk0_ref, blk1_ref, table_ref,
                          packed_ref, fbidx_ref, rows_s, tex_ref=tex_ref,
                          acc_s=acc_s)
        return kernel_tex
    if wf:
        assert u8 and resident_out and not tex_dims and not mega, \
            "whole-frame DMA loop is wired for the resident-out u8 path"

        def kernel_wf(scal_ref, ids_any, table_ref, packed_ref,
                      rows_s, id0, id1, sem0, sem1):
            p = pl.program_id(0)
            nt = pl.num_programs(0) * wf

            def tile_body(t, cur_blk):
                ti = p * wf + t
                blk = scal_ref[3 * nt + ti]

                @pl.when(blk != cur_blk)
                def _():
                    # window advanced: refresh both SMEM id blocks from
                    # the HBM-resident sorted array (~once per
                    # Kb/mean_count tiles; the BlockSpec machinery this
                    # replaces skipped unchanged indices the same way)
                    c0 = pltpu.make_async_copy(
                        ids_any.at[pl.ds(blk, 1)], id0, sem0)
                    c1 = pltpu.make_async_copy(
                        ids_any.at[pl.ds(blk + 1, 1)], id1, sem1)
                    c0.start()
                    c1.start()
                    c0.wait()
                    c1.wait()
                kernel(scal_ref, id0, id1, table_ref, packed_ref, None,
                       rows_s, tile_i=ti, nt_tiles=nt)
                return blk
            lax.fori_loop(0, wf, tile_body, jnp.int32(-1))
        return kernel_wf
    if mega:
        assert u8 and resident_out and not tex_dims, \
            "mega loop is wired for the resident-out u8 video path"

        def kernel_mega(scal_ref, blk0_ref, blk1_ref, table_ref,
                        packed_ref, rows_s):
            p = pl.program_id(0)
            nt = pl.num_programs(0) * mega

            def tile_body(t, acc):
                kernel(scal_ref, blk0_ref, blk1_ref, table_ref,
                       packed_ref, None, rows_s,
                       tile_i=p * mega + t, nt_tiles=nt)
                return acc
            lax.fori_loop(0, mega, tile_body, jnp.int32(0))
        return kernel_mega
    if u8 or tex_dims:
        def kernel_u8(scal_ref, blk0_ref, blk1_ref, table_ref, packed_ref,
                      rows_s):
            return kernel(scal_ref, blk0_ref, blk1_ref, table_ref,
                          packed_ref, None, rows_s)
        return kernel_u8
    return kernel



@functools.partial(jax.jit,
                   static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                                   15, 16, 17, 18, 19))
def raster_tiles_flat(sorted_pad, table, scalars, nt: int, tile_h: int,
                      tile_w: int, Kb: int, interpret: bool = False,
                      kcc: int = KCC, tiles_per_frame: int = 0,
                      u8: bool = False, opaque: bool = False,
                      z_clip: bool = True, tex_dims=None,
                      resident_out: bool = False, mxu: int = 0,
                      mega: int = 0, wf: int = 0, out8: bool = False,
                      ktail: int = 0):
    """Flat-bins kernel launch.  sorted_pad: (Spad,) i32 packed pairs from
    bin_triangles_flat (multi-frame: frames' arrays concatenated, with the
    scalar block indices made absolute by the caller); scalars: (5*NT,)
    i32 = [counts | ox | oy | start_block | start_offset].  The two SMEM
    blocks per tile re-DMA only when the block index advances (~every
    Kb/mean_count tiles), so id traffic is ~the sorted array size per
    frame, not NT*Kb.  ``tiles_per_frame`` selects each frame's table
    block when batching B frames in one launch (nt = B * tiles_per_frame).
    """
    P = tile_h * tile_w
    assert mega == 0 or (u8 and not tex_dims), \
        "mega loop is wired for the u8 video path"
    assert not out8 or (u8 and resident_out and not wf and not tex_dims), \
        "out8 is wired for the resident-out u8 video path"
    assert not (ktail and mxu), "ktail walks the FMA body only"
    nblocks = sorted_pad.shape[0] // Kb
    blocks = sorted_pad.reshape(nblocks, 1, Kb)
    if table.ndim == 2:
        table = table[None]
    tpf = tiles_per_frame or nt
    if wf:
        # whole-frame DMA design (see _make_kernel_flat wf): ids stay in
        # HBM (ANY) and each tile DMAs its 2-block window into SMEM
        # scratch on demand — no BlockSpec id windows, grid collapses to
        # nt // wf programs with the GRID kernel's scalar layout and
        # overflow conditions (none beyond counts <= Kb).
        assert u8 and not mega and not tex_dims
        assert nt % wf == 0 and tpf % wf == 0, (nt, tpf, wf)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt // wf,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, table.shape[1], ROW_W),
                             lambda i, s, _m=wf, _t=tpf:
                             (i * _m // _t, 0, 0)),
            ],
            out_specs=[pl.BlockSpec((nt, 1, P), lambda i, s: (0, 0, 0))],
            scratch_shapes=[
                pltpu.VMEM((kcc, ROW_W), jnp.float32),
                pltpu.SMEM((1, 1, Kb), jnp.int32),
                pltpu.SMEM((1, 1, Kb), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )
        packed = pl.pallas_call(
            _make_kernel_flat(tile_h, tile_w, Kb, kcc, u8=True,
                              opaque=opaque, z_clip=z_clip,
                              resident_out=True, mxu=mxu, wf=wf,
                              ktail=ktail),
            out_shape=[jax.ShapeDtypeStruct((nt, 1, P), jnp.int32)],
            grid_spec=grid_spec,
            interpret=interpret,
        )(scalars, blocks, table)[0]
        return packed
    if mega:
        # one program per TPG consecutive tiles: id window + table block
        # selected by the program's FIRST tile (the caller made per-tile
        # offsets window-relative and checked the 2*Kb window demand)
        assert nt % mega == 0 and tpf % mega == 0, (nt, tpf, mega)
        resident_out = True
        grid = nt // mega

        def blk_map(i, s, d=0, _m=mega, _n=nt):
            return (s[3 * _n + i * _m] + d, 0, 0)

        def tab_map(i, s, _m=mega, _t=tpf):
            return (i * _m // _t, 0, 0)
    else:
        grid = nt

        def blk_map(i, s, d=0, _n=nt):
            return (s[3 * _n + i] + d, 0, 0)

        def tab_map(i, s, _t=tpf):
            return (i // _t, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1, Kb), blk_map,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Kb), functools.partial(blk_map, d=1),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, table.shape[1], ROW_W), tab_map),
        ],
        out_specs=(
            [(pl.BlockSpec((nt, P // 128, 128) if out8 else (nt, 1, P),
                           lambda i, s: (0, 0, 0))
              if resident_out else
              pl.BlockSpec((1, 1, P), lambda i, s: (i, 0, 0)))]
            if (u8 or tex_dims) else
            [pl.BlockSpec((1, 1, P), lambda i, s: (i, 0, 0)),
             pl.BlockSpec((1, D, P), lambda i, s: (i, 0, 0))]),
        scratch_shapes=[
            pltpu.VMEM((kcc, ROW_W), jnp.float32),
        ],
    )
    if u8 or tex_dims:
        packed = pl.pallas_call(
            _make_kernel_flat(tile_h, tile_w, Kb, kcc, u8=u8,
                              opaque=opaque, z_clip=z_clip,
                              tex_dims=tex_dims,
                              resident_out=resident_out, mxu=mxu,
                              mega=mega, out8=out8, ktail=ktail),
            out_shape=[jax.ShapeDtypeStruct(
                (nt, P // 128, 128) if out8 else (nt, 1, P), jnp.int32)],
            grid_spec=grid_spec,
            interpret=interpret,
        )(scalars, blocks, blocks, table)[0]
        return packed
    keys, rgba = pl.pallas_call(
        _make_kernel_flat(tile_h, tile_w, Kb, kcc, z_clip=z_clip, mxu=mxu,
                          ktail=ktail),
        out_shape=(
            jax.ShapeDtypeStruct((nt, 1, P), jnp.int32),
            jax.ShapeDtypeStruct((nt, D, P), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, blocks, blocks, table)
    return keys, rgba


@functools.partial(jax.jit,
                   static_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                                   15, 16, 17, 18, 19, 20, 21))
def raster_tiles_tex(sorted_pad, table, scalars, tex_l, nt: int,
                     tile_h: int, tile_w: int, Kb: int,
                     interpret: bool = False, kcc: int = KCC,
                     tiles_per_frame: int = 0, tex_dims=None,
                     tex_nw: int = 8, mxu: int = 0,
                     tex_split: bool = False, mega: int = 0,
                     tex_dyn: bool = False, out8: bool = False,
                     ktail: int = 0, tex_when: int = 0,
                     z_clip: bool = True, tex_skip: bool = False):
    """tex_resolve kernel launch (see _make_kernel_flat): tex_l is the
    packed-i32 texture in (th*bpr, 128) window layout, VMEM-resident
    across all programs.  scalars: (5*NT+1,) with the packed background
    in the last slot (read as scal_ref[5*nt], same as the u8 path).
    ``mega`` loops TPG consecutive tiles per program; the two output
    planes ride per-program (mega, 1, P) blocks stored at the LOCAL
    tile index (two whole-frame resident planes would exceed the 16 MB
    scoped-VMEM default at 1080p).
    Returns (packed (NT, 1, P) i32, fbidx (NT, 1, P) i32)."""
    P = tile_h * tile_w
    if P % 128 or P < 256:
        raise ValueError("tex_resolve needs P % 128 == 0 and P >= 256 "
                         "(Mosaic dynamic_gather lane constraint)")
    assert not (tex_when and tex_dyn), \
        "tex_when (predicated groups) and tex_dyn (fori) are exclusive"
    nblocks = sorted_pad.shape[0] // Kb
    blocks = sorted_pad.reshape(nblocks, 1, Kb)
    if table.ndim == 2:
        table = table[None]
    tpf = tiles_per_frame or nt
    tr, tc = tex_l.shape
    # out8: (n_sub, 128) sublane-major out blocks (see _make_kernel_flat
    # tex epilogue) — the per-tile plane is the same P pixels in the
    # same flat order, so callers' reshape(nt, -1) is unchanged
    obk = (P // 128, 128) if out8 else (1, P)
    if mega:
        assert nt % mega == 0 and tpf % mega == 0, (nt, tpf, mega)
        grid = nt // mega

        def blk_map(i, s, d=0, _m=mega, _n=nt):
            return (s[3 * _n + i * _m] + d, 0, 0)

        def tab_map(i, s, _m=mega, _t=tpf):
            return (i * _m // _t, 0, 0)
        out_specs = [pl.BlockSpec((mega,) + obk, lambda i, s: (i, 0, 0)),
                     pl.BlockSpec((mega,) + obk, lambda i, s: (i, 0, 0))]
    else:
        grid = nt

        def blk_map(i, s, d=0, _n=nt):
            return (s[3 * _n + i] + d, 0, 0)

        def tab_map(i, s, _t=tpf):
            return (i // _t, 0, 0)
        out_specs = [pl.BlockSpec((1,) + obk, lambda i, s: (i, 0, 0)),
                     pl.BlockSpec((1,) + obk, lambda i, s: (i, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((nt,) + obk, jnp.int32),
                 jax.ShapeDtypeStruct((nt,) + obk, jnp.int32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1, Kb), blk_map,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Kb), functools.partial(blk_map, d=1),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, table.shape[1], ROW_W), tab_map),
            pl.BlockSpec((tr, tc), lambda i, s: (0, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=(
            [pltpu.VMEM((kcc, ROW_W), jnp.float32)]
            + ([pltpu.VMEM((P // 128, 128), jnp.int32)] if tex_when
               else [])),
    )
    packed, fbidx = pl.pallas_call(
        _make_kernel_flat(tile_h, tile_w, Kb, kcc, z_clip=z_clip,
                          tex_dims=tuple(tex_dims), tex_resolve=True,
                          tex_nw=tex_nw, tex_split=tex_split, mxu=mxu,
                          mega=mega, tex_dyn=tex_dyn, out8=out8,
                          ktail=ktail, tex_when=tex_when,
                          tex_skip=tex_skip),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, blocks, blocks, table, tex_l)
    return packed, fbidx


def render_binned_pallas_flat(sorted_pad, starts, counts, table, bg,
                              width: int, height: int, tile_w: int,
                              tile_h: int, Kb: int,
                              interpret: bool = False, kcc: int = KCC):
    """Gatherless raster: sorted pair array + starts from
    bin_triangles_flat, table from build_table.  Returns (keys (H, W) i32
    with per-tile BIN SLOT ids, rgba (H, W, D))."""
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    nt = ntx * nty
    dtype = table.dtype

    tids = jnp.arange(nt, dtype=jnp.int32)
    scalars = jnp.concatenate(
        [counts.astype(jnp.int32), tids % ntx * tile_w,
         tids // ntx * tile_h, starts // Kb, starts % Kb])

    keys_l, rgba = raster_tiles_flat(sorted_pad, table, scalars, nt,
                                     tile_h, tile_w, Kb, interpret, kcc)
    return _detile(keys_l.reshape(nt, -1), rgba, nty, ntx, tile_h, tile_w,
                   height, width, bg, dtype)


def _pack_bg(bg):
    """Background RGBA -> one packed i32 (same clip/*255/truncate as the
    kernel epilogue)."""
    q = jnp.clip(jnp.asarray(bg) * 255.0, 0.0, 255.0).astype(jnp.int32)
    return q[0] | (q[1] << 8) | (q[2] << 16) | (q[3] << 24)


def _detile_plane(plane_flat, nty, ntx, tile_h, tile_w, height, width):
    """(NT, P) per-tile scalar planes -> (H, W)."""
    p2 = plane_flat.reshape(nty, ntx, tile_h, tile_w)
    p2 = jnp.moveaxis(p2, 2, 1).reshape(nty * tile_h, ntx * tile_w)
    return p2[:height, :width]


def _detile_packed(packed_flat, nty, ntx, tile_h, tile_w, height, width):
    """(NT, P) packed-u32 tiles -> (H, W, 4) u8 via one bitcast."""
    p2 = _detile_plane(packed_flat, nty, ntx, tile_h, tile_w, height,
                       width)
    return lax.bitcast_convert_type(p2, jnp.uint8)   # (H, W, 4), LE: r first


def render_binned_pallas_flat_u8(sorted_pad, starts, counts, table, bg,
                                 width: int, height: int, tile_w: int,
                                 tile_h: int, Kb: int,
                                 interpret: bool = False, kcc: int = KCC,
                                 opaque: bool = False,
                                 z_clip: bool = True,
                                 resident_out: bool = False,
                                 mxu: int = 0, mega: int = 0,
                                 wf: int = 0, out8: bool = False,
                                 ktail: int = 0, tiled: bool = False):
    """Video-path raster: fused u8 quantise in the kernel epilogue, no
    depth output.  Returns rgba (H, W, 4) uint8 — exactly
    clip(rgba_f32 * 255, 0, 255) truncated, with bg quantised the same
    way for sky pixels.  ``mega`` = tiles per program (see
    _make_kernel_flat); callers must have checked
    raster3d.mega_window_overflow first.  ``wf`` = tiles per program
    with in-kernel id DMA (no window constraint; see _make_kernel_flat).

    ``tiled=True`` skips the device-side detile (the ~0.065 ms/frame
    transpose + reshape chain, exp_r4_champprof3) and returns the
    kernel's per-tile layout (NT, P, 4) uint8 — slot p of tile t is
    pixel (t//ntx*tile_h + p//tile_w, t%ntx*tile_w + p%tile_w); slots
    past the viewport carry whatever the walk rasterised there (crop on
    detile).  Consumers detile on host (media.MediaDetileU8 inside the
    VideoCap encode worker, overlapped with encode)."""
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    nt = ntx * nty

    tids = jnp.arange(nt, dtype=jnp.int32)
    if mega:
        # id window anchored at the program's FIRST tile: per-tile
        # offsets are window-relative (the blk slots of non-first tiles
        # are never read by the block specs but keep the layout uniform)
        prog_first = starts.reshape(-1, mega)[:, :1]        # (NP, 1)
        blk = jnp.broadcast_to(prog_first // Kb,
                               (nt // mega, mega)).reshape(-1)
        woff = starts - blk * Kb
    else:
        blk = starts // Kb
        woff = starts % Kb
    scalars = jnp.concatenate(
        [counts.astype(jnp.int32), tids % ntx * tile_w,
         tids // ntx * tile_h, blk, woff,
         _pack_bg(bg)[None]])

    packed = raster_tiles_flat(sorted_pad, table, scalars, nt, tile_h,
                               tile_w, Kb, interpret, kcc, 0, True, opaque,
                               z_clip, None, resident_out, mxu, mega, wf,
                               out8, ktail)
    if tiled:
        return lax.bitcast_convert_type(packed.reshape(nt, -1),
                                        jnp.uint8)       # (NT, P, 4)
    return _detile_packed(packed.reshape(nt, -1), nty, ntx, tile_h,
                          tile_w, height, width)


def render_binned_pallas_flat_batch_u8(sorted_pads, starts, counts,
                                       tables, bg, width: int, height: int,
                                       tile_w: int, tile_h: int, Kb: int,
                                       interpret: bool = False,
                                       kcc: int = KCC,
                                       opaque: bool = False,
                                       z_clip: bool = True,
                                       mxu: int = 0):
    """Batched u8 raster: B frames in one launch (see
    render_binned_pallas_flat_batch), u8-packed output (see
    render_binned_pallas_flat_u8).  Returns (B, H, W, 4) uint8."""
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    nt = ntx * nty
    Bn, spad = sorted_pads.shape
    nblk = spad // Kb

    tids = jnp.arange(nt, dtype=jnp.int32)
    frame_base = (jnp.arange(Bn, dtype=jnp.int32) * nblk)[:, None]
    scalars = jnp.concatenate([
        counts.reshape(-1).astype(jnp.int32),
        jnp.tile(tids % ntx * tile_w, Bn),
        jnp.tile(tids // ntx * tile_h, Bn),
        (frame_base + starts // Kb).reshape(-1),
        (starts % Kb).reshape(-1),
        _pack_bg(bg)[None],
    ])

    packed = raster_tiles_flat(sorted_pads.reshape(-1), tables, scalars,
                               Bn * nt, tile_h, tile_w, Kb, interpret,
                               kcc, nt, True, opaque, z_clip, None,
                               False, mxu)
    packed = packed.reshape(Bn, nt, -1)
    return jax.vmap(
        lambda p: _detile_packed(p, nty, ntx, tile_h, tile_w, height,
                                 width))(packed)


def render_binned_tex_idx_batch(sorted_pads, starts, counts, tables,
                                width: int, height: int, tile_w: int,
                                tile_h: int, Kb: int, tex_dims,
                                interpret: bool = False, kcc: int = KCC):
    """Batched textured-index raster: B frames in one launch, the kernel
    resolving each pixel to its clamped-nearest texel index (see
    _make_kernel_flat tex_dims; -1 = sky).  Returns (B, H, W) i32 —
    callers follow with ONE packed-u32 texel gather per pixel."""
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    nt = ntx * nty
    Bn, spad = sorted_pads.shape
    nblk = spad // Kb

    tids = jnp.arange(nt, dtype=jnp.int32)
    frame_base = (jnp.arange(Bn, dtype=jnp.int32) * nblk)[:, None]
    scalars = jnp.concatenate([
        counts.reshape(-1).astype(jnp.int32),
        jnp.tile(tids % ntx * tile_w, Bn),
        jnp.tile(tids // ntx * tile_h, Bn),
        (frame_base + starts // Kb).reshape(-1),
        (starts % Kb).reshape(-1),
    ])

    idx = raster_tiles_flat(sorted_pads.reshape(-1), tables, scalars,
                            Bn * nt, tile_h, tile_w, Kb, interpret, kcc,
                            nt, False, False, True, tuple(tex_dims))
    idx = idx.reshape(Bn, nt, -1)
    return jax.vmap(
        lambda p: _detile_plane(p, nty, ntx, tile_h, tile_w, height,
                                width))(idx)


def render_binned_tex_resolve_batch(sorted_pads, starts, counts, tables,
                                    tex_l, bg, width: int, height: int,
                                    tile_w: int, tile_h: int, Kb: int,
                                    tex_dims, interpret: bool = False,
                                    kcc: int = KCC, tex_nw: int = 8,
                                    detile: bool = True, mxu: int = 0,
                                    tex_split: bool = False,
                                    mega: int = 0, tex_dyn: bool = False,
                                    out8: bool = False, ktail: int = 0,
                                    tex_when: int = 0,
                                    z_clip: bool = True,
                                    tex_skip: bool = False):
    """Batched in-kernel-texel raster: B frames in one launch through the
    tex_resolve kernel (texels fetched from the VMEM-resident packed
    texture via per-tile footprint windows).  Returns
    (packed (B, H, W) i32 rgba with bg for sky / 0 for unresolved,
     fbidx (B, H, W) i32: >=0 padded-layout texel index for pixels the
     footprint missed, -2 resolved, -1 sky).  ``detile=False`` returns
    the raw per-tile planes (B, NT, P) instead — callers that patch
    unresolved tiles (tile-compacted fallback gather) merge in tile
    space first and detile after."""
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    nt = ntx * nty
    Bn, spad = sorted_pads.shape
    nblk = spad // Kb

    tids = jnp.arange(nt, dtype=jnp.int32)
    frame_base = (jnp.arange(Bn, dtype=jnp.int32) * nblk)[:, None]
    if mega:
        # per-program id window anchored at the program's first tile
        # (frame-absolute block); per-tile offsets window-relative.
        # mega must divide nt, so programs never straddle frames.
        first = starts.reshape(Bn, nt // mega, mega)[:, :, :1]
        blk = frame_base[:, :, None] + first // Kb        # (B, NP, 1)
        blk = jnp.broadcast_to(blk, (Bn, nt // mega, mega))
        woff = starts - jnp.broadcast_to(
            (first // Kb) * Kb, (Bn, nt // mega, mega)).reshape(Bn, nt)
        blk_col = blk.reshape(-1)
        woff_col = woff.reshape(-1)
    else:
        blk_col = (frame_base + starts // Kb).reshape(-1)
        woff_col = (starts % Kb).reshape(-1)
    scalars = jnp.concatenate([
        counts.reshape(-1).astype(jnp.int32),
        jnp.tile(tids % ntx * tile_w, Bn),
        jnp.tile(tids // ntx * tile_h, Bn),
        blk_col,
        woff_col,
        _pack_bg(bg)[None],
    ])

    packed, fbidx = raster_tiles_tex(
        sorted_pads.reshape(-1), tables, scalars, tex_l, Bn * nt,
        tile_h, tile_w, Kb, interpret, kcc, nt, tuple(tex_dims), tex_nw,
        mxu, tex_split, mega, tex_dyn, out8, ktail, tex_when, z_clip,
        tex_skip)

    if not detile:
        return packed.reshape(Bn, nt, -1), fbidx.reshape(Bn, nt, -1)

    def det(p):
        return _detile_plane(p.reshape(nt, -1), nty, ntx, tile_h,
                             tile_w, height, width)

    return jax.vmap(det)(packed.reshape(Bn, nt, -1)), \
        jax.vmap(det)(fbidx.reshape(Bn, nt, -1))


# -------------------------------------------------------------------- #
# dynrows (round 3): pair-ordered pre-gathered rows.
#
# The flat kernel's per-chunk row gather (one scalar SMEM id read + one
# 1-row VMEM copy per pair) measured ~5.6 us per 1k rows and dominated
# every finer-tile/grouped redesign (ROADMAP round-3 findings).  Here
# prep pre-gathers table rows into SORTED PAIR ORDER
# (rows = take(table, sorted_pad[:cap] & IDX_MASK)) and the kernel walks
# each tile's run with ONE contiguous dynamic (kcc, ROW_W) sublane slice
# per chunk from a frame-resident VMEM block.  The packed-id SMEM blocks
# disappear entirely: slot ids are iota, and tie-break order (ascending
# triangle id within the run) is unchanged, so output is bit-exact vs
# the flat kernel (verified in tools/exp_r3_dynprod.py and
# tests/test_pallas_raster.py).
#
# ``g`` frames of the batch share one program per tile (sublane groups
# of kcc; one tile geometry, per-frame min-reduce via a free
# (g, kcc, P) sublane-split reshape).  EMPIRICAL COMPILE LIMIT: a
# single Pallas operand > 24 MiB fails the TPU compile (bisected in
# exp_r3_dynprod.py), so callers slice the rows batch into
# <= DYNROWS_BATCH_ROWS-row operands.
# -------------------------------------------------------------------- #

DYNROWS_BATCH_ROWS = (24 * 1024 * 1024) // (ROW_W * 4)  # rows / operand


def _make_kernel_dynrows(tile_h: int, tile_w: int, g: int, kcc: int,
                         z_clip: bool = False):
    GK = g * kcc
    P = tile_h * tile_w

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
        x1 = (ox + p_idx % tile_w).astype(jnp.float32)
        y1 = (oy + p_idx // tile_w).astype(jnp.float32)
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
            if z_clip:
                cov = (m >= 0.0) & (zz >= 0.0) & (zz <= 1.0)
            else:
                cov = m >= 0.0
            zq = (zz * Z_LEVELS).astype(jnp.int32)
            ids = c * kcc + slot0
            keys = jnp.where(cov, (zq << IDX_BITS) | ids,
                             jnp.int32(SKY_KEY))

            if g == 1:
                cmin = jnp.min(keys, axis=0, keepdims=True)
                win = (keys == cmin) & cov
                upd = cmin < kacc
                outs = []
                for d, rd in enumerate(rs):
                    cd = (e0 * col(14 + d) + e1 * col(14 + D + d)
                          + e2 * col(14 + 2 * D + d))
                    cdm = jnp.sum(jnp.where(win, cd, 0.0), axis=0,
                                  keepdims=True)
                    outs.append(jnp.where(upd, cdm, rd))
                return (jnp.where(upd, cmin, kacc), *outs)
            kg = keys.reshape(g, kcc, P)
            cmin_g = jnp.min(kg, axis=1)                    # (g, P)
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


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def raster_tiles_dynrows(rows, scalars, nt: int, tile_h: int, tile_w: int,
                         g: int = 1, kcc: int = 16,
                         interpret: bool = False):
    """Dynrows launch for ONE operand group.  rows: (Bn, CAP, ROW_W)
    f32 pair-ordered (Bn * CAP * ROW_W * 4 <= 24 MiB, Bn % g == 0);
    scalars: [counts_q.. | ox | oy | woff_q.. | packed_bg] with
    npg = (Bn/g) * nt entries per part.  Returns (npg, g, P) packed-u8
    i32 tiles (frame q of pair p at [p, q])."""
    Bn = rows.shape[0]
    npg = (Bn // g) * nt
    P = tile_h * tile_w

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
        _make_kernel_dynrows(tile_h, tile_w, g, kcc),
        out_shape=[jax.ShapeDtypeStruct((npg, g, P), jnp.int32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, *([rows] * g))[0]


def render_binned_dynrows_batch_u8(rows, starts, counts, bg, width: int,
                                   height: int, tile_w: int, tile_h: int,
                                   g: int = 1, kcc: int = 16,
                                   interpret: bool = False):
    """Batched u8 video-path raster on pair-ordered rows.

    rows: (B, CAP, ROW_W) f32 from take(table, sorted_pad[:CAP] &
    IDX_MASK); starts/counts: (B, NT).  Slices the batch into operand
    groups of <= DYNROWS_BATCH_ROWS rows (24 MiB Pallas compile limit),
    g frames per program within each group.  Returns (B, H, W, 4) u8,
    bit-exact vs render_binned_pallas_flat_batch_u8(opaque=True,
    z_clip=False)."""
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    nt = ntx * nty
    P = tile_h * tile_w
    Bn, cap = rows.shape[0], rows.shape[1]
    assert g * cap <= DYNROWS_BATCH_ROWS, (g, cap)
    grp = min((DYNROWS_BATCH_ROWS // cap) // g * g, Bn)
    # slices need only be multiples of g (frames per program); a
    # remainder slice smaller than grp is fine (round-3 review: the old
    # Bn % grp == 0 assert rejected e.g. 6-frame batches at grp=4)
    assert grp and Bn % g == 0, (Bn, g, grp)

    tids = jnp.arange(nt, dtype=jnp.int32)
    bgp = _pack_bg(bg)[None]

    outs = []
    for s0 in range(0, Bn, grp):
        sz = min(grp, Bn - s0)
        rsl = lax.slice_in_dim(rows, s0, s0 + sz, axis=0)
        ox = jnp.tile(tids % ntx * tile_w, sz // g)
        oy = jnp.tile(tids // ntx * tile_h, sz // g)
        cs, offs = [], []
        for q in range(g):
            fsel = s0 + jnp.arange(sz // g) * g + q
            cs.append(counts[fsel].reshape(-1))
            offs.append(starts[fsel].reshape(-1))
        scal = jnp.concatenate(
            [jnp.asarray(x, jnp.int32)
             for x in (cs + [ox, oy] + offs + [bgp])])
        out = raster_tiles_dynrows(rsl, scal, nt, tile_h, tile_w, g,
                                   kcc, interpret)
        # (npg, g, P) -> (sz, nt, P) in frame order
        out = out.reshape(sz // g, nt, g, P)
        outs.append(jnp.moveaxis(out, 2, 1).reshape(sz, nt, P))
    packed = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    return jax.vmap(
        lambda p: _detile_packed(p, nty, ntx, tile_h, tile_w, height,
                                 width))(packed)


def render_binned_pallas_flat_batch(sorted_pads, starts, counts, tables,
                                    bg, width: int, height: int,
                                    tile_w: int, tile_h: int, Kb: int,
                                    interpret: bool = False,
                                    kcc: int = KCC):
    """Batched gatherless raster: B frames in ONE kernel launch.

    sorted_pads: (B, Spad) from vmapped bin_triangles_flat; starts/counts:
    (B, NT); tables: (B, F+1, ROW_W).  Frames' sorted arrays concatenate
    along the block axis and the per-tile scalar block indices are made
    absolute (frame_idx * blocks_per_frame + start // Kb); each frame's
    table block is selected by grid position.  Amortises per-op dispatch
    overheads that dominate single-frame prep at ~2 ms scale.
    Returns keys (B, H, W) i32, rgba (B, H, W, D)."""
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    nt = ntx * nty
    Bn, spad = sorted_pads.shape
    nblk = spad // Kb
    dtype = tables.dtype

    tids = jnp.arange(nt, dtype=jnp.int32)
    frame_base = (jnp.arange(Bn, dtype=jnp.int32) * nblk)[:, None]
    scalars = jnp.concatenate([
        counts.reshape(-1).astype(jnp.int32),
        jnp.tile(tids % ntx * tile_w, Bn),
        jnp.tile(tids // ntx * tile_h, Bn),
        (frame_base + starts // Kb).reshape(-1),
        (starts % Kb).reshape(-1),
    ])

    keys_l, rgba = raster_tiles_flat(sorted_pads.reshape(-1), tables,
                                     scalars, Bn * nt, tile_h, tile_w, Kb,
                                     interpret, kcc, nt)
    keys_l = keys_l.reshape(Bn, nt, -1)
    rgba = rgba.reshape(Bn, nt, D, -1)
    return jax.vmap(
        lambda k, r: _detile(k, r, nty, ntx, tile_h, tile_w, height,
                             width, bg, dtype))(keys_l, rgba)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def raster_tiles(bins, table, scalars, nt: int, tile_h: int, tile_w: int,
                 interpret: bool = False, tiles_per_frame: int = 0,
                 kcc: int = KCC):
    """bins: (NT, K) i32 (NO_TRI slots remapped to the table's NaN pad
    row); table: edge-major rows, VMEM-resident — (F_pad, 32) single table
    or (B, F_pad, 32) one per frame, selected by grid position when
    ``tiles_per_frame`` is set (re-DMA'd only at frame boundaries);
    scalars: (3*NT,) i32 = [counts | ox | oy].
    Returns keys (NT, 1, P) i32, rgba (NT, D, P).

    Batching B frames into one launch (NT = B * tiles_per_frame) amortises
    the per-dispatch overheads that dominate at single-frame granularity.
    """
    K = bins.shape[1]
    P = tile_h * tile_w
    bins = bins.reshape(nt, 1, K)   # (1, 1, K) blocks: trailing dims must
    # be (8,128)-divisible or equal the array dims — (1, K) equals.
    if table.ndim == 2:
        table = table[None]
    tpf = tiles_per_frame or nt
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, K), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, table.shape[1], ROW_W),
                         lambda i, s: (i // tpf, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, P), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((1, D, P), lambda i, s: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((kcc, ROW_W), jnp.float32),
        ],
    )
    keys, rgba = pl.pallas_call(
        _make_kernel(tile_h, tile_w, K, kcc),
        out_shape=(
            jax.ShapeDtypeStruct((nt, 1, P), jnp.int32),
            jax.ShapeDtypeStruct((nt, D, P), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, bins, table)
    return keys, rgba


def build_table(A, B, C, zplane_scaled, inv_area, sign, valid, attrs):
    """Edge-major triangle row table for the kernel:
    [A0' B0' C0' | ... | zsc' | sign | ia | attrs*ia*sg], NaN rows for
    invalid triangles plus one NaN pad row (index F) for NO_TRI bin
    slots, padded to ROW_W floats.  The cover sign is PRE-FOLDED into the
    edge coefficients (e' = sg*e), so the kernel's inside test is a bare
    min(e0,e1,e2) >= 0 — three fewer (kcc, P) vector muls per chunk —
    and zsc/attr columns carry a compensating sg so e'-weighted sums are
    unchanged (sg^2 = 1).  inv_area is pre-folded into the attribute
    columns (like zsc) so shading is plain edge-value FMAs."""
    F = A.shape[0]
    As = A * sign[:, None]
    Bs = B * sign[:, None]
    Cs = C * sign[:, None]
    cols = [As[:, 0], Bs[:, 0], Cs[:, 0],
            As[:, 1], Bs[:, 1], Cs[:, 1],
            As[:, 2], Bs[:, 2], Cs[:, 2]]
    table = jnp.stack(cols, axis=1)
    attrs_sc = attrs * (inv_area * sign)[:, None, None]
    table = jnp.concatenate(
        [table, zplane_scaled * sign[:, None], sign[:, None],
         inv_area[:, None], attrs_sc.reshape(F, 3 * D)], axis=1)
    table = jnp.where(valid[:, None], table, jnp.nan).astype(jnp.float32)
    table = jnp.concatenate(
        [table, jnp.full((1, table.shape[1]), jnp.nan, jnp.float32)],
        axis=0)
    return jnp.pad(table, ((0, 0), (0, ROW_W - table.shape[1])))


def build_table_mxu(A, B, C, zplane_scaled, inv_area, sign, valid, attrs):
    """Affine row table for the MXU chunk walk (_make_kernel_flat mxu):
    EVERY per-pixel quantity the walk evaluates — the three sign-folded
    edges, the z plane, and the D attribute planes — is an affine
    function of (x, y), so each row stores 4 + D affine triples
    (a_x, a_y, c, 0) at lanes 4q..4q+3 and the kernel evaluates all of
    them with ONE (q*kcc, 4) x (4, P) matmul per chunk instead of
    ~2(4+D) broadcast-FMA vector ops.

    The z/attr triples PRECOMBINE the per-edge weights
    (a_z = sum_i A_i' * w_i, w = zsc * sign; same for attrs * ia * sign),
    which changes rounding vs the two-step e-then-dot evaluation of the
    default walk: knife-edge z-ties and attribute ulps can differ (see
    tests/test_pallas_raster.py mxu tests).  D=4 fills ROW_W exactly."""
    F = A.shape[0]
    As = A * sign[:, None]
    Bs = B * sign[:, None]
    Cs = C * sign[:, None]
    w_z = zplane_scaled * sign[:, None]                     # (F, 3)
    attrs_sc = attrs * (inv_area * sign)[:, None, None]     # (F, 3, D)
    zero = jnp.zeros((F,), As.dtype)
    cols = []
    for q in range(3):
        cols += [As[:, q], Bs[:, q], Cs[:, q], zero]
    for w in ([w_z] + [attrs_sc[:, :, d] for d in range(D)]):
        cols += [jnp.sum(As * w, axis=1), jnp.sum(Bs * w, axis=1),
                 jnp.sum(Cs * w, axis=1), zero]
    table = jnp.stack(cols, axis=1)                         # (F, 32)
    assert table.shape[1] == ROW_W
    table = jnp.where(valid[:, None], table, jnp.nan).astype(jnp.float32)
    return jnp.concatenate(
        [table, jnp.full((1, ROW_W), jnp.nan, jnp.float32)], axis=0)


def _detile(keys_flat, rgba_flat, nty, ntx, tile_h, tile_w, height, width,
            bg, dtype):
    """(NT, P) keys + (NT, D, P) rgba -> (H, W) + (H, W, D) with bg fill."""
    keys2d = keys_flat.reshape(nty, ntx, tile_h, tile_w)
    keys2d = jnp.moveaxis(keys2d, 2, 1).reshape(nty * tile_h, ntx * tile_w)
    keys2d = keys2d[:height, :width]
    Dn = rgba_flat.shape[1]
    rgba2d = rgba_flat.reshape(nty, ntx, Dn, tile_h, tile_w)
    rgba2d = jnp.transpose(rgba2d, (0, 3, 1, 4, 2))
    rgba2d = rgba2d.reshape(nty * tile_h, ntx * tile_w, Dn)
    rgba2d = rgba2d[:height, :width]
    bgv = jnp.asarray(bg, dtype)
    sky = keys2d == SKY_KEY
    rgba2d = jnp.where(sky[..., None], bgv[None, None, :],
                       rgba2d.astype(dtype))
    return keys2d, rgba2d


def render_binned_pallas_batch(bins, counts, tables, bg,
                               width: int, height: int,
                               tile_w: int, tile_h: int,
                               interpret: bool = False):
    """Batched fused raster: B frames in ONE Pallas launch.

    bins: (B, NT, K) with NO_TRI already remapped to the pad row; counts:
    (B, NT); tables: (B, F+1, ROW_W) from build_table (vmapped).  The grid
    is B*NT tiles; each frame's table block is selected by grid position
    (one extra 1.3 MB DMA per frame boundary).  Per-dispatch/per-stage
    launch overheads amortise across the batch.
    Returns keys (B, H, W) i32, rgba (B, H, W, D)."""
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    Bn, nt, K = bins.shape
    dtype = tables.dtype

    tids = jnp.arange(nt, dtype=jnp.int32)
    ox = jnp.tile(tids % ntx * tile_w, Bn)
    oy = jnp.tile(tids // ntx * tile_h, Bn)
    scalars = jnp.concatenate(
        [counts.reshape(-1).astype(jnp.int32), ox, oy])

    keys_l, rgba = raster_tiles(bins.reshape(Bn * nt, K), tables, scalars,
                                Bn * nt, tile_h, tile_w, interpret, nt)
    keys_l = keys_l.reshape(Bn, nt, -1)
    rgba = rgba.reshape(Bn, nt, D, -1)
    outs = jax.vmap(
        lambda k, r: _detile(k, r, nty, ntx, tile_h, tile_w, height,
                             width, bg, dtype))(keys_l, rgba)
    return outs


def render_binned_pallas(bins, counts, A, B, C, zplane_scaled, inv_area,
                         sign, valid, attrs, bg, width: int, height: int,
                         tile_w: int, tile_h: int, interpret: bool = False,
                         return_ids: bool = False, kcc: int = KCC):
    """Fused raster via the Pallas kernel + XLA pre/post.

    Returns (keys (H, W) int32, rgba (H, W, 4)).  The key id bits are the
    per-tile BIN SLOT unless ``return_ids`` — remapping slots to global
    triangle ids costs a 2M-element gather (~10+ ms on TPU) and only the
    depth bits are consumed by the render paths, so it's off by default."""
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    nt, K = bins.shape
    F = A.shape[0]
    dtype = A.dtype

    table = build_table(A, B, C, zplane_scaled, inv_area, sign, valid,
                        attrs)
    safe = jnp.where(bins == NO_TRI, F, bins)

    tids = jnp.arange(nt, dtype=jnp.int32)
    scalars = jnp.concatenate(
        [counts.astype(jnp.int32), tids % ntx * tile_w,
         tids // ntx * tile_h])

    keys_local, rgba = raster_tiles(safe, table, scalars, nt, tile_h,
                                    tile_w, interpret, 0, kcc)

    kl = keys_local.reshape(nt, -1)
    if return_ids:
        # remap bin-slot ids -> global triangle ids (debug/tooling only)
        slot = kl & ((1 << IDX_BITS) - 1)
        hit = slot != NO_TRI
        gid = jnp.take_along_axis(safe, jnp.minimum(slot, K - 1),
                                  axis=1).astype(jnp.int32)
        keys_g = jnp.where(hit, (kl & ~((1 << IDX_BITS) - 1)) | gid,
                           jnp.int32(SKY_KEY))
    else:
        keys_g = kl

    keys2d = keys_g.reshape(nty, ntx, tile_h, tile_w)
    keys2d = jnp.moveaxis(keys2d, 2, 1).reshape(nty * tile_h,
                                                ntx * tile_w)
    keys2d = keys2d[:height, :width]

    rgba2d = rgba.reshape(nty, ntx, D, tile_h, tile_w)
    rgba2d = jnp.transpose(rgba2d, (0, 3, 1, 4, 2))
    rgba2d = rgba2d.reshape(nty * tile_h, ntx * tile_w, D)
    rgba2d = rgba2d[:height, :width]

    bgv = jnp.asarray(bg, dtype)
    sky = keys2d == SKY_KEY
    rgba2d = jnp.where(sky[..., None], bgv[None, None, :],
                       rgba2d.astype(dtype))
    return keys2d, rgba2d
