#!/usr/bin/env python
"""Round-3 prep-side measurements (XLA only, no Pallas compiles).

Times, per frame, on a 12-frame vmapped batch (matching the production
fused path):
  s_setup   : setup_triangles + edge_coeffs + zsc
  s_table   : build_table on top of setup
  s_emit    : bin emission ops up to (but excluding) the sort
  s_sort200 : lax.sort of the (B, 200k) emission (th8 2x10 spans)
  s_sort240/400: sort scaling for subtile binning ((64,8): 24 slots,
              (32,8): 40 slots per triangle)
  s_search  : searchsorted for starts
  s_binfull : full bin_triangles_flat
  s_prepfull: full production prep (setup+edges+table+bin)
  s_take43k : XLA row gather of 48k table rows (pair-ordered rows
              candidate; decides Pallas-gather-kernel vs XLA take)
  s_sum_packed / s_sum_detiled: checksum cost on (B, NT, P) packed tiles
              vs detile + checksum (bench reduce lever)

Run: nohup python tools/exp_r3_prep.py > /tmp/exp_r3_prep.log 2>&1 &
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402
from libnativecpurenderer_tpu.ops import pallas_raster      # noqa: E402

W, H = 1920, 1080
TW, TH = 128, 8
B = 12
NTX, NTY = W // TW, H // TH
NT = NTX * NTY
P = TW * TH


def checksum(arrs):
    return float(jnp.sum(jnp.stack([jnp.sum(jnp.ravel(a)[:64].astype(
        jnp.float32)) for a in arrs])))


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    attrs = jnp.asarray(colors_np[faces_np], jnp.float32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = jnp.stack([jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                                  jnp.float32) for i in range(B)])
    checksum([mvps])

    def setup(mvp):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        A, Bc, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                    tri["valid"])
        zsc = tri["z"] * ia[:, None]
        return tri, A, Bc, C, ia, sg, vl, zsc

    @jax.jit
    def s_setup(mvps):
        def one(mvp):
            tri, A, Bc, C, ia, sg, vl, zsc = setup(mvp)
            return A, Bc, C, zsc
        return jax.vmap(one)(mvps)

    @jax.jit
    def s_table(mvps):
        def one(mvp):
            tri, A, Bc, C, ia, sg, vl, zsc = setup(mvp)
            return pallas_raster.build_table(A, Bc, C, zsc, ia, sg, vl,
                                             attrs)
        return jax.vmap(one)(mvps)

    def emit_only(mvp, tw, th, sx, sy):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        sxy, valid = tri["sxy"], tri["valid"]
        ntx = (W + tw - 1) // tw
        nty = (H + th - 1) // th
        nt = ntx * nty
        xs, ys = sxy[..., 0], sxy[..., 1]
        x0c = jnp.maximum(jnp.floor(jnp.min(xs, 1) / tw).astype(jnp.int32), 0)
        x1c = jnp.minimum(jnp.floor(jnp.max(xs, 1) / tw).astype(jnp.int32),
                          ntx - 1)
        y0c = jnp.maximum(jnp.floor(jnp.min(ys, 1) / th).astype(jnp.int32), 0)
        y1c = jnp.minimum(jnp.floor(jnp.max(ys, 1) / th).astype(jnp.int32),
                          nty - 1)
        ne = valid & (x0c <= x1c) & (y0c <= y1c)
        dx = jnp.arange(sx, dtype=jnp.int32)
        dy = jnp.arange(sy, dtype=jnp.int32)
        txs = x0c[:, None] + dx[None, :]
        tys = y0c[:, None] + dy[None, :]
        ok = (ne[:, None, None] & (txs[:, None, :] <= x1c[:, None, None])
              & (tys[:, :, None] <= y1c[:, None, None]))
        tid = jnp.where(ok, tys[:, :, None] * ntx + txs[:, None, :], nt)
        F = sxy.shape[0]
        tri_i = jnp.arange(F, dtype=jnp.int32)[:, None, None]
        return ((tid << raster3d.IDX_BITS) | tri_i).reshape(-1)

    @jax.jit
    def s_emit(mvps):
        return jax.vmap(lambda m: emit_only(m, TW, TH, 2, 10))(mvps)

    packed = s_emit(mvps)
    checksum([packed])

    @jax.jit
    def s_sort(p):
        return jax.vmap(lax.sort)(p)

    @jax.jit
    def s_search(ps):
        def one(p):
            tid_sorted = p >> raster3d.IDX_BITS
            return jnp.searchsorted(tid_sorted,
                                    jnp.arange(NT + 1, dtype=jnp.int32))
        return jax.vmap(one)(ps)

    @jax.jit
    def s_binfull(mvps):
        def one(mvp):
            tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
            A, Bc, C, ia, sg, vl = raster3d.edge_coeffs(
                tri["sxy"], tri["z"], tri["valid"])
            return raster3d.bin_triangles_flat(
                tri["sxy"], vl, W, H, TW, TH, 512, 2, 10,
                edges=(A, Bc, C, sg))[0]
        return jax.vmap(one)(mvps)

    @jax.jit
    def s_prepfull(mvps):
        def one(mvp):
            tri, A, Bc, C, ia, sg, vl, zsc = setup(mvp)
            sp, st, ct, ovf = raster3d.bin_triangles_flat(
                tri["sxy"], vl, W, H, TW, TH, 512, 2, 10,
                edges=(A, Bc, C, sg))
            tb = pallas_raster.build_table(A, Bc, C, zsc, ia, sg, vl, attrs)
            return sp, st, ct, tb
        return jax.vmap(one)(mvps)

    tables = s_table(mvps)
    sorted_b = s_sort(packed)
    checksum([tables, sorted_b])

    @jax.jit
    def s_take43k(ps, tbs):
        def one(p, tb):
            tri_sorted = p[:49152] & raster3d.IDX_MASK
            return jnp.take(tb, jnp.minimum(tri_sorted, tb.shape[0] - 1),
                            axis=0)
        return jax.vmap(one)(ps, tbs)

    # sort-with-payload alternative: one extra 32-bit payload word
    @jax.jit
    def s_sort_payload(p):
        def one(x):
            return lax.sort((x, x + 1), num_keys=1)[0]
        return jax.vmap(one)(p)

    rng = jax.random.PRNGKey(0)
    pk240 = jax.random.randint(rng, (B, 240000), 0, 1 << 30, jnp.int32)
    pk400 = jax.random.randint(rng, (B, 400000), 0, 1 << 30, jnp.int32)
    packed8 = jnp.tile(packed, (1, 2))
    tiles_u8 = jax.random.randint(rng, (B, NT, P), -(1 << 31), (1 << 31) - 1,
                                  jnp.int32)

    @jax.jit
    def s_sum_packed(t):
        return jnp.sum(lax.bitcast_convert_type(t, jnp.uint8),
                       dtype=jnp.uint32)

    @jax.jit
    def s_sum_detiled(t):
        def one(p):
            return pallas_raster._detile_packed(p, NTY, NTX, TH, TW, H, W)
        fr = jax.vmap(one)(t)
        return jnp.sum(fr, dtype=jnp.uint32)

    def timeit(name, fn, *args, per=B):
        outs = fn(*args)
        checksum([outs] if isinstance(outs, jax.Array) else list(outs))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _i in range(4):
                outs = fn(*args)
            chk = checksum([outs] if isinstance(outs, jax.Array)
                           else list(outs))
            dt = (time.perf_counter() - t0) / 4
            best = dt if best is None else min(best, dt)
        print(f"{name:14s} {best / per * 1e3:7.3f} ms/frame", flush=True)

    timeit("s_setup", s_setup, mvps)
    timeit("s_table", s_table, mvps)
    timeit("s_emit", s_emit, mvps)
    timeit("s_sort200", s_sort, packed)
    timeit("s_sort240", s_sort, pk240)
    timeit("s_sort400", s_sort, pk400)
    timeit("s_sortpay200", s_sort_payload, packed)
    timeit("s_search", s_search, sorted_b)
    timeit("s_binfull", s_binfull, mvps)
    timeit("s_prepfull", s_prepfull, mvps)
    timeit("s_take43k", s_take43k, sorted_b, tables)
    timeit("s_sum_packed", s_sum_packed, tiles_u8)
    timeit("s_sum_detiled", s_sum_detiled, tiles_u8)


if __name__ == "__main__":
    main()
