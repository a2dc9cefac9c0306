#!/usr/bin/env python
"""Device-side-loop prep decomposition (clean of host/sync noise).

Each stage runs N times inside ONE jitted lax.fori_loop over pre-staged
stacked inputs (one dispatch, one checksum sync); per-frame device time =
(wall(N=96) - wall(N=32)) / 64, which cancels the sync and dispatch
costs exactly and keeps execution strictly in-order on the device.

Run: nohup python tools/exp_prep2.py > /tmp/exp_prep2.log 2>&1 &
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402
from libnativecpurenderer_tpu.ops import pallas_raster      # noqa: E402

W, H = 1920, 1080
TW, TH, KB, SX, SY, KCC = 128, 8, 512, 2, 10, 16
NSTAGE = 16      # distinct staged inputs, cycled
NTX = (W + TW - 1) // TW
NTY = (H + TH - 1) // TH
NT = NTX * NTY


def measure(name, loop_fn):
    """loop_fn: jitted (n) -> scalar; returns per-frame seconds."""
    for n in (32, 96):
        float(loop_fn(n))            # warm/compile both trip counts
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
    print(f"{name:9s} {per * 1e3:7.3f} ms/frame "
          f"(w32 {walls[32] * 1e3:6.1f}  w96 {walls[96] * 1e3:6.1f})",
          flush=True)
    return per


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = jnp.stack([jnp.asarray(
        proj @ view @ mesh.rotation_y(i * 0.03), jnp.float32)
        for i in range(NSTAGE)])
    attrs = jnp.asarray(colors_np[faces_np], jnp.float32)
    float(jnp.sum(mvps))

    def staged_coeffs(mvp):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                   tri["valid"])
        zsc = tri["z"] * ia[:, None]
        return tri["sxy"], A, B, C, zsc, ia, sg, vl

    coeffs = jax.jit(jax.vmap(staged_coeffs))(mvps)
    float(jnp.sum(coeffs[1]))

    def emit(sxy, vl):
        xs = sxy[..., 0]
        ys = sxy[..., 1]
        x0c = jnp.maximum(jnp.floor(jnp.min(xs, 1) / TW).astype(jnp.int32), 0)
        x1c = jnp.minimum(jnp.floor(jnp.max(xs, 1) / TW).astype(jnp.int32),
                          NTX - 1)
        y0c = jnp.maximum(jnp.floor(jnp.min(ys, 1) / TH).astype(jnp.int32), 0)
        y1c = jnp.minimum(jnp.floor(jnp.max(ys, 1) / TH).astype(jnp.int32),
                          NTY - 1)
        ne = vl & (x0c <= x1c) & (y0c <= y1c)
        dx = jnp.arange(SX, dtype=jnp.int32)
        dy = jnp.arange(SY, dtype=jnp.int32)
        txs = x0c[:, None] + dx[None, :]
        tys = y0c[:, None] + dy[None, :]
        ok = (ne[:, None, None] & (txs[:, None, :] <= x1c[:, None, None])
              & (tys[:, :, None] <= y1c[:, None, None]))
        tid = jnp.where(ok, tys[:, :, None] * NTX + txs[:, None, :], NT)
        tri_ids = jnp.arange(xs.shape[0], dtype=jnp.int32)[:, None, None]
        return ((tid << raster3d.IDX_BITS) | tri_ids).reshape(-1)

    emitted = jax.jit(jax.vmap(emit))(coeffs[0], coeffs[7])
    sorted_pairs = jax.jit(jax.vmap(lax.sort))(emitted)
    float(jnp.sum(sorted_pairs[:, 0]))

    def mk_loop(stage):
        @functools.partial(jax.jit, static_argnums=(0,))
        def loop(n):
            def body(i, acc):
                j = i % NSTAGE
                out = stage(j)
                return acc + jnp.ravel(out)[0].astype(jnp.float32)
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return loop

    # stages (index into staged inputs; all math traced fresh per iter)
    def s_gather(j):
        mvp = mvps[j]
        v4 = jnp.concatenate([verts, jnp.ones((verts.shape[0], 1),
                                              jnp.float32)], -1)
        clip = v4 @ mvp.T
        ndc = clip[:, :3] / clip[:, 3:4]
        sx = (ndc[:, 0] * 0.5 + 0.5) * W
        sy = (0.5 - ndc[:, 1] * 0.5) * H
        sz = ndc[:, 2] * 0.5 + 0.5
        return sx[faces] + sy[faces] + sz[faces]

    def s_edge(j):
        tri = raster3d.setup_triangles(verts, faces, mvps[j], W, H)
        A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                   tri["valid"])
        return A + B + C + ia[:, None]

    def s_table(j):
        return pallas_raster.build_table(
            coeffs[1][j], coeffs[2][j], coeffs[3][j], coeffs[4][j],
            coeffs[5][j], coeffs[6][j], coeffs[7][j], attrs)

    def s_emit(j):
        return emit(coeffs[0][j], coeffs[7][j])

    def s_sort(j):
        return lax.sort(emitted[j])

    def s_post(j):
        ps = sorted_pairs[j]
        tid_sorted = ps >> raster3d.IDX_BITS
        starts = jnp.searchsorted(tid_sorted,
                                  jnp.arange(NT + 1, dtype=jnp.int32))
        return starts

    def s_prep(j):
        tri = raster3d.setup_triangles(verts, faces, mvps[j], W, H)
        A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                   tri["valid"])
        zsc = tri["z"] * ia[:, None]
        sp, st, ct, ovf = raster3d.bin_triangles_flat(
            tri["sxy"], vl, W, H, TW, TH, KB, SX, SY)
        tb = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl, attrs)
        return sp + st[0] + ct[0] + tb[0, 0].astype(jnp.int32)

    # render_gouraud_pallas is jitted at top level; for in-loop use we
    # need its unjitted body — fall back to composing prep+kernel here.
    from libnativecpurenderer_tpu.ops.pallas_raster import (
        render_binned_pallas_flat)

    colors_j = jnp.asarray(colors_np, jnp.float32)

    def s_full2(j):
        mvp = mvps[j]
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                   tri["valid"])
        zsc = tri["z"] * ia[:, None]
        sp, st, ct, ovf = raster3d.bin_triangles_flat(
            tri["sxy"], vl, W, H, TW, TH, KB, SX, SY)
        table = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl,
                                          colors_j[faces])
        keys, rgba = render_binned_pallas_flat(
            sp, st, ct, table, jnp.zeros(4, jnp.float32), W, H, TW, TH,
            KB, False, KCC)
        return rgba

    def s_kernel(j):
        keys, rgba = render_binned_pallas_flat(
            prestaged_sp[j], prestaged_st[j], prestaged_ct[j],
            prestaged_tb[j], jnp.zeros(4, jnp.float32), W, H, TW, TH,
            KB, False, KCC)
        return rgba

    @jax.jit
    def prep_all(mvp):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                   tri["valid"])
        zsc = tri["z"] * ia[:, None]
        sp, st, ct, ovf = raster3d.bin_triangles_flat(
            tri["sxy"], vl, W, H, TW, TH, KB, SX, SY)
        tb = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl,
                                       colors_j[faces])
        return sp, st, ct, tb

    sps, sts, cts, tbs = [], [], [], []
    for i in range(NSTAGE):
        sp, st, ct, tb = prep_all(mvps[i])
        sps.append(sp)
        sts.append(st)
        cts.append(ct)
        tbs.append(tb)
    prestaged_sp = jnp.stack(sps)
    prestaged_st = jnp.stack(sts)
    prestaged_ct = jnp.stack(cts)
    prestaged_tb = jnp.stack(tbs)
    float(jnp.sum(prestaged_tb[:, 0, 0]))

    measure("gather", mk_loop(s_gather))
    measure("edge", mk_loop(s_edge))
    measure("table", mk_loop(s_table))
    measure("emit", mk_loop(s_emit))
    measure("sort", mk_loop(s_sort))
    measure("post", mk_loop(s_post))
    measure("prep", mk_loop(s_prep))
    measure("kernel", mk_loop(s_kernel))
    measure("full", mk_loop(s_full2))


if __name__ == "__main__":
    main()
