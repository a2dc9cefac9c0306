#!/usr/bin/env python
"""Sync-floor-aware prep decomposition for the flat raster path.

Earlier numbers amortised one ~30 ms checksum sync over 32 frames
(+0.94 ms/frame — the CLAUDE.md trap).  Here every stage is timed at
F=32 AND F=128 calls per sync; per-frame cost = (wall128 - wall32)/96,
cancelling the sync exactly.  Stages (th8 flat config, spans (2,10)):

  calib    : trivial jitted op                  [host floor per call]
  p_gather : the six per-vertex [faces] gathers
  p_edge   : projection + edge coeffs + zsc (gathers included)
  p_table  : build_table from pre-staged coeffs
  p_emit   : pair emission (no sort)
  p_sort   : lax.sort of the emitted pairs
  p_post   : searchsorted + counts + pad from pre-sorted pairs
  p_full   : whole prep
  k_b16    : kernel, 16 frames per launch      [true device kernel]
  full     : render_gouraud_pallas whole frame

Run: nohup python tools/exp_prep.py > /tmp/exp_prep.log 2>&1 &
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
NFRM = 32


def sync(x):
    return float(jnp.sum(x))


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    colors = jnp.asarray(colors_np, jnp.float32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = [jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03), jnp.float32)
            for i in range(NFRM)]
    sync(jnp.stack([jnp.sum(m) for m in mvps]))
    attrs = jnp.asarray(colors_np[faces_np], jnp.float32)

    def measure(name, fn, args_for, probe):
        """per-frame = (wall(128) - wall(32)) / 96; sync via probe(outs)."""
        outs = [fn(*args_for(i)) for i in range(NFRM)]   # warm
        sync(probe(outs))
        walls = {}
        for F in (32, 128):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                outs = []
                for i in range(F):
                    outs.append(fn(*args_for(i)))
                sync(probe(outs[-4:]))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            walls[F] = best
        per = (walls[128] - walls[32]) / 96.0
        print(f"{name:9s} {per * 1e3:7.3f} ms/frame "
              f"(w32 {walls[32] * 1e3:6.1f}  w128 {walls[128] * 1e3:6.1f})",
              flush=True)
        return per

    def pb(outs):
        return jnp.stack([jnp.ravel(o[0] if isinstance(o, tuple) else o)[0]
                          for o in outs]).sum()

    # ---- calibration
    small = jnp.ones((128,), jnp.float32)
    calib = jax.jit(lambda x, s: x * s)
    measure("calib", calib, lambda i: (small, float(i % 7 + 1)), pb)

    # ---- prep stages
    @jax.jit
    def p_gather(mvp):
        v4 = jnp.concatenate([verts, jnp.ones((verts.shape[0], 1),
                                              jnp.float32)], -1)
        clip = v4 @ mvp.T
        w = clip[:, 3:4]
        ndc = clip[:, :3] / w
        sx = (ndc[:, 0] * 0.5 + 0.5) * W
        sy = (0.5 - ndc[:, 1] * 0.5) * H
        sz = ndc[:, 2] * 0.5 + 0.5
        return sx[faces] + sy[faces] + sz[faces] + w[:, 0][faces]

    @jax.jit
    def p_edge(mvp):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                   tri["valid"])
        return A + B + C + ia[:, None]

    @jax.jit
    def staged_coeffs(mvp):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                   tri["valid"])
        zsc = tri["z"] * ia[:, None]
        return tri["sxy"], A, B, C, zsc, ia, sg, vl

    coeffs = [staged_coeffs(m) for m in mvps]
    sync(jnp.stack([jnp.sum(c[1]) for c in coeffs]))

    @jax.jit
    def p_table(A, B, C, zsc, ia, sg, vl):
        return pallas_raster.build_table(A, B, C, zsc, ia, sg, vl, attrs)

    ntx = (W + TW - 1) // TW
    nty = (H + TH - 1) // TH
    nt = ntx * nty

    @jax.jit
    def p_emit(sxy, vl):
        xs = sxy[..., 0]
        ys = sxy[..., 1]
        x0c = jnp.maximum(jnp.floor(jnp.min(xs, 1) / TW).astype(jnp.int32), 0)
        x1c = jnp.minimum(jnp.floor(jnp.max(xs, 1) / TW).astype(jnp.int32),
                          ntx - 1)
        y0c = jnp.maximum(jnp.floor(jnp.min(ys, 1) / TH).astype(jnp.int32), 0)
        y1c = jnp.minimum(jnp.floor(jnp.max(ys, 1) / TH).astype(jnp.int32),
                          nty - 1)
        ne = vl & (x0c <= x1c) & (y0c <= y1c)
        dx = jnp.arange(SX, dtype=jnp.int32)
        dy = jnp.arange(SY, dtype=jnp.int32)
        txs = x0c[:, None] + dx[None, :]
        tys = y0c[:, None] + dy[None, :]
        ok = (ne[:, None, None] & (txs[:, None, :] <= x1c[:, None, None])
              & (tys[:, :, None] <= y1c[:, None, None]))
        tid = jnp.where(ok, tys[:, :, None] * ntx + txs[:, None, :], nt)
        tri_ids = jnp.arange(xs.shape[0], dtype=jnp.int32)[:, None, None]
        return ((tid << raster3d.IDX_BITS) | tri_ids).reshape(-1)

    emitted = [p_emit(c[0], c[7]) for c in coeffs]
    sync(jnp.stack([e[0] for e in emitted]))

    @jax.jit
    def p_sort(pairs):
        return lax.sort(pairs)

    sorted_pairs = [p_sort(e) for e in emitted]
    sync(jnp.stack([s[0] for s in sorted_pairs]))

    @jax.jit
    def p_post(ps):
        tid_sorted = ps >> raster3d.IDX_BITS
        starts = jnp.searchsorted(tid_sorted,
                                  jnp.arange(nt + 1, dtype=jnp.int32))
        counts = (starts[1:] - starts[:-1]).astype(jnp.int32)
        return starts[:-1], counts

    @jax.jit
    def p_full(mvp):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                   tri["valid"])
        zsc = tri["z"] * ia[:, None]
        sp, st, ct, ovf = raster3d.bin_triangles_flat(
            tri["sxy"], vl, W, H, TW, TH, KB, SX, SY)
        tb = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl, attrs)
        return sp, st, ct, tb

    measure("p_gather", p_gather, lambda i: (mvps[i % NFRM],), pb)
    measure("p_edge", p_edge, lambda i: (mvps[i % NFRM],), pb)
    measure("p_table", p_table,
            lambda i: coeffs[i % NFRM][1:], pb)
    measure("p_emit", p_emit,
            lambda i: (coeffs[i % NFRM][0], coeffs[i % NFRM][7]), pb)
    measure("p_sort", p_sort, lambda i: (emitted[i % NFRM],), pb)
    measure("p_post", p_post, lambda i: (sorted_pairs[i % NFRM],), pb)
    measure("p_full", p_full, lambda i: (mvps[i % NFRM],), pb)

    full = functools.partial(raster3d.render_gouraud_pallas, tile_w=TW,
                             tile_h=TH, capacity=KB, span_x=SX, span_y=SY,
                             kcc=KCC, flat=True)
    measure("full", full,
            lambda i: (verts, faces, colors, W, H, mvps[i % NFRM]), pb)


if __name__ == "__main__":
    main()
