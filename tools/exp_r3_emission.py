#!/usr/bin/env python
"""Pair-emission statistics for alternative tile shapes (CPU, numpy).

For the bench mesh/camera: how many (tile, triangle) pairs does each tile
config emit (AABB spans, then exact edge-vs-tile cull), and what is the
total pair-pixel work (pairs * tile_px)?  Decides whether finer binning
(e.g. 4x interleaved (8, 32) subtiles sharing a 128-lane vector) can cut
the kernel's VPU work.

Run: python tools/exp_r3_emission.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")
import jax                                                   # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp                                      # noqa: E402
from libnativecpurenderer_tpu.models import mesh             # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d            # noqa: E402

W, H = 1920, 1080


def stats(sxy, valid, A, B, C, sg, tw, th):
    xs, ys = sxy[..., 0], sxy[..., 1]
    ntx = (W + tw - 1) // tw
    nty = (H + th - 1) // th
    x0 = np.maximum(np.floor(xs.min(1) / tw).astype(int), 0)
    x1 = np.minimum(np.floor(xs.max(1) / tw).astype(int), ntx - 1)
    y0 = np.maximum(np.floor(ys.min(1) / th).astype(int), 0)
    y1 = np.minimum(np.floor(ys.max(1) / th).astype(int), nty - 1)
    ok = valid & (x0 <= x1) & (y0 <= y1)
    aabb_pairs = np.where(ok, (x1 - x0 + 1) * (y1 - y0 + 1), 0)
    span_x = int(np.max(np.where(ok, x1 - x0 + 1, 0)))
    span_y = int(np.max(np.where(ok, y1 - y0 + 1, 0)))

    # exact edge cull per candidate tile
    kept = 0
    counts = np.zeros((nty * ntx,), np.int64)
    F = sxy.shape[0]
    for f in np.nonzero(ok)[0]:
        txs = np.arange(x0[f], x1[f] + 1)
        tys = np.arange(y0[f], y1[f] + 1)
        fxl = (txs * tw).astype(np.float64)
        fyl = (tys * th).astype(np.float64)
        fxh = fxl + (tw - 1)
        fyh = fyl + (th - 1)
        keep = np.ones((len(tys), len(txs)), bool)
        for e in range(3):
            Ae = A[f, e] * sg[f]
            Be = B[f, e] * sg[f]
            Ce = C[f, e] * sg[f]
            ex = np.where(Ae >= 0, Ae * fxh, Ae * fxl)
            ey = np.where(Be >= 0, Be * fyh, Be * fyl)
            keep &= (ey[:, None] + ex[None, :] + Ce) >= 0
        kept += int(keep.sum())
        tid = tys[:, None] * ntx + txs[None, :]
        np.add.at(counts, tid[keep].ravel(), 1)
    return dict(tw=tw, th=th, nt=ntx * nty, span=(span_x, span_y),
                aabb=int(aabb_pairs.sum()), kept=kept,
                px_work=kept * tw * th,
                maxcount=int(counts.max()),
                p90=int(np.percentile(counts, 90)))


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float64)
    faces = jnp.asarray(faces_np, jnp.int32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvp = jnp.asarray(proj @ view @ mesh.rotation_y(5 * 0.03), jnp.float64)
    tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
    A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                               tri["valid"])
    sxy = np.asarray(tri["sxy"])
    valid = np.asarray(vl)
    A, B, C, sg = map(np.asarray, (A, B, C, sg))

    # triangle size profile
    xs, ys = sxy[..., 0], sxy[..., 1]
    wpx = np.where(valid, xs.max(1) - xs.min(1), np.nan)
    hpx = np.where(valid, ys.max(1) - ys.min(1), np.nan)
    print(f"valid={valid.sum()}  bbox w px: med={np.nanmedian(wpx):.0f} "
          f"p90={np.nanpercentile(wpx, 90):.0f}  "
          f"h px: med={np.nanmedian(hpx):.0f} "
          f"p90={np.nanpercentile(hpx, 90):.0f}", flush=True)

    for tw, th in [(128, 8), (128, 16), (64, 8), (64, 16), (32, 8),
                   (32, 16), (32, 32), (16, 8)]:
        s = stats(sxy, valid, A, B, C, sg, tw, th)
        print(f"tile {tw:3d}x{th:2d}: nt={s['nt']:5d} span={s['span']} "
              f"aabb={s['aabb']:6d} kept={s['kept']:6d} "
              f"px_work={s['px_work'] / 1e6:6.1f}M max={s['maxcount']:4d} "
              f"p90={s['p90']:3d}", flush=True)


if __name__ == "__main__":
    main()
