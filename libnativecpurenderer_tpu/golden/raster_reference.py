"""Trusted NumPy reference for the 3D raster pipeline (test oracle).

Implements the same math as ops/raster3d.py (same projection, edge
functions, packed-key visibility, barycentric shading) as straightforward
per-pixel NumPy, so the jitted pipelines can be validated including their
depth-quantisation and tie-break rules.
"""

from __future__ import annotations

import numpy as np

from ..ops.raster3d import IDX_BITS, NO_TRI, Z_LEVELS


def project(verts, mvp, width, height):
    v4 = np.concatenate([verts, np.ones((len(verts), 1))], -1)
    clip = v4 @ np.asarray(mvp).T
    w = clip[:, 3:4]
    w_ok = w[:, 0] > 1e-6
    ndc = clip[:, :3] / np.where(w_ok[:, None], w, 1.0)
    sx = (ndc[:, 0] * 0.5 + 0.5) * width
    sy = (0.5 - ndc[:, 1] * 0.5) * height
    sz = ndc[:, 2] * 0.5 + 0.5
    return sx, sy, sz, w_ok


def render_gouraud(verts, faces, colors, width, height, mvp=None,
                   bg=(0, 0, 0, 0)):
    if mvp is None:
        mvp = np.eye(4)
    sx, sy, sz, w_ok = project(np.asarray(verts, np.float64), mvp,
                               width, height)
    fb = np.broadcast_to(np.asarray(bg, np.float64), (height, width, 4)).copy()
    zbuf = np.full((height, width), np.inf)
    keybuf = np.full((height, width), (Z_LEVELS << IDX_BITS) | NO_TRI,
                     np.int64)
    win = np.full((height, width), -1, np.int64)

    for fi, (i0, i1, i2) in enumerate(np.asarray(faces)):
        if not (w_ok[i0] and w_ok[i1] and w_ok[i2]):
            continue
        x0, y0 = sx[i0], sy[i0]
        x1, y1 = sx[i1], sy[i1]
        x2, y2 = sx[i2], sy[i2]
        area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        if abs(area2) <= 1e-12:
            continue
        sign = np.sign(area2)
        xmin = max(0, int(np.floor(min(x0, x1, x2))))
        xmax = min(width - 1, int(np.ceil(max(x0, x1, x2))))
        ymin = max(0, int(np.floor(min(y0, y1, y2))))
        ymax = min(height - 1, int(np.ceil(max(y0, y1, y2))))
        for py in range(ymin, ymax + 1):
            for px in range(xmin, xmax + 1):
                e0 = (y1 - y2) * px + (x2 - x1) * py + (x1 * y2 - x2 * y1)
                e1 = (y2 - y0) * px + (x0 - x2) * py + (x2 * y0 - x0 * y2)
                e2 = (y0 - y1) * px + (x1 - x0) * py + (x0 * y1 - x1 * y0)
                if e0 * sign < 0 or e1 * sign < 0 or e2 * sign < 0:
                    continue
                w0 = e0 / area2
                w1 = e1 / area2
                w2 = e2 / area2
                z = w0 * sz[i0] + w1 * sz[i1] + w2 * sz[i2]
                if z < 0.0 or z > 1.0:
                    continue
                zq = int(np.clip(z * Z_LEVELS, 0, Z_LEVELS))
                key = (zq << IDX_BITS) | fi
                if key < keybuf[py, px]:
                    keybuf[py, px] = key
                    win[py, px] = fi
                    zbuf[py, px] = zq / Z_LEVELS
                    c = (w0 * np.asarray(colors[i0])
                         + w1 * np.asarray(colors[i1])
                         + w2 * np.asarray(colors[i2]))
                    fb[py, px] = c
    zout = np.where(win >= 0, zbuf, 1.0)
    return fb, zout
