"""Trusted NumPy reference for the 3D raster pipeline (test oracle).

Implements the same math as ops/raster3d.py (same projection, edge
functions, packed-key visibility, barycentric shading) as straightforward
per-pixel NumPy, so the jitted pipelines can be validated including their
depth-quantisation and tie-break rules.
"""

from __future__ import annotations

import numpy as np

from ..ops.raster3d import IDX_BITS, NO_TRI, SUBPIXEL, Z_LEVELS


def _snap(c):
    """1/256-px subpixel snap, mirroring ops.raster3d._snap (same
    round-half-even), so oracle coverage is bit-identical."""
    return np.round(c * SUBPIXEL) / SUBPIXEL


def project(verts, mvp, width, height):
    v4 = np.concatenate([verts, np.ones((len(verts), 1))], -1)
    clip = v4 @ np.asarray(mvp).T
    w = clip[:, 3:4]
    w_ok = w[:, 0] > 1e-6
    ndc = clip[:, :3] / np.where(w_ok[:, None], w, 1.0)
    sx = _snap((ndc[:, 0] * 0.5 + 0.5) * width)
    sy = _snap((0.5 - ndc[:, 1] * 0.5) * height)
    sz = ndc[:, 2] * 0.5 + 0.5
    return sx, sy, sz, w_ok


def clip_near(clipf, attrsf, eps=1e-6):
    """NumPy mirror of ops.raster3d.clip_near_triangles (same op order so
    f64 results match bit-for-bit).  clipf: (F, 3, 4); attrsf: (F, 3, D).
    Returns (clip2 (2F, 3, 4), attrs2 (2F, 3, D), valid (2F,))."""
    w = clipf[..., 3]
    inside = w > eps
    n_in = inside.sum(axis=1)
    out_idx = np.argmax(~inside, axis=1)
    in_idx = np.argmax(inside, axis=1)
    r = np.where(n_in == 1, in_idx,
                 np.where(n_in == 2, (out_idx + 1) % 3, 0))
    perm = (r[:, None] + np.arange(3)[None, :]) % 3
    vr = np.take_along_axis(clipf, perm[..., None], axis=1)
    ar = np.take_along_axis(attrsf, perm[..., None], axis=1)
    v0, v1, v2 = vr[:, 0], vr[:, 1], vr[:, 2]
    a0, a1, a2 = ar[:, 0], ar[:, 1], ar[:, 2]
    w0, w1, w2 = vr[:, 0, 3], vr[:, 1, 3], vr[:, 2, 3]

    def isect(av, aa, bv, ba, wa, wb):
        denom = wb - wa
        t = ((eps - wa) / np.where(denom == 0.0, 1.0, denom))[:, None]
        return av + t * (bv - av), aa + t * (ba - aa)

    i01v, i01a = isect(v0, a0, v1, a1, w0, w1)
    i02v, i02a = isect(v0, a0, v2, a2, w0, w2)
    i12v, i12a = isect(v1, a1, v2, a2, w1, w2)

    c3 = (n_in == 3)[:, None, None]
    c2 = (n_in == 2)[:, None, None]

    def pick(full, two, one):
        return np.where(c3, full, np.where(c2, two, one))

    triA_v = pick(np.stack([v0, v1, v2], 1), np.stack([v0, v1, i12v], 1),
                  np.stack([v0, i01v, i02v], 1))
    triA_a = pick(np.stack([a0, a1, a2], 1), np.stack([a0, a1, i12a], 1),
                  np.stack([a0, i01a, i02a], 1))
    triB_v = np.stack([v0, i12v, i02v], 1)
    triB_a = np.stack([a0, i12a, i02a], 1)
    clip2 = np.concatenate([triA_v, triB_v], axis=0)
    attrs2 = np.concatenate([triA_a, triB_a], axis=0)
    valid = np.concatenate([n_in >= 1, n_in == 2], axis=0)
    return clip2, attrs2, valid


def render_gouraud_clipped(verts, faces, colors, width, height, mvp=None,
                           bg=(0, 0, 0, 0), eps=1e-6):
    """render_gouraud with near-plane clipping (w = eps), the oracle for
    ops.raster3d render paths with ``near_clip=True``."""
    if mvp is None:
        mvp = np.eye(4)
    verts = np.asarray(verts, np.float64)
    v4 = np.concatenate([verts, np.ones((len(verts), 1))], -1)
    clipf = (v4 @ np.asarray(mvp).T)[np.asarray(faces)]
    attrsf = np.asarray(colors, np.float64)[np.asarray(faces)]
    clip2, attrs2, valid = clip_near(clipf, attrsf, eps)
    w = clip2[..., 3]
    w_ok = w > 0.0
    valid = valid & w_ok.all(axis=1)
    wsafe = np.where(w_ok[..., None], clip2[..., 3:4], 1.0)
    ndc = clip2[..., :3] / wsafe
    fsx = _snap((ndc[..., 0] * 0.5 + 0.5) * width)
    fsy = _snap((0.5 - ndc[..., 1] * 0.5) * height)
    fsz = ndc[..., 2] * 0.5 + 0.5
    return _raster_faces(fsx, fsy, fsz, attrs2, valid, width, height, bg)


def _raster_faces(fsx, fsy, fsz, fcolors, valid, width, height, bg):
    """Per-face scanline core: fsx/fsy/fsz (F, 3), fcolors (F, 3, D)."""
    fb = np.broadcast_to(np.asarray(bg, np.float64),
                         (height, width, 4)).copy()
    zbuf = np.full((height, width), np.inf)
    keybuf = np.full((height, width), (Z_LEVELS << IDX_BITS) | NO_TRI,
                     np.int64)
    win = np.full((height, width), -1, np.int64)
    for fi in range(len(fsx)):
        if not valid[fi]:
            continue
        x0, y0 = fsx[fi, 0], fsy[fi, 0]
        x1, y1 = fsx[fi, 1], fsy[fi, 1]
        x2, y2 = fsx[fi, 2], fsy[fi, 2]
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
                z = w0 * fsz[fi, 0] + w1 * fsz[fi, 1] + w2 * fsz[fi, 2]
                if z < 0.0 or z > 1.0:
                    continue
                zq = int(np.clip(z * Z_LEVELS, 0, Z_LEVELS))
                key = (zq << IDX_BITS) | fi
                if key < keybuf[py, px]:
                    keybuf[py, px] = key
                    win[py, px] = fi
                    zbuf[py, px] = zq / Z_LEVELS
                    fb[py, px] = (w0 * fcolors[fi, 0] + w1 * fcolors[fi, 1]
                                  + w2 * fcolors[fi, 2])
    zout = np.where(win >= 0, zbuf, 1.0)
    return fb, zout


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
