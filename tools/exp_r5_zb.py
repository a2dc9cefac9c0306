#!/usr/bin/env python
"""Device validation of the z_clip=False boundary golden scene
(tests/test_textured_raster.py::test_tex_zclip_false_boundary_golden,
VERDICT r4 item 6 asks for one device run): the same quads ON the
sz=0/1 boundaries rendered with the REAL Mosaic kernel must match the
NumPy same-convention oracle's u8 output except at fp-noise texel
boundaries (expected: zero or a handful of straddle pixels).

Run: nohup python tools/exp_r5_zb.py > /tmp/exp_r5_zb.log 2>&1 &
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from libnativecpurenderer_tpu.ops import raster3d  # noqa: E402
from libnativecpurenderer_tpu.golden.raster_reference import project  # noqa: E402
from libnativecpurenderer_tpu.ops.raster3d import (IDX_BITS, NO_TRI,  # noqa: E402
                                                   Z_LEVELS)


def scene():
    rng = np.random.default_rng(31)
    tex_u8 = rng.integers(0, 256, (4, 4, 4)).astype(np.uint8)
    verts, faces, uvs = [], [], []

    def quad(x0, y0, x1, y1, z):
        b = len(verts)
        zs = z if isinstance(z, tuple) else (z, z, z, z)
        verts.extend([[x0, y0, zs[0]], [x1, y0, zs[1]],
                      [x1, y1, zs[2]], [x0, y1, zs[3]]])
        uvs.extend([[0.031, 0.067], [0.911, 0.067], [0.911, 0.941],
                    [0.031, 0.941]])
        faces.extend([[b, b + 1, b + 2], [b, b + 2, b + 3]])

    quad(-0.9, -0.8, -0.4, 0.7, -1.0)
    quad(-0.3, -0.8, 0.25, 0.7, 1.0)
    quad(0.35, -0.8, 0.9, 0.7, (-1.0, 1.0, 1.0, -1.0))
    return (np.asarray(verts, np.float32),
            np.asarray(faces, np.int32),
            np.asarray(uvs, np.float32), tex_u8)


def oracle(verts, faces_a, uvs, tex_u8, Wl, Hl):
    sx, sy, sz, _ = project(np.asarray(verts, np.float64), np.eye(4),
                            Wl, Hl)
    th_t, tw_t = tex_u8.shape[0], tex_u8.shape[1]
    keybuf = np.full((Hl, Wl), (Z_LEVELS << IDX_BITS) | NO_TRI, np.int64)
    want = np.zeros((Hl, Wl, 4), np.uint8)
    for fi, (i0, i1, i2) in enumerate(faces_a):
        x0, y0, x1, y1, x2, y2 = (sx[i0], sy[i0], sx[i1], sy[i1],
                                  sx[i2], sy[i2])
        area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        sign = np.sign(area2)
        for py in range(Hl):
            for px in range(Wl):
                e0 = (y1 - y2) * px + (x2 - x1) * py + (x1 * y2 - x2 * y1)
                e1 = (y2 - y0) * px + (x0 - x2) * py + (x2 * y0 - x0 * y2)
                e2 = (y0 - y1) * px + (x1 - x0) * py + (x0 * y1 - x1 * y0)
                if e0 * sign < 0 or e1 * sign < 0 or e2 * sign < 0:
                    continue
                w0, w1, w2 = e0 / area2, e1 / area2, e2 / area2
                z = w0 * sz[i0] + w1 * sz[i1] + w2 * sz[i2]
                zq = int(np.clip(z * Z_LEVELS, 0, Z_LEVELS))
                key = (zq << IDX_BITS) | fi
                if key < keybuf[py, px]:
                    keybuf[py, px] = key
                    wsum = w0 + w1 + w2
                    u = (w0 * uvs[i0, 0] + w1 * uvs[i1, 0]
                         + w2 * uvs[i2, 0]) / wsum
                    v = (w0 * uvs[i0, 1] + w1 * uvs[i1, 1]
                         + w2 * uvs[i2, 1]) / wsum
                    ui = int(np.clip(np.trunc(u * tw_t), 0, tw_t - 1))
                    vi = int(np.clip(np.trunc(v * th_t), 0, th_t - 1))
                    want[py, px] = tex_u8[vi, ui]
    return want


def main():
    Wl, Hl = 64, 48
    verts, faces_a, uvs, tex_u8 = scene()
    got, ovf = raster3d.render_textured_pallas_loop(
        jnp.asarray(verts), jnp.asarray(faces_a), jnp.asarray(uvs),
        jnp.asarray(tex_u8), Wl, Hl,
        mvps=jnp.asarray(np.eye(4, dtype=np.float32)[None]),
        tile_w=32, tile_h=8, capacity=512, span_x=8, span_y=8,
        mega=0, z_clip=False)
    g = np.asarray(got[0])
    assert not bool(ovf)
    want = oracle(verts, faces_a, uvs, tex_u8, Wl, Hl)
    bad = (g != want).any(-1)
    print(f"device z-boundary golden: {bad.sum()} / {Wl * Hl} pixels "
          f"differ ({'PASS' if bad.sum() == 0 else 'check'})")
    ys, xs = np.nonzero(bad)
    for y, x in list(zip(ys, xs))[:10]:
        print(" ", y, x, g[y, x], want[y, x])


if __name__ == "__main__":
    main()
