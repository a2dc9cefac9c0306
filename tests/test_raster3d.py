"""3D raster pipeline vs the NumPy oracle (BASELINE configs 1-3 shapes)."""

import numpy as np
import jax.numpy as jnp

from libnativecpurenderer_tpu.models import mesh
from libnativecpurenderer_tpu.ops import raster3d
from libnativecpurenderer_tpu.golden import raster_reference as gref

W, H = 64, 48


def as_f32(*arrs):
    return [jnp.asarray(a, jnp.float64) for a in arrs]


def check_gouraud(verts, faces, colors, w=W, h=H, mvp=None, atol=1e-9):
    v, c = as_f32(verts, colors)
    f = jnp.asarray(faces, jnp.int32)
    m = None if mvp is None else jnp.asarray(mvp, jnp.float64)
    fb, z = raster3d.render_gouraud(v, f, c, w, h, m)
    gfb, gz = gref.render_gouraud(verts, faces, colors, w, h, mvp)
    np.testing.assert_allclose(np.asarray(fb), gfb, atol=atol)
    np.testing.assert_allclose(np.asarray(z), gz, atol=1e-6)
    return fb, z


def test_single_triangle_with_depth():
    # BASELINE config 1 shape: one flat-shaded triangle + depth test
    verts = np.array([[-0.5, -0.5, 0.2], [0.7, -0.2, 0.2], [0.0, 0.8, 0.2]])
    faces = np.array([[0, 1, 2]])
    colors = np.tile([1.0, 0.25, 0.5, 1.0], (3, 1))
    fb, z = check_gouraud(verts, faces, colors)
    fb = np.asarray(fb)
    assert abs(fb[..., 0].max() - 1.0) < 1e-9   # triangle rendered
    assert (np.asarray(z) < 1.0).any()      # depth written


def test_depth_ordering_two_triangles():
    # near triangle must win regardless of draw order
    verts = np.array([
        [-0.8, -0.8, 0.7], [0.8, -0.8, 0.7], [0.0, 0.8, 0.7],   # far, red
        [-0.6, -0.6, 0.3], [0.6, -0.6, 0.3], [0.0, 0.6, 0.3],   # near, green
    ])
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    colors = np.array([[1, 0, 0, 1]] * 3 + [[0, 1, 0, 1]] * 3, np.float64)
    fb, _ = check_gouraud(verts, faces, colors)
    fb = np.asarray(fb)
    cy, cx = H // 2, W // 2
    assert abs(fb[cy, cx, 1] - 1.0) < 1e-9 and abs(fb[cy, cx, 0]) < 1e-9
    # swap order — same image (order independence of packed-key min)
    fb2, _ = check_gouraud(verts[::-1].copy(),
                           np.array([[5, 4, 3], [2, 1, 0]]),
                           colors[::-1].copy())


def test_gouraud_interpolation():
    verts = np.array([[-0.9, -0.9, 0.5], [0.9, -0.9, 0.5], [0.0, 0.9, 0.5]])
    faces = np.array([[0, 1, 2]])
    colors = np.array([[1, 0, 0, 1], [0, 1, 0, 1], [0, 0, 1, 1]], np.float64)
    fb, _ = check_gouraud(verts, faces, colors)


def test_mesh_with_mvp():
    verts, faces = mesh.icosphere(1)  # 80 faces
    colors = np.concatenate([np.abs(verts), np.ones((len(verts), 1))], 1)
    mvp = (mesh.perspective(1.0, W / H, 0.1, 10.0)
           @ mesh.look_at([0, 0, 2.5], [0, 0, 0], [0, 1, 0])
           @ mesh.rotation_y(0.7))
    check_gouraud(verts, faces, colors, mvp=mvp)


def test_binned_matches_naive():
    verts, faces = mesh.icosphere(2)  # 320 faces
    colors = np.concatenate([np.abs(verts), np.ones((len(verts), 1))], 1)
    mvp = (mesh.perspective(1.0, W / H, 0.1, 10.0)
           @ mesh.look_at([0, 0, 2.5], [0, 0, 0], [0, 1, 0])
           @ mesh.rotation_x(0.4))
    v, c = as_f32(verts, colors)
    f = jnp.asarray(faces, jnp.int32)
    m = jnp.asarray(mvp, jnp.float64)
    fb_naive, z_naive = raster3d.render_gouraud(v, f, c, W, H, m)
    fb_bin, z_bin, overflow = raster3d.render_gouraud_binned(
        v, f, c, W, H, m, tile_w=16, tile_h=8, capacity=96)
    assert not bool(overflow)
    np.testing.assert_allclose(np.asarray(fb_bin), np.asarray(fb_naive),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(z_bin), np.asarray(z_naive),
                               atol=1e-9)


def test_bin_overflow_flag():
    # 60 coincident triangles in one tile with capacity 16 must overflow
    verts = np.array([[-0.1, -0.1, 0.5], [0.1, -0.1, 0.5], [0.0, 0.1, 0.5]])
    verts = np.tile(verts, (60, 1))
    faces = np.arange(180).reshape(60, 3)
    colors = np.ones((180, 4))
    v, c = as_f32(verts, colors)
    _, _, overflow = raster3d.render_gouraud_binned(
        v, jnp.asarray(faces, jnp.int32), c, W, H, None,
        tile_w=16, tile_h=8, capacity=16)
    assert bool(overflow)


def test_blended_quads():
    # BASELINE config 2 shape: textured quads, alpha blend + z-test
    verts, faces, uvs = mesh.quad_batch(3, seed=1)
    tex = np.zeros((8, 8, 4))
    tex[:, :, 0] = 1.0
    tex[:, :, 3] = 0.5  # half-transparent red
    v, u, t = as_f32(verts, uvs, tex)
    f = jnp.asarray(faces, jnp.int32)
    fb = raster3d.render_blended(v, f, u, t, W, H)
    fb = np.asarray(fb)
    assert fb[..., 0].max() > 0.4          # red drawn
    assert fb[..., 2].max() == 0.0
    # alpha accumulated where quads overlap at most to <=1
    assert fb[..., 3].max() <= 1.0


def test_blended_respects_opaque_depth():
    verts, faces, uvs = mesh.quad_batch(1, seed=2)
    tex = np.ones((4, 4, 4))
    v, u, t = as_f32(verts, uvs, tex)
    f = jnp.asarray(faces, jnp.int32)
    # opaque depth of 0 everywhere -> everything z-fails -> background
    depth0 = jnp.zeros((H, W), jnp.float64)
    fb = raster3d.render_blended(v, f, u, t, W, H, opaque_depth=depth0)
    assert np.asarray(fb).max() == 0.0


def test_split_emission_pair_set_exact():
    # the 2D split emission (base box + tall/wide/corner top-K pieces,
    # raster3d.bin_triangles_flat) must yield EXACTLY the full-emission
    # valid pair set — same sorted prefix, same starts/counts — for a
    # mesh big enough to trigger the F >= 4096 splits
    rng = np.random.default_rng(11)
    n = 4200
    # mixed sizes incl. wide and tall triangles around many tiles
    cx = rng.uniform(-0.95, 0.95, n)
    cy = rng.uniform(-0.95, 0.95, n)
    w_ = rng.uniform(0.002, 0.25, n)        # up to ~160 px wide at 64px fb
    h_ = rng.uniform(0.002, 0.25, n)
    verts = np.zeros((n * 3, 3), np.float32)
    verts[0::3] = np.stack([cx - w_, cy - h_, np.full(n, 0.5)], 1)
    verts[1::3] = np.stack([cx + w_, cy - h_, np.full(n, 0.5)], 1)
    verts[2::3] = np.stack([cx, cy + h_, np.full(n, 0.5)], 1)
    faces = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
    tri = raster3d.setup_triangles(jnp.asarray(verts),
                                   jnp.asarray(faces),
                                   jnp.eye(4, dtype=jnp.float32), W, H)
    sxy, valid = tri["sxy"], tri["valid"]

    def pairs(span_x, span_y, force_full):
        import libnativecpurenderer_tpu.ops.raster3d as r3
        sp, st, ct, ovf = r3.bin_triangles_flat(
            sxy, valid, W, H, 8, 8, 4096, span_x, span_y,
            wide_split=not force_full)
        return np.asarray(sp), np.asarray(st), np.asarray(ct), bool(ovf)

    # 8x8 px tiles at 64x48: spans up to ~20 tiles -> splits active
    sp_a, st_a, ct_a, ovf_a = pairs(24, 24, False)
    assert not ovf_a
    # reference pair set computed directly in numpy
    sx = np.asarray(sxy)
    vl = np.asarray(valid)
    ntx, nty = (W + 7) // 8, (H + 7) // 8
    want = []
    for i in range(n):
        if not vl[i]:
            continue
        x0 = max(int(np.floor(sx[i, :, 0].min() / 8)), 0)
        x1 = min(int(np.floor(sx[i, :, 0].max() / 8)), ntx - 1)
        y0 = max(int(np.floor(sx[i, :, 1].min() / 8)), 0)
        y1 = min(int(np.floor(sx[i, :, 1].max() / 8)), nty - 1)
        for ty in range(y0, y1 + 1):
            for tx in range(x0, x1 + 1):
                want.append(((ty * ntx + tx) << raster3d.IDX_BITS) | i)
    want = np.sort(np.array(want, np.int64))
    nt = ntx * nty
    got = sp_a[sp_a >> raster3d.IDX_BITS < nt]
    np.testing.assert_array_equal(np.sort(got.astype(np.int64)), want)

    # tall split ON, wide split OFF (the production default): the base
    # and tall pieces must emit the FULL span_x columns — a regression
    # here silently dropped bins for triangles >= 3 tile-columns wide
    # (round-3 review finding)
    sp_b, st_b, ct_b, ovf_b = pairs(24, 24, True)
    assert not ovf_b
    got_b = sp_b[sp_b >> raster3d.IDX_BITS < nt]
    np.testing.assert_array_equal(np.sort(got_b.astype(np.int64)), want)
