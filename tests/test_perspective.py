"""Perspective-correct attribute interpolation (raster3d option)."""

import numpy as np
import jax.numpy as jnp

from libnativecpurenderer_tpu.models import mesh
from libnativecpurenderer_tpu.ops import raster3d

W, H = 64, 64


def _scene():
    # a ground quad receding into depth: near edge at z=-1, far at z=-6
    verts = np.array([
        [-1.0, -0.5, -1.0], [1.0, -0.5, -1.0],
        [-1.0, -0.5, -6.0], [1.0, -0.5, -6.0],
    ])
    faces = np.array([[0, 1, 2], [1, 3, 2]])
    # attribute = 0 at near edge, 1 at far edge
    colors = np.array([[0, 0, 0, 1], [0, 0, 0, 1],
                       [1, 1, 1, 1], [1, 1, 1, 1]], np.float64)
    proj = mesh.perspective(1.2, 1.0, 0.1, 20.0)
    return verts, faces, colors, proj


def _render(persp):
    verts, faces, colors, proj = _scene()
    fb, z, ovf = raster3d.render_gouraud_binned(
        jnp.asarray(verts, jnp.float64), jnp.asarray(faces, jnp.int32),
        jnp.asarray(colors, jnp.float64), W, H,
        jnp.asarray(proj, jnp.float64), tile_w=32, tile_h=8, capacity=64,
        perspective_correct=persp)
    assert not bool(ovf)
    return np.asarray(fb)


def test_perspective_differs_from_affine():
    affine = _render(False)
    persp = _render(True)
    cov = affine[..., 3] > 0
    assert cov.any()
    # hyperbolic interpolation pulls mid-screen values toward the near edge
    diff = np.abs(affine[..., 0] - persp[..., 0])[cov]
    assert diff.max() > 0.05


def test_perspective_exact_midpoint():
    # at the screen row halfway between the projected near and far edges,
    # the perspective-correct attribute equals the harmonic blend
    verts, faces, colors, proj = _scene()
    persp = _render(True)
    v4 = np.concatenate([verts, np.ones((4, 1))], 1)
    clip = v4 @ proj.T
    ndc_y = clip[:, 1] / clip[:, 3]
    sy = (0.5 - ndc_y * 0.5) * H
    y_near, y_far = sy[0], sy[2]
    y_mid = (y_near + y_far) / 2
    row = int(round(y_mid))
    col = W // 2
    got = persp[row, col, 0]
    # analytic: screen-space alpha 0.5 between edges, w_near=1, w_far=6
    w_near, w_far = clip[0, 3], clip[2, 3]
    a = (y_mid - y_near) / (y_far - y_near)
    expect = (a / w_far) / ((1 - a) / w_near + a / w_far)
    assert abs(got - expect) < 0.03  # pixel-center quantisation slack


def test_affine_matches_naive_unchanged():
    # the default (affine) path is unchanged by the feature
    verts, faces, colors, proj = _scene()
    fb_b, z_b, _ = raster3d.render_gouraud_binned(
        jnp.asarray(verts, jnp.float64), jnp.asarray(faces, jnp.int32),
        jnp.asarray(colors, jnp.float64), W, H,
        jnp.asarray(proj, jnp.float64), tile_w=32, tile_h=8, capacity=64)
    fb_n, z_n = raster3d.render_gouraud(
        jnp.asarray(verts, jnp.float64), jnp.asarray(faces, jnp.int32),
        jnp.asarray(colors, jnp.float64), W, H,
        jnp.asarray(proj, jnp.float64))
    np.testing.assert_allclose(np.asarray(fb_b), np.asarray(fb_n),
                               atol=1e-9)
