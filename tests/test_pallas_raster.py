"""Pallas fused raster kernel vs the XLA/naive paths (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from libnativecpurenderer_tpu.models import mesh
from libnativecpurenderer_tpu.ops import raster3d

W, H = 64, 32


def _scene():
    verts, faces = mesh.icosphere(2)  # 320 faces
    colors = np.concatenate([np.abs(verts), np.ones((len(verts), 1))], 1)
    mvp = (mesh.perspective(1.0, W / H, 0.1, 10.0)
           @ mesh.look_at([0, 0, 2.5], [0, 0, 0], [0, 1, 0])
           @ mesh.rotation_x(0.4))
    return (jnp.asarray(verts, jnp.float32),
            jnp.asarray(faces, jnp.int32),
            jnp.asarray(colors, jnp.float32),
            jnp.asarray(mvp, jnp.float32))


def test_pallas_matches_naive():
    v, f, c, m = _scene()
    fb_n, z_n = raster3d.render_gouraud(v, f, c, W, H, m)
    fb_p, z_p, ovf = raster3d.render_gouraud_pallas(
        v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=96,
        interpret=True)
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(fb_p), np.asarray(fb_n),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_n), atol=1e-6)


def test_pallas_matches_binned_xla():
    v, f, c, m = _scene()
    fb_b, z_b, _ = raster3d.render_gouraud_binned(
        v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=96)
    fb_p, z_p, _ = raster3d.render_gouraud_pallas(
        v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=96,
        interpret=True)
    np.testing.assert_allclose(np.asarray(fb_p), np.asarray(fb_b),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_b), atol=1e-6)


def test_flat_matches_binned_xla():
    """Gatherless (flat) kernel == XLA binned reference, incl. fuzz scenes
    where bin runs straddle SMEM block boundaries arbitrarily."""
    v, f, c, m = _scene()
    fb_b, z_b, _ = raster3d.render_gouraud_binned(
        v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=96)
    fb_p, z_p, ovf = raster3d.render_gouraud_pallas(
        v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=96,
        interpret=True, flat=True)
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(fb_p), np.asarray(fb_b),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_b), atol=1e-6)

    rng = np.random.default_rng(11)
    for _ in range(3):
        nv = 50
        verts = jnp.asarray(rng.uniform(-1, 1, (nv, 3)), jnp.float32)
        faces = jnp.asarray(rng.integers(0, nv, (30, 3)), jnp.int32)
        cols = jnp.asarray(rng.uniform(0, 1, (nv, 4)), jnp.float32)
        eye = jnp.eye(4, dtype=jnp.float32)
        ref = raster3d.render_gouraud_binned(
            verts, faces, cols, W, H, eye, tile_w=32, tile_h=8,
            capacity=96, span_x=3, span_y=5)
        out = raster3d.render_gouraud_pallas(
            verts, faces, cols, W, H, eye, tile_w=32, tile_h=8,
            capacity=96, span_x=3, span_y=5, interpret=True, flat=True)
        assert bool(ref[2]) == bool(out[2])
        if not bool(ref[2]):
            np.testing.assert_allclose(np.asarray(out[0]),
                                       np.asarray(ref[0]), atol=2e-5)


def test_flat_matches_naive_random_cameras():
    """Flat kernel vs the naive all-triangles reference under random
    camera orbits (exercises varied bin layouts, offscreen culling and
    near-plane-adjacent geometry)."""
    verts, faces = mesh.icosphere(2)
    colors = np.concatenate([np.abs(verts), np.ones((len(verts), 1))], 1)
    v = jnp.asarray(verts, jnp.float32)
    f = jnp.asarray(faces, jnp.int32)
    c = jnp.asarray(colors, jnp.float32)
    rng = np.random.default_rng(3)
    for _ in range(4):
        eye = rng.uniform(-1, 1, 3)
        eye = eye / np.linalg.norm(eye) * rng.uniform(1.8, 4.0)
        m = (mesh.perspective(rng.uniform(0.7, 1.4), W / H, 0.1, 10.0)
             @ mesh.look_at(eye, [0, 0, 0], [0, 1, 0]))
        m = jnp.asarray(m, jnp.float32)
        fb_n, z_n = raster3d.render_gouraud(v, f, c, W, H, m)
        fb_p, z_p, ovf = raster3d.render_gouraud_pallas(
            v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=96,
            span_x=4, span_y=6, interpret=True, flat=True)
        if bool(ovf):
            continue
        np.testing.assert_allclose(np.asarray(fb_p), np.asarray(fb_n),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_n),
                                   atol=1e-6)


def test_flat_overflow_flag():
    """Run longer than the SMEM block (capacity) must raise overflow."""
    v, f, c, m = _scene()
    _, _, ovf = raster3d.render_gouraud_pallas(
        v, f, c, W, H, m, tile_w=64, tile_h=32, capacity=32,
        span_x=3, span_y=3, interpret=True, flat=True)
    assert bool(ovf)


def test_batched_flat_matches_per_frame():
    v, f, c, m = _scene()
    from libnativecpurenderer_tpu.models import mesh as mesh_mod
    mvps = jnp.stack([
        m,
        jnp.asarray(np.asarray(m) @ mesh_mod.rotation_y(0.3), jnp.float32),
        jnp.asarray(np.asarray(m) @ mesh_mod.rotation_y(0.6), jnp.float32),
    ])
    fb_b, z_b, ovf = raster3d.render_gouraud_pallas_batch(
        v, f, c, W, H, mvps, tile_w=32, tile_h=8, capacity=96,
        span_x=8, span_y=8, interpret=True, flat=True)
    assert not bool(ovf)
    for i in range(3):
        fb_1, z_1, _ = raster3d.render_gouraud_pallas(
            v, f, c, W, H, mvps[i], tile_w=32, tile_h=8, capacity=96,
            span_x=8, span_y=8, interpret=True, flat=True)
        np.testing.assert_array_equal(np.asarray(fb_b[i]),
                                      np.asarray(fb_1))
        np.testing.assert_array_equal(np.asarray(z_b[i]), np.asarray(z_1))


def test_batched_matches_per_frame():
    v, f, c, m = _scene()
    import numpy as np
    from libnativecpurenderer_tpu.models import mesh as mesh_mod
    mvps = jnp.stack([
        m,
        jnp.asarray(np.asarray(m) @ mesh_mod.rotation_y(0.3), jnp.float32),
        jnp.asarray(np.asarray(m) @ mesh_mod.rotation_y(0.6), jnp.float32),
    ])
    fb_b, z_b, ovf = raster3d.render_gouraud_pallas_batch(
        v, f, c, W, H, mvps, tile_w=32, tile_h=8, capacity=96,
        span_x=8, span_y=8, interpret=True)
    assert not bool(ovf)
    for i in range(3):
        fb_1, z_1, _ = raster3d.render_gouraud_pallas(
            v, f, c, W, H, mvps[i], tile_w=32, tile_h=8, capacity=96,
            interpret=True)
        np.testing.assert_allclose(np.asarray(fb_b[i]), np.asarray(fb_1),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(z_b[i]), np.asarray(z_1),
                                   atol=1e-6)


def test_u8_matches_quantized_f32():
    # the fused u8 epilogue == clip(f32*255, 0, 255) truncated, sky = bg
    v, f, c, m = _scene()
    bg = jnp.asarray([0.12, 0.34, 0.56, 1.0], jnp.float32)
    fb, z, ovf = raster3d.render_gouraud_pallas(
        v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=96, bg=bg,
        span_x=8, span_y=8, interpret=True, flat=True)
    assert not bool(ovf)
    fb8, z8, ovf8 = raster3d.render_gouraud_pallas(
        v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=96, bg=bg,
        span_x=8, span_y=8, interpret=True, flat=True, u8=True)
    assert z8 is None and not bool(ovf8)
    want = np.clip(np.asarray(fb) * 255.0, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(fb8), want)
    assert np.asarray(fb8).dtype == np.uint8


def test_u8_resident_out_matches():
    # whole-frame VMEM-resident out block (index map pinned to 0,
    # dynamic per-program row stores) == the per-tile out-block path,
    # at both the production tile shape and small (16, 16) tiles
    # (the split-emission flags are inert below 4096 faces; the splits'
    # bit-exactness is asserted by the sorted-prefix design, see
    # bin_triangles_flat)
    v, f, c, m = _scene()
    bg = jnp.asarray([0.12, 0.34, 0.56, 1.0], jnp.float32)
    for tw, th, sx, sy, ws, cap in ((32, 8, 8, 8, False, 96),
                                    (16, 16, 6, 6, True, 256)):
        base, _, ovf = raster3d.render_gouraud_pallas(
            v, f, c, W, H, m, tile_w=tw, tile_h=th, capacity=cap, bg=bg,
            span_x=sx, span_y=sy, interpret=True, flat=True, u8=True,
            wide_split=ws)
        res, _, ovf_r = raster3d.render_gouraud_pallas(
            v, f, c, W, H, m, tile_w=tw, tile_h=th, capacity=cap, bg=bg,
            span_x=sx, span_y=sy, interpret=True, flat=True, u8=True,
            wide_split=ws, resident_out=True)
        assert not bool(ovf) and not bool(ovf_r)
        np.testing.assert_array_equal(np.asarray(res), np.asarray(base))


def test_u8_mega_loop_matches():
    # mega: TPG consecutive tiles per grid program via an in-kernel fori
    # (per-program id window anchored at the first tile) == the
    # one-program-per-tile grid kernel, bit-exact
    v, f, c, m = _scene()
    bg = jnp.asarray([0.12, 0.34, 0.56, 1.0], jnp.float32)
    base, _, ovf = raster3d.render_gouraud_pallas(
        v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=1024, bg=bg,
        span_x=8, span_y=8, interpret=True, flat=True, u8=True)
    assert not bool(ovf)
    for mega in (8,):   # NT = 8 tiles at 32x8 -> ONE program; the
        # windowing logic is parametric in TPG (suite-budget trim:
        # mega=2 exercised nothing mega=8 doesn't)
        got, _, ovf_m = raster3d.render_gouraud_pallas(
            v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=1024, bg=bg,
            span_x=8, span_y=8, interpret=True, flat=True, u8=True,
            mega=mega)
        assert not bool(ovf_m), mega
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_u8_out8_ktail_match():
    # out8: (NT, P/128, 128) sublane-major out (layout-native store) and
    # ktail: small-chunk remainder walk — both must be bit-exact vs the
    # plain resident-out grid kernel, alone and combined with mega
    v, f, c, m = _scene()
    bg = jnp.asarray([0.12, 0.34, 0.56, 1.0], jnp.float32)
    kw = dict(tile_w=32, tile_h=8, capacity=1024, bg=bg, span_x=8,
              span_y=8, interpret=True, flat=True, u8=True,
              resident_out=True)
    base, _, ovf = raster3d.render_gouraud_pallas(v, f, c, W, H, m, **kw)
    assert not bool(ovf)
    for extra in (dict(out8=True), dict(ktail=8),
                  dict(out8=True, ktail=8, mega=2)):
        # (suite-budget trim: ktail=4 rides the same remainder-split code
        # as ktail=8, and the bare out8+ktail8 pair is subsumed by the
        # out8+ktail8+mega2 combination)
        got, _, ovf_v = raster3d.render_gouraud_pallas(
            v, f, c, W, H, m, **kw, **extra)
        assert not bool(ovf_v), extra
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_clamp_mega():
    # the kernel needs mega | NT; entry points clamp a user mega down
    # to the largest divisor instead of crashing (advisor r3, raster3d
    # mega_window_overflow reshape TypeError at NT % mega != 0)
    assert raster3d.clamp_mega(0, 12) == 0
    assert raster3d.clamp_mega(8, 12) == 6
    assert raster3d.clamp_mega(8, 8) == 8
    assert raster3d.clamp_mega(5, 12) == 4
    assert raster3d.clamp_mega(7, 13) == 1
    assert raster3d.clamp_mega(64, 12) == 12
    # indivisible mega reaching the overflow test is a clear error now
    import pytest
    with pytest.raises(ValueError, match="clamp_mega"):
        raster3d.mega_window_overflow(
            jnp.zeros(12, jnp.int32), jnp.zeros(12, jnp.int32), 512, 8)


def test_u8_mega_window_overflow_flag():
    # a program whose TPG runs exceed the 2*Kb id window must raise the
    # overflow flag (callers fall back to the grid kernel)
    v, f, c, m = _scene()
    _, _, ovf = raster3d.render_gouraud_pallas(
        v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=96,
        span_x=8, span_y=8, interpret=True, flat=True, u8=True, mega=8)
    assert bool(ovf)
    # same capacity without mega does NOT overflow: the demand is the
    # per-program window, not per-tile runs
    _, _, ovf0 = raster3d.render_gouraud_pallas(
        v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=96,
        span_x=8, span_y=8, interpret=True, flat=True, u8=True)
    assert not bool(ovf0)


def test_u8_mxu_walk_matches():
    """The MXU chunk walk (one (q*kcc, 4) x (4, P) matmul over the
    affine-plane table, pallas_raster.build_table_mxu) vs the FMA walk.
    Edge planes evaluate identically; the z/attr planes PRECOMBINE the
    per-edge weights, so rounding differs by ulps — knife-edge z-ties
    can flip winners and quantised channels can differ by 1.  The test
    allows a small knife-edge pixel budget and requires everything else
    bit-equal."""
    v, f, c, m = _scene()
    bg = jnp.asarray([0.12, 0.34, 0.56, 1.0], jnp.float32)
    # opaque=True (nacc=3, nq=7) is the bench race configuration; the
    # opaque=False concat path (nacc=4, nq=8) was dropped for suite
    # budget — mxu is a default-off measured-negative walk kept for
    # characterization (ROADMAP "MXU chunk walk")
    for opaque in (True,):
        kw = dict(tile_w=32, tile_h=8, capacity=96, bg=bg, span_x=8,
                  span_y=8, interpret=True, flat=True, u8=True,
                  opaque=opaque)
        base, _, ovf = raster3d.render_gouraud_pallas(
            v, f, c, W, H, m, **kw)
        mx, _, ovf_m = raster3d.render_gouraud_pallas(
            v, f, c, W, H, m, **kw, mxu=1)
        assert not bool(ovf) and not bool(ovf_m)
        a, b = np.asarray(base), np.asarray(mx)
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        diff = np.any(d > 0, axis=-1)
        # ulp slips across a x255 truncation boundary are common (~7%
        # of pixels on this scene) but bounded to 1; anything larger
        # means a knife-edge winner flip, which must stay rare
        assert diff.mean() <= 0.15, (opaque, diff.mean())
        big = diff & (d.max(axis=-1) > 1)
        assert big.mean() <= 0.002, (opaque, big.mean())

        # the batched launcher must agree with the single-frame mxu
        # path exactly (same table, same kernel, same arithmetic)
        mvps = jnp.stack([m, m])
        mb, _, ovf_b = raster3d.render_gouraud_pallas_batch(
            v, f, c, W, H, mvps, **kw, mxu=1)
        assert not bool(ovf_b)
        np.testing.assert_array_equal(np.asarray(mb[0]), b)
        np.testing.assert_array_equal(np.asarray(mb[1]), b)


def test_u8_batch_matches_per_frame():
    v, f, c, m = _scene()
    from libnativecpurenderer_tpu.models import mesh as mesh_mod
    mvps = jnp.stack([
        m,
        jnp.asarray(np.asarray(m) @ mesh_mod.rotation_y(0.4), jnp.float32),
    ])
    fb_b, z_b, ovf = raster3d.render_gouraud_pallas_batch(
        v, f, c, W, H, mvps, tile_w=32, tile_h=8, capacity=96,
        span_x=8, span_y=8, interpret=True, flat=True, u8=True)
    assert z_b is None and not bool(ovf)
    for i in range(2):
        fb_1, _, _ = raster3d.render_gouraud_pallas(
            v, f, c, W, H, mvps[i], tile_w=32, tile_h=8, capacity=96,
            span_x=8, span_y=8, interpret=True, flat=True, u8=True)
        np.testing.assert_array_equal(np.asarray(fb_b[i]),
                                      np.asarray(fb_1))


def test_u8_opaque_matches_u8():
    # opaque meshes (all vertex alpha == 1): the alpha-free walk must
    # produce identical frames with a=255
    v, f, c, m = _scene()   # colors carry alpha 1.0
    fb8, _, _ = raster3d.render_gouraud_pallas(
        v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=96,
        span_x=8, span_y=8, interpret=True, flat=True, u8=True)
    fb8o, _, _ = raster3d.render_gouraud_pallas(
        v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=96,
        span_x=8, span_y=8, interpret=True, flat=True, u8=True,
        opaque=True)
    a = np.asarray(fb8)
    b = np.asarray(fb8o)
    np.testing.assert_array_equal(a[..., :3], b[..., :3])
    # interpolated alpha can truncate to 254 where barycentric weights
    # round below 1.0; opaque's exact 255 is the more correct answer
    assert (np.abs(a[..., 3].astype(int) - b[..., 3].astype(int))
            <= 1).all()


def test_z_clip_skip_matches_and_guards():
    # in-frustum scene: skipping the per-pixel z test changes nothing
    v, f, c, m = _scene()
    a, _, ovf_a = raster3d.render_gouraud_pallas(
        v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=96,
        span_x=8, span_y=8, interpret=True, flat=True, u8=True)
    b, _, ovf_b = raster3d.render_gouraud_pallas(
        v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=96,
        span_x=8, span_y=8, interpret=True, flat=True, u8=True,
        z_clip=False)
    assert not bool(ovf_a) and not bool(ovf_b)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # geometry outside [0, 1] z trips the overflow guard instead of
    # rendering wrongly
    v_far = jnp.asarray(np.asarray(v) * np.array([1, 1, 50]), v.dtype)
    _, _, ovf = raster3d.render_gouraud_pallas(
        v_far, f, c, W, H, m, tile_w=32, tile_h=8, capacity=96,
        span_x=8, span_y=8, interpret=True, flat=True, u8=True,
        z_clip=False)
    assert bool(ovf)


@pytest.mark.parametrize("g", [1, 2])
def test_dynrows_matches_flat_u8(g):
    """The dynrows kernel (pair-ordered pre-gathered rows, g frames per
    program, no packed-id blocks) must be bit-exact vs the flat u8
    kernel: same pair runs, same slot-id tie-break."""
    v, f, c, m = _scene()
    from libnativecpurenderer_tpu.models import mesh as mesh_mod
    mvps = jnp.stack([
        m,
        jnp.asarray(np.asarray(m) @ mesh_mod.rotation_y(0.4), jnp.float32),
        jnp.asarray(np.asarray(m) @ mesh_mod.rotation_y(0.9), jnp.float32),
        jnp.asarray(np.asarray(m) @ mesh_mod.rotation_x(0.7), jnp.float32),
    ])
    kw = dict(tile_w=32, tile_h=8, capacity=96, span_x=8, span_y=8,
              interpret=True, flat=True, u8=True, opaque=True,
              z_clip=False)
    ref, _, ovf0 = raster3d.render_gouraud_pallas_batch(
        v, f, c, W, H, mvps, **kw)
    got, z, ovf = raster3d.render_gouraud_pallas_batch(
        v, f, c, W, H, mvps, dynrows=g, rows_cap=2048, kcc=8, **kw)
    assert z is None and not bool(ovf) and not bool(ovf0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    if g == 1:
        # batch sizes that don't divide the operand group are sliced
        # with a remainder (rows_cap=65536 -> grp=3 for this 4-frame
        # batch: one 3-frame slice + one 1-frame remainder; the old
        # Bn % grp == 0 assert rejected this — round-3 review)
        got_r, _, ovf_r = raster3d.render_gouraud_pallas_batch(
            v, f, c, W, H, mvps, dynrows=1, rows_cap=65536, kcc=8, **kw)
        assert not bool(ovf_r)
        np.testing.assert_array_equal(np.asarray(got_r), np.asarray(ref))


def test_dynrows_overflow_flag():
    """Real pair counts beyond rows_cap - capacity must raise the
    overflow flag (callers fall back to the flat kernel)."""
    v, f, c, m = _scene()
    mvps = jnp.stack([m, m])
    _, _, ovf = raster3d.render_gouraud_pallas_batch(
        v, f, c, W, H, mvps, tile_w=32, tile_h=8, capacity=96,
        span_x=8, span_y=8, interpret=True, flat=True, u8=True,
        opaque=True, z_clip=False, dynrows=1, rows_cap=256, kcc=8)
    assert bool(ovf)


def test_pregathered_inputs_bit_exact():
    """render_gouraud_pallas(pre=(v4f, attrsf)) — the frame-loop hoist of
    the per-face vertex/attribute gathers (exp_r4_champprof2) — is
    bit-identical to the default in-call gathers: clip rows are the same
    4-element dots whether the matmul runs before or after the gather
    ((v4 @ mvp.T)[faces] == v4[faces] @ mvp.T row-for-row)."""
    v, f, c, m = _scene()
    pre = (raster3d.pregather_mesh(v, f), c[f])
    for kw in (
        # (suite-budget trim: production pre= users are flat/u8 — the
        # gouraud loop champion and the textured prep; the non-flat f32
        # pre path has no production caller)
        dict(tile_w=32, tile_h=8, capacity=96, flat=True, u8=True,
             opaque=True, kcc=8),
        dict(tile_w=32, tile_h=8, capacity=96, flat=True, u8=True,
             near_clip=True, kcc=8),
    ):
        ref = raster3d.render_gouraud_pallas(v, f, c, W, H, m,
                                             interpret=True, **kw)
        got = raster3d.render_gouraud_pallas(v, f, c, W, H, m,
                                             interpret=True, pre=pre,
                                             **kw)
        for a, b in zip(ref[:2], got[:2]):
            if a is None:
                assert b is None
                continue
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert bool(ref[2]) == bool(got[2])


def test_u8_tiled_matches_detiled():
    """tiled=True returns the kernel's (NT, P, 4) per-tile layout; host
    detile (NumPy reference AND the native C MediaDetileU8 used inside
    the VideoCap encode worker) reproduces the detiled u8 output
    byte-for-byte, including viewport crop of padded slots (H=27 below
    does not divide tile_h=8).  Slots past the viewport carry real
    rasterised values (edge triangles cover them) — the viewport_mask
    contract."""
    from libnativecpurenderer_tpu import media
    v, f, c, m = _scene()
    Hp = 27                               # 4 tile rows, 5 padded lines
    bg = jnp.asarray([0.12, 0.34, 0.56, 1.0], jnp.float32)
    kw = dict(tile_w=32, tile_h=8, capacity=96, bg=bg, span_x=8,
              span_y=8, interpret=True, flat=True, u8=True)
    fb8, _, ovf = raster3d.render_gouraud_pallas(v, f, c, W, Hp, m, **kw)
    tiles, z_t, ovf_t = raster3d.render_gouraud_pallas(
        v, f, c, W, Hp, m, tiled=True, **kw)
    assert z_t is None and bool(ovf) == bool(ovf_t)
    assert tiles.shape == (2 * 4, 32 * 8, 4) and tiles.dtype == jnp.uint8
    np.testing.assert_array_equal(
        raster3d.detile_u8_host(tiles, W, Hp, 32, 8), np.asarray(fb8))
    np.testing.assert_array_equal(
        media.detile_u8(np.asarray(tiles), W, Hp, 32, 8), np.asarray(fb8))
    # masked checksum == detiled checksum (the bench tiled-racer contract)
    msk = np.asarray(raster3d.viewport_mask(W, Hp, 32, 8))
    assert (int((np.asarray(tiles) * msk[..., None]).sum())
            == int(np.asarray(fb8).sum()))


def test_u8_tiled_variants_match():
    """tiled output is layout-only: out8/resident_out/mega variants all
    produce identical tiles."""
    v, f, c, m = _scene()
    kw = dict(tile_w=32, tile_h=8, capacity=1024, span_x=8, span_y=8,
              interpret=True, flat=True, u8=True, tiled=True)
    base, _, _ = raster3d.render_gouraud_pallas(v, f, c, W, H, m, **kw)
    for extra in (dict(resident_out=True),
                  dict(resident_out=True, out8=True, mega=4)):
        # (suite-budget trim: resident_out+out8 is subsumed by the
        # +mega=4 combination)
        got, _, ovf = raster3d.render_gouraud_pallas(v, f, c, W, H, m,
                                                     **kw, **extra)
        assert not bool(ovf), extra
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))
