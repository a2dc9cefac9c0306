"""Deferred textured rendering (render_textured_binned)."""

import numpy as np
import jax.numpy as jnp

from libnativecpurenderer_tpu.models import mesh
from libnativecpurenderer_tpu.ops import raster3d

W, H = 64, 48


def _checker(n=8, size=32):
    tex = np.zeros((size, size, 4))
    ys, xs = np.mgrid[0:size, 0:size]
    tex[..., 0] = ((xs // (size // n) + ys // (size // n)) % 2)
    tex[..., 1] = 1.0 - tex[..., 0]
    tex[..., 3] = 1.0
    return tex


def test_textured_quad_flat():
    # screen-parallel quad: affine == perspective; texel lookup verifiable
    verts = np.array([[-0.8, -0.8, 0.5], [0.8, -0.8, 0.5],
                      [-0.8, 0.8, 0.5], [0.8, 0.8, 0.5]])
    faces = np.array([[0, 1, 2], [1, 3, 2]])
    uvs = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float64)
    tex = _checker()
    for persp in (False, True):
        fb, z, ovf = raster3d.render_textured_binned(
            jnp.asarray(verts, jnp.float64), jnp.asarray(faces, jnp.int32),
            jnp.asarray(uvs, jnp.float64), jnp.asarray(tex, jnp.float64),
            W, H, tile_w=32, tile_h=8, capacity=16,
            perspective_correct=persp)
        assert not bool(ovf)
        out = np.asarray(fb)
        # checker pattern present: both colors, roughly balanced
        covered = out[..., 3] > 0
        assert covered.sum() > 0.4 * W * H
        r = out[..., 0][covered]
        assert (r > 0.5).any() and (r < 0.5).any()
        frac = (r > 0.5).mean()
        assert 0.35 < frac < 0.65


def test_textured_depth_ordering():
    # near quad occludes far quad
    verts = np.array([
        [-0.9, -0.9, 0.8], [0.9, -0.9, 0.8], [-0.9, 0.9, 0.8],
        [0.9, 0.9, 0.8],                                     # far
        [-0.4, -0.4, 0.2], [0.4, -0.4, 0.2], [-0.4, 0.4, 0.2],
        [0.4, 0.4, 0.2],                                     # near
    ])
    faces = np.array([[0, 1, 2], [1, 3, 2], [4, 5, 6], [5, 7, 6]])
    uvs = np.zeros((8, 2))
    uvs[4:] = 0.99  # near quad samples the opposite checker corner
    tex = np.zeros((4, 4, 4))
    tex[..., 2] = 1.0
    tex[..., 3] = 1.0
    tex[3, 3, 0] = 1.0
    tex[3, 3, 2] = 0.0
    fb, z, _ = raster3d.render_textured_binned(
        jnp.asarray(verts, jnp.float64), jnp.asarray(faces, jnp.int32),
        jnp.asarray(uvs, jnp.float64), jnp.asarray(tex, jnp.float64),
        W, H, tile_w=32, tile_h=8, capacity=16)
    out = np.asarray(fb)
    cy, cx = H // 2, W // 2
    assert out[cy, cx, 0] == 1.0   # near quad's texel (red corner)
    assert out[6, 6, 2] == 1.0     # far quad visible at the border (blue)


def test_perspective_texture_foreshortening():
    # receding floor: perspective-correct sampling compresses far texels
    verts = np.array([
        [-1.0, -0.5, -1.0], [1.0, -0.5, -1.0],
        [-1.0, -0.5, -8.0], [1.0, -0.5, -8.0],
    ])
    faces = np.array([[0, 1, 2], [1, 3, 2]])
    uvs = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float64)
    proj = mesh.perspective(1.2, W / H, 0.1, 20.0)
    tex = _checker(n=8, size=64)
    outs = {}
    for persp in (False, True):
        fb, _, ovf = raster3d.render_textured_binned(
            jnp.asarray(verts, jnp.float64), jnp.asarray(faces, jnp.int32),
            jnp.asarray(uvs, jnp.float64), jnp.asarray(tex, jnp.float64),
            W, H, jnp.asarray(proj, jnp.float64),
            tile_w=32, tile_h=8, capacity=16, perspective_correct=persp)
        assert not bool(ovf)
        outs[persp] = np.asarray(fb)
    # the two interpolations must differ visibly on a receding plane
    d = np.abs(outs[True][..., 0] - outs[False][..., 0])
    assert d.max() == 1.0


def test_textured_pallas_matches_binned():
    # the Pallas textured path (kernel-interpolated UVs) agrees with the
    # XLA fused path: identical hit mask, same sampled texels wherever
    # the interpolated uv doesn't straddle a texel boundary within fp
    # noise (compare texel indices exactly on >=99.9% of hit pixels)
    verts = np.array([[-0.8, -0.8, 0.5], [0.8, -0.8, 0.5],
                      [-0.8, 0.8, 0.5], [0.8, 0.8, 0.5],
                      [-0.3, -0.3, 0.2], [0.5, -0.2, 0.25]])
    faces = np.array([[0, 1, 2], [1, 3, 2], [3, 4, 5]])
    uvs = np.array([[0, 0], [1, 0], [0, 1], [1, 1], [0.3, 0.3], [0.7, 0.2]],
                   np.float64)
    tex = _checker(n=8, size=64).astype(np.float64)
    for persp in (False, True):
        fb_a, z_a, ovf_a = raster3d.render_textured_binned(
            jnp.asarray(verts, jnp.float64), jnp.asarray(faces, jnp.int32),
            jnp.asarray(uvs, jnp.float64), jnp.asarray(tex),
            W, H, tile_w=32, tile_h=8, capacity=16,
            perspective_correct=persp)
        fb_b, z_b, ovf_b = raster3d.render_textured_pallas(
            jnp.asarray(verts, jnp.float64), jnp.asarray(faces, jnp.int32),
            jnp.asarray(uvs, jnp.float64), jnp.asarray(tex),
            W, H, tile_w=32, tile_h=8, capacity=64, span_x=8, span_y=8,
            interpret=True, perspective_correct=persp)
        assert not bool(ovf_a) and not bool(ovf_b)
        a, b = np.asarray(fb_a), np.asarray(fb_b)
        np.testing.assert_array_equal(a[..., 3] > 0, b[..., 3] > 0)
        np.testing.assert_array_equal(np.asarray(z_a), np.asarray(z_b))
        same = (a == b).all(-1)
        assert same.mean() > 0.995, same.mean()


def test_tex_idx_batch_matches_single():
    # the batched u8-texture path (kernel-resolved texel indices + ONE
    # packed-u32 gather; raster3d.render_textured_pallas_batch) matches
    # the per-channel f32 path on a u8-valued texture: identical hit
    # masks, same texel on >=99.5% of pixels (fp-boundary texel flips
    # only), and batch frames with identical mvps are bit-identical
    rng = np.random.default_rng(3)
    verts, faces, uvs = mesh.quad_batch(12, seed=3)
    tex_u8 = rng.integers(0, 256, (32, 32, 4), np.uint8)
    mvp = np.eye(4, dtype=np.float32)
    for persp in (False, True):
        fb_a, _, ovf_a = raster3d.render_textured_pallas(
            jnp.asarray(verts, jnp.float32), jnp.asarray(faces, jnp.int32),
            jnp.asarray(uvs, jnp.float32),
            jnp.asarray(tex_u8, jnp.float32),          # integer-valued
            W, H, tile_w=32, tile_h=8, capacity=64, span_x=8, span_y=8,
            interpret=True, perspective_correct=persp)
        fb_b, ovf_b = raster3d.render_textured_pallas_batch(
            jnp.asarray(verts, jnp.float32), jnp.asarray(faces, jnp.int32),
            jnp.asarray(uvs, jnp.float32), jnp.asarray(tex_u8),
            W, H, jnp.asarray(np.stack([mvp, mvp])),
            tile_w=32, tile_h=8, capacity=64, span_x=8, span_y=8,
            interpret=True, perspective_correct=persp)
        assert not bool(ovf_a) and not bool(ovf_b)
        a = np.asarray(fb_a)                           # integer-valued f32
        b = np.asarray(fb_b)                           # (2, H, W, 4) u8
        np.testing.assert_array_equal(b[0], b[1])
        hit_a = a[..., 3] > 0
        hit_b = b[0][..., 3] > 0
        np.testing.assert_array_equal(hit_a, hit_b)
        same = (a.astype(np.int32) == b[0].astype(np.int32)).all(-1)
        assert same.mean() > 0.995, same.mean()


def test_tex_mega_loop_matches():
    # mega: TPG consecutive tiles per grid program (per-program id
    # window + (mega, 1, P) out blocks stored at the local index) ==
    # the grid tex kernel, bit-exact
    rng = np.random.default_rng(3)
    verts, faces, uvs = mesh.quad_batch(12, seed=3)
    tex_u8 = rng.integers(0, 256, (32, 32, 4), np.uint8)
    mvp = np.eye(4, dtype=np.float32)
    args = (jnp.asarray(verts, jnp.float32), jnp.asarray(faces, jnp.int32),
            jnp.asarray(uvs, jnp.float32), jnp.asarray(tex_u8), W, H,
            jnp.asarray(np.stack([mvp])))
    kw = dict(tile_w=32, tile_h=8, capacity=512, span_x=8, span_y=8,
              interpret=True)
    base, ovf = raster3d.render_textured_pallas_batch(*args, **kw)
    assert not bool(ovf)
    # NT = 12 tiles at 32x8 (W=64, H=48): mega=2 divides, mega=8 is
    # clamped to 6 by raster3d.clamp_mega — exercising both paths
    # (mega=3 dropped: same dividing-case coverage as 2, ~13 s of
    # single-CPU interpret time — suite budget, VERDICT r4 item 8)
    for mega in (2, 8):
        got, ovf_m = raster3d.render_textured_pallas_batch(
            *args, mega=mega, **kw)
        assert not bool(ovf_m), mega
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_tex_out8_ktail_match():
    # out8: sublane-major (n_sub, 128) out blocks — the tex epilogue
    # skips BOTH from_sub masked-reduce conversions and the out array is
    # born layout-native; ktail: small-chunk remainder walk.  Bit-exact
    # vs the plain tex kernel, alone and combined with mega.
    rng = np.random.default_rng(3)
    verts, faces, uvs = mesh.quad_batch(12, seed=3)
    tex_u8 = rng.integers(0, 256, (32, 32, 4), np.uint8)
    mvp = np.eye(4, dtype=np.float32)
    args = (jnp.asarray(verts, jnp.float32), jnp.asarray(faces, jnp.int32),
            jnp.asarray(uvs, jnp.float32), jnp.asarray(tex_u8), W, H,
            jnp.asarray(np.stack([mvp])))
    kw = dict(tile_w=32, tile_h=8, capacity=512, span_x=8, span_y=8,
              interpret=True)
    base, ovf = raster3d.render_textured_pallas_batch(*args, **kw)
    assert not bool(ovf)
    for extra in (dict(out8=True), dict(ktail=8),
                  dict(out8=True, ktail=8, mega=2)):
        # (suite-budget trim: bare out8+ktail8 is subsumed by the
        # +mega=2 combination)
        got, ovf_v = raster3d.render_textured_pallas_batch(
            *args, **kw, **extra)
        assert not bool(ovf_v), extra
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_tex_fused_loop_matches_batch():
    # render_textured_pallas_loop (single-frame prep + kernel inside a
    # device fori_loop) == the vmap-batched entry, bit-exact — same
    # per-frame ops, different program structure
    rng = np.random.default_rng(3)
    verts, faces, uvs = mesh.quad_batch(12, seed=3)
    tex_u8 = rng.integers(0, 256, (32, 32, 4), np.uint8)
    mvps = jnp.asarray(np.stack(
        [np.eye(4, dtype=np.float32)] * 3))
    args = (jnp.asarray(verts, jnp.float32),
            jnp.asarray(faces, jnp.int32),
            jnp.asarray(uvs, jnp.float32), jnp.asarray(tex_u8), W, H,
            mvps)
    # mega=0 pins the mega-free control: the loop entry's default went
    # to mega=8 in round 4, which would silently turn this into a
    # mega-vs-mega comparison (r4 advisor)
    kw = dict(tile_w=32, tile_h=8, capacity=512, span_x=8, span_y=8,
              interpret=True, mega=0)
    base, ovf = raster3d.render_textured_pallas_batch(*args, **kw)
    got, ovf_l = raster3d.render_textured_pallas_loop(*args, **kw)
    assert bool(ovf) == bool(ovf_l)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_tex_resolve_footprint_fallback():
    # a quad whose v-UV sweeps the whole 256-row texture within a few
    # screen tiles overflows the per-tile footprint (fh rows max), so
    # the kernel marks those pixels (fbidx >= 0) and the lax.cond XLA
    # gather finishes them — output must still match the f32 path
    rng = np.random.default_rng(5)
    verts = np.array([[-0.9, -0.9, 0.5], [0.9, -0.9, 0.5],
                      [-0.9, 0.9, 0.5], [0.9, 0.9, 0.5]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    uvs = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    tex_u8 = rng.integers(0, 256, (256, 32, 4), np.uint8)
    mvp = np.eye(4, dtype=np.float32)
    fb_a, _, _ = raster3d.render_textured_pallas(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(uvs),
        jnp.asarray(tex_u8, jnp.float32), W, H,
        tile_w=32, tile_h=8, capacity=16, span_x=8, span_y=8,
        interpret=True, perspective_correct=True)
    fb_b, _ = raster3d.render_textured_pallas_batch(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(uvs),
        jnp.asarray(tex_u8), W, H, jnp.asarray(mvp[None]),
        tile_w=32, tile_h=8, capacity=16, span_x=8, span_y=8,
        interpret=True, perspective_correct=True)
    a = np.asarray(fb_a)
    b = np.asarray(fb_b)[0]
    hit = a[..., 3] > 0
    # every hit pixel v-extent per 8px tile is 256*(8/38)≈54 rows > fh,
    # so this scene exercises the fallback for most tiles
    same = (a.astype(np.int32) == b.astype(np.int32)).all(-1)
    assert same[hit].mean() > 0.995, same[hit].mean()
    np.testing.assert_array_equal(hit, b[..., 3] > 0)


def test_tex_resolve_full_gather_escape():
    # fb_tile_cap=1 forces the whole-plane-gather escape (more bad
    # tiles than the compaction cap) — output must be identical to the
    # default compacted path
    rng = np.random.default_rng(7)
    verts = np.array([[-0.9, -0.9, 0.5], [0.9, -0.9, 0.5],
                      [-0.9, 0.9, 0.5], [0.9, 0.9, 0.5]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    uvs = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    tex_u8 = rng.integers(0, 256, (256, 32, 4), np.uint8)
    mvp = np.eye(4, dtype=np.float32)
    outs = []
    for cap in (1, 1024):
        fb, _ = raster3d.render_textured_pallas_batch(
            jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(uvs),
            jnp.asarray(tex_u8), W, H, jnp.asarray(mvp[None]),
            tile_w=32, tile_h=8, capacity=16, span_x=8, span_y=8,
            interpret=True, perspective_correct=True, fb_tile_cap=cap)
        outs.append(np.asarray(fb)[0])
    np.testing.assert_array_equal(outs[0], outs[1])


def test_tex_split_matches():
    # bimodal-v footprint split (tex_split=True) only moves pixels from
    # the XLA fallback gather into the in-kernel window resolve — both
    # sample the same clamped-nearest texel, so the final RGBA must be
    # bit-identical with the split on or off, including on the
    # footprint-overflow scene where the split actually engages
    rng = np.random.default_rng(13)
    scenes = []
    verts, faces, uvs = mesh.quad_batch(12, seed=3)
    scenes.append((verts, faces, uvs,
                   rng.integers(0, 256, (32, 32, 4), np.uint8)))
    verts2 = np.array([[-0.9, -0.9, 0.5], [0.9, -0.9, 0.5],
                       [-0.9, 0.9, 0.5], [0.9, 0.9, 0.5]], np.float32)
    faces2 = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    uvs2 = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    scenes.append((verts2, faces2, uvs2,
                   rng.integers(0, 256, (256, 32, 4), np.uint8)))
    mvp = np.eye(4, dtype=np.float32)
    for verts_s, faces_s, uvs_s, tex_u8 in scenes:
        outs = []
        for split in (False, True):
            fb, ovf = raster3d.render_textured_pallas_batch(
                jnp.asarray(verts_s, jnp.float32),
                jnp.asarray(faces_s, jnp.int32),
                jnp.asarray(uvs_s, jnp.float32), jnp.asarray(tex_u8),
                W, H, jnp.asarray(mvp[None]),
                tile_w=32, tile_h=8, capacity=64, span_x=8, span_y=8,
                interpret=True, perspective_correct=True,
                tex_split=split)
            assert not bool(ovf)
            outs.append(np.asarray(fb)[0])
        np.testing.assert_array_equal(outs[0], outs[1])


def test_tex_mxu_walk_matches():
    # the MXU chunk walk on the textured path (affine UVW planes,
    # build_table_mxu): identical hit masks; texel flips only at UV
    # knife edges (precombined u/v plane rounding), so >=99% of pixels
    # carry the identical texel
    rng = np.random.default_rng(11)
    verts, faces, uvs = mesh.quad_batch(12, seed=3)
    tex_u8 = rng.integers(0, 256, (32, 32, 4), np.uint8)
    mvp = np.eye(4, dtype=np.float32)
    for persp in (False, True):
        outs = []
        for mxu in (0, 1):
            fb, ovf = raster3d.render_textured_pallas_batch(
                jnp.asarray(verts, jnp.float32),
                jnp.asarray(faces, jnp.int32),
                jnp.asarray(uvs, jnp.float32), jnp.asarray(tex_u8),
                W, H, jnp.asarray(np.stack([mvp, mvp])),
                tile_w=32, tile_h=8, capacity=64, span_x=8, span_y=8,
                interpret=True, perspective_correct=persp, mxu=mxu)
            assert not bool(ovf)
            outs.append(np.asarray(fb))
        a, b = outs
        np.testing.assert_array_equal(b[0], b[1])
        np.testing.assert_array_equal(a[0][..., 3] > 0, b[0][..., 3] > 0)
        same = (a[0].astype(np.int32) == b[0].astype(np.int32)).all(-1)
        assert same.mean() > 0.99, (persp, same.mean())


def test_tex_dyn_window_loop_matches():
    # tex_dyn=True (per-tile dynamic footprint-window count: the static
    # NW-unroll becomes a fori_loop bounded by the tile's actual window
    # demand) is bit-exact vs the static unroll — skipped iterations only
    # touch acc positions the resolve mask never consumes.  Exercised
    # with a rotated mesh (non-trivial UV footprints) and both split
    # modes.
    rng = np.random.default_rng(9)
    verts, faces, uvs = mesh.quad_batch(12, seed=9)
    tex_u8 = rng.integers(0, 256, (64, 64, 4), np.uint8)
    rot = mesh.rotation_y(0.6) @ mesh.rotation_x(0.3)
    # B=1, rotated frame only: batch-dim coverage lives in
    # test_tex_idx_batch_matches_single (suite budget)
    mvps = jnp.asarray(np.stack([rot]).astype(np.float32))
    args = (jnp.asarray(verts, jnp.float32),
            jnp.asarray(faces, jnp.int32),
            jnp.asarray(uvs, jnp.float32), jnp.asarray(tex_u8), W, H,
            mvps)
    for split in (True,):   # shipped default; tex_dyn is default-off
        # measured-negative — this guards only its bit-exactness
        # contract (suite-budget trim)
        kw = dict(tile_w=32, tile_h=8, capacity=512, span_x=8, span_y=8,
                  interpret=True, tex_split=split)
        base, ovf = raster3d.render_textured_pallas_batch(*args, **kw)
        got, ovf_d = raster3d.render_textured_pallas_batch(
            *args, tex_dyn=True, **kw)
        assert bool(ovf) == bool(ovf_d)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_tex_when_predicated_groups_match():
    # tex_when=g (grouped predicated unroll: windows run in static
    # groups of g, each group wrapped in pl.when(w_need > group_start))
    # is bit-exact vs the full static unroll — same skip argument as
    # tex_dyn, but group interiors keep the unrolled pipelining.
    # Exercised with a rotated mesh (varied footprint demand), both
    # split modes, group sizes that do and don't divide NW, and
    # combined with out8.
    rng = np.random.default_rng(11)
    verts, faces, uvs = mesh.quad_batch(12, seed=11)
    tex_u8 = rng.integers(0, 256, (64, 64, 4), np.uint8)
    rot = mesh.rotation_y(0.6) @ mesh.rotation_x(0.3)
    # B=1, rotated frame only: batch-dim coverage lives in
    # test_tex_idx_batch_matches_single (suite budget)
    mvps = jnp.asarray(np.stack([rot]).astype(np.float32))
    args = (jnp.asarray(verts, jnp.float32),
            jnp.asarray(faces, jnp.int32),
            jnp.asarray(uvs, jnp.float32), jnp.asarray(tex_u8), W, H,
            mvps)
    for split in (True,):   # split=True is the shipped default; the
        # tex_when predication is orthogonal to the footprint split
        # (suite-budget trim: tex_when is a default-off measured-negative
        # variant — this test only guards its bit-exactness contract)
        kw = dict(tile_w=32, tile_h=8, capacity=512, span_x=8, span_y=8,
                  interpret=True, tex_split=split)
        base, ovf = raster3d.render_textured_pallas_batch(*args, **kw)
        for extra in (dict(tex_when=4), dict(tex_when=6),
                      dict(tex_when=4, out8=True)):
            got, ovf_w = raster3d.render_textured_pallas_batch(
                *args, **kw, **extra)
            assert bool(ovf) == bool(ovf_w), extra
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(base), err_msg=str(extra))


def test_tex_loop_mega_zclip_match():
    # fused-loop entry: mega tile grouping and the caller-verified
    # z_clip=False contract (z-range check folded into the overflow
    # flag, mirroring render_gouraud_pallas) are bit-exact vs the
    # per-tile-program z-clipped loop.  The z-remap mvp keeps every
    # vertex z inside [0, 1] so z_clip=False stays on the fast path.
    rng = np.random.default_rng(13)
    verts, faces, uvs = mesh.quad_batch(12, seed=13)
    tex_u8 = rng.integers(0, 256, (64, 64, 4), np.uint8)
    zmap = np.eye(4, dtype=np.float32)
    zmap[2, 2] = 0.25
    zmap[2, 3] = 0.5
    rot = (zmap @ mesh.rotation_y(0.6) @ mesh.rotation_x(0.3)).astype(
        np.float32)
    # B=1, rotated frame only (carries the z-remap): batch-dim
    # coverage lives in test_tex_idx_batch_matches_single
    mvps = jnp.asarray(np.stack([rot]))
    args = (jnp.asarray(verts, jnp.float32),
            jnp.asarray(faces, jnp.int32),
            jnp.asarray(uvs, jnp.float32), jnp.asarray(tex_u8), W, H)
    # mega=0 keeps the control mega-free now that the entry defaults to
    # mega=8 (r4 advisor); extras override it where they test mega
    kw = dict(mvps=mvps, tile_w=32, tile_h=8, capacity=512, span_x=8,
              span_y=8, interpret=True, mega=0)
    base, ovf = raster3d.render_textured_pallas_loop(*args, **kw)
    assert not bool(ovf)
    for extra in (dict(z_clip=False),
                  dict(mega=2, z_clip=False)):
        # (suite-budget trim: standalone mega is covered by
        # test_tex_mega_loop_matches; this test guards z_clip and the
        # shipped mega+z_clip stack)
        got, ovf_v = raster3d.render_textured_pallas_loop(
            *args, **{**kw, **extra})
        assert not bool(ovf_v), extra
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base),
                                      err_msg=str(extra))


def test_tex_loop_zclip_off_flags_out_of_range():
    # z outside [0, 1] with z_clip=False must raise the overflow flag
    # (callers fall back to a z-clipped config) instead of rendering
    # unclipped garbage.
    rng = np.random.default_rng(14)
    verts, faces, uvs = mesh.quad_batch(6, seed=14)
    tex_u8 = rng.integers(0, 256, (32, 32, 4), np.uint8)
    zmap = np.eye(4, dtype=np.float32)
    zmap[2, 2] = 0.25
    zmap[2, 3] = 1.5            # z' = 0.25 z + 1.5 > 1 for every vertex
    mvps = jnp.asarray(zmap[None])
    _, ovf = raster3d.render_textured_pallas_loop(
        jnp.asarray(verts, jnp.float32), jnp.asarray(faces, jnp.int32),
        jnp.asarray(uvs, jnp.float32), jnp.asarray(tex_u8), W, H,
        mvps=mvps, tile_w=32, tile_h=8, capacity=512, span_x=8,
        span_y=8, interpret=True, z_clip=False)
    assert bool(ovf)


def test_tex_skip_empty_and_subrow_fallback_match():
    # tex_skip (empty-tile epilogue shortcut behind one pl.when) and
    # fb_subrow (128-px sub-row fallback compaction) are value-identical
    # to the unconditional epilogue + whole-tile compaction, alone and
    # combined with mega/z_clip; a tiny fb_tile_cap exercises the
    # whole-plane escape through the sub-row ladder.
    rng = np.random.default_rng(15)
    verts, faces, uvs = mesh.quad_batch(12, seed=15)
    tex_u8 = rng.integers(0, 256, (64, 64, 4), np.uint8)
    zmap = np.eye(4, dtype=np.float32)
    zmap[2, 2] = 0.25
    zmap[2, 3] = 0.5
    rot = (zmap @ mesh.rotation_y(0.6) @ mesh.rotation_x(0.3)).astype(
        np.float32)
    # B=1, rotated frame only (carries the z-remap): batch-dim
    # coverage lives in test_tex_idx_batch_matches_single
    mvps = jnp.asarray(np.stack([rot]))
    args = (jnp.asarray(verts, jnp.float32),
            jnp.asarray(faces, jnp.int32),
            jnp.asarray(uvs, jnp.float32), jnp.asarray(tex_u8), W, H)
    # mega=0 keeps the control mega-free now that the entry defaults to
    # mega=8 (r4 advisor); extras override it where they test mega
    kw = dict(mvps=mvps, tile_w=32, tile_h=8, capacity=512, span_x=8,
              span_y=8, interpret=True, mega=0)
    base, ovf = raster3d.render_textured_pallas_loop(
        *args, **kw, fb_subrow=False)
    assert not bool(ovf)
    for extra in (dict(), dict(tex_skip=True),
                  dict(tex_skip=True, mega=2, z_clip=False),
                  dict(fb_tile_cap=4)):
        # (suite-budget trim: tex_skip+fb_subrow=False is subsumed by
        # the shipped tex_skip+fb_subrow combination and the mega/z_clip
        # stack below)
        got, ovf_v = raster3d.render_textured_pallas_loop(
            *args, **{**kw, **extra})
        assert not bool(ovf_v), extra
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base),
                                      err_msg=str(extra))


def test_tex_tiled_matches_detiled():
    """tiled=True on the textured entries returns the kernel's per-tile
    (B, NT, P, 4) u8 layout; host detile (raster3d.detile_u8_host /
    native media.detile_u8 — the VideoCap encode-worker path)
    reproduces the detiled frames byte-for-byte, including viewport
    crop (H=48 doesn't divide tile_h=32)."""
    from libnativecpurenderer_tpu import media
    rng = np.random.default_rng(16)
    verts, faces, uvs = mesh.quad_batch(10, seed=16)
    tex_u8 = rng.integers(0, 256, (64, 64, 4), np.uint8)
    zmap = np.eye(4, dtype=np.float32)
    zmap[2, 2] = 0.25
    zmap[2, 3] = 0.5
    rot = (zmap @ mesh.rotation_y(0.5) @ mesh.rotation_x(0.2)).astype(
        np.float32)
    # B=1, rotated frame only (carries the z-remap): batch-dim
    # coverage lives in test_tex_idx_batch_matches_single
    mvps = jnp.asarray(np.stack([rot]))
    args = (jnp.asarray(verts, jnp.float32),
            jnp.asarray(faces, jnp.int32),
            jnp.asarray(uvs, jnp.float32), jnp.asarray(tex_u8), W, H)
    kw = dict(mvps=mvps, tile_w=32, tile_h=32, capacity=512, span_x=8,
              span_y=8, interpret=True)
    # the loop entry only: both entries share _tex_resolve_finish's
    # tiled path, and loop-vs-batch equality is pinned by
    # test_tex_fused_loop_matches_batch (suite budget: the batch pass
    # was a second ~9 s interpret compile of the same contract)
    for entry in (raster3d.render_textured_pallas_loop,):
        base, ovf = entry(*args, **kw)
        assert not bool(ovf)
        tiles, ovf_t = entry(*args, **kw, tiled=True)
        assert not bool(ovf_t)
        assert tiles.shape == (mvps.shape[0], 2 * 2, 32 * 32, 4)
        for b in range(2):
            np.testing.assert_array_equal(
                raster3d.detile_u8_host(tiles[b], W, H, 32, 32),
                np.asarray(base[b]))
            np.testing.assert_array_equal(
                media.detile_u8(np.asarray(tiles[b]), W, H, 32, 32),
                np.asarray(base[b]))


def test_tex_zclip_false_boundary_golden():
    """Golden u8 contract for the z_clip=False convention at the zz ~ 0/1
    depth boundaries (VERDICT r4 item 6).  z_clip=False performs NO
    per-pixel z-range rejection — pixels whose interpolated zz spills a
    few ulp past 0 or 1 (constant-z planes at sz=1 interpolate to
    w0+w1+w2 != 1 exactly) are still shaded, while z_clip=True rejects
    them; that is why the two modes are checksum-divergent at the
    boundary (ROADMAP texmega2) and why zoff rows need their own
    checksum base.  The oracle below implements the same convention
    (accept everything, clamp the quantised depth), so the fp-spill
    behaviour is contract, not folklore.  Device-validated 2026-08-20:
    the REAL Mosaic kernel matches this oracle on every pixel of this
    scene (tools/exp_r5_zb.py, 0/3072 differ)."""
    rng = np.random.default_rng(31)
    Wl, Hl = 64, 48
    tex_u8 = rng.integers(0, 256, (4, 4, 4)).astype(np.uint8)

    # three disjoint screen regions: a quad ON the near boundary
    # (NDC z=-1 -> sz=0), one ON the far boundary (z=+1 -> sz=1), and a
    # tilted quad sweeping the full 0..1 depth range.  Disjoint regions
    # keep the assert independent of +-1-level zq noise between modes.
    verts, faces, uvs = [], [], []

    def quad(x0, y0, x1, y1, z):
        b = len(verts)
        zs = z if isinstance(z, tuple) else (z, z, z, z)
        verts.extend([[x0, y0, zs[0]], [x1, y0, zs[1]],
                      [x1, y1, zs[2]], [x0, y1, zs[3]]])
        # asymmetric uv range: texel boundaries (u*4 integer) must not
        # land on pixel-center columns, or the f32/f64 interpolation
        # noise flips the sampled texel (the one legitimate divergence)
        uvs.extend([[0.031, 0.067], [0.911, 0.067], [0.911, 0.941],
                    [0.031, 0.941]])
        faces.extend([[b, b + 1, b + 2], [b, b + 2, b + 3]])

    quad(-0.9, -0.8, -0.4, 0.7, -1.0)            # sz = 0 exactly
    quad(-0.3, -0.8, 0.25, 0.7, 1.0)             # sz = 1 exactly
    quad(0.35, -0.8, 0.9, 0.7, (-1.0, 1.0, 1.0, -1.0))  # sweeps 0..1
    verts = np.asarray(verts, np.float32)
    faces_a = np.asarray(faces, np.int32)
    uvs = np.asarray(uvs, np.float32)

    got, ovf = raster3d.render_textured_pallas_loop(
        jnp.asarray(verts), jnp.asarray(faces_a), jnp.asarray(uvs),
        jnp.asarray(tex_u8), Wl, Hl,
        mvps=jnp.asarray(np.eye(4, dtype=np.float32)[None]),
        tile_w=32, tile_h=8, capacity=512, span_x=8, span_y=8,
        interpret=True, mega=0, z_clip=False)
    assert not bool(ovf)

    # oracle: scanline raster, SAME convention — no z rejection, zq
    # clamped; perspective-correct interpolation with w == 1; clamped
    # nearest texel (trunc-toward-zero cast then clip, raster3d:1191)
    from libnativecpurenderer_tpu.golden.raster_reference import project
    from libnativecpurenderer_tpu.ops.raster3d import (IDX_BITS, NO_TRI,
                                                       Z_LEVELS)
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
                zq = int(np.clip(z * Z_LEVELS, 0, Z_LEVELS))  # NO reject
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
    np.testing.assert_array_equal(np.asarray(got[0]), want)
