"""Golden-image tests: jitted executor vs the trusted NumPy f64 model.

Contexts are float64 on the CPU backend (conftest), so results must match
the per-pixel golden model exactly (same double math, same op order).
"""

import numpy as np
import pytest

import libnativecpurenderer_tpu as R
from libnativecpurenderer_tpu.golden import cpu_reference as gold

W, H = 48, 32


def make_pair(w=W, h=H, alpha=True):
    return (R.RenderContext(w, h, alpha),
            gold.GoldenContext(w, h, alpha))


def assert_match(ctx, g, atol=1e-12):
    # XLA is free to contract multiply-add into FMA, so device doubles can
    # differ from the numpy model by ~1 ULP; u8 output may then flip by 1
    # exactly at truncation boundaries.
    got = ctx.numpy_buffer()
    want = g.float_buffer()
    np.testing.assert_allclose(got, want, atol=atol, rtol=0)
    du8 = ctx.uint8_buffer().astype(np.int16) - g.uint8_buffer().astype(np.int16)
    assert np.abs(du8).max() <= 1, f"u8 mismatch > 1 LSB: {np.abs(du8).max()}"


def both(ctx, g, name, *args, **kw):
    getattr(ctx, name)(*args, **kw)
    getattr(g, name)(*args, **kw)


def test_set_color_and_fill():
    ctx, g = make_pair()
    both(ctx, g, "set_color", 0.2, 0.4, 0.6, 0.8)
    both(ctx, g, "fill_color", 1.0, 0.0, 0.0, 0.25)
    assert_match(ctx, g)


def test_fill_with_color_transform():
    ctx, g = make_pair()
    both(ctx, g, "set_color", 0.1, 0.1, 0.1, 1.0)
    both(ctx, g, "set_color_transform", 0.5, 2.0, 1.0, 0.5)
    both(ctx, g, "fill_color", 0.8, 0.6, 0.4, 0.9)
    assert_match(ctx, g)


def test_rect_identity_and_transformed():
    ctx, g = make_pair()
    both(ctx, g, "set_color", 0.0, 0.0, 0.0, 1.0)
    both(ctx, g, "draw_rect", 3.2, 4.7, 20.5, 10.1, 0.9, 0.5, 0.3, 0.7)
    both(ctx, g, "save_state")
    both(ctx, g, "translate", 10.0, 5.0)
    both(ctx, g, "rotate", 0.3)
    both(ctx, g, "scale", 1.3, 0.8)
    both(ctx, g, "draw_rect", 0.0, 0.0, 15.0, 8.0, 0.1, 0.9, 0.2, 0.5)
    both(ctx, g, "restore_state")
    # negative / zero sizes draw nothing (cpp:853)
    both(ctx, g, "draw_rect", 5.0, 5.0, -3.0, 10.0, 1, 1, 1, 1)
    assert_match(ctx, g)


def test_circle():
    ctx, g = make_pair()
    both(ctx, g, "set_color", 1.0, 1.0, 1.0, 1.0)
    both(ctx, g, "draw_circle", 20.0, 15.0, 9.5, 0.2, 0.3, 0.9, 0.6)
    both(ctx, g, "rotate", -0.7)
    both(ctx, g, "draw_circle", 18.0, -4.0, 6.0, 0.9, 0.1, 0.1, 1.0)
    assert_match(ctx, g)


def test_line():
    ctx, g = make_pair()
    both(ctx, g, "set_color", 0.0, 0.0, 0.0, 1.0)
    both(ctx, g, "draw_line", 2.0, 3.0, 40.0, 25.0, 4.0, 1.0, 0.8, 0.2, 0.9)
    both(ctx, g, "scale", 0.7, 1.2)
    both(ctx, g, "draw_line", 5.0, 30.0, 55.0, 1.0, 7.5, 0.3, 0.3, 1.0, 0.4)
    # zero-length and zero-width lines draw nothing (cpp:883, 891)
    both(ctx, g, "draw_line", 5.0, 5.0, 5.0, 5.0, 3.0, 1, 1, 1, 1)
    both(ctx, g, "draw_line", 1.0, 1.0, 9.0, 9.0, 0.0, 1, 1, 1, 1)
    assert_match(ctx, g)


def test_vertical_gradient():
    ctx, g = make_pair()
    both(ctx, g, "set_color", 0.5, 0.5, 0.5, 1.0)
    both(ctx, g, "draw_vertical_grd", 4.0, 2.0, 30.0, 25.0,
         1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0)
    both(ctx, g, "rotate_degree", 15.0)
    both(ctx, g, "draw_vertical_grd", 10.0, 5.0, 20.0, 20.0,
         0.1, 0.9, 0.1, 1.0, 0.9, 0.1, 0.9, 0.2)
    assert_match(ctx, g)


def test_mut_gradient():
    ctx, g = make_pair()
    steps = [(0.0, (0, 0, 0, 0.0)), (0.5, (0, 0, 0, 0.6)), (1.0, (0, 0, 0, 1.0))]
    both(ctx, g, "set_color", 1.0, 1.0, 1.0, 1.0)
    ctx.draw_vertical_mut_grd(0, H * 0.4, W, H * 0.6, steps)
    # golden: expand manually like pybind:272-280
    for i, (p, s) in enumerate(steps[:-1]):
        np_, ns = steps[i + 1]
        g.draw_vertical_grd(0, H * 0.4 + H * 0.6 * p, W, H * 0.6 * (np_ - p),
                            s[0], s[1], s[2], s[3], ns[0], ns[1], ns[2], ns[3])
    assert_match(ctx, g)


def test_pixels():
    ctx, g = make_pair()
    both(ctx, g, "set_color", 0.3, 0.3, 0.3, 1.0)
    both(ctx, g, "set_pixel", 5, 7, 0.1, 0.2, 0.3, 0.4)
    both(ctx, g, "set_color_transform", 0.5, 0.5, 0.5, 0.5)
    both(ctx, g, "apply_pixel", 6, 8, 1.0, 1.0, 1.0, 1.0)
    both(ctx, g, "apply_pixel", -1, 8, 1.0, 1.0, 1.0, 1.0)  # OOB no-op
    assert_match(ctx, g)
    # get_color parity (cpp:659-680)
    assert ctx.get_color(5, 7) == (0.1, 0.2, 0.3, 0.4)
    assert ctx.get_color(-5, 700)[0] == g.buf[H - 1, 0, 0]


def _rand_tex(rng, w, h, alpha=True):
    arr = rng.random((h, w, 4 if alpha else 3))
    return (R.Texture(w, h, alpha, arr.astype(np.float64).tobytes(),
                      is_uint8=False),
            gold.GoldenTexture(arr, alpha))


def test_texture_fast_path():
    rng = np.random.default_rng(0)
    tex, gtex = _rand_tex(rng, 8, 8)
    ctx, g = make_pair()
    both(ctx, g, "set_color", 0.0, 0.0, 0.0, 1.0)
    # identity transform -> fast path, fractional position
    ctx.draw_texture(tex, 3.4, 2.7, 17.0, 12.0)
    g.draw_texture(gtex, 3.4, 2.7, 17.0, 12.0)
    assert_match(ctx, g)


def test_texture_fast_path_quirk_downscale():
    # scale(0.25) passes IsNoTransform's sum test (cpp:551-553) so the draw
    # ignores the transform entirely — observable reference behaviour.
    rng = np.random.default_rng(1)
    tex, gtex = _rand_tex(rng, 8, 8)
    ctx, g = make_pair()
    both(ctx, g, "set_color", 0.0, 0.0, 0.0, 1.0)
    both(ctx, g, "scale", 0.25, 0.25)
    ctx.draw_texture(tex, 4.0, 4.0, 20.0, 20.0)
    g.draw_texture(gtex, 4.0, 4.0, 20.0, 20.0)
    assert_match(ctx, g)


def test_texture_transformed():
    rng = np.random.default_rng(2)
    tex, gtex = _rand_tex(rng, 10, 6)
    ctx, g = make_pair()
    both(ctx, g, "set_color", 0.1, 0.1, 0.1, 1.0)
    both(ctx, g, "translate", 8.0, 3.0)
    both(ctx, g, "rotate", 0.4)
    both(ctx, g, "scale", 1.5, 1.1)  # sum test fails -> general path
    ctx.draw_texture(tex, 1.0, 1.0, 14.0, 9.0)
    g.draw_texture(gtex, 1.0, 1.0, 14.0, 9.0)
    assert_match(ctx, g)


def test_texture_color_transform_applies():
    rng = np.random.default_rng(3)
    tex, gtex = _rand_tex(rng, 4, 4)
    ctx, g = make_pair()
    both(ctx, g, "set_color", 0.0, 0.0, 0.0, 1.0)
    both(ctx, g, "apply_color_transform", 0.9, 0.5, 0.2, 0.7)
    both(ctx, g, "scale", 2.0, 2.0)
    ctx.draw_texture(tex, 2.0, 2.0, 8.0, 8.0)
    g.draw_texture(gtex, 2.0, 2.0, 8.0, 8.0)
    assert_match(ctx, g)


def test_splitted_texture():
    rng = np.random.default_rng(4)
    tex, gtex = _rand_tex(rng, 12, 12)
    ctx, g = make_pair()
    both(ctx, g, "set_color", 0.0, 0.0, 0.0, 1.0)
    both(ctx, g, "translate", 4.0, 4.0)
    both(ctx, g, "scale", 1.5, 1.5)
    ctx.draw_splitted_texture(tex, 0.0, 0.0, 20.0, 15.0, 0.25, 0.75, 0.1, 0.9)
    g.draw_splitted_texture(gtex, 0.0, 0.0, 20.0, 15.0, 0.25, 0.75, 0.1, 0.9)
    assert_match(ctx, g)


def test_rgb_context():
    rng = np.random.default_rng(5)
    tex, gtex = _rand_tex(rng, 6, 6, alpha=False)
    ctx, g = make_pair(alpha=False)
    both(ctx, g, "set_color", 0.2, 0.2, 0.2, 0.2)
    both(ctx, g, "draw_rect", 2.0, 2.0, 30.0, 20.0, 0.5, 0.6, 0.7, 0.5)
    both(ctx, g, "scale", 2.0, 1.0)
    ctx.draw_texture(tex, 1.0, 1.0, 10.0, 10.0)
    g.draw_texture(gtex, 1.0, 1.0, 10.0, 10.0)
    assert ctx.channels == 3
    assert ctx.get_buffer_size() == W * H * 3
    assert_match(ctx, g)


def test_resample_texture():
    rng = np.random.default_rng(6)
    tex, gtex = _rand_tex(rng, 9, 7)
    small = tex.resample(4, 5)
    gsmall = gtex.resample(4, 5)
    np.testing.assert_allclose(small.to_numpy()[..., :4],
                               np.concatenate([gsmall.buf], axis=-1))


def test_hit_effect_procedural_vs_golden():
    rng = np.random.default_rng(7)
    mask_arr = rng.random((16, 16, 4))
    mask = R.Texture(16, 16, True, mask_arr.astype(np.float64).tobytes(),
                     is_uint8=False)
    gmask = gold.GoldenTexture(mask_arr, True)
    het = R.HitEffectTexture(mask, seed=0.42, t=0.5, r=0.9, g=0.8, b=0.7)
    ghet = gold.hit_effect_texture(gmask, 0.42, 0.5, 0.9, 0.8, 0.7)

    ctx, g = make_pair()
    both(ctx, g, "set_color", 0.0, 0.0, 0.0, 1.0)
    both(ctx, g, "translate", 6.0, 3.0)
    both(ctx, g, "scale", 1.4, 1.4)
    ctx.draw_texture(het, 0.0, 0.0, 20.0, 20.0)
    g.draw_texture(ghet, 0.0, 0.0, 20.0, 20.0)
    assert_match(ctx, g)
    # materialised texture matches the golden buffer too
    mat = het.materialize()
    np.testing.assert_allclose(mat.to_numpy(), ghet.buf, atol=1e-12)


def test_hit_effect_fast_path():
    rng = np.random.default_rng(8)
    mask_arr = rng.random((8, 8, 4))
    mask = R.Texture(8, 8, True, mask_arr.astype(np.float64).tobytes(),
                     is_uint8=False)
    gmask = gold.GoldenTexture(mask_arr, True)
    het = R.HitEffectTexture(mask, seed=0.1, t=0.3, r=1.0, g=0.5, b=0.2)
    ghet = gold.hit_effect_texture(gmask, 0.1, 0.3, 1.0, 0.5, 0.2)
    ctx, g = make_pair()
    both(ctx, g, "set_color", 0.0, 0.0, 0.0, 1.0)
    ctx.draw_texture(het, 3.5, 2.5, 12.0, 12.0)  # identity -> fast path
    g.draw_texture(ghet, 3.5, 2.5, 12.0, 12.0)
    assert_match(ctx, g)


def test_as_texture_roundtrip():
    ctx, g = make_pair()
    both(ctx, g, "set_color", 0.0, 0.0, 0.0, 1.0)
    both(ctx, g, "draw_rect", 5.0, 5.0, 20.0, 15.0, 0.9, 0.1, 0.5, 1.0)
    tex = ctx.as_texure()
    gtex = gold.GoldenTexture(g.buf.copy(), True)
    ctx2, g2 = make_pair()
    both(ctx2, g2, "set_color", 1.0, 1.0, 1.0, 1.0)
    both(ctx2, g2, "scale", 2.0, 2.0)  # force general path
    ctx2.draw_texture(tex, 0.0, 0.0, 24.0, 16.0)
    g2.draw_texture(gtex, 0.0, 0.0, 24.0, 16.0)
    assert_match(ctx2, g2)


def test_get_version():
    assert R.get_version() == 1


def test_bilinear_resample_option():
    """Opt-in bilinear resample: exact on a linear ramp, default unchanged."""
    w = 8
    ramp = np.zeros((w, w, 4))
    ramp[..., 0] = np.arange(w)[None, :] / (w - 1)
    ramp[..., 3] = 1.0
    tex = R.Texture(w, w, True, ramp.astype(np.float64).tobytes(),
                    is_uint8=False)
    up = tex.resample(16, 16, filter="bilinear")
    out = up.to_numpy()
    # interior of a bilinear upscale of a linear ramp stays linear in x
    mid = out[8, 2:14, 0]
    d = np.diff(mid)
    np.testing.assert_allclose(d, d[0], atol=1e-9)
    # rows identical (no vertical variation)
    np.testing.assert_allclose(out[3, :, 0], out[12, :, 0], atol=1e-12)
    # default filter still matches the golden nearest model
    near = tex.resample(16, 16)
    gt = gold.GoldenTexture(ramp, True).resample(16, 16)
    np.testing.assert_allclose(near.to_numpy(), gt.buf, atol=1e-12)
