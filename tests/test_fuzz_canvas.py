"""Randomised command-stream fuzzing: executor vs the NumPy f64 oracle.

Random draw sequences with random (sometimes degenerate) transforms and
colors exercise encoding paths the hand-written scenes miss.
"""

import math

import numpy as np
import pytest

import libnativecpurenderer_tpu as R
from libnativecpurenderer_tpu.golden import cpu_reference as gold

W, H = 40, 28


def _apply_random_ops(rng, ctx, g, tex_pairs, n_ops):
    for _ in range(n_ops):
        op = rng.integers(0, 14)
        if op == 0:
            args = rng.uniform(0, 1, 4)
            ctx.set_color(*args)
            g.set_color(*args)
        elif op == 1:
            args = rng.uniform(0, 1.2, 4)
            ctx.fill_color(*args)
            g.fill_color(*args)
        elif op == 2:
            a = [rng.uniform(-10, W), rng.uniform(-10, H),
                 rng.uniform(-5, 30), rng.uniform(-5, 25),
                 *rng.uniform(0, 1, 4)]
            ctx.draw_rect(*a)
            g.draw_rect(*a)
        elif op == 3:
            a = [rng.uniform(-5, W), rng.uniform(-5, H),
                 rng.uniform(-2, 15), *rng.uniform(0, 1, 4)]
            ctx.draw_circle(*a)
            g.draw_circle(*a)
        elif op == 4:
            a = [rng.uniform(-10, W + 10), rng.uniform(-10, H + 10),
                 rng.uniform(-10, W + 10), rng.uniform(-10, H + 10),
                 rng.uniform(0, 6), *rng.uniform(0, 1, 4)]
            ctx.draw_line(*a)
            g.draw_line(*a)
        elif op == 5:
            a = [rng.uniform(-5, W), rng.uniform(-5, H),
                 rng.uniform(0, 25), rng.uniform(0, 20),
                 *rng.uniform(0, 1, 8)]
            ctx.draw_vertical_grd(*a)
            g.draw_vertical_grd(*a)
        elif op == 6:
            t, gt = tex_pairs[rng.integers(len(tex_pairs))]
            a = [rng.uniform(-8, W), rng.uniform(-8, H),
                 rng.uniform(-4, 25), rng.uniform(-4, 20)]
            ctx.draw_texture(t, *a)
            g.draw_texture(gt, *a)
        elif op == 7:
            t, gt = tex_pairs[rng.integers(len(tex_pairs))]
            a = [rng.uniform(-8, W), rng.uniform(-8, H),
                 rng.uniform(1, 25), rng.uniform(1, 20),
                 *np.sort(rng.uniform(0, 1, 2)), *np.sort(rng.uniform(0, 1, 2))]
            ctx.draw_splitted_texture(t, *a)
            g.draw_splitted_texture(gt, *a)
        elif op == 8:
            s = rng.uniform(-1.5, 2.5, 2)
            ctx.scale(*s)
            g.scale(*s)
        elif op == 9:
            tr = rng.uniform(-20, 20, 2)
            ctx.translate(*tr)
            g.translate(*tr)
        elif op == 10:
            ang = rng.uniform(-math.pi, math.pi)
            ctx.rotate(ang)
            g.rotate(ang)
        elif op == 11:
            c = rng.uniform(0, 1.5, 4)
            ctx.apply_color_transform(*c)
            g.apply_color_transform(*c)
        elif op == 12:
            ctx.save_state()
            g.save_state()
        else:
            ctx.restore_state()
            g.restore_state()


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_commands_match_oracle(seed):
    rng = np.random.default_rng(seed)
    tex_pairs = []
    for i in range(2):
        w, h = int(rng.integers(2, 12)), int(rng.integers(2, 12))
        arr = rng.random((h, w, 4))
        tex_pairs.append((
            R.Texture(w, h, True, arr.astype(np.float64).tobytes(),
                      is_uint8=False),
            gold.GoldenTexture(arr, True)))

    ctx = R.RenderContext(W, H, True)
    g = gold.GoldenContext(W, H, True)
    ctx.set_color(0, 0, 0, 1)
    g.set_color(0, 0, 0, 1)
    _apply_random_ops(rng, ctx, g, tex_pairs, 40)

    got = ctx.numpy_buffer()
    want = g.float_buffer()
    finite = np.isfinite(want)
    # color transforms can exceed 1 and compound; compare scaled tolerance
    scale = np.maximum(1.0, np.abs(want[finite]))
    assert np.all(np.abs(got[finite] - want[finite]) <= 1e-9 * scale), (
        np.abs(got[finite] - want[finite]).max())
    # non-finite positions (degenerate transforms) must match in location
    np.testing.assert_array_equal(np.isfinite(got), finite)
