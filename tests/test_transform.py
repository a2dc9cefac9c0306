"""Host transform math vs reference semantics (cpp:386-492, 693-718)."""

import math

from libnativecpurenderer_tpu.core import transform as xf


def test_identity():
    assert xf.IDENTITY == (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    assert xf.transform_point(xf.IDENTITY, 3.5, -2.0) == (3.5, -2.0)


def test_compose_order_matches_canvas():
    # translate then scale: point (1,1) -> scale applies first in local space
    m = xf.translate(xf.IDENTITY, 10.0, 20.0)
    m = xf.scale(m, 2.0, 3.0)
    assert xf.transform_point(m, 1.0, 1.0) == (12.0, 23.0)


def test_rotate():
    m = xf.rotate(xf.IDENTITY, math.pi / 2)
    x, y = xf.transform_point(m, 1.0, 0.0)
    assert abs(x) < 1e-12 and abs(y - 1.0) < 1e-12


def test_inverse_roundtrip():
    m = xf.compose(xf.IDENTITY, 1.5, 0.2, -0.3, 0.9, 40.0, -7.0)
    inv = xf.inverse(m)
    x, y = xf.transform_point(m, 3.0, 4.0)
    bx, by = xf.transform_point(inv, x, y)
    assert abs(bx - 3.0) < 1e-9 and abs(by - 4.0) < 1e-9


def test_inverse_degenerate_uses_1e9():
    # det == 0 -> inv_det = 1e9 (cpp:484), entries finite, not a failure
    inv = xf.inverse((0.0, 0.0, 0.0, 0.0, 5.0, 6.0))
    assert all(abs(v) < 1e13 for v in inv)


def test_is_no_transform_sum_quirk():
    assert xf.is_no_transform(xf.IDENTITY)
    # downscale: sum test (not abs) classifies as "no transform" (cpp:551-553)
    assert xf.is_no_transform(xf.scale(xf.IDENTITY, 0.25, 0.25))
    assert not xf.is_no_transform(xf.scale(xf.IDENTITY, 2.0, 2.0))
    assert xf.is_no_transform(xf.translate(xf.IDENTITY, -100.0, 0.0))
    assert not xf.is_no_transform(xf.translate(xf.IDENTITY, 100.0, 0.0))


def test_aabb_truncation_and_clamp():
    # rect [-5, 10.7] x [2.3, 8.9] under identity on a 9x9 screen
    box = xf.aabb(xf.IDENTITY, -5.0, 2.3, 15.7, 6.6, 9.0, 9.0)
    assert box == (0, 9, 2, 8)  # trunc toward zero, clamp to [0, max]


def test_save_restore_stack():
    from libnativecpurenderer_tpu.core.state import RenderState
    s = RenderState()
    s.scale(2.0, 2.0)
    s.set_color_transform(0.5, 0.6, 0.7, 0.8)
    s.save()
    s.translate(5.0, 5.0)
    s.apply_color_transform(0.5, 0.5, 0.5, 0.5)
    assert s.restore()
    assert s.matrix == xf.scale(xf.IDENTITY, 2.0, 2.0)
    assert s.color == (0.5, 0.6, 0.7, 0.8)
    assert not s.restore()  # empty stack -> false (cpp:293)
