"""Native recording core (native/fastrec.c) vs the pure-Python path."""

import math

import numpy as np
import pytest

import libnativecpurenderer_tpu as R
from libnativecpurenderer_tpu import fastrec
from libnativecpurenderer_tpu.core import transform as xf
from libnativecpurenderer_tpu.ops import commands as C

pytestmark = pytest.mark.skipif(not fastrec.available(),
                                reason="native fastrec not built")


def _py_aabb(m, x, y, w, h, mw, mh):
    saved = xf._fast
    xf._fast = None
    try:
        return xf.aabb(m, x, y, w, h, mw, mh)
    finally:
        xf._fast = saved


def test_aabb_parity_fuzz():
    rng = np.random.default_rng(7)
    for trial in range(3000):
        kind = trial % 5
        if kind == 0:
            m = tuple(float(v) for v in rng.uniform(-3, 3, 6))
        elif kind == 1:           # pure translation
            m = (1.0, 0.0, 0.0, 1.0, float(rng.integers(-50, 50)),
                 float(rng.integers(-50, 50)))
        elif kind == 2:           # integer matrices incl. det == 0
            m = tuple(float(v) for v in rng.integers(-4, 5, 6))
        elif kind == 3:           # huge values (inverse 1e9 quirk scale)
            m = tuple(float(v) * 1e9 for v in rng.uniform(-1, 1, 6))
        else:                     # rotation: knife-edge trig products
            a = float(rng.uniform(0, 2 * math.pi))
            m = (math.cos(a), math.sin(a), -math.sin(a), math.cos(a),
                 float(rng.integers(0, 100)), float(rng.integers(0, 100)))
        x = float(rng.uniform(-100, 2000))
        y = float(rng.uniform(-100, 1200))
        w = float(rng.uniform(0, 500))
        h = float(rng.uniform(0, 500))
        assert tuple(fastrec.mod.aabb(m, x, y, w, h, 1920.0, 1080.0)) \
            == tuple(_py_aabb(m, x, y, w, h, 1920.0, 1080.0))


def test_aabb_nan_raises_like_python():
    m = (float("nan"), 0.0, 0.0, 1.0, 0.0, 0.0)
    with pytest.raises(ValueError):
        fastrec.mod.aabb(m, 0.0, 0.0, 10.0, 10.0, 100.0, 100.0)


def test_aabb_inf_parity():
    """Overflowed transforms (inf corners) clamp identically on the
    native and pure-Python paths — int(inf) used to raise only on the
    Python side (round-3 review)."""
    cases = [
        ((1e300, 0.0, 0.0, 1e300, 0.0, 0.0), 0.0, 0.0, 1e10, 1e10),
        ((float("inf"), 0.0, 0.0, 1.0, 0.0, 0.0), 1.0, 1.0, 5.0, 5.0),
        ((1.0, 0.0, 0.0, 1.0, float("-inf"), 0.0), 0.0, 0.0, 5.0, 5.0),
        ((-1e200, 0.0, 0.0, 1e200, 1e200, -1e200), 1e120, 1e120,
         1e120, 1e120),
    ]
    for m, x, y, w, h in cases:
        assert tuple(fastrec.mod.aabb(m, x, y, w, h, 1920.0, 1080.0)) \
            == tuple(_py_aabb(m, x, y, w, h, 1920.0, 1080.0)), m


def test_inverse_parity():
    rng = np.random.default_rng(8)
    for trial in range(1000):
        if trial % 2:
            m = tuple(float(v) for v in rng.uniform(-3, 3, 6))
        else:                     # integer, hits det == 0 -> 1e9 quirk
            m = tuple(float(v) for v in rng.integers(-2, 3, 6))
        xf._INV_CACHE.clear()
        assert fastrec.mod.inverse(m) == xf.inverse(m)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_record_row_parity(dtype):
    rng = np.random.default_rng(9)
    bufs = []
    for use_fast in (True, False):
        saved = C._fast
        C._fast = fastrec.mod if use_fast else None
        try:
            buf = C.CommandBuffer()
            buf.params = buf.params.astype(dtype)
            for t in range(300):   # forces growth past 256
                inv = tuple(float(v) for v in rng.uniform(-2, 2, 6))
                box = tuple(int(v) for v in rng.integers(0, 500, 4))
                ct = tuple(float(v) for v in rng.uniform(0, 1, 4))
                spec = list(rng.uniform(-1, 1, rng.integers(0, 19)))
                buf.append(int(rng.integers(0, 12)), (inv, box, ct), spec)
        finally:
            C._fast = saved
        bufs.append(buf.snapshot())
        rng = np.random.default_rng(9)   # same stream for both passes
    (k1, p1), (k2, p2) = bufs
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_array_equal(np.asarray(p1, np.float64),
                                  np.asarray(p2, np.float64))


def test_routes_for_size_parity():
    """Native footprint-route math == the numpy for_size, including the
    NaN propagation of zero-extent split textures (0/0 divides)."""
    from libnativecpurenderer_tpu.ops import patch_exec as pe

    rng = np.random.default_rng(1)
    W, H = 1920, 1080
    r_choices = [128, 256, 512]
    sizes = [128, 256, 512]
    for trial in range(60):
        n = int(rng.integers(1, 80))
        kinds = rng.choice(
            [C.KIND_RECT, C.KIND_TEX, C.KIND_TEX_FAST, C.KIND_SPLIT_TEX,
             C.KIND_HITEFFECT, C.KIND_FILL], n).astype(np.int32)
        p = rng.uniform(-2, 2, (n, C.PARAM_W))
        p[:, 6] = rng.uniform(-100, 2000, n)
        p[:, 8] = rng.uniform(-100, 1200, n)
        p[:, 22] = rng.choice([0.0, 1.0, 16.0, 128.0, 512.0], n)
        p[:, 23] = rng.choice([0.0, 1.0, 16.0, 128.0, 512.0], n)
        p[:, 18] = rng.uniform(-2, 2, n)
        p[:, 19] = rng.uniform(-2, 2, n)
        p[:, 29] = rng.choice([0.0, 1.0], n)
        z = rng.random(n) < 0.4
        p[z, 1] = 0.0
        p[z, 2] = 0.0
        for P in (128, 256):
            rt_n, rn_n = pe._routes_table(kinds, p, W, H, r_choices,
                                          sizes)(P)
            saved = pe._fast
            pe._fast = None
            try:
                with np.errstate(invalid="ignore"):
                    rt_p, rn_p = pe._routes_table(kinds, p, W, H,
                                                  r_choices, sizes)(P)
            finally:
                pe._fast = saved
            for i in np.nonzero(np.isin(kinds,
                                        pe._SAMPLING_KINDS_T))[0]:
                assert int(rt_n[i]) == int(rt_p[i])
                assert int(rn_n[i]) == int(rn_p[i])


def test_recorded_scene_matches_python_path(monkeypatch):
    """A full draw-call scene records byte-identical buffers either way."""
    def scene(ctx):
        ctx.set_color(0, 0, 0, 1)
        ctx.save_state()
        ctx.translate(11.5, 7.25)
        ctx.rotate(0.3)
        ctx.draw_rect(2, 3, 20, 10, 0.9, 0.5, 0.2, 0.8)
        ctx.draw_circle(30, 20, 8, 0.2, 0.6, 1.0, 0.5)
        ctx.draw_line(1, 1, 50, 40, 3.0, 1, 1, 1, 1)
        ctx.restore_state()
        ctx.draw_vertical_grd(5, 5, 40, 30, 1, 0, 0, 1, 0, 0, 1, 1)
        ctx.set_pixel(3, 4, 0.1, 0.2, 0.3, 0.4)

    snaps = []
    for use_fast in (fastrec.mod, None):
        monkeypatch.setattr(C, "_fast", use_fast)
        monkeypatch.setattr(xf, "_fast", use_fast)
        ctx = R.RenderContext(64, 48, True)
        scene(ctx)
        k, p = ctx._cmds.snapshot()
        snaps.append((k.copy(), p.copy()))
    np.testing.assert_array_equal(snaps[0][0], snaps[1][0])
    np.testing.assert_array_equal(snaps[0][1], snaps[1][1])
