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


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_segmented_vs_scan(seed):
    """The segmented patch executor (ops/patch_exec.py) must be bit-exact
    with the round-1 scan executor on a framebuffer large enough that
    patch segments actually form (128 <= P <= 256)."""
    from libnativecpurenderer_tpu import config

    W2, H2 = 420, 300

    def render(mode):
        prev = config.flush_mode()
        config.set_flush_mode(mode)
        try:
            rng = np.random.default_rng(1000 + seed)
            texs = []
            for i in range(2):
                w, h = int(rng.integers(8, 40)), int(rng.integers(8, 40))
                arr = rng.random((h, w, 4))
                texs.append(R.Texture(w, h, True,
                                      arr.astype(np.float64).tobytes(),
                                      is_uint8=False))
            ctx = R.RenderContext(W2, H2, True)
            ctx.set_color(0.05, 0.05, 0.1, 1)
            for _ in range(30):
                op = rng.integers(0, 9)
                if op == 0:
                    ctx.draw_rect(rng.uniform(0, W2), rng.uniform(0, H2),
                                  rng.uniform(1, 100), rng.uniform(1, 80),
                                  *rng.uniform(0, 1, 4))
                elif op == 1:
                    ctx.draw_circle(rng.uniform(0, W2), rng.uniform(0, H2),
                                    rng.uniform(1, 50), *rng.uniform(0, 1, 4))
                elif op == 2:
                    ctx.draw_line(rng.uniform(0, W2), rng.uniform(0, H2),
                                  rng.uniform(0, W2), rng.uniform(0, H2),
                                  rng.uniform(1, 5), *rng.uniform(0, 1, 4))
                elif op == 3:
                    ctx.draw_vertical_grd(rng.uniform(0, W2),
                                          rng.uniform(0, H2),
                                          rng.uniform(1, 90),
                                          rng.uniform(1, 90),
                                          *rng.uniform(0, 1, 8))
                elif op == 4:
                    # axis-aligned (separable MXU route when identity-ish)
                    t = texs[rng.integers(2)]
                    ctx.draw_texture(t, rng.uniform(0, W2),
                                     rng.uniform(0, H2),
                                     rng.uniform(4, 100),
                                     rng.uniform(4, 100))
                elif op == 5:
                    t = texs[rng.integers(2)]
                    ctx.draw_splitted_texture(
                        t, rng.uniform(0, W2), rng.uniform(0, H2),
                        rng.uniform(4, 100), rng.uniform(4, 100),
                        *np.sort(rng.uniform(0, 1, 2)),
                        *np.sort(rng.uniform(0, 1, 2)))
                elif op == 6:
                    # rotated + upscaled (region-gather route; a pure
                    # rotation would pass the IsNoTransform sum quirk)
                    ctx.save_state()
                    ctx.scale(rng.uniform(1.2, 2.0), rng.uniform(1.2, 2.0))
                    ctx.rotate(rng.uniform(-math.pi, math.pi))
                    t = texs[rng.integers(2)]
                    ctx.draw_texture(t, rng.uniform(0, W2 / 2),
                                     rng.uniform(0, H2 / 2),
                                     rng.uniform(4, 60), rng.uniform(4, 60))
                    ctx.restore_state()
                elif op == 7:
                    ctx.fill_color(*rng.uniform(0, 0.3, 4))  # full segment
                else:
                    ctx.set_pixel(rng.integers(0, W2), rng.integers(0, H2),
                                  *rng.uniform(0, 1, 4))
            return ctx.numpy_buffer()
        finally:
            config.set_flush_mode(prev)

    a = render("auto")
    b = render("scan")
    np.testing.assert_array_equal(a, b)


def test_plan_segments_routing():
    """Planner sanity: arith/sampling segmentation + MXU/region routes."""
    from libnativecpurenderer_tpu import config
    from libnativecpurenderer_tpu.ops import commands as C
    from libnativecpurenderer_tpu.ops import patch_exec

    tex = R.Texture(8, 8, True, np.zeros((8, 8, 4)).tobytes(),
                    is_uint8=False)
    ctx = R.RenderContext(400, 300, True)
    ctx.draw_rect(10, 10, 50, 40, 1, 0, 0, 1)          # patch arith
    ctx.draw_texture(tex, 20, 20, 30, 30)              # separable -> MXU
    ctx.save_state()
    # rotation alone passes the IsNoTransform SUM test (cpp:551-553 quirk)
    # and would take the fast path; rotation+upscale fails it -> TEX with
    # a non-separable inverse -> region-gather route
    ctx.scale(2.0, 2.0)
    ctx.rotate(0.3)
    ctx.draw_texture(tex, 30, 30, 20, 20)              # rotated -> REGION
    ctx.restore_state()
    ctx.fill_color(0, 0, 1, 0.5)                       # full-frame
    ctx.draw_circle(200, 150, 20, 0, 1, 0, 1)          # patch arith

    kinds, params = ctx._cmds.snapshot()
    segs = patch_exec.plan_segments(kinds, params, 400, 300,
                                    ctx._store.device.shape)
    assert [s[0] for s in segs] == ["patch", "fullarith", "patch"]
    _, P, Rr, lo, hi, sels, with_region = segs[0]
    assert with_region
    assert (lo, hi) == (0, 3)
    assert sels[0] == C.KIND_RECT
    # identity transform selects the TEX_FAST fast path (cpp:731-752)
    assert sels[1] == patch_exec.sel_for(C.KIND_TEX_FAST,
                                         patch_exec.ROUTE_MXU)
    assert sels[2] == patch_exec.sel_for(C.KIND_TEX,
                                         patch_exec.ROUTE_REGION)
    ctx._cmds.clear()


@pytest.mark.parametrize("seed", [0, 1, 2, 23, 25])
def test_fuzz_kernel_route_vs_scan(seed):
    # seeds 23/25: extended-sweep regressions — knife-edge pixels where
    # the kernel route's unsnapped inverse mapping flipped membership
    # vs the scan executor (canvas_kernel inv_point now snaps to the
    # same 2^-20 grid as executor._snap)
    """Arith-heavy streams (stacked full-frame fills force plan_segments'
    kernel fold) through the tile kernel must be bit-exact with the scan
    executor."""
    from libnativecpurenderer_tpu import config
    from libnativecpurenderer_tpu.ops import patch_exec

    W2, H2 = 300, 220

    def build(ctx, rng):
        ctx.set_color(0.02, 0.03, 0.05, 1)
        # enough stacked full-frame fills that plan_segments' cost model
        # folds the run into a kernel segment
        for _ in range(25):
            ctx.fill_color(*rng.uniform(0, 0.2, 3), rng.uniform(0, 0.2))
        for _ in range(24):
            op = rng.integers(0, 7)
            if op == 0:
                ctx.fill_color(*rng.uniform(0, 0.4, 3), rng.uniform(0, 0.3))
            elif op == 1:
                ctx.draw_rect(rng.uniform(-20, W2), rng.uniform(-20, H2),
                              rng.uniform(1, 120), rng.uniform(1, 90),
                              *rng.uniform(0, 1, 4))
            elif op == 2:
                ctx.draw_circle(rng.uniform(0, W2), rng.uniform(0, H2),
                                rng.uniform(1, 60), *rng.uniform(0, 1, 4))
            elif op == 3:
                ctx.draw_line(rng.uniform(-10, W2), rng.uniform(-10, H2),
                              rng.uniform(-10, W2), rng.uniform(-10, H2),
                              rng.uniform(0, 8), *rng.uniform(0, 1, 4))
            elif op == 4:
                ctx.draw_vertical_grd(rng.uniform(-10, W2),
                                      rng.uniform(-10, H2),
                                      rng.uniform(1, W2), rng.uniform(1, H2),
                                      *rng.uniform(0, 1, 8))
            elif op == 5:
                ctx.save_state()
                ctx.rotate(rng.uniform(-1, 1))
                ctx.translate(rng.uniform(-30, 30), rng.uniform(-30, 30))
                ctx.draw_rect(rng.uniform(0, W2), rng.uniform(0, H2),
                              rng.uniform(1, 80), rng.uniform(1, 60),
                              *rng.uniform(0, 1, 4))
                ctx.restore_state()
            else:
                ctx.set_color_transform(*rng.uniform(0.5, 1.2, 4))

    def render(mode):
        prev = config.flush_mode()
        config.set_flush_mode(mode)
        try:
            rng = np.random.default_rng(7000 + seed)
            ctx = R.RenderContext(W2, H2, True)
            build(ctx, rng)
            if mode == "auto":
                # the stream must actually hit the kernel route
                n = ctx._cmds.n
                segs = patch_exec.plan_segments(
                    np.array(ctx._cmds.kinds[:n], np.int32),
                    ctx._cmds.params[:n], W2, H2,
                    ctx._store.device.shape)
                assert any(s[0] == "kernel" for s in segs), segs
            ctx.flush()
            return np.asarray(ctx._fb)
        finally:
            config.set_flush_mode(prev)

    got = render("auto")
    want = render("scan")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ang_deg", [90, 180, 270, 45, 30])
def test_adversarial_knife_edge_across_executors(ang_deg):
    """Integer-coordinate adversarial scenes (rotated rect corners and
    edges landing exactly on pixel centers, circles with lattice boundary
    points, 45-degree lines through lattice points) must render
    bit-identically across the scan, segmented-patch and unrolled-flush
    executors AND match the f64 oracle: the 2^-20 snap of inverse-mapped
    coordinates (ops/executor._snap) makes membership canonical even
    where LLVM fma-contraction differs per compiled structure (VERDICT
    r2 item 6)."""
    from libnativecpurenderer_tpu import config

    W2, H2 = 160, 140
    ang = math.radians(ang_deg)

    def scene(c):
        c.set_color(0.03, 0.04, 0.05, 1.0)
        # rotated rect, integer geometry: for 90/180/270 the inverse
        # mapping is exact and boundaries sit ON pixel centers; for
        # 45/30 the sqrt(2)/cos products land within ulps of the
        # width/height bounds at the far corner pixels
        c.save_state()
        c.translate(40, 30)
        c.rotate(ang)
        if ang_deg in (45, 30):
            c.draw_rect(0.0, 0.0, 7 * math.sqrt(2), 5 * math.sqrt(2),
                        0.9, 0.4, 0.2, 0.8)
        else:
            c.draw_rect(-10.0, -6.0, 20.0, 12.0, 0.9, 0.4, 0.2, 0.8)
        c.restore_state()
        # circle with exact lattice boundary points (3-4-5): pixels at
        # distance exactly r must be included by <= semantics
        c.draw_circle(90.0, 40.0, 5.0, 0.2, 0.8, 0.3, 0.9)
        c.draw_circle(90.0, 40.0, 25.0, 0.1, 0.2, 0.7, 0.35)
        # 45-degree line through lattice points, integer width
        c.draw_line(10.0, 70.0, 80.0, 140.0, 4.0, 0.8, 0.8, 0.1, 0.7)
        # vgrd with integer bounds under the rotation
        c.save_state()
        c.translate(110, 90)
        c.rotate(ang)
        c.draw_vertical_grd(-16.0, -12.0, 32.0, 24.0,
                            1, 0, 0, 1, 0, 0, 1, 1)
        c.restore_state()

    outs = {}
    for name, mode, unrolled in (("scan", "scan", False),
                                 ("segmented", "auto", False),
                                 ("unrolled", "auto", True)):
        prev = config.flush_mode()
        config.set_flush_mode(mode)
        config.set_flush_unrolled(unrolled)
        try:
            ctx = R.RenderContext(W2, H2, True)
            scene(ctx)
            outs[name] = ctx.numpy_buffer()
        finally:
            config.set_flush_mode(prev)
            config.set_flush_unrolled(True)

    g = gold.GoldenContext(W2, H2, True)
    scene(g)
    want = g.float_buffer()

    np.testing.assert_array_equal(outs["scan"], outs["segmented"])
    np.testing.assert_array_equal(outs["scan"], outs["unrolled"])
    np.testing.assert_allclose(outs["scan"], want, atol=1e-9)
