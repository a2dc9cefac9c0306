"""Tile-resident arith canvas kernel (ops/canvas_kernel.py) vs the scan
executor, plus the flush-level routing of long arith runs."""

import numpy as np
import jax.numpy as jnp
import pytest

from libnativecpurenderer_tpu import config
from libnativecpurenderer_tpu.context import RenderContext
from libnativecpurenderer_tpu.ops import canvas_kernel, commands as C
from libnativecpurenderer_tpu.ops import executor, patch_exec

W, H = 256, 192


def _record_arith(n_extra_fills=0):
    ctx = RenderContext(W, H, True)
    ctx.fill_color(0.1, 0.2, 0.3, 1.0)
    ctx.draw_rect(20.0, 10.0, 90.0, 50.0, 0.9, 0.1, 0.1, 0.8)
    ctx.save_state()
    ctx.rotate(0.4)
    ctx.translate(30.0, 5.0)
    ctx.draw_circle(80.0, 60.0, 35.0, 0.1, 0.9, 0.2, 0.6)
    ctx.draw_line(10.0, 20.0, 180.0, 150.0, 5.0, 0.9, 0.9, 0.1, 0.9)
    ctx.restore_state()
    ctx.set_color_transform(0.8, 0.9, 1.0, 0.7)
    ctx.draw_vertical_grd(5.0, 80.0, 200.0, 100.0,
                          1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 1.0, 1.0)
    ctx.set_color_transform(1.0, 1.0, 1.0, 1.0)
    ctx.set_pixel(33, 44, 0.1, 0.2, 0.3, 0.4)
    ctx.apply_pixel(35, 44, 0.5, 0.6, 0.7, 0.8)
    for i in range(n_extra_fills):
        ctx.fill_color(0.02 * i, 0.01, 0.0, 0.12)
    n = ctx._cmds.n
    return (ctx, np.array(ctx._cmds.kinds[:n], np.int32),
            np.array(ctx._cmds.params[:n], np.float64))


def test_kernel_matches_executor_bit_exact():
    _, kinds_np, params_np = _record_arith()
    kinds = jnp.asarray(kinds_np)
    params = jnp.asarray(params_np)
    atlas = jnp.zeros((8, 8, 4), jnp.float64)
    fb0 = jnp.full((H, W, 4), 0.25, jnp.float64)   # nonzero baseline
    ref = executor.render_command_list(fb0, kinds, params, atlas)
    out = canvas_kernel.render_span_kernel(fb0, kinds, params, W, H,
                                           64, 128, True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_kernel_noop_padding():
    # callers pad spans to CMD_BUCKETS with zeros; NOOP rows are inert
    _, kinds_np, params_np = _record_arith()
    b = canvas_kernel.cmd_bucket(len(kinds_np))
    kp = np.zeros(b, np.int32)
    kp[: len(kinds_np)] = kinds_np
    pp = np.zeros((b, C.PARAM_W), np.float64)
    pp[: len(kinds_np)] = params_np
    fb0 = jnp.zeros((H, W, 4), jnp.float64)
    a = canvas_kernel.render_span_kernel(
        fb0, jnp.asarray(kinds_np), jnp.asarray(params_np), W, H, 64, 128,
        True)
    bpad = canvas_kernel.render_span_kernel(
        fb0, jnp.asarray(kp), jnp.asarray(pp), W, H, 64, 128, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(bpad))


def test_plan_folds_long_arith_runs():
    # a stack of full-frame fills exceeds the kernel-cost threshold
    _, kinds, params = _record_arith(n_extra_fills=30)
    segs = patch_exec.plan_segments(kinds, params, W, H, (1024, 4096, 4))
    assert any(s[0] == "kernel" for s in segs), segs
    ker = [s for s in segs if s[0] == "kernel"][0]
    assert ker[1] == 0 and ker[2] == len(kinds)

    config.set_canvas_kernel(False)
    try:
        segs2 = patch_exec.plan_segments(kinds, params, W, H,
                                         (1024, 4096, 4))
        assert not any(s[0] == "kernel" for s in segs2)
    finally:
        config.set_canvas_kernel(True)


def test_flush_with_kernel_route_matches_scan():
    ctx, _, _ = _record_arith(n_extra_fills=30)
    segs = patch_exec.plan_segments(
        np.array(ctx._cmds.kinds[: ctx._cmds.n], np.int32),
        ctx._cmds.params[: ctx._cmds.n], W, H, ctx._store.device.shape)
    assert any(s[0] == "kernel" for s in segs)
    ctx.flush()
    got = np.asarray(ctx._fb)

    config.set_flush_mode("scan")
    try:
        ctx2, _, _ = _record_arith(n_extra_fills=30)
        ctx2.flush()
        want = np.asarray(ctx2._fb)
    finally:
        config.set_flush_mode("auto")
    np.testing.assert_array_equal(got, want)
