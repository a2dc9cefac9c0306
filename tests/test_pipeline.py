"""Batched frame pipeline vs sequential rendering (exact equality)."""

import numpy as np

import libnativecpurenderer_tpu as R
from libnativecpurenderer_tpu.pipeline import BatchedVideoPipeline


class FrameSink:
    """Stand-in encoder capturing raw frames."""

    def __init__(self):
        self.frames = []

    def put_frame_u8(self, u8):
        self.frames.append(np.asarray(u8).copy())


def draw(ctx, i):
    ctx.set_color(0, 0, 0, 1)
    ctx.save_state()
    ctx.translate(4 + i, 3)
    ctx.rotate(0.1 * i)
    ctx.draw_rect(0, 0, 10, 6, 0.9, 0.4, 0.2, 0.8)
    ctx.draw_circle(12.0, 8.0, 5.0 + i, 0.2, 0.6, 1.0, 0.5)
    ctx.restore_state()


def test_batched_equals_sequential():
    # The pipeline routes frames through the SAME segmented flush
    # executor as ctx.flush(), and the 1/256 subpixel snap makes
    # membership canonical across executor structures anyway (see
    # test_adversarial_knife_edge_across_executors), so exact equality
    # holds with no executor pinning — including when the unrolled
    # flush fires for one side but not the other.
    W, H, N = 48, 32, 7
    # sequential
    seq = []
    ctx = R.RenderContext(W, H, True)
    for i in range(N):
        draw(ctx, i)
        seq.append(ctx.uint8_buffer().copy())

    # batched (batch 3 -> two full flushes + remainder)
    sink = FrameSink()
    pipe = BatchedVideoPipeline(sink, W, H, batch=3)
    ctx2 = R.RenderContext(W, H, True)
    for i in range(N):
        draw(ctx2, i)
        k, p = ctx2._cmds.snapshot()
        pipe.submit(k, p)
        ctx2._cmds.clear()
    pipe.finish()

    assert len(sink.frames) == N
    for a, b in zip(seq, sink.frames):
        np.testing.assert_array_equal(a, b)


def test_fused_frame_step_fires_and_matches():
    """Frames with a repeating single-group plan take the fused
    fb0 -> unrolled flush -> u8 program (ONE device dispatch,
    pipeline.frame_step_unrolled) and stay bit-equal to sequential
    rendering."""
    from libnativecpurenderer_tpu.context import RenderContext
    from libnativecpurenderer_tpu.ops import patch_exec

    # canvas must be patch-eligible (min(W, H) >= 128) or sampling
    # commands plan as full-frame scans and the fused path can't apply
    W, H, N = 192, 160, 6
    rng = np.random.default_rng(7)
    tex = R.Texture._from_array(rng.random((16, 16, 4)), True)

    def draw(ctx, i):
        ctx.fill_color(0.1, 0.1, 0.2, 0.3)
        ctx.draw_texture(tex, 4.0 + i, 6.0, 12.0, 12.0)
        ctx.draw_rect(20.0, 8.0 + i, 10.0, 6.0, 0.9, 0.4, 0.2, 0.8)

    seq = []
    for i in range(N):
        ctx = R.RenderContext(W, H, True)   # fresh zero fb per frame,
        draw(ctx, i)                        # like the pipeline's fb0
        seq.append(ctx.uint8_buffer().copy())

    calls = []
    orig = patch_exec.frame_step_unrolled

    def spy(fb0, rows, atlas, sig):
        calls.append(sig)
        return orig(fb0, rows, atlas, sig)

    sink = FrameSink()
    pipe = BatchedVideoPipeline(sink, W, H, batch=3)
    ctx2 = R.RenderContext(W, H, True)
    patch_exec.frame_step_unrolled = spy
    # pin the PER-FRAME fused path: with pipeline_vmap on (the default),
    # same-signature batches take frame_step_unrolled_batch instead
    # (covered by test_pipeline_vmap_batch_fires_and_matches below)
    from libnativecpurenderer_tpu import config
    config.set_pipeline_vmap(False)
    try:
        for i in range(N):
            draw(ctx2, i)
            k, p = ctx2._cmds.snapshot()
            pipe.submit(k, p)
            ctx2._cmds.clear()
        pipe.finish()
    finally:
        patch_exec.frame_step_unrolled = orig
        config.set_pipeline_vmap(True)

    assert len(sink.frames) == N
    for a, b in zip(seq, sink.frames):
        np.testing.assert_array_equal(a, b)
    # the repeating structure must warm the signature cache and route
    # at least the later frames through the fused program
    assert len(calls) >= 2, "fused frame step never fired"


def test_pipeline_vmap_batch_fires_and_matches():
    """With config.set_pipeline_vmap(True), a batch whose frames all
    share one warm unrolled signature renders as a SINGLE vmapped
    device program (patch_exec.frame_step_unrolled_batch) and stays
    bit-equal to the per-frame fused path."""
    from libnativecpurenderer_tpu import config
    from libnativecpurenderer_tpu.ops import patch_exec

    W, H, N = 192, 160, 9
    rng = np.random.default_rng(7)
    tex = R.Texture._from_array(rng.random((16, 16, 4)), True)

    def draw(ctx, i):
        ctx.fill_color(0.1, 0.1, 0.2, 0.3)
        ctx.draw_texture(tex, 4.0 + i, 6.0, 12.0, 12.0)
        ctx.draw_rect(20.0, 8.0 + i, 10.0, 6.0, 0.9, 0.4, 0.2, 0.8)

    def render(vmap_on):
        sink = FrameSink()
        pipe = BatchedVideoPipeline(sink, W, H, batch=3)
        ctx = R.RenderContext(W, H, True)
        prior = config.pipeline_vmap()
        config.set_pipeline_vmap(vmap_on)
        try:
            for i in range(N):
                draw(ctx, i)
                k, p = ctx._cmds.snapshot()
                pipe.submit(k, p)
                ctx._cmds.clear()
            pipe.finish()
        finally:
            config.set_pipeline_vmap(prior)
        return sink.frames

    base = render(False)                 # also warms the signature cache

    calls = []
    orig = patch_exec.frame_step_unrolled_batch

    def spy(fb0, rows_b, atlas, sig):
        calls.append(rows_b.shape[0])
        return orig(fb0, rows_b, atlas, sig)

    patch_exec.frame_step_unrolled_batch = spy
    try:
        vm = render(True)
    finally:
        patch_exec.frame_step_unrolled_batch = orig

    assert calls and max(calls) == 3, f"vmapped batch never fired: {calls}"
    assert len(vm) == N
    for a, b in zip(base, vm):
        np.testing.assert_array_equal(a, b)
