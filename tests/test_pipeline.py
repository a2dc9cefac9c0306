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
