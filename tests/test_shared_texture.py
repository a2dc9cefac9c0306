"""Shared-texture aliasing semantics (CreateTextureFromRenderContextShared,
/root/reference/src/libNativeCPURenderer.cpp:377-384).

The reference's shared texture points at the context's live f64 buffer, so
draws issued AFTER sharing are visible the next time the texture is
sampled.  The TPU build re-snapshots the framebuffer when a draw sampling
the shared texture is recorded (texture._refresh_shared) — these tests pin
the observable alias behaviour, and that the plain copy (as_texure) stays
frozen.
"""

import numpy as np

import libnativecpurenderer_tpu as R


def make_ctx(w=32, h=24):
    return R.RenderContext(w, h, True)


def test_shared_sees_later_draws():
    ctx = make_ctx()
    ctx.fill_color(0.0, 0.0, 1.0, 1.0)           # blue
    shared = ctx.as_texture_shared()
    ctx.draw_rect(0, 0, 32, 24, 1.0, 0.0, 0.0, 1.0)  # then paint red

    dst = make_ctx()
    dst.draw_texture(shared, 0, 0, 32, 24)
    fb = dst.numpy_buffer().reshape(24, 32, 4)
    # the texture must show the red paint that happened after sharing
    assert np.allclose(fb[12, 16, :3], [1.0, 0.0, 0.0])


def test_copy_stays_frozen():
    ctx = make_ctx()
    ctx.fill_color(0.0, 0.0, 1.0, 1.0)
    frozen = ctx.as_texure()                        # copy semantics
    ctx.draw_rect(0, 0, 32, 24, 1.0, 0.0, 0.0, 1.0)

    dst = make_ctx()
    dst.draw_texture(frozen, 0, 0, 32, 24)
    fb = dst.numpy_buffer().reshape(24, 32, 4)
    assert np.allclose(fb[12, 16, :3], [0.0, 0.0, 1.0])   # still blue


def test_shared_tracks_multiple_states():
    """Each sampling draw observes the fb state at that record point —
    the same sequence a reference program would see through the alias."""
    ctx = make_ctx()
    dst = make_ctx(64, 24)

    ctx.fill_color(0.0, 1.0, 0.0, 1.0)            # green
    shared = ctx.as_texture_shared()
    dst.draw_texture(shared, 0, 0, 32, 24)          # left half: green
    ctx.fill_color(1.0, 1.0, 0.0, 1.0)            # then yellow
    dst.draw_texture(shared, 32, 0, 32, 24)         # right half: yellow
    fb = dst.numpy_buffer().reshape(24, 64, 4)
    assert np.allclose(fb[12, 16, :3], [0.0, 1.0, 0.0])
    assert np.allclose(fb[12, 48, :3], [1.0, 1.0, 0.0])


def test_shared_in_recording_proxy_keeps_queued_commands():
    """A recording proxy (batched pipeline) must NOT flush mid-record
    when a shared texture refreshes — earlier queued commands would be
    consumed into ctx._fb and silently dropped from the submitted frame
    (round-2 advisor finding).  The refresh re-snapshots into a fresh
    atlas region instead, so each recorded sample still observes the
    owner's fb state at its record point."""
    import jax.numpy as jnp

    from libnativecpurenderer_tpu import pipeline as pl
    from libnativecpurenderer_tpu.ops import commands as C

    owner = make_ctx()
    owner.fill_color(0.0, 1.0, 0.0, 1.0)            # green
    shared = owner.as_texture_shared()

    rec = R.MultiThreadedVideoRenderContextPreparer(None, 64, 32, True)
    rec.draw_rect(56, 24, 8, 8, 1.0, 0.0, 1.0, 1.0)  # queued BEFORE refresh
    rec.draw_texture(shared, 0, 0, 32, 24)          # left: green snapshot
    owner.fill_color(1.0, 1.0, 0.0, 1.0)            # then yellow
    rec.draw_texture(shared, 32, 0, 32, 24)         # right: fresh region
    kinds, params = rec._cmds.snapshot()

    class _Sink:
        frames = []

        def put_frame_u8(self, fr):
            self.frames.append(np.asarray(fr))

    pipe = pl.BatchedVideoPipeline(_Sink(), 64, 32, batch=1,
                                   dtype=rec._dtype)
    kp = np.zeros(C.bucket_for(kinds.shape[0]), np.int32)
    kp[: kinds.shape[0]] = kinds
    pp = np.zeros((kp.shape[0], C.PARAM_W), rec._dtype)
    pp[: params.shape[0]] = params
    u8 = pl._render_one(pipe._fb0, jnp.asarray(kp), jnp.asarray(pp),
                        pipe._store.device)
    fb = np.asarray(u8)
    assert tuple(fb[12, 16, :3]) == (0, 255, 0)     # pre-refresh sample
    assert tuple(fb[12, 48, :3]) == (255, 255, 0)   # post-refresh sample
    assert tuple(fb[28, 60, :3]) == (255, 0, 255)   # queued rect survived


def test_shared_refresh_regions_recycled_in_pipeline():
    """A shared texture refreshed EVERY frame in a pipelined render must
    not grow the atlas unboundedly: superseded regions recycle through
    the texture's pool once their sampling batch rendered (round-3
    review).  Frame contents stay exact — each frame shows the owner's
    fb state at its record point."""
    from libnativecpurenderer_tpu import pipeline as pl

    owner = make_ctx()
    owner.fill_color(0.0, 0.0, 0.0, 1.0)
    shared = owner.as_texture_shared()

    rec = R.MultiThreadedVideoRenderContextPreparer(None, 64, 32, True)

    class _Sink:
        def __init__(self):
            self.frames = []

        def put_frame_u8(self, fr):
            self.frames.append(np.asarray(fr))

    sink = _Sink()
    pipe = pl.BatchedVideoPipeline(sink, 64, 32, batch=2, dtype=rec._dtype)
    store = shared._store
    marks = []
    colors = []
    for i in range(20):
        c = (i % 4) / 4.0                       # exact binary fractions
        owner.fill_color(c, 0.25, 0.75, 1.0)    # owner redraws per frame
        colors.append(c)
        rec.draw_texture(shared, 0, 0, 64, 32)
        k, p = rec._cmds.snapshot()
        pipe.submit(k, p)
        rec._cmds.clear()
        marks.append(store._y_next)
    pipe.finish()

    assert len(sink.frames) == 20
    for i, fr in enumerate(sink.frames):
        want = int(np.float64(colors[i]) * 255)
        assert fr[16, 32, 0] == want, (i, fr[16, 32, 0], want)
        assert fr[16, 32, 2] == int(np.float64(0.75) * 255)
    # the atlas stops growing once the recycle pipeline warms up, and
    # the retirement list stays bounded (regions flow back to the pool)
    assert marks[-1] == marks[12], marks
    assert len(shared._retired) <= 8, len(shared._retired)


def test_shared_region_not_recycled_under_held_snapshot():
    """A preparer that swaps its command buffer (end_of_frame) while the
    snapshot is still un-submitted must HOLD the region guard: the live
    snapshot views keep the param array alive, and freeing the region
    would let a later refresh re-upload new texels under the queued
    frame (round-3 review finding)."""
    from libnativecpurenderer_tpu import pipeline as pl

    owner = make_ctx()
    owner.fill_color(0.25, 0.0, 0.0, 1.0)
    shared = owner.as_texture_shared()

    rec = R.MultiThreadedVideoRenderContextPreparer(None, 64, 32, True)

    class _Sink:
        def __init__(self):
            self.frames = []

        def put_frame_u8(self, fr):
            self.frames.append(np.asarray(fr))

    sink = _Sink()
    pipe = pl.BatchedVideoPipeline(sink, 64, 32, batch=1, dtype=rec._dtype)

    # frame 0 samples region set A, then end_of_frame swaps the buffer
    # WITHOUT submitting (the held-snapshot window)
    rec.draw_texture(shared, 0, 0, 64, 32)
    rec.end_of_frame()
    held_k, held_p = rec.frames[0]

    # many refresh cycles while the snapshot is held: region A must not
    # be recycled even though fences pass (pipe flushes other frames)
    for i in range(6):
        owner.fill_color(0.5, (i % 2) * 0.5, 1.0, 1.0)
        rec.draw_texture(shared, 0, 0, 64, 32)
        k, p = rec._cmds.snapshot()
        pipe.submit(k, p)
        rec._cmds.clear()
        pipe.flush()

    # now submit the held frame 0: it must still sample the ORIGINAL
    # red texels
    pipe.submit(held_k, held_p)
    rec.frames.clear()
    pipe.finish()
    first = sink.frames[-1]
    assert first[16, 32, 0] == int(np.float64(0.25) * 255), first[16, 32]
    assert first[16, 32, 2] == 0


def test_normal_sampler_of_pending_proxy_owner_raises():
    """A NORMAL context sampling a shared texture whose owner is a
    recording proxy with queued commands must raise, not silently flush
    the owner (consuming its pending frame) — round-3 review: the old
    guard only covered proxy samplers."""
    import pytest

    owner = R.MultiThreadedVideoRenderContextPreparer(None, 32, 24, True)
    owner.fill_color(0.1, 0.2, 0.3, 1.0)     # frame 0: still queued
    shared = owner.as_texture_shared()
    owner.draw_rect(0, 0, 8, 8, 1, 1, 1, 1)  # pending commands
    pending_before = owner._cmds.n

    dst = make_ctx()
    with pytest.raises(ValueError):
        dst.draw_texture(shared, 0, 0, 32, 24)
    # the owner's queued commands survived untouched
    assert owner._cmds.n == pending_before


def test_dual_pipeline_interleave_still_recycles():
    """Two pipelines fed in alternation must not stall region recycling:
    fences are per-pipeline counters, not a global all-idle epoch
    (round-3 review finding)."""
    from libnativecpurenderer_tpu import pipeline as pl

    owner = make_ctx()
    owner.fill_color(0.0, 0.0, 0.0, 1.0)
    shared = owner.as_texture_shared()

    recs = [R.MultiThreadedVideoRenderContextPreparer(None, 64, 32, True)
            for _ in range(2)]

    class _Sink:
        def __init__(self):
            self.frames = []

        def put_frame_u8(self, fr):
            self.frames.append(np.asarray(fr))

    sinks = [_Sink(), _Sink()]
    pipes = [pl.BatchedVideoPipeline(sinks[j], 64, 32, batch=2,
                                     dtype=recs[j]._dtype)
             for j in range(2)]
    store = shared._store
    marks = []
    colors = []
    for i in range(24):
        j = i % 2                       # alternate pipelines
        c = (i % 4) / 4.0
        owner.fill_color(c, 0.25, 0.75, 1.0)
        colors.append(c)
        recs[j].draw_texture(shared, 0, 0, 64, 32)
        k, p = recs[j]._cmds.snapshot()
        pipes[j].submit(k, p)
        recs[j]._cmds.clear()
        marks.append(store._y_next)
    for p_ in pipes:
        p_.finish()
    # every frame exact (each side sees the owner state at record time)
    for j in range(2):
        for fi, fr in enumerate(sinks[j].frames):
            want = int(np.float64(colors[2 * fi + j]) * 255)
            assert fr[16, 32, 0] == want, (j, fi, fr[16, 32, 0], want)
    # and the atlas stopped growing (per-pipeline fences let retired
    # regions recycle despite the interleave)
    assert marks[-1] == marks[16], marks


def test_shared_onto_own_context():
    """Blitting a shared texture onto its own context samples the fb as
    of the draw's record point (reference aliasing, minus in-flight
    self-overlap artifacts — documented in texture._refresh_shared)."""
    ctx = make_ctx()
    ctx.fill_color(0.0, 0.0, 0.0, 1.0)
    ctx.draw_rect(0, 0, 8, 8, 1.0, 1.0, 1.0, 1.0)   # white corner
    shared = ctx.as_texture_shared()
    # draw the context into itself, shrunk into the opposite corner
    ctx.draw_splitted_texture(shared, 16, 12, 16, 12, 0.0, 1.0, 0.0, 1.0)
    fb = ctx.numpy_buffer().reshape(24, 32, 4)
    assert np.allclose(fb[2, 2, :3], [1.0, 1.0, 1.0])     # original corner
    assert np.allclose(fb[13, 17, :3], [1.0, 1.0, 1.0])   # shrunk copy
    assert np.allclose(fb[22, 30, :3], [0.0, 0.0, 0.0])   # black elsewhere
