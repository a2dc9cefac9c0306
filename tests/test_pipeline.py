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


# --------------------------------------------------------------------- #
# MeshVideoPipeline: the production 3D mesh->video path (tiled frames)
# --------------------------------------------------------------------- #

def _gouraud_scene():
    import jax.numpy as jnp
    from libnativecpurenderer_tpu.models import mesh
    verts, faces, _ = mesh.quad_batch(12, seed=21)
    rng = np.random.default_rng(21)
    colors = rng.random((len(verts), 4))
    zmap = np.eye(4, dtype=np.float32)
    zmap[2, 2] = 0.25
    zmap[2, 3] = 0.5
    rot = (zmap @ mesh.rotation_y(0.6) @ mesh.rotation_x(0.3)).astype(
        np.float32)
    mvps = np.stack([zmap, rot, (zmap @ mesh.rotation_y(1.1)).astype(
        np.float32)])
    return (jnp.asarray(verts, jnp.float32),
            jnp.asarray(faces, jnp.int32),
            jnp.asarray(colors, jnp.float32), jnp.asarray(mvps))


_MESH_KW = dict(tile_w=32, tile_h=8, capacity=512, span_x=8, span_y=8,
                interpret=True, mega=0)


def test_gouraud_loop_matches_per_frame():
    # render_gouraud_pallas_loop (device fori + pregather hoist) must be
    # bit-identical to per-frame render_gouraud_pallas at the same
    # config, raster and tiled layouts both.
    from libnativecpurenderer_tpu.ops import raster3d
    W, H = 70, 50
    verts, faces, colors, mvps = _gouraud_scene()
    per = []
    for i in range(mvps.shape[0]):
        out, _, ovf = raster3d.render_gouraud_pallas(
            verts, faces, colors, W, H, mvps[i], flat=True, u8=True,
            opaque=True, z_clip=False, resident_out=True, out8=True,
            **_MESH_KW)
        assert not bool(ovf)
        per.append(np.asarray(out))
    got, ovf = raster3d.render_gouraud_pallas_loop(
        verts, faces, colors, W, H, mvps, **_MESH_KW)
    assert not bool(ovf)
    np.testing.assert_array_equal(np.asarray(got), np.stack(per))
    # tiled layout: host detile reproduces the raster-order frames
    gt, ovf_t = raster3d.render_gouraud_pallas_loop(
        verts, faces, colors, W, H, mvps, tiled=True, **_MESH_KW)
    assert not bool(ovf_t)
    for i in range(mvps.shape[0]):
        np.testing.assert_array_equal(
            raster3d.detile_u8_host(np.asarray(gt[i]), W, H, 32, 8),
            per[i])


class TiledSink(FrameSink):
    def __init__(self):
        super().__init__()
        self.tiled = []

    def put_frame_tiled_u8(self, tiles, w, h, tw, th):
        from libnativecpurenderer_tpu.ops import raster3d
        self.tiled.append(np.asarray(tiles).copy())
        self.frames.append(raster3d.detile_u8_host(
            np.asarray(tiles), w, h, tw, th))


def test_mesh_video_pipeline_tiled_matches_raster():
    # The pipeline must feed TILED frames to a tiled-capable sink and
    # raster-order frames to a plain sink, identical content both ways.
    from libnativecpurenderer_tpu.pipeline import MeshVideoPipeline
    W, H = 70, 50
    verts, faces, colors, mvps = _gouraud_scene()
    mvps = mvps[:2]     # exact batch; remainder-path coverage lives in
    # test_mesh_video_pipeline_textured / test_batched_equals_sequential

    tiled_sink = TiledSink()
    pipe = MeshVideoPipeline(tiled_sink, W, H, verts, faces,
                             colors=colors, batch=2, **_MESH_KW)
    assert pipe._tiled
    for i in range(mvps.shape[0]):
        pipe.submit(np.asarray(mvps[i]))
    pipe.finish()
    assert len(tiled_sink.tiled) == mvps.shape[0]

    plain_sink = FrameSink()
    pipe2 = MeshVideoPipeline(plain_sink, W, H, verts, faces,
                              colors=colors, batch=2, **_MESH_KW)
    assert not pipe2._tiled           # sink has no put_frame_tiled_u8
    for i in range(mvps.shape[0]):
        pipe2.submit(np.asarray(mvps[i]))
    pipe2.finish()
    for a, b in zip(tiled_sink.frames, plain_sink.frames):
        np.testing.assert_array_equal(a, b)


def test_mesh_video_pipeline_textured():
    # textured variant rides render_textured_pallas_loop with the same
    # tiled contract
    import jax.numpy as jnp
    from libnativecpurenderer_tpu.models import mesh
    from libnativecpurenderer_tpu.ops import raster3d
    from libnativecpurenderer_tpu.pipeline import MeshVideoPipeline
    W, H = 70, 50
    verts, faces, uvs = mesh.quad_batch(8, seed=5)
    rng = np.random.default_rng(5)
    tex_u8 = rng.integers(0, 256, (32, 32, 4)).astype(np.uint8)
    mvps = np.stack([np.eye(4, dtype=np.float32)] * 2)
    mvps[1][2, 2] = 0.5

    sink = TiledSink()
    pipe = MeshVideoPipeline(sink, W, H, verts, faces, uvs=uvs,
                             tex_u8=tex_u8, batch=2, **_MESH_KW)
    for m in mvps:
        pipe.submit(m)
    pipe.finish()

    base, ovf = raster3d.render_textured_pallas_loop(
        jnp.asarray(verts, jnp.float32), jnp.asarray(faces, jnp.int32),
        jnp.asarray(uvs, jnp.float32), jnp.asarray(tex_u8), W, H,
        mvps=jnp.asarray(mvps), **_MESH_KW)
    assert not bool(ovf)
    for i in range(2):
        np.testing.assert_array_equal(sink.frames[i], np.asarray(base[i]))


def test_mesh_video_pipeline_overflow_raises():
    # finish() must surface a bin/span overflow instead of shipping
    # clamped frames (the A/B-harness ovf contract, applied to prod)
    import pytest
    from libnativecpurenderer_tpu.pipeline import MeshVideoPipeline
    W, H = 70, 50
    verts, faces, colors, mvps = _gouraud_scene()
    sink = TiledSink()
    kw = dict(_MESH_KW)
    kw.update(capacity=8, span_x=1, span_y=1)   # guaranteed overflow
    pipe = MeshVideoPipeline(sink, W, H, verts, faces, colors=colors,
                             batch=4, **kw)
    for i in range(mvps.shape[0]):
        pipe.submit(np.asarray(mvps[i]))
    with pytest.raises(ValueError, match="overflow"):
        pipe.finish()
