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
