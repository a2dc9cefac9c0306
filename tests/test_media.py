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
