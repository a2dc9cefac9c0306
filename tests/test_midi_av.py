"""midi_av app end-to-end on synthetic fixtures (CPU backend)."""

import os

import numpy as np
import pytest

from libnativecpurenderer_tpu import media


def test_midi_av_end_to_end(tmp_path):
    from test_apps import make_midi, write_wav
    from libnativecpurenderer_tpu.apps import midi_av

    # mini bank (reuse pattern from test_apps.mini_bank)
    for bi, name in enumerate(("ha", "ji", "mi")):
        d = tmp_path / name
        d.mkdir()
        for n in range(12, 144):
            pcm = np.full((64, 2), (bi + 1) * 0.002)
            write_wav(str(d / f"{n}.wav"), pcm, 44100)

    data = make_midi([
        (0, 0x90, [60, 100]), (480, 0x80, [60, 0]),
        (0, 0x90, [64, 100]), (480, 0x80, [64, 0]),
        (0, 0x90, [67, 100]), (480, 0x80, [67, 0]),
    ])
    mid_fp = tmp_path / "t.mid"
    mid_fp.write_bytes(data)
    out = str(tmp_path / "av.mp4")
    n = midi_av.render(str(mid_fp), out, str(tmp_path),
                       width=128, height=72, fps=10, min_note=48,
                       max_note=84, batch_frames=4, progress=False)
    assert os.path.getsize(out) > 500
    if media.native_available():
        import cv2
        cap = cv2.VideoCapture(out)
        assert cap.isOpened()
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == n
        # a frame around the first hit must show the note bars
        cap.set(cv2.CAP_PROP_POS_FRAMES, 1)
        ok, frame = cap.read()
        assert ok and frame.max() > 60
