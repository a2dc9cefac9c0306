"""End-to-end app tests on synthetic fixtures (CPU backend, tiny sizes)."""

import json
import os
import struct
import types
import wave
import zipfile

import numpy as np
import pytest

from libnativecpurenderer_tpu import media


# ---------------------------------------------------------------------------
# fixture builders
# ---------------------------------------------------------------------------

def write_wav(path, pcm, rate=44100):
    """pcm: (N, C) float in [-1, 1]"""
    with wave.open(path, "wb") as w:
        w.setnchannels(pcm.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(pcm, -1, 1) * 32767).astype("<i2").tobytes())


def vlq(n):
    out = [n & 0x7F]
    n >>= 7
    while n:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    return bytes(reversed(out))


def make_midi(events, division=480, tempo=500000):
    track = b"" + vlq(0) + bytes([0xFF, 0x51, 0x03]) + tempo.to_bytes(3, "big")
    for delta, status, data in events:
        track += vlq(delta) + bytes([status]) + bytes(data)
    track += vlq(0) + bytes([0xFF, 0x2F, 0x00])
    return (b"MThd" + struct.pack(">IHHH", 6, 0, 1, division)
            + b"MTrk" + struct.pack(">I", len(track)) + track)


@pytest.fixture
def mini_bank(tmp_path):
    """Tiny instrument bank: ha/ji/mi x notes 12..143, 64-frame clips with
    a per-(instrument, note) DC signature so overlays are verifiable."""
    rng = np.random.default_rng(0)
    for bi, name in enumerate(("ha", "ji", "mi")):
        d = tmp_path / name
        d.mkdir()
        for n in range(12, 144):
            val = (bi + 1) * 0.001 + n * 1e-5
            pcm = np.full((64, 2), val)
            write_wav(str(d / f"{n}.wav"), pcm, 44100)
    return str(tmp_path)


def test_hjm_mixer_end_to_end(tmp_path, mini_bank):
    from libnativecpurenderer_tpu.apps import hjm_mixer
    # two notes at distinct times + one filtered out
    data = make_midi([
        (0, 0x90, [60, 100]), (480, 0x80, [60, 0]),
        (0, 0x90, [64, 100]), (480, 0x80, [64, 0]),
        (0, 0x90, [10, 100]), (10, 0x80, [10, 0]),   # below min -> skipped
    ])
    mid_fp = tmp_path / "t.mid"
    mid_fp.write_bytes(data)
    out_fp = tmp_path / "out.wav"
    hjm_mixer.main(types.SimpleNamespace(
        res=mini_bank, input=str(mid_fp), output=str(out_fp),
        min_note=60, max_note=127, dnote=0, base=None, offset=0))

    with wave.open(str(out_fp)) as w:
        assert w.getframerate() == 44100
        assert w.getnchannels() == 2
        pcm = np.frombuffer(w.readframes(w.getnframes()),
                            np.int16).reshape(-1, 2) / 32767.0
    # note 60 at t=0 round-robins to instrument 0 ("ha"), note 64 at t=0.5
    # to instrument 1 ("ji"); bank files are indexed by raw note (the
    # reference's off-by-12 quirk) so note 60 plays ha/72.wav's value
    v60 = 1 * 0.001 + 72 * 1e-5
    v64 = 2 * 0.001 + 76 * 1e-5
    assert abs(pcm[5, 0] - v60) < 2e-4
    at64 = int(0.5 * 44100) + 5
    assert abs(pcm[at64, 0] - v64) < 2e-4
    # silence between
    assert abs(pcm[int(0.3 * 44100), 0]) < 1e-4


def test_milrenderer_end_to_end(tmp_path, chart_package):
    from libnativecpurenderer_tpu.apps.milrenderer import Renderer
    zpath, res = chart_package
    out = str(tmp_path / "out.mp4")
    r = Renderer(width=96, height=54, fps=10, res_dir=res)
    r.run(zpath, out, progress=False)
    assert os.path.getsize(out) > 1000
    if media.native_available():
        import cv2
        cap = cv2.VideoCapture(out)
        assert cap.isOpened()
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        assert n == 11  # 1.0 s * 10 fps + 1
        ok, frame = cap.read()
        assert ok and frame.shape == (54, 96, 3)
        assert frame.sum() > 0  # something was drawn


def test_milrenderer_batched_matches_sequential(tmp_path, chart_package):
    """The vmapped batch pipeline must produce the same video frames as the
    frame-at-a-time path."""
    import cv2
    from libnativecpurenderer_tpu.apps.milrenderer import Renderer
    if not media.native_available():
        pytest.skip("needs native encoder to compare decoded frames")
    import random
    zpath, res = chart_package
    out_a = str(tmp_path / "seq.mp4")
    out_b = str(tmp_path / "bat.mp4")
    # no executor pinning: the 1/256 subpixel snap makes knife-edge
    # membership canonical across program structures (scan vs unrolled
    # vs batched — see test_adversarial_knife_edge_across_executors)
    random.seed(42)  # hit-effect seeds/groups draw from the global RNG
    Renderer(width=96, height=54, fps=10, res_dir=res).run(
        zpath, out_a, progress=False)
    random.seed(42)
    Renderer(width=96, height=54, fps=10, res_dir=res,
             batch_frames=4).run(zpath, out_b, progress=False)

    ca, cb = cv2.VideoCapture(out_a), cv2.VideoCapture(out_b)
    assert int(ca.get(cv2.CAP_PROP_FRAME_COUNT)) == \
        int(cb.get(cv2.CAP_PROP_FRAME_COUNT))
    diffs = []
    while True:
        ra, fa = ca.read()
        rb, fb = cb.read()
        assert ra == rb
        if not ra:
            break
        diffs.append(np.abs(fa.astype(int) - fb.astype(int)).mean())
    assert max(diffs) < 1.0  # identical up to H.264 noise


def test_chart_model_values(chart_package):
    from libnativecpurenderer_tpu.models import chart as cm
    zpath, _ = chart_package
    with zipfile.ZipFile(zpath) as z:
        chart = cm.Chart(json.loads(z.read("chart.json")))
    line = chart.lines[0]
    # bpm 120 -> beat = 0.5 s; note times: 0.25, 0.5, 0.75
    times = [n.time for n in line.notes]
    assert times == [0.25, 0.5, 0.75]
    hold = line.notes[2]
    assert hold.ishold and hold.endTime == 1.0
    # Speed anim 1.0 constant -> floorPosition = integral = t within [0, 2]
    assert abs(hold.floorPosition - 0.75) < 1e-12
    assert abs(hold.endFloorPosition - 1.0) < 1e-12
    # morebets: no two non-fake notes share a time here
    assert not any(n.morebets for n in line.notes)
    chart.update(0.6)
    assert line.acollection.get_value(cm.AnimationKey.Rotation) == 90.0


def test_hjm_server_request(tmp_path, mini_bank):
    """Full HTTP round trip on a local port."""
    import threading
    import http.client
    from libnativecpurenderer_tpu.apps import hjm_mixer_server as srv

    srv.Handler.res_dir = mini_bank
    server = __import__("http.server", fromlist=["ThreadingHTTPServer"]) \
        .ThreadingHTTPServer(("127.0.0.1", 0), srv.Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/")
        resp = conn.getresponse()
        assert resp.status == 200
        assert b"midi" in resp.read()

        data = make_midi([(0, 0x90, [60, 100]), (480, 0x80, [60, 0])])
        conn.request("POST",
                     "/%F0%9F%90%B1/60/127/0/0", body=data)
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 200, body
        if media.native_available():
            assert len(body) > 500
            # decode the mp3 back
            fp = tmp_path / "resp.mp3"
            fp.write_bytes(body)
            rate, ch, pcm = media.decode_audio(str(fp))
            assert rate == 16000  # 18 kHz snapped to nearest lame rate
            assert pcm.shape[0] > 1000
    finally:
        server.shutdown()


def test_synth_base_gm_spectral_content():
    """The server's timidity stand-in must produce real instrument-like
    audio per note (VERDICT r2 item 8): correct fundamental, harmonic
    content, family-appropriate envelope (piano decays, organ sustains),
    and a broadband percussion channel."""
    from libnativecpurenderer_tpu.apps.hjm_mixer_server import synth_base

    data = make_midi([
        (0, 0xC0, [0]),              # ch0: piano (family 0, decaying)
        (0, 0xC1, [19]),             # ch1: organ (family 2, sustained)
        (0, 0x90, [69, 100]),        # A4 = 440 Hz
        (0, 0x91, [57, 96]),         # A3 = 220 Hz
        (480, 0x80, [69, 0]),        # off at 0.5 s
        (480, 0x81, [57, 0]),        # off at 1.0 s
        (0, 0x99, [38, 110]),        # ch10 snare at 1.0 s
        (48, 0x89, [38, 0]),
    ])
    clip = synth_base(data)
    pcm = clip.numpy()[:, 0]
    rate = clip.sample_rate

    def spectrum(t0, t1):
        seg = pcm[int(t0 * rate):int(t1 * rate)]
        sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        freqs = np.fft.rfftfreq(len(seg), 1 / rate)
        return freqs, sp

    def peak_near(freqs, sp, f, tol=8.0):
        band = sp[(freqs > f - tol) & (freqs < f + tol)]
        return float(band.max()) if band.size else 0.0

    # piano note: fundamental at 440 dominates, 2nd harmonic present
    freqs, sp = spectrum(0.05, 0.45)
    p440 = peak_near(freqs, sp, 440.0)
    p880 = peak_near(freqs, sp, 880.0)
    assert p440 > 10.0 * np.median(sp)
    assert p880 > 0.1 * p440
    # organ note: fundamental at 220 + harmonics
    p220 = peak_near(freqs, sp, 220.0)
    p660 = peak_near(freqs, sp, 660.0)
    assert p220 > 10.0 * np.median(sp)
    assert p660 > 0.1 * p220

    def rms(t0, t1):
        seg = pcm[int(t0 * rate):int(t1 * rate)]
        return float(np.sqrt(np.mean(seg ** 2)))

    # envelopes: organ holds its level late into the note; the piano
    # component has decayed there (compare 440-band energy early vs late)
    f2, sp2 = spectrum(0.75, 0.95)           # piano off-ish, organ on
    assert peak_near(f2, sp2, 220.0) > 0.4 * p220
    assert peak_near(f2, sp2, 440.0) < 0.6 * p440
    # percussion: broadband noise burst, no sharp tonal peak
    f3, sp3 = spectrum(1.0, 1.1)
    assert rms(1.0, 1.05) > 4.0 * rms(1.15, 1.2)
    # (window still contains the organ's 220 Hz release tail, so allow
    # some peakiness — a pure tone would be ~1000x the median)
    assert sp3.max() < 100.0 * np.median(sp3[f3 > 100])


def test_render_tone_short_notes_all_families():
    """The shortest duration bucket (0.05 s) must render for EVERY GM
    family: slow-attack/decay families (strings, pads, fx) previously
    indexed past the envelope buffer (round-3 review)."""
    from libnativecpurenderer_tpu.apps.hjm_mixer_server import (
        _GM_FAMILIES, _render_tone)

    for fam in range(len(_GM_FAMILIES)):
        w = _render_tone(60, 0.05, 100, fam, False, 44100)
        assert w.size > 0 and np.all(np.isfinite(w)), fam
        assert np.abs(w).max() > 0.0, fam
    w = _render_tone(38, 0.05, 100, 0, True, 44100)    # percussion
    assert np.all(np.isfinite(w))


def make_midi_format1(tracks, division=480, tempo=500000):
    chunks = []
    for ti, events in enumerate(tracks):
        track = b""
        if ti == 0:
            track += (vlq(0) + bytes([0xFF, 0x51, 0x03])
                      + tempo.to_bytes(3, "big"))
        for delta, status, data in events:
            track += vlq(delta) + bytes([status]) + bytes(data)
        track += vlq(0) + bytes([0xFF, 0x2F, 0x00])
        chunks.append(b"MTrk" + struct.pack(">I", len(track)) + track)
    return (b"MThd" + struct.pack(">IHHH", 6, 1, len(tracks), division)
            + b"".join(chunks))


def test_collect_voiced_notes_format1_program_changes():
    """Format-1 SMF: program changes live on a setup track, notes on
    others — channel program state must carry across tracks (per-track
    tracking voiced everything as piano; round-3 review)."""
    from libnativecpurenderer_tpu.apps import hjm_mixer_server as srv
    from libnativecpurenderer_tpu.models import midi

    data = make_midi_format1([
        [(0, 0xC0, [48]), (0, 0xC1, [19])],      # setup: strings, organ
        [(0, 0x90, [60, 100]), (480, 0x80, [60, 0])],   # ch0 notes
        [(0, 0x91, [64, 90]), (480, 0x81, [64, 0])],    # ch1 notes
    ])
    notes = srv.collect_voiced_notes(midi.MidiFile(data))
    progs = {n[2]: n[4] for n in notes}
    assert progs == {60: 48, 64: 19}
