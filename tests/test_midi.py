"""SMF parser tests: synthetic files with known byte layout + real fixtures."""

import struct

import pytest

from libnativecpurenderer_tpu.models import midi


def vlq(n):
    """variable-length quantity encoding"""
    out = [n & 0x7F]
    n >>= 7
    while n:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    return bytes(reversed(out))


def make_midi(events, division=480, tempo=500000):
    """events: list of (delta_ticks, status, data bytes)"""
    track = b""
    track += vlq(0) + bytes([0xFF, 0x51, 0x03]) + tempo.to_bytes(3, "big")
    for delta, status, data in events:
        track += vlq(delta) + bytes([status]) + bytes(data)
    track += vlq(0) + bytes([0xFF, 0x2F, 0x00])
    header = b"MThd" + struct.pack(">IHHH", 6, 0, 1, division)
    return header + b"MTrk" + struct.pack(">I", len(track)) + track


def test_basic_notes_and_seconds():
    # 480 ticks = 1 quarter = 0.5 s at 120 bpm
    data = make_midi([
        (0, 0x90, [60, 100]),       # note on C4 at t=0
        (480, 0x80, [60, 0]),       # off at 0.5 s
        (0, 0x91, [64, 90]),        # on ch1 E4 at 0.5 s
        (240, 0x81, [64, 0]),       # off at 0.75 s
    ])
    mid = midi.MidiFile(data)
    msgs = mid.tracks[0]
    assert [m["type"] for m in msgs] == ["note_on", "note_off",
                                         "note_on", "note_off"]
    assert msgs[0]["sec_time"] == 0.0
    assert abs(msgs[1]["sec_time"] - 0.5) < 1e-12
    assert msgs[2]["channel"] == 1
    assert abs(msgs[3]["sec_time"] - 0.75) < 1e-12


def test_running_status_and_vel0_noteoff():
    data = make_midi([
        (0, 0x90, [60, 100]),
        # running status: no status byte, note 62 on, then 60 off via vel 0
        (10, 62, [100]),
        (10, 60, [0]),
    ])
    mid = midi.MidiFile(data)
    msgs = mid.tracks[0]
    assert [(m["type"], m["note"]) for m in msgs] == [
        ("note_on", 60), ("note_on", 62), ("note_off", 60)]


def test_tempo_change():
    data = make_midi([
        (0, 0x90, [60, 100]),
        (480, 0xFF, [0x51, 0x03, 0x03, 0xD0, 0x90]),  # 250000 us/qn at beat 1
        (480, 0x80, [60, 0]),   # one more beat at new tempo: 0.5 + 0.25
    ])
    mid = midi.MidiFile(data)
    off = [m for m in mid.tracks[0] if m["type"] == "note_off"][0]
    assert abs(off["sec_time"] - 0.75) < 1e-9


def test_real_fixture(ref_files):
    with open(f"{ref_files}/rr.mid", "rb") as f:
        mid = midi.MidiFile(f.read())
    msgs = [m for t in mid.tracks for m in t]
    ons = [m for m in msgs if m["type"] == "note_on"]
    assert len(ons) > 100
    assert all(0 <= m["note"] < 128 for m in ons)
    assert all(m["sec_time"] >= 0 for m in msgs)
    # monotonic within track
    for t in mid.tracks:
        secs = [m["sec_time"] for m in t]
        assert secs == sorted(secs)


def test_collect_notes_pairing():
    from libnativecpurenderer_tpu.apps.hjm_mixer import collect_notes
    data = make_midi([
        (0, 0x90, [60, 100]),
        (0, 0x90, [64, 100]),
        (480, 0x80, [60, 0]),
        # 64 never gets an off -> default length 0.1
    ])
    notes = collect_notes(midi.MidiFile(data))
    notes.sort(key=lambda x: x[2])
    assert len(notes) == 2
    assert abs(notes[0][1] - 0.5) < 1e-12       # note 60: real off
    assert abs(notes[1][1] - 0.1) < 1e-12       # note 64: default length
