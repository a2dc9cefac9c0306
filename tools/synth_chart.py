"""Synthetic Milthm chart-package builder for the bench harness.

Builds a self-contained chart zip + resource dir (same schema as the
tests' ``chart_package`` fixture, scaled up) so ``bench.py`` can time the
full milrenderer chart->MP4 path without shipping binary fixtures.
Chart format: Milthm v2 (models/chart.py; reference milrenderer.py
chart schema).  Deterministic (seeded RNG, no wall-clock inputs).
"""

import json
import os
import wave
import zipfile

import numpy as np


def _write_wav(path, pcm, rate=44100):
    """pcm: (N, C) float in [-1, 1]"""
    with wave.open(path, "wb") as w:
        w.setnchannels(pcm.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(pcm, -1, 1) * 32767).astype("<i2")
                      .tobytes())


def _ease(t=0, p=0):
    return {"type": t, "press": p, "isValueExp": False,
            "cusValueExp": "", "clipLeft": 0.0, "clipRight": 1.0}


def _anim(key, start, end, st, et, bearer_type=0, bearer=0):
    return {"startTime": st, "endTime": et, "type": key,
            "start": start, "end": end, "index": 0,
            "bearer_type": bearer_type, "bearer": bearer,
            "ease": _ease()}


def make_chart_package(root, seconds=4.0, n_lines=4, notes_per_line=24,
                       seed=7):
    """Write a chart zip + res dir under ``root``; returns (zip_path,
    res_dir).  ~n_lines*notes_per_line notes spread over ``seconds`` at
    120 BPM (beat = 0.5 s), mixing taps, drags and holds, with moving /
    rotating judge lines — a busy mid-density chart frame mix."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    res = os.path.join(root, "res")
    os.makedirs(res, exist_ok=True)
    for name in ["tap", "tap_double", "extap", "extap_double", "hold",
                 "hold_double", "exhold", "exhold_double", "drag",
                 "drag_double", "line_head", "perfect_circ"]:
        arr = rng.integers(0, 255, (32, 32, 4), np.uint8)
        arr[..., 3] = 255
        Image.fromarray(arr, "RGBA").save(os.path.join(res,
                                                       f"{name}.png"))
    with open(os.path.join(res, "meta.json"), "w") as f:
        json.dump({"holdAtlas": [4, 4], "holdDoubleAtlas": [4, 4]}, f)
    sfx = np.full((441, 2), 0.1)
    _write_wav(os.path.join(res, "hit.ogg"), sfx)
    _write_wav(os.path.join(res, "drag.ogg"), sfx * 0.5)

    n = int(44100 * seconds)
    t = np.arange(n) / 44100.0
    bgm = np.stack([np.sin(2 * np.pi * 220 * t),
                    np.sin(2 * np.pi * 277 * t)], 1) * 0.1
    bgm_fp = os.path.join(root, "audio.ogg")     # WAV bytes, .ogg name
    _write_wav(bgm_fp, bgm)
    bg_fp = os.path.join(root, "bg.png")
    Image.fromarray(rng.integers(0, 96, (270, 480, 3), np.uint8),
                    "RGB").save(bg_fp)

    beats_total = int(seconds * 2)               # 120 BPM
    lines = []
    for li in range(n_lines):
        notes = []
        for ni in range(notes_per_line):
            # beat position as [bars, num, den] with den=8 subdivisions
            b8 = int(rng.integers(0, beats_total * 8))
            tm = [b8 // 8, b8 % 8, 8]
            kind = int(rng.integers(0, 3))       # 0 tap, 1 drag, 2 hold
            if kind == 2:
                e8 = min(b8 + int(rng.integers(2, 8)), beats_total * 8)
                note = {"time": tm, "type": 0, "isFake": False,
                        "isAlwaysPerfect": False,
                        "endTime": [e8 // 8, e8 % 8, 8], "index": ni}
            else:
                note = {"time": tm, "type": kind, "isFake": False,
                        "isAlwaysPerfect": False, "endTime": tm,
                        "index": ni}
            notes.append(note)
        notes.sort(key=lambda nt: (nt["time"][0]
                                   + nt["time"][1] / nt["time"][2]))
        y = -200.0 + 150.0 * li
        lines.append({
            "index": li,
            "animations": [
                _anim(12, 1.0, 1.0, [0, 0, 1], [beats_total, 0, 1]),
                _anim(4, 80.0 + 10 * li, 100.0 + 10 * li,
                      [0, 0, 1], [beats_total, 0, 1]),
                _anim(1, y, y + 80.0, [0, 0, 1],
                      [beats_total, 0, 1]),                # PositionY
                _anim(0, -100.0 + 60 * li, 100.0 - 60 * li,
                      [0, 0, 1], [beats_total, 0, 1]),     # PositionX
            ],
            "notes": notes,
        })

    chart = {
        "fmt": 2,
        "meta": {"background_dim": 0.6, "name": "bench",
                 "background_artist": "", "music_artist": "",
                 "charter": "", "difficulty_name": "IN",
                 "difficulty": 13, "offset": 0.0},
        "bpms": [{"time": [0, 0, 1], "bpm": 120}],
        "lines": lines,
    }
    zpath = os.path.join(root, "chart.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("meta.json", json.dumps({
            "chart_file": "chart.json", "audio_file": "audio.ogg",
            "image_file": "bg.png"}))
        z.writestr("chart.json", json.dumps(chart))
        z.write(bgm_fp, "audio.ogg")
        z.write(bg_fp, "bg.png")
    return zpath, res
