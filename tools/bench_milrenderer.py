#!/usr/bin/env python
"""Synthetic-chart milrenderer benchmark: per-frame device time + the
unrolled-flush hit ratio on a CHURNING workload (VERDICT r2 item 3
acceptance: >= 80% of dispatch groups on the unrolled path, per-frame
device time <= 3.5 ms at 1080p).

Builds a dense synthetic Milthm v2 chart (many overlapping notes across
several lines, so the per-frame command structure churns as notes
appear/expire), renders N frames through the production Renderer with a
frame-sink cap (no encode, no tunnel-bound frame fetch), and reports
phase totals + the unroll ratio.

Run: nohup python tools/bench_milrenderer.py --frames 240 \
       > /tmp/bench_mil.log 2>&1 &
"""

import argparse
import json
import sys
import tempfile
import zipfile

import numpy as np

sys.path.insert(0, ".")


def build_chart_package(tmp, n_lines=4, notes_per_line=60, dur=30.0):
    from PIL import Image

    # NOT tests.conftest._write_wav: importing conftest forces the CPU
    # backend (JAX_PLATFORMS=cpu at import time), silently turning this
    # device benchmark into a CPU run
    def _write_wav(path, pcm, rate=44100):
        import wave
        with wave.open(path, "wb") as w:
            w.setnchannels(pcm.shape[1])
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(
                (np.clip(pcm, -1, 1) * 32767).astype("<i2").tobytes())

    res = tmp / "res"
    res.mkdir()
    rng = np.random.default_rng(7)
    for name in ["tap", "tap_double", "extap", "extap_double", "hold",
                 "hold_double", "exhold", "exhold_double", "drag",
                 "drag_double", "line_head", "perfect_circ"]:
        arr = rng.integers(0, 255, (32, 32, 4), np.uint8)
        arr[..., 3] = 255
        Image.fromarray(arr, "RGBA").save(str(res / f"{name}.png"))
    (res / "meta.json").write_text(json.dumps(
        {"holdAtlas": [8, 8], "holdDoubleAtlas": [8, 8]}))
    sfx = np.full((441, 2), 0.05)
    _write_wav(str(res / "hit.ogg"), sfx)
    _write_wav(str(res / "drag.ogg"), sfx * 0.5)

    bgm = np.zeros((int(44100 * dur), 2))
    bgm_fp = tmp / "audio.ogg"
    _write_wav(str(bgm_fp), bgm)
    bg_fp = tmp / "bg.png"
    Image.fromarray(rng.integers(0, 255, (270, 480, 3), np.uint8),
                    "RGB").save(str(bg_fp))

    def ease(t=0, p=0):
        return {"type": t, "press": p, "isValueExp": False,
                "cusValueExp": "", "clipLeft": 0.0, "clipRight": 1.0}

    def anim(key, start, end, st, et, bearer_type=0, bearer=0):
        return {"startTime": st, "endTime": et, "type": key,
                "start": start, "end": end, "index": 0,
                "bearer_type": bearer_type, "bearer": bearer,
                "ease": ease()}

    # beats at 120 bpm: dur seconds -> dur*2 beats
    total_beats = int(dur * 2) - 2
    lines = []
    for li in range(n_lines):
        notes = []
        for ni in range(notes_per_line):
            beat = 1 + (ni * total_beats) // notes_per_line
            frac = (li * 7 + ni * 3) % 8
            t = [beat, frac, 8]
            kind = (li + ni) % 3          # tap / drag / hold mix
            if kind == 2:
                end = [beat + 1, frac, 8]
            else:
                end = t
            notes.append({"time": t, "type": 0 if kind == 0 else kind,
                          "isFake": False, "isAlwaysPerfect": False,
                          "endTime": end, "index": li * 1000 + ni})
        lines.append({
            "index": li,
            "animations": [
                anim(12, 1.0 + 0.2 * li, 1.0 + 0.2 * li,
                     [0, 0, 1], [total_beats, 0, 1]),
                anim(4, 25.0 * li, 90.0 + 25.0 * li,
                     [0, 0, 1], [total_beats, 0, 1]),
                anim(2, -200.0 + 150 * li, 200.0 - 150 * li,
                     [0, 0, 1], [total_beats, 0, 1]),
            ],
            "notes": notes,
        })
    chart = {
        "fmt": 2,
        "meta": {"background_dim": 0.6, "name": "bench",
                 "background_artist": "", "music_artist": "",
                 "charter": "", "difficulty_name": "EZ", "difficulty": 1,
                 "offset": 0.0},
        "bpms": [{"time": [0, 0, 1], "bpm": 120}],
        "lines": lines,
    }
    zpath = tmp / "chart.zip"
    with zipfile.ZipFile(str(zpath), "w") as z:
        z.writestr("meta.json", json.dumps({
            "chart_file": "chart.json", "audio_file": "audio.ogg",
            "image_file": "bg.png"}))
        z.writestr("chart.json", json.dumps(chart))
        z.write(str(bgm_fp), "audio.ogg")
        z.write(str(bg_fp), "bg.png")
    return str(zpath), str(res)


class SinkCap:
    """VideoCap stand-in: counts frames, skips encode + host fetch of
    full frames (tunnel-bound here, PCIe-rate on real hosts)."""

    def __init__(self):
        self.n = 0
        self.last = None

    def initialize(self, *a, **k):
        pass

    def put_frame_u8(self, fr):
        self.n += 1
        self.last = fr

    def put_renderer_context_frame(self, ctx):
        ctx.flush()                       # the real cap renders the frame
        self.n += 1
        self.last = ctx._fb

    def release(self):
        pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--fps", type=int, default=60)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--no-unrolled", action="store_true")
    args = ap.parse_args()

    import pathlib
    import time

    from libnativecpurenderer_tpu.apps.milrenderer import Renderer
    from libnativecpurenderer_tpu.context import RenderContext

    with tempfile.TemporaryDirectory() as td:
        zpath, res = build_chart_package(pathlib.Path(td))
        r = Renderer(width=args.width, height=args.height, fps=args.fps,
                     res_dir=res, silent=True,
                     unrolled_flush=not args.no_unrolled)
        r.cap = SinkCap()
        # WARM pass: the unrolled-flush signature compiles (up to the
        # config cap, minutes each through the remote TPU compiler) all
        # land here; the timed pass below measures steady state.  Warm
        # covers the SAME frame range as the timed pass — a churning
        # chart's later frames have their own signatures, so warming a
        # different range leaves the timed half compile-bound.
        # Warm until the compile set stabilises: one-shot setup flushes
        # (initial clear, bg precomposite) occur once PER RUN, so with
        # min_seen=2 they compile on the SECOND run — a single warm pass
        # would leave those compiles (minutes each through the remote
        # TPU compiler) inside the timed pass (tools/exp_sig_churn.py).
        half = args.frames // 2
        t0 = time.perf_counter()
        for _ in range(4):
            pre = len(RenderContext._unroll_compiled)
            r.run(zpath, "/dev/null", progress=False, start_frame=half,
                  end_frame=args.frames)
            if r.cap.last is not None:
                np.asarray(r.cap.last)[:1, :1]
            if len(RenderContext._unroll_compiled) == pre:
                break
        warm_dt = time.perf_counter() - t0
        h0, m0 = (RenderContext._unroll_hits,
                  RenderContext._unroll_misses)
        c0 = len(RenderContext._unroll_compiled)
        print(f"WARM frames={r.cap.n} wall={warm_dt:.1f}s "
              f"unrolled {h0}/{h0 + m0} compiled_sigs={c0}", flush=True)

        n0 = r.cap.n
        t0 = time.perf_counter()
        r.run(zpath, "/dev/null", progress=False, start_frame=half,
              end_frame=args.frames)
        if r.cap.last is not None:
            np.asarray(r.cap.last)[:1, :1]
        dt = time.perf_counter() - t0
        nf = r.cap.n - n0
        hits = RenderContext._unroll_hits - h0
        misses = RenderContext._unroll_misses - m0
        print(f"RESULT frames={nf} wall={dt:.1f}s "
              f"-> {dt / max(nf, 1) * 1e3:.1f} ms/frame "
              f"unrolled {hits}/{hits + misses} groups "
              f"({100.0 * hits / max(hits + misses, 1):.0f}%)",
              flush=True)
        c1 = len(RenderContext._unroll_compiled)
        rep = {k: round(v, 2) for k, v in r.timer.report().items()}
        print(f"PHASES new_compiles={c1 - c0} {rep}", flush=True)


if __name__ == "__main__":
    main()
