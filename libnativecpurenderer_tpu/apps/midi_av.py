"""midi_av: MIDI -> synchronized audio mixdown + animated frame stream.

The BASELINE config-5 workload ("rr.mid note events -> synchronized audio
mixdown + 1080p animated frame stream"): the hjm instrument mix provides
the soundtrack, and a piano-roll style visualisation (falling note bars
with hit flashes, drawn through the display-list renderer) provides the
video, muxed into one MP4 by the native encoder.

New capability of this build (no reference counterpart — the reference's
two apps are audio-only and chart-only); exercises renderer + audio +
encoder + batching together.
"""

from __future__ import annotations

import argparse
import os
import types
import typing

import numpy as np

from .. import AudioClip, RenderContext, VideoCap
from ..models import midi
from ..pipeline import BatchedVideoPipeline
from . import hjm_mixer

FLOW_SECONDS = 2.0   # how long a note takes to fall through the screen
FLASH_DUR = 0.25


def note_color(n: int):
    h = (n % 12) / 12.0
    # simple hsv->rgb at s=0.7, v=1
    i = int(h * 6) % 6
    f = h * 6 - int(h * 6)
    p, q, t = 0.3, 1 - 0.7 * f, 0.3 + 0.7 * f
    return [(1, t, p), (q, 1, p), (p, 1, t), (p, q, 1), (t, p, 1),
            (1, p, q)][i]


def render(midi_path: str, out_path: str, res_dir: str, *,
           width: int = 1920, height: int = 1080, fps: int = 60,
           min_note: int = 21, max_note: int = 108, dnote: int = 0,
           batch_frames: int = 16, progress: bool = True,
           max_frames: typing.Optional[int] = None) -> int:
    """``max_frames`` bounds the render to a prefix (audio trimmed to
    match) — the same frame-range resume idea as milrenderer's
    start/end_frame; also keeps the golden config-5 test cheap."""
    with open(midi_path, "rb") as f:
        midi_bytes = f.read()
    mid = midi.MidiFile(midi_bytes)
    notes = hjm_mixer.collect_notes(mid)
    if not notes:
        raise ValueError("no notes in MIDI file")

    # audio: the hjm instrument mix
    audio_tmp = out_path + ".mix.wav"
    hjm_mixer.main(types.SimpleNamespace(
        res=res_dir, input=midi_path, output=audio_tmp,
        min_note=min_note, max_note=max_note, dnote=dnote, base=None,
        offset=0))
    mix = AudioClip.from_file(audio_tmp)
    os.unlink(audio_tmp)

    num_frames = int(mix.duration * fps) + 1
    if max_frames is not None and max_frames < num_frames:
        num_frames = max_frames
        mix.cut(0.0, num_frames / fps, time_unit="second")

    cap = VideoCap(width, height, fps)
    cap.initialize(out_path, hasAudio=True, a_clip=mix)
    ctx = RenderContext(width, height, enable_alpha=False)
    pipe = (BatchedVideoPipeline(cap, width, height, batch_frames)
            if batch_frames > 1 else None)

    span = max_note - min_note + 1
    lane_w = width / span
    notes = [n for n in notes if min_note <= n[2] + dnote <= max_note]

    rng = range(num_frames)
    if progress:
        import tqdm
        rng = tqdm.trange(num_frames, desc="midi_av")
    for i in rng:
        t = i / fps
        ctx.set_color(0.05, 0.05, 0.08, 1.0)
        # lane separators
        ctx.draw_vertical_grd(0, height * 0.82, width, height * 0.18,
                              0.1, 0.1, 0.16, 1.0, 0.02, 0.02, 0.04, 1.0)
        hit_y = height * 0.82
        for (start, end, n) in notes:
            n = n + dnote
            y0 = hit_y - (start - t) / FLOW_SECONDS * hit_y  # bar bottom
            y1 = hit_y - (end - t) / FLOW_SECONDS * hit_y    # bar top
            if y0 < 0:
                break      # sorted by start: the rest are above the screen
            if min(y0, y1) > height:
                continue   # fully fallen past the bottom
            x = (n - min_note) * lane_w
            r, g, b = note_color(n)
            top = min(y0, y1)
            ctx.draw_rect(x + 1, max(0.0, top - 2),
                          lane_w - 2, max(4.0, abs(y1 - y0)),
                          r, g, b, 0.85)
            if start <= t <= start + FLASH_DUR:
                p = (t - start) / FLASH_DUR
                ctx.draw_circle(x + lane_w / 2, hit_y,
                                lane_w * (0.8 + 1.6 * p),
                                r, g, b, 0.6 * (1 - p))
        ctx.draw_rect(0, hit_y - 2, width, 4, 0.9, 0.9, 1.0, 0.9)
        if pipe is not None:
            k, p = ctx._cmds.snapshot()
            pipe.submit(k, p)
            ctx._cmds.clear()
        else:
            cap.put_renderer_context_frame(ctx)
    if pipe is not None:
        pipe.finish()
    cap.release()
    return num_frames


def build_parser():
    p = argparse.ArgumentParser(prog="midi_av")
    p.add_argument("-r", "--res", required=True, help="instrument bank dir")
    p.add_argument("-i", "--input", required=True, help="input midi")
    p.add_argument("-o", "--output", required=True, help="output mp4")
    p.add_argument("-s-w", "--width", type=int, default=1920)
    p.add_argument("-s-h", "--height", type=int, default=1080)
    p.add_argument("-f", "--fps", type=int, default=60)
    p.add_argument("-bf", "--batch-frames", type=int, default=16)
    return p


if __name__ == "__main__":
    a = build_parser().parse_args()
    render(a.input, a.output, a.res, width=a.width, height=a.height,
           fps=a.fps, batch_frames=a.batch_frames)
