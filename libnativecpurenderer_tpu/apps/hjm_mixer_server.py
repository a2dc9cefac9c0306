"""hjm_mixer web service.

Behaviour mirror of ``/root/reference/src/hjm_mixer_server.py``: serves the
upload page at ``GET /`` and accepts ``POST /🐱/<min>/<max>/<dnote>/<offset>``
with a MIDI body, returning an 18 kHz MP3 of the mixed result.

Environment-driven divergences (documented):
  * Flask isn't in this image — stdlib ``http.server`` provides the same
    two routes.
  * The reference shells out to ``timidity | ffmpeg`` (:27) to synthesise a
    base track; neither binary exists here, so the base is synthesised
    in-engine (sine + exponential decay per MIDI note, mixed with the same
    batched overlay path).  MP3 encode goes through the native media
    runtime (libmp3lame) instead of pydub.
"""

from __future__ import annotations

import http.server
import os
import tempfile
import types
import urllib.parse

import numpy as np

from .. import media
from ..audio import AudioClip
from ..models import midi
from . import hjm_mixer

INDEX_HTML = os.path.join(os.path.dirname(__file__), "hjm_mixer_index.html")


def synth_base(midi_bytes: bytes, rate: int = 44100) -> AudioClip:
    """In-engine replacement for the reference's timidity base render: a
    decaying-sine voice per note, batch-overlaid."""
    mid = midi.MidiFile(midi_bytes)
    notes = hjm_mixer.collect_notes(mid)
    if not notes:
        return AudioClip.slient(rate, 2, rate)
    max_time = max(et for _, et, _ in notes) + 1.0
    base = AudioClip.slient(rate, 2, int(rate * max_time))
    # group by pitch so each distinct waveform is one scatter-add
    by_note: dict = {}
    for sec, et, n in notes:
        by_note.setdefault(n, []).append(sec)
    for n, secs in by_note.items():
        freq = 440.0 * 2 ** ((n - 69) / 12)
        dur = 0.4
        t = np.arange(int(rate * dur)) / rate
        wave = (np.sin(2 * np.pi * freq * t) * np.exp(-t * 6.0)
                * 0.18).astype(np.float64)
        tone = AudioClip._from_array(rate, 2,
                                     np.stack([wave, wave], axis=1))
        base.overlay_many(tone, secs)
    return base


def mix_request(midi_bytes: bytes, min_note: int, max_note: int,
                dnote: int, offset: int, res_dir: str) -> bytes:
    """Full request pipeline: base synth -> hjm mix -> 18 kHz MP3 bytes."""
    base = synth_base(midi_bytes)
    with tempfile.TemporaryDirectory() as td:
        in_fp = os.path.join(td, "in.mid")
        out_fp = os.path.join(td, "out.wav")
        with open(in_fp, "wb") as f:
            f.write(midi_bytes)
        hjm_mixer.main(types.SimpleNamespace(
            res=res_dir, input=in_fp, output=out_fp,
            min_note=min_note, max_note=max_note, dnote=dnote,
            base=base, offset=offset))
        mixed = AudioClip.from_file(out_fp)
        # reference re-encodes at 18 kHz (:44-45)
        mixed.resample(18000, mixed.channels)
        mp3_fp = os.path.join(td, "out.mp3")
        from ..ops import audio_ops
        media.encode_audio_file(mp3_fp,
                                np.asarray(audio_ops.to_f32_device(
                                    mixed._buf)),
                                18000, bit_rate=180000)
        with open(mp3_fp, "rb") as f:
            return f.read()


class Handler(http.server.BaseHTTPRequestHandler):
    res_dir = "../test_files/"

    def do_GET(self):
        if urllib.parse.unquote(self.path) in ("/", "/index.html"):
            with open(INDEX_HTML, "rb") as f:
                body = f.read()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_error(404)

    def do_POST(self):
        parts = urllib.parse.unquote(self.path).strip("/").split("/")
        # route: /🐱/<min>/<max>/<dnote>/<offset>
        if len(parts) != 5 or parts[0] != "🐱":
            self.send_error(404)
            return
        try:
            min_note, max_note, dnote, offset = map(int, parts[1:])
            length = int(self.headers.get("Content-Length", "0"))
            midi_bytes = self.rfile.read(length)
            out = mix_request(midi_bytes, min_note, max_note, dnote,
                              offset, self.res_dir)
        except Exception as e:  # 500 with the message (reference :38-41)
            body = str(e).encode()
            self.send_response(500)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        self.send_response(200)
        self.send_header("Content-Type", "audio/mpeg")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, fmt, *args):  # quiet
        pass


def main(host: str = "0.0.0.0", port: int = 8080, res_dir: str = None):
    if res_dir:
        Handler.res_dir = res_dir
    server = http.server.ThreadingHTTPServer((host, port), Handler)
    print(f"hjm_mixer server on {host}:{port}")
    server.serve_forever()


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--res", default="../test_files/")
    a = p.parse_args()
    main(a.host, a.port, a.res)
