#!/usr/bin/env python
"""Reference-demo parity: the binding's __main__ scene
(libNativeCPURendererPybind.py:668-719) on the TPU framework.

Audio: decode two oggs, gain, 876 timed overlays, WAV out.
Video: 7200 frames (256x256 context with a 1/4 scale, encoded at
1024x1024@60) of animated texture/line/circle/rect with color cycling —
including the faithful IsNoTransform quirk that keeps the texture
off-screen.  Pass --frames to shorten.
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import libnativecpurenderer_tpu as R  # noqa: E402

REF_FILES = "/root/reference/test_files"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=7200)
    ap.add_argument("--out-dir", default="/tmp")
    ap.add_argument("--batch", type=int, default=16,
                    help="frames per device dispatch (0 = unbatched)")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    ctx_s = 4
    ctx = R.RenderContext(1024 // ctx_s, 1024 // ctx_s, True)
    ctx.scale(1 / ctx_s, 1 / ctx_s)
    cap = R.VideoCap(1024, 1024, 60)

    clip = R.AudioClip.from_file(f"{REF_FILES}/audio.ogg")
    clip2 = R.AudioClip.from_file(f"{REF_FILES}/audio2.ogg")
    clip.apply_volume_gain(0.7)
    clip2.apply_volume_gain(1.1)

    offsets = json.load(open(f"{REF_FILES}/audio_overlay_test.json"))
    t0 = time.time()
    clip.overlay_many(clip2, offsets)   # 876 overlays, one dispatch
    wav = clip.save_as_wav()
    print(f"mixed {len(offsets)} overlays + wav ({len(wav)} B) "
          f"in {time.time() - t0:.2f}s "
          f"({clip.duration / (time.time() - t0):.0f}x realtime)")
    with open(os.path.join(args.out_dir, "testgen_audio.wav"), "wb") as f:
        f.write(wav)

    clip.resample(44100, 2)
    cap.initialize(os.path.join(args.out_dir, "testgen_test.mp4"), True,
                   clip)

    from PIL import Image
    tex = R.Texture.from_pilimg(
        Image.open(f"{REF_FILES}/image.png")).resample(16, 16)

    pipe = None
    if args.batch:
        from libnativecpurenderer_tpu.pipeline import BatchedVideoPipeline
        pipe = BatchedVideoPipeline(cap, ctx.width, ctx.height, args.batch)

    t0 = time.time()
    for i in range(args.frames):
        t = i / 60
        ctx.set_color(1, 1, 1, 1)
        ctx.save_state()
        ctx.apply_color_transform(t % 1, (t + 1.4) % 1, (t + 2.8) % 1, 1)
        w = 768 * (1 + math.sin(t * 2 * math.pi) / 4)
        h = 768 * (1 + math.cos(t * 3 * math.pi) / 4)
        ctx.draw_texture(tex, w * 1.5 / 2, h * 1.3 / 2, w, h)
        ctx.draw_line(w * 0.1, h * 0.1, w, h, (w + h) / 300, 0, 1, 0, 1)
        ctx.draw_circle(w * 0.3, h * 0.3, 100, 1, 1, 0, 0.4)
        ctx.draw_rect(w * 0.6, h * 0.6, w * 0.1, h * 0.1, 0, 1, 0, 0.4)
        ctx.restore_state()
        if pipe is not None:
            k, p = ctx._cmds.snapshot()
            pipe.submit(k, p)
            ctx._cmds.clear()
        else:
            cap.put_renderer_context_frame(ctx)
    if pipe is not None:
        pipe.finish()
    dt = time.time() - t0
    print(f"rendered+encoded {args.frames} frames in {dt:.2f}s "
          f"= {args.frames / dt:.1f} fps")
    cap.release()


if __name__ == "__main__":
    main()
