#!/usr/bin/env python
"""Measure the canvas executor: ms/frame at 1080p for a milrenderer-like
command mix, old scan path vs segmented patch path.

Timing per CLAUDE.md: amortise >=30 frames per checksum sync (the tunnel
sync costs ~30 ms).
"""

import argparse
import math
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import libnativecpurenderer_tpu as R  # noqa: E402
from libnativecpurenderer_tpu import config  # noqa: E402

W, H = 1920, 1080


def draw_frame(ctx, texs, t):
    """~60 commands shaped like a milrenderer frame: a couple of full-frame
    ops + many small texture blits/lines/hit effects."""
    ctx.fill_color(0.05, 0.05, 0.08, 0.25)          # dim overlay (full)
    ctx.draw_vertical_grd(0, H - 200, W, 200,        # bottom gradient (full)
                          0, 0, 0, 0, 0, 0, 0, 0.8)
    rng = np.random.default_rng(42)                  # fixed scene, t moves it
    for i in range(8):                               # lines
        x = float(rng.uniform(100, W - 100) + 30 * math.sin(t + i))
        y = float(rng.uniform(100, H - 100))
        ctx.draw_line(x, y, x + 90, y + 40, 6.0, 0.9, 0.9, 1.0, 0.8)
    for i in range(30):                              # note blits
        tex = texs[i % len(texs)]
        x = float(rng.uniform(0, W - 140) + 40 * math.sin(t * 2 + i))
        y = float(rng.uniform(0, H - 140))
        ctx.draw_splitted_texture(tex, x, y, 100.0, 50.0,
                                  0.1, 0.9, 0.0, 1.0)
    for i in range(12):                              # plain blits
        tex = texs[i % len(texs)]
        x = float(rng.uniform(0, W - 120))
        y = float(rng.uniform(0, H - 120))
        ctx.draw_texture(tex, x, y, 80.0, 80.0)
    for i in range(8):                               # small rects
        ctx.draw_rect(float(rng.uniform(0, W - 60)),
                      float(rng.uniform(0, H - 60)),
                      40.0, 24.0, 0.2, 0.8, 0.4, 0.7)


def bench(mode, frames=60, reps=3):
    config.set_flush_mode(mode)
    ctx = R.RenderContext(W, H, True)
    rng = np.random.default_rng(0)
    texs = [R.Texture._from_array(rng.random((128, 128, 4)), True)
            for _ in range(4)]
    # warm-up/compile
    draw_frame(ctx, texs, 0.0)
    ctx.flush()
    float(np.asarray(ctx._fb[0, 0, 0]))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(frames):
            draw_frame(ctx, texs, i * 0.016)
            ctx.flush()
        float(np.asarray(ctx._fb[0, 0, 0]))     # checksum sync
        dt = (time.perf_counter() - t0) / frames
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="auto,scan")
    ap.add_argument("--frames", type=int, default=60)
    args = ap.parse_args()
    for mode in args.modes.split(","):
        dt = bench(mode, args.frames)
        print(f"canvas 1080p ~60 cmds/frame [{mode}]: "
              f"{dt * 1e3:.2f} ms/frame ({1 / dt:.1f} fps)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
