#!/usr/bin/env python
"""Bisect bench_canvas's 128 ms/frame: time ctx.flush per command class."""

import math
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import libnativecpurenderer_tpu as R  # noqa: E402
from libnativecpurenderer_tpu import config  # noqa: E402

W, H = 1920, 1080


def bench(name, draw, frames=30):
    config.set_flush_mode("auto")
    ctx = R.RenderContext(W, H, True)
    rng = np.random.default_rng(0)
    texs = [R.Texture._from_array(rng.random((128, 128, 4)), True)
            for _ in range(4)]
    draw(ctx, texs, 0.0)
    ctx.flush()
    float(np.asarray(ctx._fb[0, 0, 0]))
    t0 = time.perf_counter()
    for i in range(frames):
        draw(ctx, texs, i * 0.016)
        ctx.flush()
    float(np.asarray(ctx._fb[0, 0, 0]))
    dt = (time.perf_counter() - t0) / frames
    print(f"{name}: {dt * 1e3:.2f} ms/frame")
    sys.stdout.flush()


def d_rects(ctx, texs, t):
    rng = np.random.default_rng(42)
    for i in range(58):
        ctx.draw_rect(float(rng.uniform(0, W - 60)),
                      float(rng.uniform(0, H - 60)),
                      40.0, 24.0, 0.2, 0.8, 0.4, 0.7)


def d_lines(ctx, texs, t):
    rng = np.random.default_rng(42)
    for i in range(8):
        x = float(rng.uniform(100, W - 100) + 30 * math.sin(t + i))
        y = float(rng.uniform(100, H - 100))
        ctx.draw_line(x, y, x + 90, y + 40, 6.0, 0.9, 0.9, 1.0, 0.8)


def d_split(ctx, texs, t):
    rng = np.random.default_rng(42)
    for i in range(30):
        tex = texs[i % len(texs)]
        x = float(rng.uniform(0, W - 140) + 40 * math.sin(t * 2 + i))
        y = float(rng.uniform(0, H - 140))
        ctx.draw_splitted_texture(tex, x, y, 100.0, 50.0,
                                  0.1, 0.9, 0.0, 1.0)


def d_tex(ctx, texs, t):
    rng = np.random.default_rng(42)
    for i in range(12):
        tex = texs[i % len(texs)]
        ctx.draw_texture(tex, float(rng.uniform(0, W - 120)),
                         float(rng.uniform(0, H - 120)), 80.0, 80.0)


def d_full(ctx, texs, t):
    ctx.fill_color(0.05, 0.05, 0.08, 0.25)
    ctx.draw_vertical_grd(0, H - 200, W, 200, 0, 0, 0, 0, 0, 0, 0, 0.8)


def main():
    bench("58 rects", d_rects)
    bench("8 lines", d_lines)
    bench("30 split_tex", d_split)
    bench("12 tex", d_tex)
    bench("fill+vgrd (full)", d_full)


if __name__ == "__main__":
    main()
