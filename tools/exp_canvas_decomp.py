#!/usr/bin/env python
"""Decompose the segmented canvas executor's 6 ms/frame (bench_canvas mix)
into per-class costs: full-frame arith, patch arith, patch sampling.

Times each subset of the bench_canvas frame separately (same recording
path, flush per frame, >=60 frames per checksum sync).

Run: nohup python tools/exp_canvas_decomp.py > /tmp/exp_canvas_decomp.log 2>&1 &
"""

import math
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import libnativecpurenderer_tpu as R  # noqa: E402
from libnativecpurenderer_tpu import config  # noqa: E402

W, H = 1920, 1080


def draw(ctx, texs, t, what):
    rng = np.random.default_rng(42)
    if "full" in what:
        ctx.fill_color(0.05, 0.05, 0.08, 0.25)
        ctx.draw_vertical_grd(0, H - 200, W, 200,
                              0, 0, 0, 0, 0, 0, 0, 0.8)
    if "lines" in what:
        for i in range(8):
            x = float(rng.uniform(100, W - 100) + 30 * math.sin(t + i))
            y = float(rng.uniform(100, H - 100))
            ctx.draw_line(x, y, x + 90, y + 40, 6.0, 0.9, 0.9, 1.0, 0.8)
    if "split" in what:
        for i in range(30):
            tex = texs[i % len(texs)]
            x = float(rng.uniform(0, W - 140) + 40 * math.sin(t * 2 + i))
            y = float(rng.uniform(0, H - 140))
            ctx.draw_splitted_texture(tex, x, y, 100.0, 50.0,
                                      0.1, 0.9, 0.0, 1.0)
    if "tex" in what:
        for i in range(12):
            tex = texs[i % len(texs)]
            x = float(rng.uniform(0, W - 120))
            y = float(rng.uniform(0, H - 120))
            ctx.draw_texture(tex, x, y, 80.0, 80.0)
    if "rects" in what:
        for i in range(8):
            ctx.draw_rect(float(rng.uniform(0, W - 60)),
                          float(rng.uniform(0, H - 60)),
                          40.0, 24.0, 0.2, 0.8, 0.4, 0.7)


def bench(what, frames=60, reps=3):
    config.set_flush_mode("auto")
    ctx = R.RenderContext(W, H, True)
    rng = np.random.default_rng(0)
    texs = [R.Texture._from_array(rng.random((128, 128, 4)), True)
            for _ in range(4)]
    draw(ctx, texs, 0.0, what)
    ctx.flush()
    float(np.asarray(ctx._fb[0, 0, 0]))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(frames):
            draw(ctx, texs, i * 0.016, what)
            ctx.flush()
        float(np.asarray(ctx._fb[0, 0, 0]))
        dt = (time.perf_counter() - t0) / frames
        best = dt if best is None else min(best, dt)
    return best


def main():
    cases = [
        ("empty", ()),                      # flush overhead only
        ("full2", ("full",)),               # 2 full-frame arith
        ("lines8", ("lines",)),             # 8 patch arith
        ("rects8", ("rects",)),             # 8 patch arith
        ("arith18", ("full", "lines", "rects")),
        ("split30", ("split",)),            # 30 patch sampling
        ("tex12", ("tex",)),                # 12 patch sampling
        ("samp42", ("split", "tex")),
        ("mix60", ("full", "lines", "split", "tex", "rects")),
    ]
    for name, what in cases:
        dt = bench(what)
        print(f"{name:8s} {dt * 1e3:7.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
