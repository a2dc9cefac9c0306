#!/usr/bin/env python
"""Canvas display-list attribution (VERDICT r4 item 3): where do the
~2.9 ms/frame of bench_canvas go?

bench_canvas is the serialized RenderContext record+flush workload (one
context, 45 frames, checksum-sync once at the end).  The ladder hasn't
moved since round 3 (2.29 -> 2.74 -> 2.95 in driver runs) and ROADMAP
attributes it to "tunnel dispatch, not host" — but without an op-level
device profile.  This measures:

1. the bench-replica wall ms/frame,
2. host-only cost (record + plan + pack, executor stubbed),
3. a jax.profiler device trace of one 45-frame pass: device total
   ms/frame + top ops + program-launch counts (how many dispatches a
   frame really issues after the unrolled-flush grouping).

Run: nohup python tools/exp_r5_canvas.py > /tmp/exp_r5_canvas.log 2>&1 &
"""

import collections
import glob
import gzip
import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402

import libnativecpurenderer_tpu as R  # noqa: E402

W, H = 1920, 1080
FRAMES = 45


def build():
    ctx = R.RenderContext(W, H, True)
    rng = np.random.default_rng(0)
    texs = [R.Texture._from_array(rng.random((128, 128, 4)), True)
            for _ in range(4)]

    def draw(t):
        ctx.fill_color(0.05, 0.05, 0.08, 0.25)
        ctx.draw_vertical_grd(0, H - 200, W, 200,
                              0, 0, 0, 0, 0, 0, 0, 0.8)
        r2 = np.random.default_rng(42)
        for i in range(8):
            x = float(r2.uniform(100, W - 100) + 30 * math.sin(t + i))
            y = float(r2.uniform(100, H - 100))
            ctx.draw_line(x, y, x + 90, y + 40, 6.0, 0.9, 0.9, 1.0, 0.8)
        for i in range(30):
            x = float(r2.uniform(0, W - 140) + 40 * math.sin(t * 2 + i))
            y = float(r2.uniform(0, H - 140))
            ctx.draw_splitted_texture(texs[i % 4], x, y, 100.0, 50.0,
                                      0.1, 0.9, 0.0, 1.0)
        for i in range(12):
            ctx.draw_texture(texs[i % 4], float(r2.uniform(0, W - 120)),
                             float(r2.uniform(0, H - 120)), 80.0, 80.0)
        for i in range(8):
            ctx.draw_rect(float(r2.uniform(0, W - 60)),
                          float(r2.uniform(0, H - 60)),
                          40.0, 24.0, 0.2, 0.8, 0.4, 0.7)

    return ctx, draw


def timed_pass(ctx, draw, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(FRAMES):
            draw(i * 0.016)
            ctx.flush()
        float(np.asarray(ctx._fb[0, 0, 0]))
        dt = (time.perf_counter() - t0) / FRAMES
        best = dt if best is None else min(best, dt)
    return best


def main():
    ctx, draw = build()
    draw(0.0)
    ctx.flush()
    float(np.asarray(ctx._fb[0, 0, 0]))          # warm
    best = timed_pass(ctx, draw)
    print(f"bench-replica: {best * 1e3:.2f} ms/frame", flush=True)

    # host-only: record + plan + pack with the device flush stubbed
    import libnativecpurenderer_tpu.context as ctx_mod
    orig = ctx_mod.RenderContext._flush_segmented
    try:
        ctx_mod.RenderContext._flush_segmented = \
            lambda self, k, p, segs=None: None
        t0 = time.perf_counter()
        for i in range(FRAMES):
            draw(i * 0.016)
            ctx.flush()
        dt_host = (time.perf_counter() - t0) / FRAMES
    finally:
        ctx_mod.RenderContext._flush_segmented = orig
    print(f"host-only (flush stubbed): {dt_host * 1e3:.2f} ms/frame",
          flush=True)
    ctx._cmds.clear()

    logdir = "/tmp/exp_r5_canvas_trace"
    with jax.profiler.trace(logdir):
        for i in range(FRAMES):
            draw(i * 0.016)
            ctx.flush()
        float(np.asarray(ctx._fb[0, 0, 0]))

    paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz",
                             recursive=True))
    ev = json.load(gzip.open(paths[-1], "rt")).get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "")
            for e in ev if e.get("ph") == "M"
            and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "tpu" in n or "/device" in n}
    tot = collections.Counter()
    cnt = collections.Counter()
    dev_total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            d = e.get("dur", 0) / 1e3
            tot[e.get("name", "?")] += d
            cnt[e.get("name", "?")] += 1
            dev_total += d
    print(f"device total {dev_total:.1f} ms / {FRAMES} frames = "
          f"{dev_total / FRAMES:.3f} ms/frame", flush=True)
    print(f"{'op':44s} {'ms/frame':>9s} {'n':>5s}")
    for name, d in tot.most_common(30):
        print(f"{name[:44]:44s} {d / FRAMES:9.4f} {cnt[name]:5d}")


if __name__ == "__main__":
    main()
