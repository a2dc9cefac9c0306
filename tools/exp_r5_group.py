#!/usr/bin/env python
"""Device A/B of the grouped patch compute (config.canvas_group_g) on
the bench_canvas 60-command 1080p mix, against the per-command unrolled
flush.  exp_r5_canvas3/4 attribution: the 1.62 ms flush program is
per-op-overhead bound (~6 small ops per command); grouping batches the
fb-independent stage into one vmapped fusion set per G-run and leaves a
pure-elementwise ds->blend->dus chain per command.

Measures ms/flush for g in (0, 4, 8, 16) with checksum equality vs the
g=0 base, then prints the op census (canvas4-style aggregate) of the
best grouped program.

Run: nohup python tools/exp_r5_group.py > /tmp/exp_r5_group.log 2>&1 &
"""

import collections
import glob
import gzip
import json
import math
import re
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import libnativecpurenderer_tpu as R  # noqa: E402
from libnativecpurenderer_tpu import config  # noqa: E402
from libnativecpurenderer_tpu.ops import patch_exec  # noqa: E402

W, H = 1920, 1080
REPS = 40
_SUFF = re.compile(r"\.\d+$")


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


def census(logdir):
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
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            d = e.get("dur", 0) / 1e3
            if name.startswith("jit_"):
                tot["<program> " + name.split("(")[0]] += d
                cnt["<program> " + name.split("(")[0]] += 1
                continue
            base = _SUFF.sub("", name)
            tot[base] += d
            cnt[base] += 1
    print(f"{'op (base)':44s} {'ms/8fl':>9s} {'n/8fl':>7s}")
    for name, d in tot.most_common(30):
        print(f"{name[:44]:44s} {d / 8:9.4f} {cnt[name] / 8:7.1f}")


def main():
    ctx, draw = build()
    atlas = ctx._store.device
    draw(0.0)
    kinds, params = ctx._cmds.snapshot()
    segs = patch_exec.plan_segments(kinds, params, W, H, atlas.shape)
    ps = None
    for _ in range(4):
        ps = ctx._unroll_pack(segs, kinds, params)
        if ps is not None:
            break
    sig, rows = ps
    print("sig:", sig, flush=True)
    ctx._cmds.clear()
    fb0 = jnp.zeros((H, W, 4), ctx._dtype)
    rows_d = jax.device_put(rows)

    def run():
        fb = jnp.copy(fb0)
        fb = patch_exec.render_flush_unrolled(fb, rows_d, atlas, sig)
        return float(jnp.sum(fb.astype(jnp.float32)))

    results = {}
    for g in (0, 4, 8, 16):
        config.set_canvas_group_g(g)
        t0 = time.perf_counter()
        cs = run()                                    # warm/compile
        print(f"g={g}: compile+first {time.perf_counter() - t0:.1f} s "
              f"checksum {cs:.6e}", flush=True)
        t0 = time.perf_counter()
        for _ in range(REPS):
            cs2 = run()
        dt = (time.perf_counter() - t0) / REPS
        results[g] = (dt, cs)
        print(f"g={g}: {dt * 1e3:.3f} ms/flush", flush=True)
        assert cs2 == cs
    base_cs = results[0][1]
    for g, (dt, cs) in results.items():
        tag = "OK" if cs == base_cs else "DIVERGED"
        print(f"g={g:2d}  {dt * 1e3:7.3f} ms/flush  checksum {tag}")

    best = min((g for g in results if g), key=lambda g: results[g][0])
    config.set_canvas_group_g(best)
    logdir = "/tmp/exp_r5_group_trace"
    with jax.profiler.trace(logdir):
        for _ in range(8):
            run()
    print(f"census of g={best}:")
    census(logdir)


if __name__ == "__main__":
    main()
