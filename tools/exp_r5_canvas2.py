#!/usr/bin/env python
"""Canvas dispatch decomposition (follow-up to exp_r5_canvas):

exp_r5_canvas measured wall 3.28 ms/frame = host 0.79 + ONE device
program (jit__flush) 1.62 + a residual ~1.5 that must be transport —
the per-frame rows upload (first-touch host->device put, the known
tunnel trap) and launch latency.  This isolates:

  put:      host->device put latency for a rows-sized array, alone
  staged:   45 unrolled-flush programs chained with PRE-STAGED rows
            (no per-frame upload) -> launch + device floor
  replica:  the bench loop (put + launch + device) for reference

If staged ~= 1.7-1.8 ms/frame, the canvas gap IS the per-frame upload
and the fix is overlapping the put with the previous frame's render.

Run: nohup python tools/exp_r5_canvas2.py > /tmp/exp_r5_canvas2.log 2>&1 &
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import libnativecpurenderer_tpu as R  # noqa: E402
from libnativecpurenderer_tpu import atlas as atlas_mod  # noqa: E402
from libnativecpurenderer_tpu.ops import patch_exec  # noqa: E402

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


def main():
    ctx, draw = build()
    atlas = ctx._store.device

    # collect each frame's (sig, rows) through the production packer
    packed = []
    for i in range(FRAMES):
        draw(i * 0.016)
        kinds, params = ctx._cmds.snapshot()
        segs = patch_exec.plan_segments(kinds, params, W, H, atlas.shape)
        assert all(s[0] in ("patch", "fullarith") for s in segs), \
            [s[0] for s in segs]
        ps = None
        for _ in range(4):
            ps = ctx._unroll_pack(segs, kinds, params)
            if ps is not None:
                break
        assert ps is not None
        packed.append(ps)
        ctx._cmds.clear()
    sigs = {repr(s) for s, _ in packed}
    print(f"{FRAMES} frames, {len(sigs)} distinct sigs, rows shape "
          f"{packed[0][1].shape}", flush=True)

    fb0 = jnp.zeros((H, W, 4), ctx._dtype)

    # --- put latency alone -------------------------------------------
    rows_np = [r for _, r in packed]
    d = jax.device_put(rows_np[0])
    d.block_until_ready()
    for rep in range(3):                 # rep 0 may carry tunnel settle
        t0 = time.perf_counter()
        outs = [jax.device_put(r) for r in rows_np]
        chk = float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
        dt = (time.perf_counter() - t0) / FRAMES
        print(f"put-only[{rep}]: {dt * 1e3:.2f} ms/frame (rows "
              f"{rows_np[0].nbytes} B) chk {chk:.0f}", flush=True)

    # --- staged: rows already on device ------------------------------
    rows_dev = [jax.device_put(r) for r in rows_np]
    float(jnp.sum(rows_dev[-1]))

    def run_staged():
        # render_flush_unrolled DONATES its fb argument — hand it a
        # fresh device copy so fb0 survives across runs
        fb = jnp.copy(fb0)
        for (sig, _), rd in zip(packed, rows_dev):
            fb = patch_exec.render_flush_unrolled(fb, rd, atlas, sig)
        return float(jnp.sum(fb[0, :64, 0].astype(jnp.float32)))

    run_staged()                                  # warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        run_staged()
        dt = (time.perf_counter() - t0) / FRAMES
        best = dt if best is None else min(best, dt)
    print(f"staged: {best * 1e3:.2f} ms/frame", flush=True)

    # --- replica: per-frame put + launch ------------------------------
    def run_replica():
        fb = jnp.copy(fb0)
        for (sig, rows) in packed:
            fb = patch_exec.render_flush_unrolled(fb, jnp.asarray(rows),
                                                  atlas, sig)
        return float(jnp.sum(fb[0, :64, 0].astype(jnp.float32)))

    a = run_replica()
    b = run_staged()
    assert a == b, (a, b)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        run_replica()
        dt = (time.perf_counter() - t0) / FRAMES
        best = dt if best is None else min(best, dt)
    print(f"replica (put+launch+device): {best * 1e3:.2f} ms/frame",
          flush=True)


if __name__ == "__main__":
    main()
