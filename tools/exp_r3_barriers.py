#!/usr/bin/env python
"""A/B the inter-command optimization barrier in the unrolled flush.

The rounding-sensitive products are individually barriered inside the
branch bodies (executor._blend_into ta/tb, mk_region/_inv_point snap
inputs), so dropping the per-command fb barrier should be bit-equal
while letting XLA fuse consecutive full-frame blends into one HBM pass
(each full-frame command is otherwise its own ~66 MB read+write at
1080p f32).  This measures both variants on device and byte-compares
the u8 outputs on two workloads:
  * the bench_canvas 60-command milrenderer-like mix
  * a fullarith-heavy stack (16 full-frame fills/dims/gradients) where
    cross-command fusion has the most to win

Run: nohup python tools/exp_r3_barriers.py > /tmp/exp_barriers.log 2>&1 &
"""

import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")
import libnativecpurenderer_tpu as R                          # noqa: E402
from libnativecpurenderer_tpu.ops import patch_exec           # noqa: E402

W, H = 1920, 1080


def record_mix(ctx, texs, t):
    ctx.fill_color(0.05, 0.05, 0.08, 0.25)
    ctx.draw_vertical_grd(0, H - 200, W, 200, 0, 0, 0, 0, 0, 0, 0, 0.8)
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


def record_fullstack(ctx, texs, t):
    # 16 full-frame arith commands: fills + gradients (all fullarith
    # segments -> maximal cross-command fusion potential).  Disable the
    # tile-kernel fold so the unrolled path executes them.
    for i in range(8):
        ctx.fill_color(0.1 + 0.05 * i, 0.2, 0.3, 0.12)
        ctx.draw_vertical_grd(0, 0, W, H, 0.1 * i, 0, 0, 0.2,
                              0, 0.1, 0, 0.3)


def capture(recorder):
    """Record one frame and capture every (rows, sig) the flush would
    send to the unrolled executor."""
    from libnativecpurenderer_tpu import config
    ctx = R.RenderContext(W, H, True)
    rng = np.random.default_rng(0)
    texs = [R.Texture._from_array(rng.random((128, 128, 4)), True)
            for _ in range(4)]
    # force unrolled: min_seen=1; keep fullarith stacks off the kernel
    old_min = config.flush_unroll_min_seen()
    old_k = config.canvas_kernel_enabled()
    config.set_flush_unroll_min_seen(1)
    config.set_canvas_kernel(False)
    caps = []
    orig = patch_exec.render_flush_unrolled

    def wrapper(fb, rows, atlas, sig, barriers=True):
        caps.append((np.asarray(rows), np.asarray(atlas), sig))
        return orig(fb, rows, atlas, sig, barriers)

    patch_exec.render_flush_unrolled = wrapper
    try:
        recorder(ctx, texs, 0.3)
        ctx.flush()
    finally:
        patch_exec.render_flush_unrolled = orig
        config.set_flush_unroll_min_seen(old_min)
        config.set_canvas_kernel(old_k)
    return caps


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def loop(fb0, rows, atlas, sig, barriers, n):
    def body(j, acc):
        # data-depend rows on the carry so XLA can't hoist the render
        r = jnp.where(jnp.isfinite(acc), rows, 0.0)
        out = patch_exec._unrolled_body(fb0, r, atlas, sig, barriers)
        return acc + out[371, 173, 0]
    return lax.fori_loop(0, n, body, jnp.float32(0.0))


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    for name, rec in (("mix60", record_mix), ("full16", record_fullstack)):
        caps = capture(rec)
        print(f"{name}: {len(caps)} unrolled flush group(s)", flush=True)
        if not caps:
            print(f"{name}: NOTHING CAPTURED (fell back to loop exec)",
                  flush=True)
            continue
        rows_np, atlas_np, sig = caps[0]
        fb0 = jnp.zeros((H, W, 4), jnp.float32)
        rows = jnp.asarray(rows_np)
        atlas = jnp.asarray(atlas_np)
        outs = {}
        for barriers in (True, False):
            out = patch_exec.frame_step_unrolled(fb0, rows, atlas, sig,
                                                 barriers)
            outs[barriers] = np.asarray(out)
            walls = {}
            for n in (8, 24):
                float(loop(fb0, rows, atlas, sig, barriers, n))  # warm
            for n in (8, 24):
                best = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(loop(fb0, rows, atlas, sig, barriers, n))
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                walls[n] = best
            per = (walls[24] - walls[8]) / 16.0
            print(f"{name} barriers={barriers}: {per * 1e3:.3f} ms/frame",
                  flush=True)
        same = np.array_equal(outs[True], outs[False])
        diff = (0 if same else
                int((outs[True] != outs[False]).sum()))
        print(f"{name}: bit-equal={same} (diff bytes {diff})", flush=True)


if __name__ == "__main__":
    main()
