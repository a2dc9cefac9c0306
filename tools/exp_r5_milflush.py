#!/usr/bin/env python
"""Per-signature device timing of the milrenderer flush programs at
canvas_group_g 0 vs 4: the cache-warm bench_milrenderer timed run costs
9.3 s/frame at g=4 (prime2 2026-08-21) while the mix60 canvas flush
HALVED — some mil-specific signature shape (suspect: P=256 hit-effect
class, whose batched one-hot einsum lowers to convolution) must be
pathological.  Captures every (sig, rows, atlas) a short production run
dispatches, then times each unique sig's program at both g values.

Run: nohup python tools/exp_r5_milflush.py > /tmp/exp_r5_milflush.log 2>&1 &
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from libnativecpurenderer_tpu import config  # noqa: E402
from libnativecpurenderer_tpu.ops import patch_exec  # noqa: E402


def capture():
    """Run a few production frames with the flush entries wrapped."""
    from tools.synth_chart import make_chart_package
    from libnativecpurenderer_tpu.apps.milrenderer import Renderer

    caps = {}
    orig_flush = patch_exec.render_flush_unrolled
    orig_step = patch_exec.frame_step_unrolled
    orig_batch = patch_exec.frame_step_unrolled_batch

    def w_flush(fb, rows, atlas, sig, barriers=True):
        caps.setdefault(("flush", sig), (np.asarray(rows),
                                         np.asarray(atlas)))
        return orig_flush(fb, rows, atlas, sig, barriers)

    def w_step(fb0, rows, atlas, sig, barriers=True):
        caps.setdefault(("step", sig), (np.asarray(rows),
                                        np.asarray(atlas)))
        return orig_step(fb0, rows, atlas, sig, barriers)

    def w_batch(fb0, rows_b, atlas, sig, barriers=True):
        caps.setdefault(("batch", sig), (np.asarray(rows_b),
                                         np.asarray(atlas)))
        return orig_batch(fb0, rows_b, atlas, sig, barriers)

    patch_exec.render_flush_unrolled = w_flush
    patch_exec.frame_step_unrolled = w_step
    patch_exec.frame_step_unrolled_batch = w_batch
    try:
        td = tempfile.mkdtemp()
        zpath, res = make_chart_package(td)
        for _ in range(2):            # second run so min_seen=2 unrolls
            r = Renderer(width=960, height=540, fps=60, res_dir=res,
                         batch_frames=8)
            r.run(zpath, os.path.join(td, "cap.mp4"), progress=False,
                  end_frame=16)
    finally:
        patch_exec.render_flush_unrolled = orig_flush
        patch_exec.frame_step_unrolled = orig_step
        patch_exec.frame_step_unrolled_batch = orig_batch
    return caps


def main():
    caps = capture()
    print(f"captured {len(caps)} unique (entry, sig)", flush=True)
    H, W = 540, 960
    for (entry, sig), (rows, atlas_np) in caps.items():
        atlas = jnp.asarray(atlas_np)
        rows_d = jnp.asarray(rows)
        fb0 = jnp.zeros((H, W, 4), jnp.float32)
        line = [f"{entry} {str(sig)[:90]}"]
        for g in (0, 4):
            config.set_canvas_group_g(g)
            try:
                if entry == "flush":
                    def run():
                        fb = patch_exec.render_flush_unrolled(
                            jnp.copy(fb0), rows_d, atlas, sig)
                        return float(jnp.sum(fb[0, :8, 0]
                                             .astype(jnp.float32)))
                elif entry == "step":
                    def run():
                        u8 = patch_exec.frame_step_unrolled(
                            fb0, rows_d, atlas, sig)
                        return float(jnp.sum(u8[0, :8, 0]
                                             .astype(jnp.uint32)))
                else:
                    def run():
                        u8 = patch_exec.frame_step_unrolled_batch(
                            fb0, rows_d, atlas, sig)
                        return float(jnp.sum(u8[0, 0, :8, 0]
                                             .astype(jnp.uint32)))
                t0 = time.perf_counter()
                run()
                warm = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _ in range(5):
                    cs = run()
                dt = (time.perf_counter() - t0) / 5
                line.append(f"g{g}: {dt * 1e3:8.2f} ms (warm {warm:5.1f} s"
                            f", cs {cs:.3e})")
            except Exception as e:
                line.append(f"g{g}: FAILED {type(e).__name__}: {e}")
        print(" | ".join(line), flush=True)


if __name__ == "__main__":
    main()
