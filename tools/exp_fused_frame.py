#!/usr/bin/env python
"""A/B the fused pipeline frame step (pipeline._flush_segmented_frames
fast path: fb0 -> unrolled flush -> u8 in ONE program) against the
eager 3-dispatch chain (fb0.copy / flush / quantize) it replaced, on
the bench_e2e workload.  Quantifies tunnel queue-item savings + fused
copy/quantize on real hardware.

Run: nohup python tools/exp_fused_frame.py > /tmp/exp_fused_frame.log 2>&1 &
"""
import math
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main(W=1920, H=1080):
    import libnativecpurenderer_tpu as R
    from libnativecpurenderer_tpu import pipeline as pl_mod
    from libnativecpurenderer_tpu.ops import patch_exec
    rec = R.MultiThreadedVideoRenderContextPreparer(None, W, H, True)
    rng = np.random.default_rng(0)
    texs = [R.Texture._from_array(rng.random((128, 128, 4)), True)
            for _ in range(4)]

    def draw(t):
        rec.fill_color(0.05, 0.05, 0.08, 0.25)
        r2 = np.random.default_rng(42)
        for i in range(24):
            x = float(r2.uniform(0, W - 140) + 40 * math.sin(t * 2 + i))
            y = float(r2.uniform(0, H - 140))
            rec.draw_splitted_texture(texs[i % 4], x, y, 100.0, 50.0,
                                      0.1, 0.9, 0.0, 1.0)
        for i in range(8):
            rec.draw_rect(float(r2.uniform(0, W - 60)),
                          float(r2.uniform(0, H - 60)),
                          40.0, 24.0, 0.2, 0.8, 0.4, 0.7)

    fb0 = jnp.zeros((H, W, 4), rec._dtype)

    class _Sink:
        def put_frame_u8(self, fr):
            pass

    def run(frames, fused: bool):
        orig = patch_exec.frame_step_unrolled
        chks = []
        try:
            pipe = pl_mod.BatchedVideoPipeline(_Sink(), W, H, 15,
                                               dtype=rec._dtype, fb0=fb0)
            if not fused:
                # bypass: monkeypatch the segmented-frames method to the
                # eager chain only
                from libnativecpurenderer_tpu.ops import executor

                def eager(pending):
                    ctx = pipe._exec_ctx
                    if ctx is None:
                        from libnativecpurenderer_tpu.context import \
                            RenderContext
                        ctx = pipe._exec_ctx = RenderContext(
                            W, H, True, dtype=pipe._dtype)
                    outs = []
                    for k, p in pending:
                        ctx._fb = pipe._fb0.copy()
                        ctx._flush_segmented(k, p)
                        outs.append(executor.quantize_u8(ctx._fb))
                    return jnp.stack(outs)
                pipe._flush_segmented_frames = eager

            def drain():
                if pipe._inflight is not None:
                    u8, _ = pipe._inflight
                    chks.append(jnp.sum(u8[0, 0, :64, 0]))
                    pipe._inflight = None
            pipe._drain = drain
            for i in range(frames):
                draw(i * 0.016)
                k, p = rec._cmds.snapshot()
                pipe.submit(k, p)
                rec._cmds.clear()
            pipe.finish()
            return float(jnp.sum(jnp.stack(chks)))
        finally:
            patch_exec.frame_step_unrolled = orig

    for fused in (True, False, True, False):
        run(15, fused)                       # warm compile
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            run(45, fused)
            dt = (time.perf_counter() - t0) / 45
            best = dt if best is None else min(best, dt)
        print(f"fused={fused}: {best * 1e3:.2f} ms/frame "
              f"({1 / best:.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
