#!/usr/bin/env python
"""Diagnose the milrenderer-on-TPU seconds-per-frame anomaly
(bench_milrenderer measured 7-11 s/frame with a 94% unroll hit ratio,
while bench.py's canvas path runs ~4-5 ms/frame on the same tunnel).

Instruments a short synthetic-chart run:
  - per-frame wall times (spikes = compiles; uniform = transport)
  - per-dispatch-call wall inside _dispatch_group / _flush_segmented /
    executor._run (does any single eager call block for seconds?)
  - unrolled-flush compile count before/after the timed window
  - optional jax.profiler trace over a few frames
    (parse with the /tmp/prof_parse.py pattern)

Run: nohup python tools/exp_mil_prof.py > /tmp/exp_mil_prof.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import numpy as np


def main(frames=40, width=1920, height=1080, trace=False):
    import pathlib
    import tempfile

    import jax

    from bench_milrenderer import SinkCap, build_chart_package
    from libnativecpurenderer_tpu.apps.milrenderer import Renderer
    from libnativecpurenderer_tpu.context import RenderContext
    from libnativecpurenderer_tpu.ops import executor, patch_exec

    td = tempfile.mkdtemp()
    zpath, res = build_chart_package(pathlib.Path(td))
    r = Renderer(width=width, height=height, fps=60, res_dir=res,
                 silent=True)
    r.cap = SinkCap()

    # --- instrument device-call wall times -----------------------------
    calls = []          # (tag, wall_s) per device-path call

    def wrap(mod, name, tag):
        orig = getattr(mod, name)

        def timed(*a, **k):
            t0 = time.perf_counter()
            out = orig(*a, **k)
            calls.append((tag, time.perf_counter() - t0))
            return out
        setattr(mod, name, timed)
        return orig

    origs = [
        (patch_exec, "render_flush_unrolled",
         wrap(patch_exec, "render_flush_unrolled", "unrolled")),
        (patch_exec, "render_flush",
         wrap(patch_exec, "render_flush", "loop_flush")),
        (patch_exec, "frame_step_unrolled",
         wrap(patch_exec, "frame_step_unrolled", "fused_frame")),
        (executor, "_run", wrap(executor, "_run", "scan_run")),
    ]

    frame_walls = []
    orig_put = SinkCap.put_renderer_context_frame

    def timed_put(self, ctx):
        t0 = time.perf_counter()
        orig_put(self, ctx)
        frame_walls.append(time.perf_counter() - t0)
    SinkCap.put_renderer_context_frame = timed_put

    try:
        # warm over the same range until the compile set stabilises:
        # one-shot setup flushes (initial clear, bg precomposite) recur
        # once PER RUN, so min_seen=2 compiles them on the SECOND run —
        # a single warm pass leaves those compiles in the timed pass
        # (tools/exp_sig_churn.py root-caused this)
        t0 = time.perf_counter()
        for _ in range(4):
            pre = len(RenderContext._unroll_compiled)
            r.run(zpath, "/dev/null", progress=False, start_frame=0,
                  end_frame=frames)
            if r.cap.last is not None:
                np.asarray(r.cap.last)[:1, :1]
            if len(RenderContext._unroll_compiled) == pre:
                break
        print(f"WARM {frames} frames wall={time.perf_counter() - t0:.1f}s "
              f"sigs={len(RenderContext._unroll_compiled)}", flush=True)

        calls.clear()
        frame_walls.clear()
        c0 = len(RenderContext._unroll_compiled)
        if trace:
            jax.profiler.start_trace("/tmp/jaxtrace_mil")
        t0 = time.perf_counter()
        r.run(zpath, "/dev/null", progress=False, start_frame=0,
              end_frame=frames)
        if r.cap.last is not None:
            np.asarray(r.cap.last)[:1, :1]
        wall = time.perf_counter() - t0
        if trace:
            jax.profiler.stop_trace()
        c1 = len(RenderContext._unroll_compiled)

        fw = np.array(frame_walls)
        print(f"TIMED {frames} frames wall={wall:.2f}s "
              f"-> {wall / frames * 1e3:.1f} ms/frame "
              f"new_compiles={c1 - c0}", flush=True)
        if len(fw):
            print(f"frame walls ms: med={np.median(fw) * 1e3:.1f} "
                  f"p90={np.percentile(fw, 90) * 1e3:.1f} "
                  f"max={fw.max() * 1e3:.1f} "
                  f"first5={[round(v * 1e3, 1) for v in fw[:5]]} "
                  f"last5={[round(v * 1e3, 1) for v in fw[-5:]]}",
                  flush=True)
        import collections
        agg = collections.defaultdict(float)
        cnt = collections.Counter()
        for tag, dt in calls:
            agg[tag] += dt
            cnt[tag] += 1
        for tag in sorted(agg, key=agg.get, reverse=True):
            print(f"  {tag:14s} {agg[tag] / frames * 1e3:8.2f} ms/frame "
                  f"x{cnt[tag]}", flush=True)
    finally:
        for mod, name, orig in origs:
            setattr(mod, name, orig)
        SinkCap.put_renderer_context_frame = orig_put


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()
    main(frames=args.frames, trace=args.trace)
