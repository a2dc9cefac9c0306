#!/usr/bin/env python
"""Grouped patch compute (config.canvas_group_g) in the REAL bench
context: bench_canvas (serialized record+flush, pipelined dispatches,
one sync per 45-frame pass) and bench_e2e (BatchedVideoPipeline batch
programs) at g in (0, 4, 8).  exp_r5_group measured the flush PROGRAM
at 0.828 ms (g=4) vs 1.619 (g=0), checksums identical — this decides
whether the wall metric follows and which g ships as default.

Run: nohup python tools/exp_r5_group2.py > /tmp/exp_r5_group2.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from libnativecpurenderer_tpu import config  # noqa: E402
import bench  # noqa: E402


def main():
    for g in (0, 4, 8, 4, 0):     # repeat ends to bound tunnel drift
        config.set_canvas_group_g(g)
        t0 = time.time()
        ms = bench.bench_canvas(45)
        print(f"[group2] g={g}: canvas {ms:.2f} ms/frame "
              f"(wall {time.time() - t0:.0f}s)", flush=True)
    for g in (0, 4):
        config.set_canvas_group_g(g)
        t0 = time.time()
        fps = bench.bench_e2e(45)
        print(f"[group2] g={g}: e2e {fps:.1f} fps "
              f"(wall {time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
