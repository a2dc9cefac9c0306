#!/usr/bin/env python
"""Census of the pathological P=512 milrenderer flush program (g=0 and
g=4): which device ops eat the 172-950 ms?  Suspects: the region-route
texel gather's lowering (serial row loop?) at P=512, the (512,512,4)
atlas window slices, or layout copies between commands.

Run: nohup python tools/exp_r5_milflush2.py > /tmp/exp_r5_milflush2.log 2>&1 &
"""

import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from libnativecpurenderer_tpu import config  # noqa: E402
from libnativecpurenderer_tpu.ops import patch_exec  # noqa: E402

_SUFF = re.compile(r"\.\d+$")


def capture_worst():
    from tools.synth_chart import make_chart_package
    from libnativecpurenderer_tpu.apps.milrenderer import Renderer

    caps = {}
    orig_flush = patch_exec.render_flush_unrolled

    def w_flush(fb, rows, atlas, sig, barriers=True):
        caps.setdefault(sig, (np.asarray(rows), np.asarray(atlas)))
        return orig_flush(fb, rows, atlas, sig, barriers)

    patch_exec.render_flush_unrolled = w_flush
    try:
        td = tempfile.mkdtemp()
        zpath, res = make_chart_package(td)
        for _ in range(2):
            r = Renderer(width=960, height=540, fps=60, res_dir=res,
                         batch_frames=8)
            r.run(zpath, os.path.join(td, "cap.mp4"), progress=False,
                  end_frame=16)
    finally:
        patch_exec.render_flush_unrolled = orig_flush
    # worst = the P=512, R=512 patch signature
    for sig, v in caps.items():
        for seg in sig:
            if seg[0] == "patch" and seg[1] == 512 and seg[2] == 512:
                return sig, v
    return next(iter(caps.items()))


def census(logdir, n):
    paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz",
                             recursive=True))
    ev = json.load(gzip.open(paths[-1], "rt")).get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "")
            for e in ev if e.get("ph") == "M"
            and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n_ in pids.items()
                if "TPU" in n_ or "tpu" in n_ or "/device" in n_}
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
    print(f"{'op (base)':44s} {'ms/call':>9s} {'n/call':>7s}")
    for name, d in tot.most_common(25):
        print(f"{name[:44]:44s} {d / n:9.3f} {cnt[name] / n:7.1f}")


def main():
    sig, (rows, atlas_np) = capture_worst()
    print("sig:", str(sig)[:200], flush=True)
    print("rows", rows.shape, "atlas", atlas_np.shape, flush=True)
    H, W = 540, 960
    atlas = jnp.asarray(atlas_np)
    rows_d = jnp.asarray(rows)
    fb0 = jnp.zeros((H, W, 4), jnp.float32)
    for g in (0, 4):
        config.set_canvas_group_g(g)

        def run():
            fb = patch_exec.render_flush_unrolled(jnp.copy(fb0), rows_d,
                                                  atlas, sig)
            return float(jnp.sum(fb[::64, ::64, 0].astype(jnp.float32)))

        run()
        t0 = time.perf_counter()
        for _ in range(3):
            run()
        print(f"g={g}: {(time.perf_counter() - t0) / 3 * 1e3:.1f} "
              f"ms/flush", flush=True)
        logdir = f"/tmp/exp_r5_milflush2_trace_g{g}"
        with jax.profiler.trace(logdir):
            for _ in range(2):
                run()
        print(f"census g={g}:", flush=True)
        census(logdir, 2)


if __name__ == "__main__":
    main()
