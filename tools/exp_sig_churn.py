#!/usr/bin/env python
"""Why does a SECOND identical milrenderer run compile NEW unrolled-flush
signatures?  (exp_mil_prof smoke: warm pass sigs=2, timed pass over the
SAME frames new_compiles=2 — renderer state must leak into the flush
grouping.)  Runs the same frame range twice on CPU at low resolution,
records every signature key _unroll_pack produces in call order, and
prints the first divergence between the two runs.

Run: python tools/exp_sig_churn.py
"""

import pathlib
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main(frames=12, width=640, height=360):
    from bench_milrenderer import SinkCap, build_chart_package
    from libnativecpurenderer_tpu import config
    from libnativecpurenderer_tpu.apps.milrenderer import Renderer
    from libnativecpurenderer_tpu.context import RenderContext

    # compile nothing: min_seen high keeps everything on the loop path,
    # we only want the SIGNATURES _unroll_pack computes
    config.set_flush_unroll_min_seen(99999)

    td = tempfile.mkdtemp()
    zpath, res = build_chart_package(pathlib.Path(td))

    seq = []          # (run, call_idx, key) in call order
    orig_pack = RenderContext._unroll_pack
    run_id = [0]

    def spy(self, group, kinds, params):
        # replicate the signature computation without cache side effects
        sig = []
        for seg in group:
            if seg[0] == "patch":
                _, P, R, lo, hi, sels, _wr = seg
                runs = []
                k = 0
                while k < len(sels):
                    j = k
                    while j < len(sels) and sels[j] == sels[k]:
                        j += 1
                    if self._sel_pad_safe(sels[k]):
                        cnt = self._run_bucket(j - k)
                    else:
                        cnt = j - k
                    runs.append((int(sels[k]), cnt))
                    k = j
                sig.append(("patch", P, R, tuple(runs)))
            else:
                _, lo, hi = seg
                sig.append(("fullarith",
                            tuple(int(k) for k in kinds[lo:hi])))
        seq.append((run_id[0], tuple(sig)))
        return orig_pack(self, group, kinds, params)

    RenderContext._unroll_pack = spy

    r = Renderer(width=width, height=height, fps=60, res_dir=res,
                 silent=True)
    r.cap = SinkCap()
    for rid in (0, 1):
        run_id[0] = rid
        r.run(zpath, "/dev/null", progress=False, start_frame=0,
              end_frame=frames)
        if r.cap.last is not None:
            np.asarray(r.cap.last)[:1, :1]
        print(f"run {rid}: calls so far {len(seq)}", flush=True)

    RenderContext._unroll_pack = orig_pack

    a = [s for rid, s in seq if rid == 0]
    b = [s for rid, s in seq if rid == 1]
    print(f"run0 {len(a)} flush groups, run1 {len(b)}", flush=True)
    sa, sb = set(a), set(b)
    print(f"distinct: run0 {len(sa)} run1 {len(sb)} "
          f"only-in-run1 {len(sb - sa)} only-in-run0 {len(sa - sb)}",
          flush=True)
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            print(f"\nFIRST DIVERGENCE at call {i}:")
            print(f"  run0: {x}")
            print(f"  run1: {y}")
            break
    else:
        if len(a) != len(b):
            i = min(len(a), len(b))
            longer = a if len(a) > len(b) else b
            print(f"\nLENGTH DIVERGENCE at call {i}: "
                  f"extra in run{0 if len(a) > len(b) else 1}: "
                  f"{longer[i]}")
        else:
            print("\nNO divergence — grouping identical across runs")
    for s in sorted(sb - sa, key=repr)[:4]:
        print(f"\nonly-in-run1 sig: {s}")
    for s in sorted(sa - sb, key=repr)[:4]:
        print(f"\nonly-in-run0 sig: {s}")


if __name__ == "__main__":
    main()


def count_mode(frames=12, width=1920, height=1080):
    """Occurrence counts per signature in ONE run: any sig seen exactly
    once explains a min_seen=2 'new compile' appearing in the next run."""
    from collections import Counter

    from bench_milrenderer import SinkCap, build_chart_package
    from libnativecpurenderer_tpu import config
    from libnativecpurenderer_tpu.apps.milrenderer import Renderer
    from libnativecpurenderer_tpu.context import RenderContext

    config.set_flush_unroll_min_seen(99999)
    td = tempfile.mkdtemp()
    zpath, res = build_chart_package(pathlib.Path(td))
    keys = []
    orig = RenderContext._unroll_pack

    def spy(self, group, kinds, params):
        out = orig(self, group, kinds, params)
        keys.append(next(reversed(RenderContext._unroll_sigs)))
        return out

    RenderContext._unroll_pack = spy
    r = Renderer(width=width, height=height, fps=60, res_dir=res,
                 silent=True)
    r.cap = SinkCap()
    r.run(zpath, "/dev/null", progress=False, start_frame=0,
          end_frame=frames)
    RenderContext._unroll_pack = orig
    c = Counter(keys)
    print(f"{len(keys)} groups, {len(c)} distinct")
    for k, n in c.most_common():
        print(f"  x{n}  {repr(k)[:140]}")


if __name__ == "__main__" and "--count" in sys.argv:
    count_mode()
