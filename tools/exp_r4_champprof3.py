#!/usr/bin/env python
"""Op-level device profile of the ROUND-4 session-E champion candidate (out8+ktail), with
HLO metadata attribution.

Round-3's exp_r3_champprof measured the non-kernel tail (~0.66 ms/frame)
but only by anonymous HLO op names (fusion.108, copy.115, ...).  This
variant (a) profiles the CURRENT race winner (mega=8 / capacity 1024 +
pre-sort sentinels), and (b) parses the optimized HLO text to map each
hot op name to its op_name metadata (jit(seq)/while/body/... source
path) and operand shapes, so the tail is attributed to concrete source
operations instead of guessed.

Run: nohup python tools/exp_r4_champprof3.py > /tmp/champprof3.log 2>&1 &
"""

import collections
import glob
import gzip
import json
import re
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402

W, H = 1920, 1080
FRAMES = 48
CFG = dict(tile_w=32, tile_h=32, span_x=5, span_y=3, capacity=1024,
           flat=True, kcc=32, u8=True, opaque=True, z_clip=False,
           resident_out=True, mega=8, out8=True)


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    colors = jnp.asarray(colors_np, jnp.float32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = jnp.stack([jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                                  jnp.float32) for i in range(FRAMES)])

    @jax.jit
    def seq(mv):
        pre = (raster3d.pregather_mesh(verts, faces), colors[faces])

        def step(i, acc):
            out, _, ovf = raster3d.render_gouraud_pallas.__wrapped__(
                verts, faces, colors, W, H, mv[i], pre=pre, **CFG)
            s = jnp.sum(out, dtype=jnp.uint32).astype(jnp.float32)
            return (acc[0] + s, acc[1] | ovf)
        return lax.fori_loop(0, FRAMES, step,
                             (jnp.float32(0.0), jnp.asarray(False)))

    t0 = time.time()
    s, ovf = seq(mvps)
    print(f"warm {time.time() - t0:.0f}s chk {float(s):.6g} "
          f"ovf {bool(ovf)}", flush=True)

    # optimized HLO text: op name -> (op_name metadata, def line prefix)
    hlo = jax.jit(seq).lower(mvps).compile().as_text()
    meta = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ([^ ]+)", line)
        if not m:
            continue
        name = m.group(1)
        shape = m.group(2)
        om = re.search(r'op_name="([^"]+)"', line)
        meta[name] = (shape, om.group(1) if om else "")

    logdir = "/tmp/champprof3"
    with jax.profiler.trace(logdir):
        s, _ = seq(mvps)
        float(s)   # sync inside the trace window

    paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz",
                             recursive=True))
    print("traces:", paths, flush=True)
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
            name = e.get("name", "?")
            d = e.get("dur", 0) / 1e3            # us -> ms
            tot[name] += d
            cnt[name] += 1
            dev_total += d
    print(f"device total {dev_total:.2f} ms over {FRAMES} frames "
          f"= {dev_total / FRAMES:.3f} ms/frame", flush=True)
    print(f"{'op':34s} {'ms/frame':>9s} {'n':>4s}  shape / source")
    for name, d in tot.most_common(45):
        shape, om = meta.get(name, ("?", ""))
        # drop the jit(seq)/while/body prefix for readability
        om = re.sub(r"^jit\(seq\)/", "", om)
        print(f"{name[:34]:34s} {d / FRAMES:9.4f} {cnt[name]:4d}  "
              f"{shape[:40]} {om[:90]}")


if __name__ == "__main__":
    main()
