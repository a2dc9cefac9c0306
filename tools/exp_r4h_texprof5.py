#!/usr/bin/env python
"""texprof5: op-level device profile of the textured FUSED-LOOP entry at
the SESSION-H defaults (out8 + kcc32 + nw14 + tex_skip + fb_subrow +
MEGA=8/capacity=1024, bench race 2.09 ms/frame).  texprof4 at the
session-F defaults read kernel 1.255 + fallback 0.212 + sort 0.080 +
detile 0.034 + ~0.36 scheduling/small fusions; with mega8 the kernel
share drops — this run names what is actually left in the ~0.36 misc
bucket (the largest non-kernel item) and re-checks the balance.

Run: nohup python tools/exp_r4h_texprof5.py > /tmp/texprof5.log 2>&1 &
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
import numpy as np

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402

W, H = 1920, 1080
FRAMES = 12


def main():
    verts_np, faces_np, _ = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    uvs_np = ((verts_np[:, :2] - verts_np[:, :2].min(0))
              / np.ptp(verts_np[:, :2], 0))
    uvs = jnp.asarray(uvs_np, jnp.float32)
    rng = np.random.default_rng(1)
    tex_u8 = jnp.asarray(rng.integers(0, 256, (256, 256, 4)), jnp.uint8)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = jnp.stack([jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                                  jnp.float32) for i in range(FRAMES)])

    def run():
        out, ovf = raster3d.render_textured_pallas_loop(
            verts, faces, uvs, tex_u8, W, H, mvps=mvps)
        return (float(jnp.sum(out.astype(jnp.float32))), bool(ovf))

    t0 = time.time()
    chk, ovf = run()
    print(f"warm {time.time() - t0:.0f}s chk {chk:.6g} ovf {ovf}",
          flush=True)

    lowered = raster3d.render_textured_pallas_loop.lower(
        verts, faces, uvs, tex_u8, W, H, mvps=mvps)
    hlo = lowered.compile().as_text()
    meta = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ([^ ]+)", line)
        if not m:
            continue
        om = re.search(r'op_name="([^"]+)"', line)
        meta[m.group(1)] = (m.group(2), om.group(1) if om else "")

    logdir = "/tmp/texprof5"
    with jax.profiler.trace(logdir):
        run()

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
            d = e.get("dur", 0) / 1e3
            tot[name] += d
            cnt[name] += 1
            dev_total += d
    print(f"device total {dev_total:.2f} ms over {FRAMES} frames "
          f"= {dev_total / FRAMES:.3f} ms/frame", flush=True)
    print(f"{'op':34s} {'ms/frame':>9s} {'n':>4s}  shape / source")
    for name, d in tot.most_common(45):
        shape, om = meta.get(name, ("?", ""))
        om = re.sub(r"^jit\(render_textured_pallas_loop\)/", "", om)
        print(f"{name[:34]:34s} {d / FRAMES:9.4f} {cnt[name]:4d}  "
              f"{shape[:40]} {om[:90]}")


if __name__ == "__main__":
    main()
