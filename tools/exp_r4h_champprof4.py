#!/usr/bin/env python
"""Op-level device profile of the session-H champion (mega8/kcc32/out8
/TILED), plus a masked-vs-raw checksum A/B.

The tiled racer won bench 2026-08-20 at 1.007 ms/frame (993.3 fps) —
7 us/frame from the 1000-fps north-star.  champprof3 attributed the
detiled out8 champion at kernel 0.844 + sort 0.067 + detile 0.065 +
misc 0.07; tiled removes the detile chain, so what remains is kernel +
sort + misc + the bench's per-frame forcing reduce.  Two questions:

1. attribution of the residual misc (~0.07) at the TILED layout —
   which fusions survive, what do they feed;
2. the tiled racers checksum with a viewport-mask f32 multiply (padded
   slots carry real rasterised values) — does the mask multiply cost
   measurably more than a raw u32 sum?  Padded slots are deterministic
   (edge triangles), so a raw sum is a valid forcing reduce with its
   own checksum base.

Run: nohup python tools/exp_r4h_champprof4.py > /tmp/champprof4.log 2>&1 &
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
           resident_out=True, mega=8, out8=True, tiled=True)


def build_seq(masked: bool):
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    colors = jnp.asarray(colors_np, jnp.float32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = jnp.stack([jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                                  jnp.float32) for i in range(FRAMES)])
    vmask = raster3d.viewport_mask(W, H, 32, 32)[..., None]

    @jax.jit
    def seq(mv):
        pre = (raster3d.pregather_mesh(verts, faces), colors[faces])
        mask_f = vmask.astype(jnp.float32)

        def step(i, acc):
            out, _, ovf = raster3d.render_gouraud_pallas.__wrapped__(
                verts, faces, colors, W, H, mv[i], pre=pre, **CFG)
            if masked:
                s = jnp.sum(out.astype(jnp.float32) * mask_f)
            else:
                s = jnp.sum(out, dtype=jnp.uint32).astype(jnp.float32)
            return (acc[0] + s, acc[1] | ovf)
        return lax.fori_loop(0, FRAMES, step,
                             (jnp.float32(0.0), jnp.asarray(False)))

    return seq, mvps


def time_seq(seq, mvps, reps=4):
    s, ovf = seq(mvps)          # warm
    chk = float(s)
    t0 = time.perf_counter()
    for _ in range(reps):
        s, _ = seq(mvps)
    got = float(s)
    dt = (time.perf_counter() - t0) / reps / FRAMES * 1e3
    return dt, chk, got, bool(ovf)


def main():
    seq_m, mvps = build_seq(masked=True)
    seq_r, _ = build_seq(masked=False)

    t0 = time.time()
    dt_m, chk_m, _, ovf = time_seq(seq_m, mvps)
    print(f"masked-sum: {dt_m:.3f} ms/frame chk {chk_m:.6g} ovf {ovf} "
          f"(warm+time {time.time() - t0:.0f}s)", flush=True)
    t0 = time.time()
    dt_r, chk_r, _, _ = time_seq(seq_r, mvps)
    print(f"raw-u32-sum: {dt_r:.3f} ms/frame chk {chk_r:.6g} "
          f"(warm+time {time.time() - t0:.0f}s)", flush=True)

    # optimized HLO metadata for the masked (bench-equivalent) program
    hlo = jax.jit(seq_m).lower(mvps).compile().as_text()
    meta = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ([^ ]+)", line)
        if not m:
            continue
        om = re.search(r'op_name="([^"]+)"', line)
        meta[m.group(1)] = (m.group(2), om.group(1) if om else "")

    logdir = "/tmp/champprof4"
    with jax.profiler.trace(logdir):
        s, _ = seq_m(mvps)
        float(s)

    paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz",
                             recursive=True))
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
            d = e.get("dur", 0) / 1e3
            tot[e.get("name", "?")] += d
            cnt[e.get("name", "?")] += 1
            dev_total += d
    print(f"device total {dev_total:.2f} ms over {FRAMES} frames "
          f"= {dev_total / FRAMES:.3f} ms/frame", flush=True)
    print(f"{'op':34s} {'ms/frame':>9s} {'n':>4s}  shape / source")
    for name, d in tot.most_common(40):
        shape, om = meta.get(name, ("?", ""))
        om = re.sub(r"^jit\(seq\)/", "", om)
        print(f"{name[:34]:34s} {d / FRAMES:9.4f} {cnt[name]:4d}  "
              f"{shape[:40]} {om[:90]}")


if __name__ == "__main__":
    main()
