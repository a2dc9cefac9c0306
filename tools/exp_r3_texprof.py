#!/usr/bin/env python
"""Device-op profile of the textured raster path (1080p/10k bench mesh).

Traces render_textured_pallas_batch with jax.profiler, then parses the
trace.json.gz device lanes into per-op totals so the 4.7 ms/frame
textured cost can be decomposed (kernel vs fallback gather vs detile vs
prep) before guessing at levers.

Run on the TPU:
  nohup python tools/exp_r3_texprof.py > /tmp/exp_texprof.log 2>&1 &
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402
import numpy as np                                           # noqa: E402

from libnativecpurenderer_tpu.models import mesh             # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d            # noqa: E402

W, H, B = 1920, 1080, 12
TRACE_DIR = "/tmp/jaxtrace_tex"


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    nv = verts_np.shape[0]
    rng = np.random.default_rng(3)
    if "--random-uv" in sys.argv:
        # adversarial fallback-only scene (footprint windows never hit)
        uvs = jnp.asarray(rng.uniform(0, 1, (nv, 2)), jnp.float32)
    else:
        # bench.py bench_textured's planar-projected uvs — the actual
        # bench workload (the r3 random-uv run profiled the fallback
        # conds at ~6 ms/frame each, which is NOT the bench's path)
        uvs_np = ((verts_np[:, :2] - verts_np[:, :2].min(0))
                  / np.ptp(verts_np[:, :2], 0))
        uvs = jnp.asarray(uvs_np, jnp.float32)
    tex = jnp.asarray(rng.integers(0, 255, (256, 256, 4)), jnp.uint8)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = jnp.stack([
        jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03), jnp.float32)
        for i in range(B)])

    @jax.jit
    def run(mv):
        rgba, ovf = raster3d.render_textured_pallas_batch(
            verts, faces, uvs, tex, W, H, mvps=mv)
        return jnp.sum(jnp.sum(rgba.reshape(B, -1), axis=1,
                               dtype=jnp.uint32).astype(jnp.float32)), ovf

    t0 = time.time()
    s, o = run(mvps)
    print(f"warm compile {time.time() - t0:.0f}s chk {float(s):.4e} "
          f"ovf={bool(o)}", flush=True)

    # timed (checksum-forced sync, 5 reps of B frames)
    t0 = time.perf_counter()
    for _ in range(5):
        s, o = run(mvps)
    float(s)
    dt = time.perf_counter() - t0
    print(f"timed: {dt / (5 * B) * 1e3:.2f} ms/frame", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        s, o = run(mvps)
    float(s)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*"
                             "trace.json.gz"))
    if not paths:
        print("no trace.json.gz produced", flush=True)
        return
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "args" in e}
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "/device" in n.lower()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tot[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    frames = 3 * B
    print(f"device lanes: {[pids[p] for p in dev_pids]}")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{us / frames / 1e3:8.3f} ms/frame  x{cnt[name]:4d}  "
              f"{name[:90]}", flush=True)


if __name__ == "__main__":
    main()
