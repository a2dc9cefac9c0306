#!/usr/bin/env python
"""Textured fused-loop A/B on the bench workload: static NW=16 footprint
unroll vs tex_dyn (per-tile dynamic window count — the fori_loop bounded
by each tile's actual window demand, pallas_raster tex_dyn).  Also the
first clean device measure of the loop entry AFTER the pregather hoist
(raster3d.pregather_mesh landed inside both textured entries).

Checksums must MATCH bit-exactly (skipped windows only touch acc
positions the resolve mask never consumes; interpret test
test_tex_dyn_window_loop_matches).

Run: nohup python tools/exp_r4_texdyn.py > /tmp/texdyn.log 2>&1 &
"""

import functools
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402

W, H = 1920, 1080


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
    frames, batch = 24, 12
    tmvps = [jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                         jnp.float32) for i in range(frames)]
    grouped = [jnp.stack(tmvps[i:i + batch])
               for i in range(0, frames, batch)]
    float(jnp.sum(grouped[0]))

    # --kcc: ladder the tex kernel's chunk size instead of tex_dyn (the
    # flat path's kcc32 win, exp_r4_kcc, should transfer: the tex walk
    # rides the same chunk machinery)
    if "--kcc" in sys.argv:
        variants = [("kcc=16", dict(kcc=16)), ("kcc=24", dict(kcc=24)),
                    ("kcc=32", dict(kcc=32))]
    elif "--nw" in sys.argv:
        # fewer footprint windows save ~NW-proportional resolve cost in
        # the kernel; the geometric fallback tiers now bound the extra
        # misses' cost (nw8 was only dead pre-tiers: its misses hit the
        # whole-plane gather).  checksums must still MATCH — the
        # fallback finishes missed pixels with the same texel values.
        variants = [("nw=16", dict(kcc=16, tex_nw=16)),
                    ("nw=14", dict(kcc=16, tex_nw=14)),
                    ("nw=12", dict(kcc=16, tex_nw=12)),
                    ("nw=10", dict(kcc=16, tex_nw=10)),
                    ("nw=8", dict(kcc=16, tex_nw=8))]
    else:
        variants = [("dyn=False", dict(kcc=16, tex_dyn=False)),
                    ("dyn=True", dict(kcc=16, tex_dyn=True))]

    chk0 = None
    for vtag, vkw in variants:
        lfn = functools.partial(raster3d.render_textured_pallas_loop,
                                capacity=512, **vkw)

        def run_loop(reps=10):
            outs = []
            for _ in range(reps):
                outs.extend(lfn(verts, faces, uvs, tex_u8, W, H,
                                mvps=m)[0] for m in grouped)
            return float(jnp.sum(jnp.stack(
                [jnp.sum(o.astype(jnp.float32)) for o in outs])))

        tag = f"texloop {vtag}"
        try:
            t0 = time.time()
            chk = run_loop(1)
            print(f"{tag}: compile {time.time() - t0:.0f}s chk {chk:.0f}",
                  flush=True)
            if chk0 is None:
                chk0 = chk
            elif chk != chk0:
                print(f"{tag}: CHECKSUM MISMATCH ({chk:.0f} != "
                      f"{chk0:.0f})", flush=True)
                continue
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                run_loop()
                dt = (time.perf_counter() - t0) / 10 / frames
                best = dt if best is None else min(best, dt)
            print(f"{tag}: {best * 1e3:.3f} ms/frame", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:400]}",
                  flush=True)


if __name__ == "__main__":
    main()


# NOTE (session D): --kcc mode reuses this harness to ladder the tex
# kernel's chunk size now that kcc32 won the flat path (exp_r4_kcc).
