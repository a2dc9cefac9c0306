#!/usr/bin/env python
"""Tex mega + z_clip-off A/B at the out8+kcc32+nw14 champion: mega=8
collapses 2040 per-tile programs to 255 (flat path won 0.15 ms from the
same move, and the tex kernel pays per-program block machinery for TWO
output planes); z_clip=False drops 2 compares/slot under the flat path's
caller-verified contract (z-range folded into ovf).  Bit-exact
(test_tex_loop_mega_zclip_match).

Run: nohup python tools/exp_r4f_texmega3.py > /tmp/texmega3.log 2>&1
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
# mega=8 window demand needs the flat champion's Kb (capacity 1024);
# z_clip=False keeps fp-spill boundary pixels the clipped walk rejects
# (the flat champion's shipped semantics), so zoff rows get their OWN
# checksum base instead of comparing against the clipped control.
CFGS = [
    ("control", dict()),
    ("mega8/Kb1024", dict(mega=8, capacity=1024)),
    ("zoff [own-chk]", dict(z_clip=False)),
    ("mega8/Kb1024+zoff+skip [own-chk]",
     dict(mega=8, capacity=1024, z_clip=False, tex_skip=True)),
    ("mega8/Kb1024+zoff+skip rep2 [own-chk]",
     dict(mega=8, capacity=1024, z_clip=False, tex_skip=True)),
]


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

    chk0 = None
    for vtag, vkw in CFGS:
        vkw = dict(vkw)
        own = "[own-chk]" in vtag
        cap = vkw.pop("capacity", 512)
        lfn = functools.partial(raster3d.render_textured_pallas_loop,
                                capacity=cap, **vkw)

        def run_loop(reps=10):
            outs, ovfs = [], []
            for _ in range(reps):
                for m in grouped:
                    o, ov = lfn(verts, faces, uvs, tex_u8, W, H, mvps=m)
                    outs.append(o)
                    ovfs.append(ov)
            assert not any(bool(v) for v in ovfs), vtag
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
            elif own:
                print(f"{tag}: own checksum {chk:.0f} (clipped base "
                      f"{chk0:.0f})", flush=True)
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
