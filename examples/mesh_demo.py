#!/usr/bin/env python
"""Mesh->MP4 demo: the production 3D path (MeshVideoPipeline).

Renders the 10k-triangle BASELINE mesh spinning for a few seconds
through the champion fused-loop Pallas rasterizer, frames leaving the
device in the kernel's tiled u8 layout (detile inside the native encode
worker).  Multi-device: pass --devices N to frame-shard over a
('data', 'tile') mesh (ShardedMeshVideoPipeline).

    python examples/mesh_demo.py -o /tmp/mesh.mp4 --frames 120
"""

import argparse
import sys

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default="mesh_demo.mp4")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--fps", type=int, default=60)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--devices", type=int, default=1)
    ap.add_argument("--textured", action="store_true")
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode kernels (CPU)")
    ap.add_argument("--small", action="store_true",
                    help="small mesh + generous bins (CPU smoke; the "
                         "10k mesh overflows 32x32 bins below ~480p)")
    args = ap.parse_args(argv)

    import numpy as np
    import jax

    from libnativecpurenderer_tpu import VideoCap
    from libnativecpurenderer_tpu.models import mesh
    from libnativecpurenderer_tpu.pipeline import (
        MeshVideoPipeline, ShardedMeshVideoPipeline)

    if args.small:
        verts, faces = mesh.icosphere(2)
        colors = np.concatenate(
            [np.abs(verts), np.ones((len(verts), 1))], 1)
    else:
        verts, faces, colors = mesh.mesh_10k()
    proj = mesh.perspective(1.0, args.width / args.height, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])

    cap = VideoCap(args.width, args.height, args.fps)
    cap.initialize(args.output)
    kw = dict(interpret=True, mega=0) if args.interpret else {}
    if args.small:
        kw.update(tile_w=32, tile_h=8, capacity=512, span_x=8,
                  span_y=8)
    if args.textured:
        rng = np.random.default_rng(1)
        uvs = (verts[:, :2] - verts[:, :2].min(0)) / np.ptp(
            verts[:, :2], 0)
        tex = rng.integers(0, 256, (256, 256, 4)).astype(np.uint8)
        mesh_kw = dict(uvs=uvs, tex_u8=tex)
    else:
        mesh_kw = dict(colors=colors)
    if args.devices > 1:
        pipe = ShardedMeshVideoPipeline(
            cap, args.width, args.height, verts, faces, batch=16,
            **mesh_kw, **kw)
    else:
        pipe = MeshVideoPipeline(cap, args.width, args.height, verts,
                                 faces, batch=16, **mesh_kw, **kw)
    for i in range(args.frames):
        pipe.submit(np.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                               np.float32))
    pipe.finish()
    cap.release()
    print(f"wrote {args.frames} frames to {args.output} "
          f"(backend={jax.default_backend()})")


if __name__ == "__main__":
    main()
