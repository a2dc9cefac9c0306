#!/usr/bin/env python
"""Experiment: bin-sort span-window shrink + kernel chunk-size sweep."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402
from libnativecpurenderer_tpu.ops import pallas_raster      # noqa: E402

W, H = 1920, 1080
TW, TH, CAP = 128, 32, 512
FRAMES = 30


def checksum(arrs):
    return float(jnp.sum(jnp.stack([jnp.sum(a.astype(jnp.float32))
                                    for a in arrs])))


def timeit(name, fn, args_for):
    outs = [fn(*args_for(i)) for i in range(FRAMES)]
    checksum([o[0] if isinstance(o, tuple) else o for o in outs])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args_for(i)) for i in range(FRAMES)]
        checksum([o[0] if isinstance(o, tuple) else o for o in outs])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:32s} {best / FRAMES * 1e3:7.2f} ms/frame", flush=True)
    return best / FRAMES


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    colors = jnp.asarray(colors_np, jnp.float32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = [jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03), jnp.float32)
            for i in range(FRAMES)]
    checksum(mvps)
    F = faces.shape[0]
    attrs = jnp.asarray(colors_np[faces_np], jnp.float32)

    import functools

    def binonly(sx, sy):
        @jax.jit
        def f(mvp):
            tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
            return raster3d.bin_triangles(tri["sxy"], tri["valid"], W, H,
                                          TW, TH, CAP, sx, sy)[:2]
        return f

    for sx, sy in [(8, 4), (3, 4), (2, 4)]:
        timeit(f"setup+bin span {sx}x{sy}", binonly(sx, sy),
               lambda i: (mvps[i],))

    # staged bins/table for kernel-only kcc sweep
    @jax.jit
    def prep(mvp):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                   tri["valid"])
        zsc = tri["z"] * ia[:, None]
        bins, counts, _ = raster3d.bin_triangles(
            tri["sxy"], vl, W, H, TW, TH, CAP, 3, 4)
        table = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl, attrs)
        safe = jnp.where(bins == raster3d.NO_TRI, F, bins)
        return safe, counts, table

    staged = [prep(m) for m in mvps]
    checksum([s[2] for s in staged])

    ntx = (W + TW - 1) // TW
    nty = (H + TH - 1) // TH
    nt = ntx * nty

    def kernel_k(kcc):
        @jax.jit
        def f(safe, counts, table):
            tids = jnp.arange(nt, dtype=jnp.int32)
            scalars = jnp.concatenate(
                [counts.astype(jnp.int32), tids % ntx * TW,
                 tids // ntx * TH])
            keys_l, rgba = pallas_raster.raster_tiles(
                safe, table, scalars, nt, TH, TW, False, 0, kcc)
            return rgba
        return f

    for kcc in [32, 16, 8, 64]:
        try:
            timeit(f"kernel kcc={kcc}", kernel_k(kcc), lambda i: staged[i])
        except Exception as e:
            print(f"kernel kcc={kcc} FAILED: {type(e).__name__}",
                  flush=True)

    # full frame with best-guess new config
    for sx, sy, kcc in [(3, 4, 16), (3, 4, 32)]:
        fn = functools.partial(raster3d.render_gouraud_pallas, tile_w=TW,
                               tile_h=TH, capacity=CAP, span_x=sx,
                               span_y=sy, kcc=kcc)
        timeit(f"FULL span{sx}x{sy} kcc{kcc}", fn,
               lambda i: (verts, faces, colors, W, H, mvps[i]))


if __name__ == "__main__":
    main()
