#!/usr/bin/env python
"""Piecewise device timing of the binned Pallas raster frame (1080p/10k).

Times three jitted stages separately (checksum-forced — block_until_ready
is unreliable on the axon backend):
  prep   : setup_triangles + edge_coeffs + bin_triangles + build_table
  kernel : raster_tiles launch + detile (bins/table pre-staged)
  full   : render_gouraud_pallas end to end
Run on the TPU: python tools/profile_raster.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402
from libnativecpurenderer_tpu.ops import pallas_raster      # noqa: E402

W, H = 1920, 1080
TW, TH, CAP, SX, SY, KCC = 128, 32, 512, 8, 4, 32
FRAMES = 30


def checksum(arrs):
    return float(jnp.sum(jnp.stack([jnp.sum(a.astype(jnp.float32))
                                    for a in arrs])))


def timeit(name, fn, args_for):
    outs = [fn(*args_for(i)) for i in range(FRAMES)]   # warm/untimed
    checksum([o[0] if isinstance(o, tuple) else o for o in outs])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args_for(i)) for i in range(FRAMES)]
        checksum([o[0] if isinstance(o, tuple) else o for o in outs])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:26s} {best / FRAMES * 1e3:7.2f} ms/frame", flush=True)
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
    attrs_host = colors_np[faces_np]

    @jax.jit
    def prep(mvp, attrs):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                   tri["valid"])
        zsc = tri["z"] * ia[:, None]
        bins, counts, ovf = raster3d.bin_triangles(
            tri["sxy"], vl, W, H, TW, TH, CAP, SX, SY)
        table = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl, attrs)
        safe = jnp.where(bins == raster3d.NO_TRI, F, bins)
        return safe, counts, table

    @jax.jit
    def prep_nobin(mvp, attrs):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                   tri["valid"])
        zsc = tri["z"] * ia[:, None]
        table = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl, attrs)
        return table

    @jax.jit
    def binonly(mvp):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        return raster3d.bin_triangles(tri["sxy"], tri["valid"], W, H,
                                      TW, TH, CAP, SX, SY)[:2]

    attrs = jnp.asarray(attrs_host, jnp.float32)
    staged = [prep(m, attrs) for m in mvps]
    checksum([s[2] for s in staged])

    ntx = (W + TW - 1) // TW
    nty = (H + TH - 1) // TH
    nt = ntx * nty

    @jax.jit
    def kernel_only(safe, counts, table):
        tids = jnp.arange(nt, dtype=jnp.int32)
        scalars = jnp.concatenate(
            [counts.astype(jnp.int32), tids % ntx * TW, tids // ntx * TH])
        keys_l, rgba = pallas_raster.raster_tiles(
            safe, table, scalars, nt, TH, TW, False, 0, KCC)
        bg = jnp.zeros(4, jnp.float32)
        k2, r2 = pallas_raster._detile(keys_l.reshape(nt, -1), rgba, nty,
                                       ntx, TH, TW, H, W, bg, jnp.float32)
        return r2

    @jax.jit
    def kernel_nodetile(safe, counts, table):
        tids = jnp.arange(nt, dtype=jnp.int32)
        scalars = jnp.concatenate(
            [counts.astype(jnp.int32), tids % ntx * TW, tids // ntx * TH])
        keys_l, rgba = pallas_raster.raster_tiles(
            safe, table, scalars, nt, TH, TW, False, 0, KCC)
        return rgba

    full = functools.partial(raster3d.render_gouraud_pallas, tile_w=TW,
                             tile_h=TH, capacity=CAP, span_x=SX, span_y=SY,
                             kcc=KCC)

    t_prep = timeit("prep(setup+bin+table)", prep,
                    lambda i: (mvps[i], attrs))
    t_nobin = timeit("prep w/o binning", prep_nobin,
                     lambda i: (mvps[i], attrs))
    t_bin = timeit("setup+bin only", binonly, lambda i: (mvps[i],))
    t_kern = timeit("kernel+detile", kernel_only, lambda i: staged[i])
    t_knd = timeit("kernel (no detile)", kernel_nodetile,
                   lambda i: staged[i])
    t_full = timeit("full frame", full,
                    lambda i: (verts, faces, colors, W, H, mvps[i]))
    print(f"sum of stages: {(t_prep + t_kern) * 1e3:.2f} ms  "
          f"full: {t_full * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
