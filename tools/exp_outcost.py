#!/usr/bin/env python
"""What is the flat kernel's 1.16 ms/frame zero-work fixed cost?

exp_smem_pairs eliminated input-block DMA (spairs0 = 1.159 ms with the
pair array inside the scalar operand and counts = 0).  Remaining
suspects: per-grid-step output DMA (40 KB/step: keys 8 KB + rgba f32
32 KB) vs constant per-step overhead.  Variants, all counts=0, nt=1020
(th16) unless stated:

  full_out   : keys (1,P) i32 + rgba (D,P) f32        [reference, 40 KB]
  keys_only  : keys only                               [8 KB]
  u8pack     : keys + rgba packed u8-in-i32 (1,P)      [16 KB]
  two_tiles  : full outputs, 2 tiles per grid step     [80 KB, 510 steps]

Run: nohup python tools/exp_outcost.py > /tmp/exp_outcost.log 2>&1 &
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402
from libnativecpurenderer_tpu.ops import pallas_raster      # noqa: E402
from libnativecpurenderer_tpu.ops.pallas_raster import ROW_W, D  # noqa
from libnativecpurenderer_tpu.ops.raster3d import SKY_KEY   # noqa: E402

W, H = 1920, 1080
TW, TH, KB, SX, SY, KCC = 128, 16, 512, 3, 6, 32
FRAMES = 32
P = TH * TW


def checksum(arrs):
    return float(jnp.sum(jnp.stack([jnp.sum(a.astype(jnp.float32))
                                    for a in arrs])))


def kern_full(scal_ref, table_ref, keys_ref, rgba_ref):
    keys_ref[0] = jnp.full((1, P), SKY_KEY, jnp.int32)
    rgba_ref[0] = jnp.zeros((D, P), jnp.float32)


def kern_keys(scal_ref, table_ref, keys_ref):
    keys_ref[0] = jnp.full((1, P), SKY_KEY, jnp.int32)


def kern_u8(scal_ref, table_ref, keys_ref, pack_ref):
    keys_ref[0] = jnp.full((1, P), SKY_KEY, jnp.int32)
    pack_ref[0] = jnp.zeros((1, P), jnp.int32)


def kern_two(scal_ref, table_ref, keys_ref, rgba_ref):
    keys_ref[0] = jnp.full((2, P), SKY_KEY, jnp.int32)
    rgba_ref[0] = jnp.zeros((2 * D, P), jnp.float32)


@functools.partial(jax.jit, static_argnums=(2,))
def launch(scalars, table, variant):
    nt = 1020
    table = table[None]
    tspec = pl.BlockSpec((1, table.shape[1], ROW_W), lambda i, s: (0, 0, 0))
    if variant == "full_out":
        outs = (jax.ShapeDtypeStruct((nt, 1, P), jnp.int32),
                jax.ShapeDtypeStruct((nt, D, P), jnp.float32))
        ospec = [pl.BlockSpec((1, 1, P), lambda i, s: (i, 0, 0)),
                 pl.BlockSpec((1, D, P), lambda i, s: (i, 0, 0))]
        kern, grid = kern_full, nt
    elif variant == "keys_only":
        outs = (jax.ShapeDtypeStruct((nt, 1, P), jnp.int32),)
        ospec = [pl.BlockSpec((1, 1, P), lambda i, s: (i, 0, 0))]
        kern, grid = kern_keys, nt
    elif variant == "u8pack":
        outs = (jax.ShapeDtypeStruct((nt, 1, P), jnp.int32),
                jax.ShapeDtypeStruct((nt, 1, P), jnp.int32))
        ospec = [pl.BlockSpec((1, 1, P), lambda i, s: (i, 0, 0)),
                 pl.BlockSpec((1, 1, P), lambda i, s: (i, 0, 0))]
        kern, grid = kern_u8, nt
    elif variant == "two_tiles":
        outs = (jax.ShapeDtypeStruct((nt // 2, 2, P), jnp.int32),
                jax.ShapeDtypeStruct((nt // 2, 2 * D, P), jnp.float32))
        ospec = [pl.BlockSpec((1, 2, P), lambda i, s: (i, 0, 0)),
                 pl.BlockSpec((1, 2 * D, P), lambda i, s: (i, 0, 0))]
        kern, grid = kern_two, nt // 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(grid,),
        in_specs=[tspec], out_specs=ospec)
    return pl.pallas_call(kern, out_shape=outs, grid_spec=grid_spec)(
        scalars, table)


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = [jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03), jnp.float32)
            for i in range(FRAMES)]
    checksum(mvps)
    attrs = jnp.asarray(colors_np[faces_np], jnp.float32)

    @jax.jit
    def prep(mvp):
        tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
        A, B, C, ia, sg, vl = raster3d.edge_coeffs(tri["sxy"], tri["z"],
                                                   tri["valid"])
        zsc = tri["z"] * ia[:, None]
        sorted_pad, starts, counts, ovf = raster3d.bin_triangles_flat(
            tri["sxy"], vl, W, H, TW, TH, KB, SX, SY)
        table = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl, attrs)
        return jnp.concatenate([jnp.zeros_like(counts), starts,
                                sorted_pad]), table

    staged = [prep(m) for m in mvps]
    checksum([s[1] for s in staged])

    for variant in ("full_out", "keys_only", "u8pack", "two_tiles"):
        try:
            fn = functools.partial(launch, variant=variant)
            outs = [fn(*staged[i]) for i in range(FRAMES)]
            checksum([o[0] for o in outs])
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [fn(*staged[i]) for i in range(FRAMES)]
                chk = checksum([o[0] for o in outs])
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"{variant:10s} {best / FRAMES * 1e3:7.3f} ms/frame",
                  flush=True)
        except Exception as e:
            print(f"{variant:10s} FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
