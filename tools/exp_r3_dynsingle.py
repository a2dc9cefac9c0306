#!/usr/bin/env python
"""Does the production dynrows path compile OUTSIDE the bench's
fori_loop?  The fused-sequence bench wrapper (lax.fori_loop over
batched launches) makes XLA:TPU assign the pallas output s32[8100,1,
1024] to scoped VMEM (S(1)) and the compile OOMs at 48 MB > 16 MB
(/tmp/exp_r3_e2e2.log).  Hypothesis: the single-dispatch production
path (render_gouraud_pallas_batch, no loop) keeps the output in HBM
and compiles.  Variants:

  A  single jitted batched call, B=12, dynrows=1 (production shape)
  B  fused sequence with the G-loop UNROLLED in Python (no fori_loop)
  C  fori_loop fused + --xla_tpu_scoped_vmem_limit_kib=65536 (flag
     forwarded per-compile through the axon terminal) [g=1 and g=2]

Timing per CLAUDE.md: queue dispatches, sync once via checksum fetch.
Run: nohup python tools/exp_r3_dynsingle.py [A|B|C] > /tmp/log 2>&1 &
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

from libnativecpurenderer_tpu.models import mesh  # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d  # noqa: E402

W, H = 1920, 1080
FRAMES = 60
BATCH = 12
KW = dict(tile_w=128, tile_h=8, span_x=2, span_y=10, capacity=512,
          flat=True, kcc=16, u8=True, opaque=True, z_clip=False)


def scene():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    colors = jnp.asarray(colors_np, jnp.float32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = [jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                        jnp.float32) for i in range(FRAMES)]
    return verts, faces, colors, mvps


def checksum(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def run_A(g, vmem_kib=0):
    verts, faces, colors, mvps = scene()
    grouped = [jnp.stack(mvps[i:i + BATCH])
               for i in range(0, FRAMES, BATCH)]
    if vmem_kib:
        lowered = jax.jit(
            raster3d.render_gouraud_pallas_batch.__wrapped__,
            static_argnums=(3, 4, 6, 7, 8, 10, 11, 12, 13, 14, 15, 16,
                            17, 18, 19)).lower(
            verts, faces, colors, W, H, grouped[0], dynrows=g, **KW)
        compiled = lowered.compile(compiler_options={
            "xla_tpu_scoped_vmem_limit_kib": str(vmem_kib)})

        def fn(v, f, c, w, h, mvp_b):
            return compiled(v, f, c, mvp_b)
    else:
        fn = functools.partial(raster3d.render_gouraud_pallas_batch,
                               dynrows=g, **KW)
    t0 = time.time()
    out0, _, ovf = fn(verts, faces, colors, W, H, grouped[0])
    print(f"A g={g} vmem={vmem_kib}: compiled in {time.time() - t0:.1f}s "
          f"ovf={bool(ovf)}", flush=True)
    # warm all dispatch groups
    outs = [fn(verts, faces, colors, W, H, m)[0] for m in grouped]
    [checksum(jnp.sum(o.reshape(BATCH, -1), axis=1)) for o in outs]
    for rep in range(3):
        t0 = time.time()
        outs = [fn(verts, faces, colors, W, H, m)[0] for m in grouped]
        s = checksum(jnp.stack(
            [jnp.sum(o.reshape(BATCH, -1).astype(jnp.float32), axis=1)
             for o in outs]))
        dt = time.time() - t0
        print(f"A g={g} rep{rep}: {dt / FRAMES * 1e3:.3f} ms/frame "
              f"({FRAMES / dt:.1f} fps) sum={s:.3e}", flush=True)


def run_B(g):
    verts, faces, colors, mvps = scene()
    G = FRAMES // BATCH
    stacked = jnp.stack([jnp.stack(mvps[k * BATCH:(k + 1) * BATCH])
                         for k in range(G)])

    @jax.jit
    def seq(mv):
        acc = jnp.float32(0.0)
        ovf = jnp.asarray(False)
        for k in range(G):                    # UNROLLED: no fori_loop
            out, _, o = raster3d.render_gouraud_pallas_batch.__wrapped__(
                verts, faces, colors, W, H, mv[k], dynrows=g, **KW)
            acc = acc + jnp.sum(
                jnp.sum(out.reshape(BATCH, -1), axis=1,
                        dtype=jnp.uint32).astype(jnp.float32))
            ovf = ovf | o
        return acc, ovf

    t0 = time.time()
    s, ovf = seq(stacked)
    print(f"B g={g}: compiled+ran in {time.time() - t0:.1f}s "
          f"ovf={bool(ovf)} sum={float(s):.3e}", flush=True)
    float(s)
    for rep in range(3):
        t0 = time.time()
        s, _ = seq(stacked)
        float(s)
        dt = time.time() - t0
        print(f"B g={g} rep{rep}: {dt / FRAMES * 1e3:.3f} ms/frame "
              f"({FRAMES / dt:.1f} fps)", flush=True)


def run_C(g):
    import os
    import subprocess
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_tpu_scoped_vmem_limit_kib=65536")
    code = (
        "import sys; sys.path.insert(0, '.');"
        "import importlib; m = importlib.import_module("
        "'tools.exp_r3_dynsingle'); m.run_fused_fori(%d)" % g)
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=".")
    print(f"C g={g}: rc={r.returncode}", flush=True)


def run_fused_fori(g):
    verts, faces, colors, mvps = scene()
    G = FRAMES // BATCH
    stacked = jnp.stack([jnp.stack(mvps[k * BATCH:(k + 1) * BATCH])
                         for k in range(G)])

    @jax.jit
    def seq(mv):
        def step(k, acc):
            out, _, o = raster3d.render_gouraud_pallas_batch.__wrapped__(
                verts, faces, colors, W, H, mv[k], dynrows=g, **KW)
            s = jnp.sum(jnp.sum(out.reshape(BATCH, -1), axis=1,
                                dtype=jnp.uint32).astype(jnp.float32))
            return (acc[0] + s, acc[1] | o)
        return lax.fori_loop(0, G, step,
                             (jnp.float32(0.0), jnp.asarray(False)))

    t0 = time.time()
    s, ovf = seq(stacked)
    float(s)
    print(f"fori g={g}: compiled+ran in {time.time() - t0:.1f}s "
          f"ovf={bool(ovf)}", flush=True)
    for rep in range(3):
        t0 = time.time()
        s, _ = seq(stacked)
        float(s)
        dt = time.time() - t0
        print(f"fori g={g} rep{rep}: {dt / FRAMES * 1e3:.3f} ms/frame "
              f"({FRAMES / dt:.1f} fps)", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "AB"
    if which == "V":                 # scoped-vmem-limit override probe
        for g in (1, 2):
            try:
                run_A(g, vmem_kib=98304)
            except Exception:
                import traceback
                traceback.print_exc()
                print(f"V g={g}: FAILED", flush=True)
        return
    for tag in which:
        for g in ([1] if tag in "AB" else [1, 2]):
            try:
                {"A": run_A, "B": run_B, "C": run_C}[tag](g)
            except Exception as e:
                import traceback
                traceback.print_exc()
                print(f"{tag} g={g}: FAILED {type(e).__name__}: "
                      f"{e}"[:400], flush=True)


if __name__ == "__main__":
    main()
