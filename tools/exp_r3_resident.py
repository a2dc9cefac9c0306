#!/usr/bin/env python
"""Resident-out ladder: whole-frame VMEM-resident kernel output.

The out BlockSpec pins its index map to 0, so the (NT, 1, P) packed-u8
plane stays VMEM-resident across every grid step (8.3 MB at 1080p) and
writes back once — the per-program out-block swap machinery disappears.
That matters most for SMALL tiles: (16, 16) tiles quadruple the program
count (8160/frame) but cut walked pair-pixels ~2.3x on the ~14 px bench
mesh (pairs x P: ~145k x 256 vs ~84k x 1024), so if the per-program
fixed cost (~0.25 us measured at (32,32)) is mostly out-machinery, the
small-tile configs come out ahead.

Subtraction timing (96-32 frames, one fori_loop jit) per exp_r3_cfg32.

Run: nohup python tools/exp_r3_resident.py > /tmp/exp_resident.log 2>&1 &
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402

W, H = 1920, 1080
NSTAGE = 16

CFGS = [
    # control: current bench champion
    dict(tile_w=32, tile_h=32, span_x=5, span_y=3, kcc=16),
    # isolate the out-machinery cost at the champion shape
    dict(tile_w=32, tile_h=32, span_x=5, span_y=3, kcc=16,
         resident_out=True),
    # small tiles: fewer walked pair-pixels, more programs
    dict(tile_w=16, tile_h=16, span_x=10, span_y=5, kcc=16,
         capacity=256, wide_split=True, resident_out=True),
    dict(tile_w=16, tile_h=16, span_x=10, span_y=5, kcc=16,
         capacity=256, wide_split=True),
    # half-step shape
    dict(tile_w=32, tile_h=16, span_x=5, span_y=5, kcc=16,
         capacity=384, wide_split=True, resident_out=True),
    dict(tile_w=16, tile_h=16, span_x=10, span_y=5, kcc=24,
         capacity=256, wide_split=True, resident_out=True),
    # (16, 8): ~11M walked slots (vs 16M at (16,16), 32M at (32,32));
    # viable only if resident-out amortises 16320 programs/frame
    dict(tile_w=16, tile_h=8, span_x=10, span_y=10, kcc=8,
         capacity=256, wide_split=True, resident_out=True),
    dict(tile_w=16, tile_h=8, span_x=10, span_y=10, kcc=16,
         capacity=256, wide_split=True, resident_out=True),
]


def main():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    colors = jnp.asarray(colors_np, jnp.float32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps = jnp.stack([jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                                  jnp.float32) for i in range(NSTAGE)])
    float(jnp.sum(mvps))

    for cfg in CFGS:
        kw = dict(capacity=512, flat=True, u8=True, opaque=True,
                  z_clip=False)
        kw.update(cfg)

        @functools.partial(jax.jit, static_argnums=(1,))
        def loop(mvps, n, kw=kw):
            def body(i, acc):
                out, _, ovf = raster3d.render_gouraud_pallas.__wrapped__(
                    verts, faces, colors, W, H, mvps[i % NSTAGE], **kw)
                return (acc[0]
                        + jnp.sum(out, dtype=jnp.uint32
                                  ).astype(jnp.float32),
                        acc[1] | ovf)
            return lax.fori_loop(0, n, body,
                                 (jnp.float32(0.0), jnp.asarray(False)))

        # two compile strategies: plain jit, then the scoped-VMEM
        # override (96 MB) — a resident whole-frame out block can trip
        # the 16 MB default if Mosaic double-buffers it (ROADMAP
        # "Scoped-VMEM discovery")
        def make_runner(scoped):
            if not scoped:
                return lambda n: loop(mvps, n)
            cache = {}

            def run(n):
                if n not in cache:
                    cache[n] = loop.lower(mvps, n).compile(
                        compiler_options={
                            "xla_tpu_scoped_vmem_limit_kib": "98304"})
                return cache[n](mvps)
            return run

        done = False
        for scoped in (False, True):
            tag = " [scoped-vmem]" if scoped else ""
            try:
                runner = make_runner(scoped)
                t0 = time.time()
                r = runner(8)
                ok = bool(r[1])
                print(f"{cfg}{tag}: compile {time.time() - t0:.0f}s chk "
                      f"{float(r[0]):.4e}", flush=True)
                if ok:
                    print(f"{cfg}{tag}: OVERFLOW", flush=True)
                    done = True
                    break
                for n in (32, 96):
                    float(runner(n)[0])
                walls = {}
                for n in (32, 96):
                    best = None
                    for _ in range(3):
                        t0 = time.perf_counter()
                        float(runner(n)[0])
                        dt = time.perf_counter() - t0
                        best = dt if best is None else min(best, dt)
                    walls[n] = best
                per = (walls[96] - walls[32]) / 64.0
                print(f"{cfg}{tag}: {per * 1e3:.3f} ms/frame", flush=True)
                done = True
                break
            except Exception as e:
                print(f"{cfg}{tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
        if not done:
            continue


if __name__ == "__main__":
    main()
