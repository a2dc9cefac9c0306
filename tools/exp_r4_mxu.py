#!/usr/bin/env python
"""MXU chunk-walk ladder (pallas_raster._make_kernel_flat mxu).

The fused walk is VPU-compute-bound (ROADMAP): ~45 vector ops per
(kcc, P) chunk slot, of which the edge/z/attr plane evaluations are
~2(4+D) broadcast-FMAs.  Every one of those planes is affine in (x, y),
so the mxu mode evaluates all of them with ONE
(q*kcc, 4) x (4, P) matmul per chunk on the MXU (table layout
build_table_mxu).  Cost moved to the MXU: ~26 of ~60 VPU ops; new VPU
cost: one 7-piece sublane concat + a (nq, kcc, P) reshape.

Rounding: the z/attr planes precombine per-edge weights, so u8 output
can differ from the FMA walk by +-1 quantisation slips (~7% of pixels,
interpret-mode measured; no winner flips on the bench mesh) — see
tests/test_pallas_raster.py::test_u8_mxu_walk_matches.  mxu=2 (bf16
single-pass) is coarser still; the ladder prints per-config checksums
so divergence is visible.

Subtraction timing per exp_r3_resident (32/96-frame fori loops).

Run: nohup python tools/exp_r4_mxu.py > /tmp/exp_mxu.log 2>&1 &
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
    # control: current bench champion shape
    dict(tile_w=32, tile_h=32, span_x=5, span_y=3, kcc=16),
    # MXU walk, HIGHEST precision (6-pass bf16, near-f32)
    dict(tile_w=32, tile_h=32, span_x=5, span_y=3, kcc=16, mxu=1),
    # MXU walk, DEFAULT precision: measurement-only speed bound
    # (bf16 rounds pixel coordinates -> multi-pixel distortion at
    # 1080p; never a production config)
    dict(tile_w=32, tile_h=32, span_x=5, span_y=3, kcc=16, mxu=2),
    # bigger chunks amortise the concat/reshape + per-chunk gather;
    # M = 7*32 = 224 sublanes = 2 MXU row blocks
    dict(tile_w=32, tile_h=32, span_x=5, span_y=3, kcc=32, mxu=1),
    # MXU + whole-frame resident out (if exp_r3_resident lands)
    dict(tile_w=32, tile_h=32, span_x=5, span_y=3, kcc=16, mxu=1,
         resident_out=True),
    # small tiles: fewer walked pair-pixels; viable only with
    # resident-out amortising 4x programs
    dict(tile_w=16, tile_h=16, span_x=10, span_y=5, kcc=16,
         capacity=256, wide_split=True, resident_out=True, mxu=1),
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

        for scoped in (False, True):
            tag = " [scoped-vmem]" if scoped else ""
            try:
                runner = make_runner(scoped)
                t0 = time.time()
                r = runner(8)
                ok = bool(r[1])
                print(f"{cfg}{tag}: compile {time.time() - t0:.0f}s chk "
                      f"{float(r[0]):.6e}", flush=True)
                if ok:
                    print(f"{cfg}{tag}: OVERFLOW", flush=True)
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
                break
            except Exception as e:
                print(f"{cfg}{tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
