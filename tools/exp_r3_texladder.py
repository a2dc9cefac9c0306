#!/usr/bin/env python
"""Textured-raster config ladder (VERDICT r3 item 2: 4.7 -> <= 3 ms/frame).

Dimensions probed against the current default ((64, 16) tiles, 16
footprint windows, 12-frame vmapped-prep batch):
  * tile shape: the color path's (32, 32) square-tile win (wasted-lane
    argument) applies to the textured walk too, but the footprint
    windows are texture-ROW aligned so the resolve rate may shift —
    the harness prints the unresolved-tile count per config.
  * fused single-frame loop: the color path measured vmapped prep
    SLOWER than a device-side fori over single-frame preps (layout/copy
    overhead); B=1 batches inside a fori probe the same effect here.
  * window count (tex_nw): epilogue cost vs fallback-gather cost.

Subtraction timing (48-16 frames, one jit) per exp_r3_cfg32.

Run: nohup python tools/exp_r3_texladder.py > /tmp/exp_texladder.log 2>&1 &
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")
from libnativecpurenderer_tpu.models import mesh            # noqa: E402
from libnativecpurenderer_tpu.ops import raster3d           # noqa: E402

W, H = 1920, 1080
NSTAGE = 24   # must give groups >= 2 for every B so the fori body varies

CFGS = [
    dict(tile_w=64, tile_h=16, span_x=3, span_y=6, tex_nw=16, B=12),
    dict(tile_w=64, tile_h=16, span_x=3, span_y=6, tex_nw=16, B=1),
    dict(tile_w=32, tile_h=32, span_x=5, span_y=4, tex_nw=16, B=12),
    dict(tile_w=32, tile_h=32, span_x=5, span_y=4, tex_nw=16, B=1),
    dict(tile_w=32, tile_h=32, span_x=5, span_y=4, tex_nw=8, B=12),
    dict(tile_w=64, tile_h=32, span_x=3, span_y=4, tex_nw=16, B=12),
    # MXU chunk walk on the UVW planes (exp_r4_mxu rationale; texel
    # flips only at UV knife edges)
    dict(tile_w=64, tile_h=16, span_x=3, span_y=6, tex_nw=16, B=12,
         mxu=1),
    dict(tile_w=64, tile_h=16, span_x=3, span_y=6, tex_nw=16, B=1,
         mxu=1),
]


SPLIT_CFGS = [
    # champion (64,32)/(3,4)/nw16 measured 3.286 ms/frame 2026-08-18;
    # tex_split anchors the footprint at BOTH v-clusters (bimodal-v
    # tiles), host sim ~100% resolve vs 95-99% single-rect — if the
    # fallback gather cost dominates the extra epilogue selects, split
    # wins; nw8+split probes whether full resolve lets windows shrink
    dict(tile_w=64, tile_h=32, span_x=3, span_y=4, tex_nw=16, B=12),
    dict(tile_w=64, tile_h=32, span_x=3, span_y=4, tex_nw=16, B=12,
         tex_split=True),
    dict(tile_w=64, tile_h=32, span_x=3, span_y=4, tex_nw=8, B=12,
         tex_split=True),
    dict(tile_w=64, tile_h=16, span_x=3, span_y=6, tex_nw=8, B=12,
         tex_split=True),
    # MXU walk retest now that the sublane-concat crasher is gone
    # (per-quantity dots, exp_r4_mxu_bisect)
    dict(tile_w=64, tile_h=32, span_x=3, span_y=4, tex_nw=16, B=12,
         tex_split=True, mxu=1),
]


MICRO_CFGS = [
    # neighbourhood of the champion (64,32)/(3,4)/nw16/B=12 = 3.156
    # ms/frame — knobs the earlier ladders never varied:
    #  * B: prep batch size (12 was inherited from the color path; a
    #    smaller batch shrinks the vmapped prep's working set)
    #  * tighter spans: at (64,32) the bench mesh may fit (2,4)/(3,3)
    #    (span histograms were measured at 32 px tiles only) — the
    #    harness's overflow flag arbitrates
    #  * nw24: higher window count -> fewer fallback-gather tiles
    dict(tile_w=64, tile_h=32, span_x=3, span_y=4, tex_nw=16, B=6,
         tex_split=True),
    dict(tile_w=64, tile_h=32, span_x=3, span_y=4, tex_nw=16, B=8,
         tex_split=True),
    dict(tile_w=64, tile_h=32, span_x=2, span_y=4, tex_nw=16, B=12,
         tex_split=True),
    dict(tile_w=64, tile_h=32, span_x=3, span_y=3, tex_nw=16, B=12,
         tex_split=True),
    dict(tile_w=64, tile_h=32, span_x=3, span_y=4, tex_nw=24, B=12,
         tex_split=True),
]


def main():
    global CFGS
    if "--split" in sys.argv:
        CFGS = SPLIT_CFGS
    elif "--micro" in sys.argv:
        CFGS = MICRO_CFGS
    elif "--champ" in sys.argv:
        # champion only — quick re-measure after an internal change
        # (e.g. the small-cap fallback tier)
        CFGS = SPLIT_CFGS[:1]
    verts_np, faces_np, _ = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    nv = verts_np.shape[0]
    rng = np.random.default_rng(3)
    if "--random-uv" in sys.argv:
        # adversarial: every triangle spans ~half the texture, so the
        # footprint windows always miss and the fallback gather is the
        # whole measurement.  NOT the bench workload.
        uvs = jnp.asarray(rng.uniform(0, 1, (nv, 2)), jnp.float32)
    else:
        # bench.py bench_textured's planar-projected uvs (coherent —
        # the workload the ladder should optimise)
        uvs_np = ((verts_np[:, :2] - verts_np[:, :2].min(0))
                  / np.ptp(verts_np[:, :2], 0))
        uvs = jnp.asarray(uvs_np, jnp.float32)
    tex_u8 = jnp.asarray(rng.integers(0, 255, (256, 256, 4)), jnp.uint8)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    mvps_np = [np.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                          np.float32) for i in range(NSTAGE)]
    float(jnp.sum(jnp.stack([jnp.asarray(m) for m in mvps_np])))

    for cfg in CFGS:
        kw = dict(cfg)
        B = kw.pop("B")
        kw.setdefault("capacity", 512)
        kw.setdefault("kcc", 16)
        groups = NSTAGE // max(B, 1)
        stacked = jnp.stack([
            jnp.stack([jnp.asarray(mvps_np[(g * B + j) % NSTAGE])
                       for j in range(B)])
            for g in range(groups)])              # (G, B, 4, 4)

        @functools.partial(jax.jit, static_argnums=(1,))
        def loop(mv, n, kw=kw, B=B, groups=groups):
            def body(i, acc):
                # Data-depend the mvp on the loop carry (bit-identical
                # select) so XLA cannot hoist a loop-invariant render
                # out of the fori body — with groups==1 that hoisting
                # made n=1 and n=4 equally fast and the subtraction
                # "timing" measured ~0 ms/frame (exp_texladder r3 run).
                mvi = jnp.where(jnp.isfinite(acc[0]),
                                mv[i % groups], 0.0)
                out, ovf = \
                    raster3d.render_textured_pallas_batch.__wrapped__(
                        verts, faces, uvs, tex_u8, W, H,
                        mvi, **kw)
                s = jnp.sum(jnp.sum(out.reshape(B, -1), axis=1,
                                    dtype=jnp.uint32).astype(jnp.float32))
                return (acc[0] + s, acc[1] | ovf)
            return lax.fori_loop(0, n, body,
                                 (jnp.float32(0.0), jnp.asarray(False)))

        try:
            t0 = time.time()
            r = loop(stacked, 2)
            print(f"{cfg}: compile {time.time() - t0:.0f}s chk "
                  f"{float(r[0]):.4e}", flush=True)
            if bool(r[1]):
                print(f"{cfg}: OVERFLOW", flush=True)
                continue
            walls = {}
            for n in (16 // B if B > 1 else 16, 48 // B if B > 1 else 48):
                float(loop(stacked, n)[0])
            for n in (16 // B if B > 1 else 16, 48 // B if B > 1 else 48):
                best = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(loop(stacked, n)[0])
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                walls[n] = best
            ns = sorted(walls)
            per = (walls[ns[1]] - walls[ns[0]]) / ((ns[1] - ns[0]) * B)
            print(f"{cfg}: {per * 1e3:.3f} ms/frame", flush=True)
        except Exception as e:
            print(f"{cfg}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
