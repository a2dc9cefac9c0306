#!/usr/bin/env python
"""Per-tile UV-footprint extent histogram for the bench mesh: drives the
tex_resolve window design (row windows cover dv <= NW//bw, du <=
bw*128; what envelope do real tiles need, and does an orientation-
transposed window set close the gap?).

Uses the texel-INDEX plane (render_binned_tex_idx_batch) — vi = idx //
tw, ui = idx % tw — then numpy per-tile bbox stats on frame 0 and the
most-rotated frame.

Run: nohup python tools/exp_fp_hist.py > /tmp/exp_fp_hist.log 2>&1 &
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from libnativecpurenderer_tpu.models import mesh  # noqa: E402
from libnativecpurenderer_tpu.ops import pallas_raster, raster3d  # noqa: E402

W, H = 1920, 1080
TW = TH = 256


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    verts_np, faces_np, _ = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    uvs_np = (verts_np[:, :2] - verts_np[:, :2].min(0)) / np.ptp(
        verts_np[:, :2], 0)
    uvs = jnp.asarray(uvs_np, jnp.float32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    fuv_all = uvs[faces]

    kw = dict(tile_w=64, tile_h=16, span_x=3, span_y=6, kcc=16)

    @jax.jit
    def idx_plane(mv):
        def prep(mvp):
            tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
            A, B, C, ia, sg, vl = raster3d.edge_coeffs(
                tri["sxy"], tri["z"], tri["valid"])
            zsc = tri["z"] * ia[:, None]
            sp, st, ct, _ = raster3d.bin_triangles_flat(
                tri["sxy"], vl, W, H, kw["tile_w"], kw["tile_h"], 512,
                kw["span_x"], kw["span_y"], edges=(A, B, C, sg))
            iw = tri["inv_w"][..., None]
            attrs = jnp.concatenate([fuv_all * iw, iw,
                                     jnp.ones_like(iw)], axis=-1)
            table = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl,
                                              attrs)
            return sp, st, ct, table
        sps, st, ct, tables = jax.vmap(prep)(mv)
        return pallas_raster.render_binned_tex_idx_batch(
            sps, st, ct, tables, W, H, kw["tile_w"], kw["tile_h"], 512,
            (TH, TW), False, kw["kcc"])

    for fi in (0, 23):
        mvp = jnp.asarray(proj @ view @ mesh.rotation_y(fi * 0.03),
                          jnp.float32)
        idx = np.asarray(idx_plane(mvp[None]))[0]   # (H, W)
        vi = np.where(idx >= 0, idx // TW, 0)
        ui = np.where(idx >= 0, idx % TW, 0)
        hit = idx >= 0
        th_, tw_ = kw["tile_h"], kw["tile_w"]
        nty, ntx = H // th_, W // tw_
        dvs, dus, needs = [], [], []
        for ty in range(nty):
            for tx in range(ntx):
                sl = np.s_[ty * th_:(ty + 1) * th_,
                           tx * tw_:(tx + 1) * tw_]
                h = hit[sl]
                if not h.any():
                    continue
                v, u = vi[sl][h], ui[sl][h]
                dv = v.max() - v.min() + 1
                ub = u // 128
                bw = ub.max() - ub.min() + 1
                dvs.append(dv)
                dus.append(u.max() - u.min() + 1)
                needs.append((dv, bw))
        dvs = np.array(dvs)
        dus = np.array(dus)
        print(f"frame {fi}: tiles={len(dvs)}", flush=True)
        for q in (50, 90, 95, 99, 100):
            print(f"  dv p{q}={np.percentile(dvs, q):.0f} "
                  f"du p{q}={np.percentile(dus, q):.0f}", flush=True)
        for nw in (8, 16, 24, 32):
            ok_r = sum(1 for dv, bw in needs if dv <= nw // bw)
            # transposed windows: du <= nw // ceil(dv/128) (lanes along v)
            ok_either = sum(
                1 for (dv, bw), du in zip(needs, dus)
                if dv <= nw // bw
                or du <= nw // max(1, -(-dv // 128)))
            n = len(needs)
            print(f"  NW={nw}: row-fit {ok_r / n:.2%} "
                  f"either-fit {ok_either / n:.2%}", flush=True)


def strip_stats():
    """Per-128-flat-pixel-chunk (the dynamic_gather row granularity)
    extents: operand row i of one gather can be chunk i's OWN texture
    row, so the budget is NW texture rows per chunk, not per tile."""
    import functools
    verts_np, faces_np, _ = mesh.mesh_10k()
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    uvs_np = (verts_np[:, :2] - verts_np[:, :2].min(0)) / np.ptp(
        verts_np[:, :2], 0)
    uvs = jnp.asarray(uvs_np, jnp.float32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    fuv_all = uvs[faces]

    for tw_, th_, sx, sy in ((64, 16, 3, 6), (128, 8, 2, 10),
                             (32, 32, 5, 4)):
        @jax.jit
        def idx_plane(mv, tw_=tw_, th_=th_, sx=sx, sy=sy):
            def prep(mvp):
                tri = raster3d.setup_triangles(verts, faces, mvp, W, H)
                A, B, C, ia, sg, vl = raster3d.edge_coeffs(
                    tri["sxy"], tri["z"], tri["valid"])
                zsc = tri["z"] * ia[:, None]
                sp, st, ct, _ = raster3d.bin_triangles_flat(
                    tri["sxy"], vl, W, H, tw_, th_, 512, sx, sy,
                    edges=(A, B, C, tri and sg))
                iw = tri["inv_w"][..., None]
                attrs = jnp.concatenate([fuv_all * iw, iw,
                                         jnp.ones_like(iw)], axis=-1)
                table = pallas_raster.build_table(A, B, C, zsc, ia, sg,
                                                  vl, attrs)
                return sp, st, ct, table
            sps, st, ct, tables = jax.vmap(prep)(mv)
            return pallas_raster.render_binned_tex_idx_batch(
                sps, st, ct, tables, W, H, tw_, th_, 512,
                (TH, TW), False, 16)

        for fi in (23,):
            mvp = jnp.asarray(proj @ view @ mesh.rotation_y(fi * 0.03),
                              jnp.float32)
            idx = np.asarray(idx_plane(mvp[None]))[0]
            vi = np.where(idx >= 0, idx // TW, 0)
            ui = np.where(idx >= 0, idx % TW, 0)
            hit = idx >= 0
            nty, ntx = H // th_, W // tw_
            dvs, bws, npx = [], [], []
            for ty in range(nty):
                for tx in range(ntx):
                    sl = np.s_[ty * th_:(ty + 1) * th_,
                               tx * tw_:(tx + 1) * tw_]
                    h = hit[sl].reshape(-1, 128)     # flat chunks
                    v = vi[sl].reshape(-1, 128)
                    u = ui[sl].reshape(-1, 128)
                    for ci in range(h.shape[0]):
                        if not h[ci].any():
                            continue
                        vv, uu = v[ci][h[ci]], u[ci][h[ci]]
                        dvs.append(vv.max() - vv.min() + 1)
                        ub = uu // 128
                        bws.append(ub.max() - ub.min() + 1)
                        npx.append(h[ci].sum())
            dvs, bws, npx = map(np.array, (dvs, bws, npx))
            need = dvs * bws                      # windows needed
            print(f"tile ({tw_},{th_}) frame {fi}: chunks={len(dvs)}",
                  flush=True)
            for q in (50, 90, 99, 99.9, 100):
                print(f"  strip dv p{q}={np.percentile(dvs, q):.0f} "
                      f"need p{q}={np.percentile(need, q):.0f}",
                      flush=True)
            for nw in (4, 6, 8, 12, 16):
                fit = need <= nw
                pxfit = npx[fit].sum() / npx.sum()
                print(f"  NW={nw}: chunk-fit {fit.mean():.2%} "
                      f"px-fit {pxfit:.2%}", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "strips":
    strip_stats()
