"""Tile-resident Pallas kernel for ARITHMETIC canvas command spans.

The segmented patch executor (ops/patch_exec.py) pays ~43 us/command in
its fori_loop and a full-frame slice/blend/update per full-frame command;
this kernel instead walks a whole arithmetic span with the fb tile held
in VMEM scratch: grid = fb tiles, fori_loop over the tile's binned
commands, pl.when-predicated branch writes (lax.switch RESULTS over
6-vector tuples don't legalize in Mosaic — predicated REF writes do, see
ROADMAP).  Measured on v5e (tools/exp_canvas_kernel.py): 0.90 ms/frame
for 64 full-frame commands at 1080p — the floor is per-tile fixed work,
not the command walk — vs ~46 ms on the scan executor and ~2.8 ms on the
patch loop.

Scope: the arithmetic kinds (NOOP / SET_COLOR / FILL / RECT / CIRCLE /
LINE / VGRD / SET_PIXEL / APPLY_PIXEL) with exact executor semantics
(inverse-transform point tests, C-cast AABB masks, per-command color
transform, src-over blend with the stored-source-alpha quirk,
cpp:515-549 / 643-691 / 822-845 / 1300-1320).  Sampling kinds (texture
blits, hit effects) are routed by plan_segments to the patch loop or the
full scan — they never reach this kernel.

The framebuffer rides in a TILED planar layout (NT, 4*th, tw) so kernel
blocks map 1:1 onto VMEM scratch with no in-kernel reshapes; tile_fb /
detile_fb convert from/to the canvas (H, W, 4) layout (one XLA transpose
each way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import commands as C
from . import executor

# kinds this kernel can execute (everything that never reads the atlas)
KERNEL_KINDS = frozenset((
    C.KIND_NOOP, C.KIND_SET_COLOR, C.KIND_FILL, C.KIND_RECT,
    C.KIND_CIRCLE, C.KIND_LINE, C.KIND_VGRD, C.KIND_SET_PIXEL,
    C.KIND_APPLY_PIXEL))

# command-count buckets (one compile per (fb shape, bucket, dtype))
CMD_BUCKETS = (16, 64, 256)


def _make_kernel(tile_h, tile_w, ncmd, dtype):
    th = tile_h

    def kernel(scal_ref, bins_ref, params_ref, fb_in_ref, out_ref, br_s):
        i = pl.program_id(0)
        nt = pl.num_programs(0)
        ox = scal_ref[ncmd + i]
        oy = scal_ref[ncmd + nt + i]
        count = scal_ref[ncmd + 2 * nt + i]
        X = (ox + lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
             ).astype(dtype)
        Y = (oy + lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
             ).astype(dtype)
        one = jnp.asarray(1.0, dtype)
        ones = jnp.ones((tile_h, tile_w), dtype)
        zeros = jnp.zeros((tile_h, tile_w), dtype)
        fmask = zeros > one     # all-false

        out_ref[0] = fb_in_ref[0]

        def body(c, dummy):
            # per-tile command list in ORIGINAL order (blending is
            # order-dependent)
            cmd = bins_ref[0, 0, c]
            kind = scal_ref[cmd]

            def p(j):
                return params_ref[0, cmd, j]

            def aabb():
                return ((X >= p(6)) & (X < p(7))
                        & (Y >= p(8)) & (Y < p(9)))

            def inv_point():
                # SAME subpixel snap as executor._snap: without it,
                # knife-edge membership (and shading) can flip vs the
                # scan/unrolled executors (caught by extended fuzz, seed
                # 7023/7025 of test_fuzz_kernel_route_vs_scan)
                s = executor.SNAP_SCALE
                ix = p(0) * X + p(2) * Y + p(4)
                iy = p(1) * X + p(3) * Y + p(5)
                return (jnp.round(ix * s) * (1.0 / s),
                        jnp.round(iy * s) * (1.0 / s))

            def ct(r, g, b, a):
                return r * p(10), g * p(11), b * p(12), a * p(13)

            def emit(m, r, g, b, a, store):
                br_s[:, :] = jnp.concatenate(
                    [m.astype(dtype), r, g, b, a, store], axis=0)

            samp = (kind >= C.KIND_TEX) & (kind <= C.KIND_HITEFFECT)

            @pl.when((kind == C.KIND_NOOP) | samp)
            def _():  # noop / sampling kinds never routed here
                emit(fmask, zeros, zeros, zeros, zeros, zeros)

            @pl.when(kind == C.KIND_SET_COLOR)
            def _():  # raw AABB-masked store, no ct, no blend
                # (cpp:643-657; box is full-frame except the RGB-mode
                # SetPixel-corruption column — see executor.b_set_color)
                emit(aabb(), p(14) * ones, p(15) * ones,
                     p(16) * ones, p(17) * ones, ones)

            @pl.when(kind == C.KIND_FILL)
            def _():  # ct + blend over every pixel (cpp:682-691)
                r, g, b, a = ct(p(14), p(15), p(16), p(17))
                emit(ones > 0.0, r * ones, g * ones, b * ones,
                     a * ones, zeros)

            @pl.when(kind == C.KIND_RECT)
            def _():
                ix, iy = inv_point()
                m = ((ix >= p(14)) & (ix <= p(16))
                     & (iy >= p(15)) & (iy <= p(17))) & aabb()
                r, g, b, a = ct(p(18), p(19), p(20), p(21))
                emit(m, r * ones, g * ones, b * ones, a * ones, zeros)

            @pl.when(kind == C.KIND_CIRCLE)
            def _():
                ix, iy = inv_point()
                dx = ix - p(14)
                dy = iy - p(15)
                m = (jnp.sqrt(dx * dx + dy * dy) <= p(16)) & aabb()
                r, g, b, a = ct(p(18), p(19), p(20), p(21))
                emit(m, r * ones, g * ones, b * ones, a * ones, zeros)

            @pl.when(kind == C.KIND_LINE)
            def _():  # even-odd point-in-quad on inverse coords
                ix, iy = inv_point()
                res = fmask
                # vertices at params 14..21; same edge order as the
                # executor so f-p results match bit-for-bit
                j0 = 3
                for i0 in range(4):
                    xi, yi = p(14 + 2 * i0), p(15 + 2 * i0)
                    xj, yj = p(14 + 2 * j0), p(15 + 2 * j0)
                    den = yj - yi
                    safe = jnp.where(den != 0.0, den, one)
                    crosses = (yi > iy) != (yj > iy)
                    xint = (xj - xi) * (iy - yi) / safe + xi
                    res = res ^ (crosses & (ix < xint))
                    j0 = i0
                m = res & aabb()
                r, g, b, a = ct(p(22), p(23), p(24), p(25))
                emit(m, r * ones, g * ones, b * ones, a * ones, zeros)

            @pl.when(kind == C.KIND_VGRD)
            def _():
                ix, iy = inv_point()
                m = ((ix >= p(14)) & (ix <= p(16))
                     & (iy >= p(15)) & (iy <= p(17))) & aabb()
                t = (iy - p(18)) / p(19)
                r = p(20) + (p(24) - p(20)) * t
                g = p(21) + (p(25) - p(21)) * t
                b = p(22) + (p(26) - p(22)) * t
                a = p(23) + (p(27) - p(23)) * t
                r, g, b, a = ct(r, g, b, a)
                emit(m, r, g, b, a, zeros)

            @pl.when(kind == C.KIND_SET_PIXEL)
            def _():  # raw single-pixel store
                m = (X == p(14)) & (Y == p(15))
                emit(m, p(16) * ones, p(17) * ones, p(18) * ones,
                     p(19) * ones, ones)

            @pl.when(kind == C.KIND_APPLY_PIXEL)
            def _():  # blended single pixel
                m = (X == p(14)) & (Y == p(15))
                r, g, b, a = ct(p(16), p(17), p(18), p(19))
                emit(m, r * ones, g * ones, b * ones, a * ones, zeros)

            packed = br_s[:, :]
            m = packed[0:th] > 0.5
            r, g, b, a, store = (packed[th:2 * th], packed[2 * th:3 * th],
                                 packed[3 * th:4 * th],
                                 packed[4 * th:5 * th], packed[5 * th:])
            fbr = out_ref[0, 0:th, :]
            fbg = out_ref[0, th:2 * th, :]
            fbb = out_ref[0, 2 * th:3 * th, :]
            fba = out_ref[0, 3 * th:, :]
            sm = store > 0.0
            nr = jnp.where(sm, r, fbr * (one - a) + r * a)
            ng = jnp.where(sm, g, fbg * (one - a) + g * a)
            nb = jnp.where(sm, b, fbb * (one - a) + b * a)
            out_ref[0, 0:th, :] = jnp.where(m, nr, fbr)
            out_ref[0, th:2 * th, :] = jnp.where(m, ng, fbg)
            out_ref[0, 2 * th:3 * th, :] = jnp.where(m, nb, fbb)
            out_ref[0, 3 * th:, :] = jnp.where(m, a, fba)
            return dummy

        lax.fori_loop(0, count, body, 0)

    return kernel


def tile_fb(fb, tile_h: int, tile_w: int):
    """(H, W, 4) -> (NT, 4*th, tw) planar tiles (pads H, W up)."""
    H, W = fb.shape[0], fb.shape[1]
    nty = (H + tile_h - 1) // tile_h
    ntx = (W + tile_w - 1) // tile_w
    fbp = jnp.pad(fb, ((0, nty * tile_h - H), (0, ntx * tile_w - W),
                       (0, 0)))
    t = fbp.reshape(nty, tile_h, ntx, tile_w, 4)
    t = jnp.transpose(t, (0, 2, 4, 1, 3))          # (nty, ntx, 4, th, tw)
    return t.reshape(nty * ntx, 4 * tile_h, tile_w)


def detile_fb(tiles, height: int, width: int, tile_h: int, tile_w: int):
    """(NT, 4*th, tw) -> (H, W, 4)."""
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    t = tiles.reshape(nty, ntx, 4, tile_h, tile_w)
    t = jnp.transpose(t, (0, 3, 1, 4, 2))          # (nty, th, ntx, tw, 4)
    t = t.reshape(nty * tile_h, ntx * tile_w, 4)
    return t[:height, :width]


def _bin_commands(kinds, params, nt, ntx, tile_h, tile_w, ncmd):
    """Per-tile resident command lists by AABB intersection (stable order:
    blending is order-dependent)."""
    tids = jnp.arange(nt, dtype=jnp.int32)
    oxs = (tids % ntx * tile_w).astype(jnp.float32)
    oys = (tids // ntx * tile_h).astype(jnp.float32)
    box = params[:, 6:10].astype(jnp.float32)                # (N, 4)
    hits = ((box[None, :, 1] > oxs[:, None])
            & (box[None, :, 0] < oxs[:, None] + tile_w)
            & (box[None, :, 3] > oys[:, None])
            & (box[None, :, 2] < oys[:, None] + tile_h))     # (NT, N)
    counts = jnp.sum(hits, axis=1).astype(jnp.int32)
    order = jnp.argsort(~hits, axis=1, stable=True).astype(jnp.int32)
    bins = order[:, :, None].transpose(0, 2, 1)              # (NT, 1, N)
    scal = jnp.concatenate([
        kinds.astype(jnp.int32),
        tids % ntx * tile_w, tids // ntx * tile_h, counts])
    return bins, scal


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def render_span_kernel(fb, kinds, params, width: int, height: int,
                       tile_h: int = 128, tile_w: int = 128,
                       interpret: bool = False):
    """Execute an arithmetic command span on ``fb`` via the tile kernel.

    fb: (H, W, 4); kinds: (ncmd,) i32 (static length — callers pad to a
    CMD_BUCKET with NOOPs); params: (ncmd, PARAM_W).  Returns the new fb.
    """
    dtype = fb.dtype
    ncmd = kinds.shape[0]
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    nt = ntx * nty

    bins, scal = _bin_commands(kinds, params, nt, ntx, tile_h, tile_w,
                               ncmd)
    tiles = tile_fb(fb, tile_h, tile_w)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, ncmd), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ncmd, C.PARAM_W), lambda i, s: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4 * tile_h, tile_w), lambda i, s: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 4 * tile_h, tile_w), lambda i, s: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((6 * tile_h, tile_w), dtype),
        ],
    )
    (out,) = pl.pallas_call(
        _make_kernel(tile_h, tile_w, ncmd, dtype),
        out_shape=(jax.ShapeDtypeStruct((nt, 4 * tile_h, tile_w), dtype),),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scal, bins, params.astype(dtype)[None], tiles)
    return detile_fb(out, height, width, tile_h, tile_w)


def cmd_bucket(n: int) -> int:
    for b in CMD_BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"arith span too long for the tile kernel ({n})")
