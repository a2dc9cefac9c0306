"""Z-buffered triangle rasterizer (TPU-native, JAX/XLA).

This subsystem has no counterpart in the reference's code — the reference is
a 2D canvas — but it is the BASELINE.json headline workload ("tile-binned
rasterizer that evaluates edge functions, depth-tests against a z-buffer,
and shades whole tiles", configs 1-3).  The design is TPU-first:

  Phase V (visibility): per pixel, a single int32 ``min``-reduction over
    triangles of the packed key ``(quantised_z << IDX_BITS) | triangle_id``.
    Packing depth and id into one word turns "argmin with tie-break" into a
    plain associative min that XLA/Pallas reduce natively, with *no*
    scatter, no atomics, and order-independence (so triangles can be
    processed in any chunked/tiled/sharded order).

  Phase S (shading): one gather of the winning triangle's attribute rows,
    then a dense per-pixel barycentric evaluation (Gouraud color, UV
    texture) — pure VPU work.

Triangle-dense scenes use tile binning (``render_binned``): triangles are
bucketed per screen tile by a vectorised cumsum+scatter, and each tile only
evaluates its K resident triangles.  The naive path (``render_naive``)
evaluates all T triangles against all pixels and is the correctness
reference for small scenes.

Alpha-blended geometry (BASELINE config 2) uses painter's order with z-test
(``render_blended``): a scan over depth-sorted triangles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

IDX_BITS = 18          # up to 256k triangles per draw
IDX_MASK = (1 << IDX_BITS) - 1
Z_LEVELS = (1 << (31 - IDX_BITS)) - 1   # 13 bits of depth quantisation
NO_TRI = IDX_MASK      # sentinel triangle id (background)
SKY_KEY = np.int32((Z_LEVELS << IDX_BITS) | NO_TRI)
NEAR_EPS = 1e-6        # w <= NEAR_EPS is "behind the near plane"
SUBPIXEL = 256.0       # screen coords snap to 1/256 px (hardware-style)


def _snap(c):
    """Snap a screen coordinate to the 1/256 subpixel grid.

    With snapped coords every edge-function quantity (A, B, C and
    e = A*x + B*y + C at integer pixels) is EXACT in f64 for coords up to
    ~4096 px: products fit in 40 bits, sums in 42 — so coverage at
    shared edges cannot flip with XLA fusion/FMA-contraction choices.
    Without it, pixels lying exactly on a shared quad diagonal evaluate
    e ~ +-1e-13 whose sign depends on how XLA fuses the upstream graph
    (observed: a setup-gather layout change flipped 7 knife-edge pixels
    in test_textured_raster.py).  GPUs snap for the same reason.
    """
    return jnp.round(c * SUBPIXEL) / SUBPIXEL


def pregather_mesh(verts, faces):
    """Frame-invariant half of ``setup_triangles``: the per-face gather of
    homogeneous vertex rows.  XLA does NOT hoist gathers out of a device
    ``fori_loop`` body (profiled ~0.05 ms/frame re-gathered EVERY frame at
    10k faces — tools/exp_r4_champprof2.py), so frame loops over a static
    mesh gather once here and pass the result as ``v4f=`` / ``pre=``.
    ``(v4 @ mvp.T)[faces] == v4[faces] @ mvp.T`` row-for-row: each clip
    row is the same 4-element dot either way (bit-equality asserted in
    tests/test_raster3d.py)."""
    dtype = verts.dtype
    v4 = jnp.concatenate([verts, jnp.ones((verts.shape[0], 1), dtype)], -1)
    return v4[faces]                        # (F, 3, 4)


def setup_triangles(verts, faces, mvp, width: int, height: int, v4f=None):
    """Transform + project + precompute per-triangle raster data.

    verts: (V, 3) f32 object space; faces: (F, 3) i32; mvp: (4, 4).
    ``v4f``: optional pre-gathered (F, 3, 4) homogeneous vertex rows from
    :func:`pregather_mesh` (hoists the per-face gather out of frame loops).
    Returns a dict of per-face arrays:
      sxy: (F, 3, 2) screen-space vertex positions
      z:   (F, 3) NDC depth in [0, 1] (after viewport mapping)
      valid: (F,) bool (in front of near plane, non-degenerate)
    """
    dtype = verts.dtype
    # IDX_BITS caps triangle ids; one more and ids overflow into the depth
    # field of the packed visibility keys (id NO_TRI doubles as the
    # background sentinel), silently corrupting visibility.
    assert faces.shape[0] < NO_TRI, (
        f"draw has {faces.shape[0]} faces; packed keys support < {NO_TRI}")
    # ONE per-face gather of the 16 B clip rows, then per-face projection:
    # TPU random gathers cost ~0.2 ms per 30k fetches at this size and the
    # per-vertex-then-gather layout needed six of them (tools/exp_prep2.py).
    # The arithmetic after the gather is identical op-for-op; _snap makes
    # downstream edge tests exact so the layout change cannot shift
    # knife-edge coverage via XLA fusion differences.
    if v4f is None:
        v4 = jnp.concatenate(
            [verts, jnp.ones((verts.shape[0], 1), dtype)], -1)
        clipf = (v4 @ mvp.T)[faces]         # (F, 3, 4)
    else:
        clipf = v4f @ mvp.T                 # (F, 3, 4) — same row dots
    w = clipf[..., 3:4]                     # (F, 3, 1)
    w_ok = w[..., 0] > 1e-6                 # (F, 3)
    ndc = clipf[..., :3] / jnp.where(w_ok[..., None], w, 1.0)
    fsx = _snap((ndc[..., 0] * 0.5 + 0.5) * width)
    fsy = _snap((0.5 - ndc[..., 1] * 0.5) * height)  # y down, canvas convention
    fz = ndc[..., 2] * 0.5 + 0.5              # [0, 1], 0 = near
    valid = jnp.all(w_ok, axis=1)
    sxy = jnp.stack([fsx, fsy], axis=-1)      # (F, 3, 2)
    inv_w = (1.0 / jnp.where(w_ok[..., None], w, 1.0))[..., 0]   # (F, 3)
    return {"sxy": sxy, "z": fz, "valid": valid, "inv_w": inv_w}


def clip_near_triangles(clip, attrs, eps: float = NEAR_EPS):
    """Clip clip-space triangles against the near plane w = eps.

    A triangle with 1 or 2 vertices behind the plane is cut into 1 or 2
    sub-triangles whose new vertices sit exactly on the plane (positions
    AND attributes interpolated with the same parameter t); fully-behind
    triangles become degenerate.  Fully static shapes: every input
    triangle owns two output slots (slot i and slot F + i).

    clip: (F, 3, 4) clip-space vertices; attrs: (F, 3, D).
    Returns (clip2 (2F, 3, 4), attrs2 (2F, 3, D), valid (2F,) bool).
    """
    F = clip.shape[0]
    dtype = clip.dtype
    w = clip[..., 3]                                       # (F, 3)
    inside = w > eps
    n_in = jnp.sum(inside.astype(jnp.int32), axis=1)       # (F,)

    # rotate each triangle (cyclically, preserving winding) so that:
    #   n_in==1 -> the single inside vertex lands at position 0
    #   n_in==2 -> the single outside vertex lands at position 2
    out_idx = jnp.argmax(~inside, axis=1).astype(jnp.int32)
    in_idx = jnp.argmax(inside, axis=1).astype(jnp.int32)
    r = jnp.where(n_in == 1, in_idx,
                  jnp.where(n_in == 2, (out_idx + 1) % 3, 0))
    perm = (r[:, None] + jnp.arange(3, dtype=jnp.int32)[None, :]) % 3
    vr = jnp.take_along_axis(clip, perm[..., None], axis=1)
    ar = jnp.take_along_axis(attrs, perm[..., None], axis=1)
    v0, v1, v2 = vr[:, 0], vr[:, 1], vr[:, 2]
    a0, a1, a2 = ar[:, 0], ar[:, 1], ar[:, 2]
    w0, w1, w2 = vr[:, 0, 3], vr[:, 1, 3], vr[:, 2, 3]

    def isect(av, aa, bv, ba, wa, wb):
        denom = wb - wa
        t = ((eps - wa) / jnp.where(denom == 0.0, 1.0, denom))[:, None]
        return av + t * (bv - av), aa + t * (ba - aa)

    i01v, i01a = isect(v0, a0, v1, a1, w0, w1)
    i02v, i02a = isect(v0, a0, v2, a2, w0, w2)
    i12v, i12a = isect(v1, a1, v2, a2, w1, w2)

    c3 = (n_in == 3)[:, None, None]
    c2 = (n_in == 2)[:, None, None]

    def pick(full, two, one):
        return jnp.where(c3, full, jnp.where(c2, two, one))

    # slot A: 3in -> (v0,v1,v2); 2in -> (v0,v1,i12); 1in -> (v0,i01,i02)
    triA_v = pick(jnp.stack([v0, v1, v2], 1), jnp.stack([v0, v1, i12v], 1),
                  jnp.stack([v0, i01v, i02v], 1))
    triA_a = pick(jnp.stack([a0, a1, a2], 1), jnp.stack([a0, a1, i12a], 1),
                  jnp.stack([a0, i01a, i02a], 1))
    # slot B: only for the 2-in quad -> (v0, i12, i02)
    triB_v = jnp.stack([v0, i12v, i02v], 1)
    triB_a = jnp.stack([a0, i12a, i02a], 1)

    validA = n_in >= 1
    validB = n_in == 2
    clip2 = jnp.concatenate([triA_v, triB_v], axis=0).astype(dtype)
    attrs2 = jnp.concatenate([triA_a, triB_a], axis=0)
    valid = jnp.concatenate([validA, validB], axis=0)
    return clip2, attrs2, valid


def setup_triangles_clipped(verts, faces, mvp, attrs, width: int,
                            height: int, eps: float = NEAR_EPS, v4f=None):
    """setup_triangles with near-plane clipping (see clip_near_triangles).

    attrs: (F, 3, D) per-vertex attributes (clipped alongside positions).
    ``v4f``: optional pre-gathered rows from :func:`pregather_mesh`.
    Returns (tri dict with 2F entries, clipped attrs (2F, 3, D)).
    """
    dtype = verts.dtype
    assert 2 * faces.shape[0] < NO_TRI, (
        f"clipped draw has {2 * faces.shape[0]} slots; keys support "
        f"< {NO_TRI}")
    if v4f is None:
        v4 = jnp.concatenate(
            [verts, jnp.ones((verts.shape[0], 1), dtype)], -1)
        clip = (v4 @ mvp.T)[faces]                      # (F, 3, 4)
    else:
        clip = v4f @ mvp.T                              # (F, 3, 4)
    clip2, attrs2, valid = clip_near_triangles(clip, attrs, eps)
    w = clip2[..., 3:4]                                 # (2F, 3, 1)
    # clipping already pinned boundary vertices to w ~= eps (up to one
    # ulp), so the per-vertex safety test is w > 0, not w > eps
    w_ok = w[..., 0] > 0.0
    valid = valid & jnp.all(w_ok, axis=1)
    wsafe = jnp.where(w_ok[..., None], w, 1.0)
    ndc = clip2[..., :3] / wsafe
    fsx = _snap((ndc[..., 0] * 0.5 + 0.5) * width)
    fsy = _snap((0.5 - ndc[..., 1] * 0.5) * height)
    fz = ndc[..., 2] * 0.5 + 0.5
    sxy = jnp.stack([fsx, fsy], axis=-1)
    inv_w = (1.0 / wsafe)[..., 0]
    return ({"sxy": sxy, "z": fz, "valid": valid, "inv_w": inv_w}, attrs2)


def edge_coeffs(sxy, z, valid):
    """Per-triangle edge-function and interpolation coefficients.

    Edge i is opposite vertex i, normalised so that e_i(p) equals the
    barycentric weight w_i(p) * 2*area; dividing by 2*area gives w.
    Returns (A, B, C): each (F, 3) so e_i(x, y) = A_i x + B_i y + C_i,
    plus inv_area (F,) signed, and cover_sign (F,) for inside tests.
    """
    x0, y0 = sxy[:, 0, 0], sxy[:, 0, 1]
    x1, y1 = sxy[:, 1, 0], sxy[:, 1, 1]
    x2, y2 = sxy[:, 2, 0], sxy[:, 2, 1]
    # e0 opposite v0: edge v1->v2
    A = jnp.stack([y1 - y2, y2 - y0, y0 - y1], -1)
    B = jnp.stack([x2 - x1, x0 - x2, x1 - x0], -1)
    C = jnp.stack([x1 * y2 - x2 * y1,
                   x2 * y0 - x0 * y2,
                   x0 * y1 - x1 * y0], -1)
    area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    nz = jnp.abs(area2) > 1e-12
    valid = valid & nz
    inv_area = jnp.where(nz, 1.0 / jnp.where(nz, area2, 1.0), 0.0)
    sign = jnp.sign(area2)
    return A, B, C, inv_area, sign, valid


def _pack_keys(e, z, sign, valid, tri_ids):
    """Coverage + packed (z << IDX_BITS | id) keys.

    e: (..., 3) edge values; z: (...) interpolated depth; returns int32 keys
    with SKY for uncovered.
    """
    covered = jnp.all(e * sign[..., None] >= 0.0, axis=-1) & valid
    # callers pass sign/valid already shaped to broadcast against (..., P)
    covered &= (z >= 0.0) & (z <= 1.0)
    zq = jnp.clip(z * Z_LEVELS, 0, Z_LEVELS).astype(jnp.int32)
    key = (zq << IDX_BITS) | tri_ids
    return jnp.where(covered, key, jnp.int32(SKY_KEY))


def visibility_naive(A, B, C, zplane, sign, valid, X, Y, block: int = 16384):
    """Min-reduce packed keys over ALL triangles for every pixel.

    X, Y: (P,) pixel coords.  zplane: (F, 3) per-vertex z scaled by
    inv_area (so the einsum with raw edge values yields interpolated
    depth).  Memory is bounded by processing pixels in blocks.
    """
    F = A.shape[0]
    tri_ids = jnp.arange(F, dtype=jnp.int32)
    P = X.shape[0]
    n_blocks = (P + block - 1) // block
    Xp = jnp.pad(X, (0, n_blocks * block - P))
    Yp = jnp.pad(Y, (0, n_blocks * block - P))
    Xb = Xp.reshape(n_blocks, block)
    Yb = Yp.reshape(n_blocks, block)

    def per_block(xy):
        x, y = xy
        # e: (F, 3, block)
        e = (A[:, :, None] * x[None, None, :]
             + B[:, :, None] * y[None, None, :] + C[:, :, None])
        # barycentric w = e * inv_area; z = sum w_i z_i.  We fold inv_area
        # into zplane ahead of time (caller passes zplane_scaled).
        z = jnp.einsum("ftp,ft->fp", e, zplane)
        keys = _pack_keys(jnp.moveaxis(e, 1, -1), z, sign[:, None],
                          valid[:, None], tri_ids[:, None])
        return jnp.min(keys, axis=0)

    keys = lax.map(per_block, (Xb, Yb))
    return keys.reshape(-1)[:P]


def shade(keys, A, B, C, inv_area, attrs, X, Y, bg):
    """Phase S: evaluate the winning triangle's attributes per pixel.

    attrs: (F, 3, D) per-vertex attributes (e.g. RGBA).  bg: (D,) background.
    Returns (P, D).  One fused-table row gather per pixel + explicit FMAs
    (einsum over tiny contraction dims lowers to pathological code on TPU).
    """
    D = attrs.shape[-1]
    F = A.shape[0]
    table = jnp.concatenate(
        [A, B, C, inv_area[:, None], attrs.reshape(F, 3 * D)], axis=1)
    idx = keys & IDX_MASK
    hit = idx != NO_TRI
    row = table[jnp.where(hit, idx, 0)]          # (P, 10 + 3D)
    e = row[:, 0:3] * X[:, None] + row[:, 3:6] * Y[:, None] + row[:, 6:9]
    w = e * row[:, 9:10]                         # barycentric (P, 3)
    out = (w[:, 0:1] * row[:, 10:10 + D]
           + w[:, 1:2] * row[:, 10 + D:10 + 2 * D]
           + w[:, 2:3] * row[:, 10 + 2 * D:10 + 3 * D])
    return jnp.where(hit[:, None], out, bg[None, :])


@functools.partial(jax.jit, static_argnums=(3, 4, 7, 8))
def render_gouraud(verts, faces, vtx_colors, width: int, height: int,
                   mvp=None, bg=None, band_height: int = None, full_height: int = None,
                   y0=None):
    """Naive full-screen Gouraud render: (H, W, 4) f32 + (H, W) depth.

    For multi-device y-band sharding pass ``band_height`` (rows rendered by
    this call), ``full_height`` (viewport height used for projection) and
    ``y0`` (first row, traced value) — each device renders its band of the
    same projected scene (parallel/sharding.py).
    """
    dtype = verts.dtype
    if mvp is None:
        mvp = jnp.eye(4, dtype=dtype)
    if bg is None:
        bg = jnp.zeros(4, dtype)
    proj_h = full_height if full_height is not None else height
    out_h = band_height if band_height is not None else height
    tri = setup_triangles(verts, faces, mvp, width, proj_h)
    A, B, C, inv_area, sign, valid = edge_coeffs(tri["sxy"], tri["z"],
                                                 tri["valid"])
    zplane_scaled = tri["z"] * inv_area[:, None]
    height = out_h
    X = lax.broadcasted_iota(dtype, (height, width), 1).reshape(-1)
    Y = lax.broadcasted_iota(dtype, (height, width), 0).reshape(-1)
    if y0 is not None:
        Y = Y + jnp.asarray(y0, dtype)
    keys = visibility_naive(A, B, C, zplane_scaled, sign, valid, X, Y)
    attrs = vtx_colors[faces]  # (F, 3, 4)
    rgba = shade(keys, A, B, C, inv_area, attrs, X, Y, bg)
    zq = (keys >> IDX_BITS).astype(dtype) / Z_LEVELS
    return rgba.reshape(height, width, 4), zq.reshape(height, width)


# ---------------------------------------------------------------------------
# Tile-binned pipeline (the fast path)
# ---------------------------------------------------------------------------

def bin_triangles(sxy, valid, width, height, tile_w: int, tile_h: int,
                  capacity: int, span_x: int = 8, span_y: int = 8):
    """Bucket triangle ids per screen tile — sort-based, no scatter.

    Each triangle emits up to span_x*span_y (tile, tri) pairs from its
    tile-space AABB; one ``lax.sort`` by tile id turns the pair list into
    per-tile contiguous runs, and a windowed gather materialises the
    (NT, capacity) bins.  TPU scatter is serialised and was the dominant
    frame cost; sorting ~F*span pairs is ~3 orders of magnitude cheaper.

    Returns (bins (NT, capacity) i32 with NO_TRI padding, counts (NT,),
    overflow bool — true if any tile exceeds capacity OR any triangle's
    AABB exceeds the static span window (callers escalate and recompile)).
    """
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    nt = ntx * nty
    F = sxy.shape[0]
    xs = sxy[..., 0]
    ys = sxy[..., 1]
    x0 = jnp.floor(jnp.min(xs, axis=1) / tile_w).astype(jnp.int32)
    x1 = jnp.floor(jnp.max(xs, axis=1) / tile_w).astype(jnp.int32)
    y0 = jnp.floor(jnp.min(ys, axis=1) / tile_h).astype(jnp.int32)
    y1 = jnp.floor(jnp.max(ys, axis=1) / tile_h).astype(jnp.int32)
    # clip to the grid; triangles fully offscreen become empty ranges
    x0c = jnp.maximum(x0, 0)
    y0c = jnp.maximum(y0, 0)
    x1c = jnp.minimum(x1, ntx - 1)
    y1c = jnp.minimum(y1, nty - 1)
    nonempty = valid & (x0c <= x1c) & (y0c <= y1c)
    span_overflow = jnp.any(
        nonempty & ((x1c - x0c >= span_x) | (y1c - y0c >= span_y)))

    dx = jnp.arange(span_x, dtype=jnp.int32)
    dy = jnp.arange(span_y, dtype=jnp.int32)
    txs = x0c[:, None] + dx[None, :]                    # (F, span_x)
    tys = y0c[:, None] + dy[None, :]                    # (F, span_y)
    ok = (nonempty[:, None, None]
          & (txs[:, None, :] <= x1c[:, None, None])
          & (tys[:, :, None] <= y1c[:, None, None]))    # (F, span_y, span_x)
    tid = tys[:, :, None] * ntx + txs[:, None, :]
    tid = jnp.where(ok, tid, nt)                        # sentinel tile
    # one packed int32 sort (tile major, triangle-id minor): F <= 2^IDX_BITS
    # and nt << IDX_BITS must stay below 2^31 (nt <= 4095 tiles)
    assert nt < (1 << (31 - IDX_BITS)), "too many tiles for packed binning"
    tri = jnp.arange(F, dtype=jnp.int32)[:, None, None]
    packed = (tid << IDX_BITS) | tri
    # is_stable=False: packed values are unique (tile, tri) pairs, so the
    # sorted array is value-determined and the cheaper unstable network
    # returns identical bits
    packed_sorted = lax.sort(packed.reshape(-1), is_stable=False)
    tid_sorted = packed_sorted >> IDX_BITS
    tri_sorted = packed_sorted & IDX_MASK

    starts = _searchsorted_blocked(tid_sorted, nt + 1)
    counts = (starts[1:] - starts[:-1]).astype(jnp.int32)
    win = starts[:-1, None] + jnp.arange(capacity, dtype=jnp.int32)[None, :]
    bins = jnp.take(tri_sorted, jnp.minimum(win, tid_sorted.shape[0] - 1),
                    axis=0)
    bins = jnp.where(jnp.arange(capacity)[None, :] < counts[:, None],
                     bins, NO_TRI)
    overflow = span_overflow | jnp.any(counts > capacity)
    return bins, counts, overflow


def _searchsorted_blocked(vals, n_queries: int, block: int = 128):
    """Exact left-searchsorted of 0..n_queries-1 into sorted int32 ``vals``.

    ``jnp.searchsorted`` lowers to a log2(S)-iteration while loop whose
    per-iteration gather dominates prep on TPU (profiled 0.7 ms/frame at
    S=200k: the while + its gather fusion cost more than the sort
    itself).  Dense integer queries let us do it in two vectorised
    levels instead: (1) rank each query against the per-block head
    values (strided slice + broadcast compare), (2) gather ONE
    straddling block per query and rank within it.  position(t) =
    blk*block + |{v in vals[blk] : v < t}| with blk = max(rank-1, 0) —
    exact because blocks before blk are entirely < t and blocks after
    start >= t.
    """
    S = vals.shape[0]
    nblk = -(-S // block)
    if nblk * block != S:
        vals = jnp.concatenate(
            [vals, jnp.full(nblk * block - S, jnp.int32(0x7FFFFFFF))])
    t = jnp.arange(n_queries, dtype=jnp.int32)
    heads = vals[:: block]                                # (nblk,)
    rank = jnp.sum((heads[None, :] < t[:, None]).astype(jnp.int32),
                   axis=1)                                # (Q,)
    blk = jnp.maximum(rank - 1, 0)
    rows = jnp.take(vals.reshape(nblk, block), blk, axis=0)  # (Q, block)
    fine = jnp.sum((rows < t[:, None]).astype(jnp.int32), axis=1)
    return jnp.minimum(blk * block + fine, S)


def bin_triangles_flat(sxy, valid, width, height, tile_w: int, tile_h: int,
                       block_k: int, span_x: int = 8, span_y: int = 8,
                       edges=None, wide_split: bool = False):
    """Gatherless binning for the flat Pallas path.

    Same sort-based bucketing as ``bin_triangles`` but the per-tile runs are
    NOT materialised into a (NT, capacity) array — that windowed gather
    measured ~1.9 ms/frame at 1080p/10k (261k random 4 B fetches).  Instead
    the kernel reads each tile's run straight out of the sorted pair array
    via two scalar-indexed SMEM blocks (pallas_raster.raster_tiles_flat).

    Returns (sorted_pad (Spad,) i32 packed (tile << IDX_BITS | tri), padded
    with (nt, F) sentinels to a block_k multiple + 2 guard blocks; starts
    (NT,); counts (NT,); overflow).  ``counts > block_k`` is the overflow
    condition (a run must fit the kernel's two-block window).
    """
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    nt = ntx * nty
    F = sxy.shape[0]
    xs = sxy[..., 0]
    ys = sxy[..., 1]
    x0 = jnp.floor(jnp.min(xs, axis=1) / tile_w).astype(jnp.int32)
    x1 = jnp.floor(jnp.max(xs, axis=1) / tile_w).astype(jnp.int32)
    y0 = jnp.floor(jnp.min(ys, axis=1) / tile_h).astype(jnp.int32)
    y1 = jnp.floor(jnp.max(ys, axis=1) / tile_h).astype(jnp.int32)
    x0c = jnp.maximum(x0, 0)
    y0c = jnp.maximum(y0, 0)
    x1c = jnp.minimum(x1, ntx - 1)
    y1c = jnp.minimum(y1, nty - 1)
    nonempty = valid & (x0c <= x1c) & (y0c <= y1c)
    span_overflow = jnp.any(
        nonempty & ((x1c - x0c >= span_x) | (y1c - y0c >= span_y)))

    assert nt < (1 << (31 - IDX_BITS)), "too many tiles for packed binning"

    def emit(y0c_, x0c_, x1c_, y1c_, ne_, tri_ids, dy0: int, sy_n: int,
             edges_, dx0: int = 0, sx_n: int | None = None):
        """Packed (tile << IDX_BITS | tri) slots for the tile sub-grid
        rows y0c_+dy0 .. +dy0+sy_n-1 x cols x0c_+dx0 .. +dx0+sx_n-1 of
        the given triangle subset; invalid slots carry the tile=nt
        sentinel (sorted to the end).

        Built (sy, sx, n) — triangles on the LANE dim — not (n, sy, sx):
        the latter pads the sx-sized minor dim to 128 lanes (25x read
        amplification at sx=5) and its flatten was the top emission cost
        (~0.05 ms/frame, exp_r4_champprof2 post-hoist).  The element SET
        is identical (same products, same sums per slot) and the sort is
        order-invariant over unique values, so downstream bits are
        unchanged."""
        dx = dx0 + jnp.arange(span_x if sx_n is None else sx_n,
                              dtype=jnp.int32)
        dyv = dy0 + jnp.arange(sy_n, dtype=jnp.int32)
        txs = x0c_[None, :] + dx[:, None]            # (sx, n)
        tys = y0c_[None, :] + dyv[:, None]           # (sy, n)
        ok = (ne_[None, None, :]
              & (txs[None, :, :] <= x1c_[None, None, :])
              & (tys[:, None, :] <= y1c_[None, None, :]))
        if edges_ is not None:
            # exact edge-vs-tile cull: AABB spans keep every tile the
            # box touches, but a triangle covers only ~half of them —
            # and each kept pair costs a full (kcc, P) VPU walk in the
            # kernel.  An edge e = A x + B y + C is affine, so its max
            # over the tile's pixel rect sits at a corner selected by
            # the coefficient signs; if sign * e_max < 0 for any edge,
            # no pixel in the tile is covered and the pair is dropped.
            # Slack covers f32 rounding (the kernel evaluates e from
            # the SAME A/B/C, so only fma-ordering ulps differ); in f64
            # (golden suite) the test is exact for snapped coords.
            A, B, C, sign = edges_
            dtype = A.dtype
            fxl = (txs * tile_w).astype(dtype)       # (sx, n)
            fyl = (tys * tile_h).astype(dtype)       # (sy, n)
            fxh = fxl + (tile_w - 1)
            fyh = fyl + (tile_h - 1)
            cover = None
            for e in range(3):
                Ae = (A[:, e] * sign)[None, :]       # fold sign in
                Be = (B[:, e] * sign)[None, :]
                Ce = (C[:, e] * sign)[None, :]
                # max over the two corner products == the sign select
                # (tile coords are >= 0 and fxl <= fxh), with exactly
                # the same value in any float width — and it fuses as
                # one maximum instead of compare+select_n
                ex = jnp.maximum(Ae * fxh, Ae * fxl)         # (sx, n)
                ey = jnp.maximum(Be * fyh, Be * fyl)         # (sy, n)
                emax = (ey[:, None, :] + ex[None, :, :]
                        + Ce[None, None, :])
                slack = ((jnp.abs(Ae) * fxh)[None, :, :]
                         + (jnp.abs(Be) * fyh)[:, None, :]
                         + jnp.abs(Ce)[None, None, :])
                keep = emax >= -1e-5 * slack
                cover = keep if cover is None else (cover & keep)
            ok = ok & cover
        tid = tys[:, None, :] * ntx + txs[None, :, :]
        tid = jnp.where(ok, tid, nt)
        tri = tri_ids[None, None, :]
        return ((tid << IDX_BITS) | tri).reshape(-1)

    # Tall-triangle split: most triangles span <= SY_A tile rows, so
    # emitting span_y rows for all of them wastes ~half the sort input
    # (the sort is a top prep cost — see ROADMAP round-3 profile).
    # Emit SY_A rows for everyone + the remaining rows for only the
    # top-K tallest (lax.top_k); the sorted VALID prefix is identical,
    # so starts/counts/kernel output are bit-exact.  Overflows (more
    # than K talls) fall back via the overflow flag as usual.
    # SY_A stays 4 for every tile height: lowering it to 2 for tall
    # tiles silently ENABLES the top-k tall split at (32,32)/(5,4),
    # and each lax.top_k measures ~0.1 ms/frame — more than the sort
    # saving at that span budget (same lesson as wide_split below)
    SY_A = 4
    SX_A = 2
    tall_split = F >= 4096 and span_y > SY_A
    # wide_split defaults OFF: measured NEGATIVE on the bench mesh at
    # (32,32)/(5,4) — 1.90 vs 1.74 ms/frame (tools/exp_r3_split2d.py);
    # the second lax.top_k (K=4096) costs more than the 200k->84k sort
    # saving.  Kept behind the flag for denser span budgets.
    wide_split = wide_split and F >= 4096 and span_x > SX_A
    all_tris = jnp.arange(F, dtype=jnp.int32)

    def subset(idx):
        def g(a):
            return jnp.take(a, idx, axis=0)
        ed = (tuple(g(e) for e in edges) if edges is not None else None)
        return (g(y0c), g(x0c), g(x1c), g(y1c), g(nonempty), idx, ed)

    if tall_split or wide_split:
        # 2D split emission: a base (SY_A rows x SX_A cols) box for ALL
        # triangles plus extra rows only for the top-K tallest, extra
        # cols only for the top-K widest, and the (extra rows x extra
        # cols) corner only for the tallest (a tall-and-wide triangle
        # is in both top-K sets, so the corner from one set suffices —
        # emitting it from both would DUPLICATE pairs and double-count
        # winner attributes in the kernel's chunk walk).  The sorted
        # VALID prefix is identical to full emission, so starts/counts/
        # kernel output stay bit-exact; more than K talls/wides than
        # fit raises the overflow flag as usual.
        # separate top-K budgets: the bench mesh measures ~270
        # triangles >= 3 tile-rows but ~2100 >= 3 tile-cols at 32 px
        # tiles (wide-x AABBs from the camera aspect), so the wide set
        # needs the bigger K
        # deeper top-k for tighter tiles: 16 px-wide tiles push ~41% of
        # the bench mesh past SX_A cols (max ~4.1k wides over the
        # rotation) and 8 px-tall tiles push ~20% past SY_A rows; size
        # the budgets to the span demand so the split stays exact
        # instead of overflowing
        TK = min(4096 if span_y >= 8 else 2048, F)
        TKW = min(8192 if span_x >= 8 else 4096, F)
        # columns are only capped at SX_A when the wide split actually
        # emits the remaining columns; with wide_split off, the base and
        # tall pieces must carry the FULL span_x (capping unconditionally
        # silently dropped bins for triangles >= 3 tile-columns wide)
        sx_base = min(SX_A, span_x) if wide_split else span_x
        pieces = [emit(y0c, x0c, x1c, y1c, nonempty, all_tris, 0,
                       min(SY_A, span_y), edges, 0, sx_base)]
        if tall_split:
            spans = jnp.where(nonempty, y1c - y0c + 1, 0)
            tall_span, tall_idx = lax.top_k(spans, TK)
            span_overflow = span_overflow | (tall_span[-1] > SY_A)
            ty0, tx0, tx1, ty1, tne, tid_, ted = subset(tall_idx)
            pieces.append(emit(ty0, tx0, tx1, ty1, tne, tid_, SY_A,
                               span_y - SY_A, ted, 0,
                               sx_base))
            if wide_split:
                pieces.append(emit(ty0, tx0, tx1, ty1, tne, tid_, SY_A,
                                   span_y - SY_A, ted, SX_A,
                                   span_x - SX_A))
        if wide_split:
            wides = jnp.where(nonempty, x1c - x0c + 1, 0)
            wide_span, wide_idx = lax.top_k(wides, TKW)
            span_overflow = span_overflow | (wide_span[-1] > SX_A)
            wy0, wx0, wx1, wy1, wne, wid_, wed = subset(wide_idx)
            pieces.append(emit(wy0, wx0, wx1, wy1, wne, wid_, 0,
                               min(SY_A, span_y), wed, SX_A,
                               span_x - SX_A))
        pieces_flat = pieces
    else:
        pieces_flat = [emit(y0c, x0c, x1c, y1c, nonempty, all_tris, 0,
                            span_y, edges)]
    # guard/padding sentinels ((tile=nt, tri=F): tri F is the table's NaN
    # row, so guard-block reads shade nothing) are emitted BEFORE the sort
    # and ride it to the end (pad_val >= every real packed slot), instead
    # of a post-sort concatenate — one fewer full copy of the pair array
    # per frame.  Two whole guard blocks keep the kernel's blk+1 SMEM
    # window in bounds for every possible start; invalid emission slots
    # already carry tid=nt, so starts/counts are unchanged.
    S = sum(p.shape[0] for p in pieces_flat)
    spad = (S // block_k + 3) * block_k
    pad_val = jnp.int32((nt << IDX_BITS) | F)
    pieces_flat.append(jnp.full((spad - S,), pad_val, jnp.int32))
    packed_flat = jnp.concatenate(pieces_flat)
    # unique packed values (duplicate-free emission) -> unstable sort is
    # bit-identical and skips the index-carrying stable network
    sorted_pad = lax.sort(packed_flat, is_stable=False)
    tid_sorted = sorted_pad >> IDX_BITS

    starts = _searchsorted_blocked(tid_sorted, nt + 1)
    counts = (starts[1:] - starts[:-1]).astype(jnp.int32)
    overflow = span_overflow | jnp.any(counts > block_k)
    return sorted_pad, starts[:-1].astype(jnp.int32), counts, overflow


def clamp_mega(mega: int, tiles_per_frame: int) -> int:
    """Largest divisor of ``tiles_per_frame`` that is <= ``mega`` (0 if
    mega is 0).  The mega-loop kernel requires mega | NT (its grid is
    NT // mega programs, each looping mega consecutive tiles), and NT
    depends on width/height/tile dims — callers pick mega per-workload,
    so entry points clamp instead of crashing on indivisible combos."""
    if mega <= 0:
        return 0
    m = min(int(mega), int(tiles_per_frame))
    while tiles_per_frame % m:
        m -= 1
    return m


def mega_window_overflow(starts, counts, Kb: int, mega: int):
    """Overflow test for the mega-loop kernel's per-program id window
    (pallas_raster._make_kernel_flat mega): a program covers ``mega``
    consecutive tiles whose runs must all fit the 2*Kb SMEM window
    anchored at the FIRST tile's block.  starts/counts: (NT,)."""
    nt = int(starts.shape[0])
    if nt % mega:
        raise ValueError(
            f"mega={mega} must divide the tile count NT={nt} "
            f"(use raster3d.clamp_mega)")
    s2 = starts.reshape(-1, mega)
    ends = s2[:, -1] + counts.reshape(-1, mega)[:, -1]
    return jnp.any(ends - (s2[:, 0] // Kb) * Kb > 2 * Kb)


def viewport_mask(width: int, height: int, tile_w: int, tile_h: int):
    """(NT, P) bool: True where tile slot p lands inside the viewport.

    The ``tiled=True`` u8 output keeps the kernel's padded per-tile
    layout; slots past width/height carry whatever the walk rasterised
    there (triangles extending past the viewport edge DO cover padding
    slots of edge tiles).  Checksums/consumers of tiled output must
    mask with this before comparing against detiled output."""
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    tids = np.arange(ntx * nty)
    px = np.arange(tile_h * tile_w) % tile_w
    py = np.arange(tile_h * tile_w) // tile_w
    x = (tids % ntx * tile_w)[:, None] + px[None, :]
    y = (tids // ntx * tile_h)[:, None] + py[None, :]
    return jnp.asarray((x < width) & (y < height))


def detile_u8_host(tiles, width: int, height: int, tile_w: int,
                   tile_h: int):
    """NumPy reference detile of the ``tiled=True`` u8 output:
    (NT, P, 4) uint8 -> (H, W, 4) uint8, cropping padded slots.  The
    production video path does this in C inside the VideoCap encode
    worker (native MediaDetileU8) overlapped with encode; this is the
    layout contract both are tested against."""
    tiles = np.asarray(tiles)
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    a = tiles.reshape(nty, ntx, tile_h, tile_w, 4)
    a = np.moveaxis(a, 2, 1).reshape(nty * tile_h, ntx * tile_w, 4)
    return np.ascontiguousarray(a[:height, :width])


def raster_binned_fused(bins, A, B, C, zplane_scaled, inv_area, sign, valid,
                        attrs, bg, width: int, height: int,
                        tile_w: int, tile_h: int, batch_tiles: int = 128):
    """Fused per-tile visibility + shading — the TPU fast path.

    Per tile: (1) min-reduce packed (z, id) keys over the K bin residents,
    (2) recompute each resident's key and *select* the winner's barycentric
    colour with a masked sum.  Everything is elementwise over (K, P) and
    fuses on the VPU; no per-pixel gathers (TPU random-row gathers measured
    ~9 GB/s — recomputation is ~25x cheaper than one gathered row per
    pixel).

    attrs: (F, 3, D).  Returns (keys (H, W) int32, rgba (H, W, D)).
    """
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    nt, K = bins.shape
    dtype = A.dtype
    F = A.shape[0]
    D = attrs.shape[-1]

    # fused table: [A3 B3 C3 zsc3 sign ia attrs*ia(3D)] with NaN invalid
    # rows; inv_area is pre-folded into the attribute columns so shading
    # uses raw edge values as barycentric weights (matches build_table)
    attrs_sc = attrs * inv_area[:, None, None]
    table = jnp.concatenate(
        [A, B, C, zplane_scaled, sign[:, None], inv_area[:, None],
         attrs_sc.reshape(F, 3 * D)], axis=1)                 # (F, 14+3D)
    table = jnp.where(valid[:, None], table, jnp.nan).astype(dtype)
    table = jnp.concatenate(
        [table, jnp.full((1, 14 + 3 * D), jnp.nan, dtype)], axis=0)
    safe = jnp.where(bins == NO_TRI, F, bins)
    rows = table[safe]                                        # (NT,K,14+3D)
    ids = safe.astype(jnp.int32)

    px = lax.broadcasted_iota(dtype, (tile_h, tile_w), 1).reshape(-1)
    py = lax.broadcasted_iota(dtype, (tile_h, tile_w), 0).reshape(-1)
    ox = (jnp.arange(nt, dtype=jnp.int32) % ntx * tile_w).astype(dtype)
    oy = (jnp.arange(nt, dtype=jnp.int32) // ntx * tile_h).astype(dtype)
    X = ox[:, None] + px[None, :]
    Y = oy[:, None] + py[None, :]
    bgv = jnp.asarray(bg, dtype)

    def tile_fn(rows, ids, x, y):
        r = rows[:, :, None]                                  # (K,14+3D,1)
        xb = x[None, :]
        yb = y[None, :]
        e0 = r[:, 0] * xb + r[:, 3] * yb + r[:, 6]            # (K,P)
        e1 = r[:, 1] * xb + r[:, 4] * yb + r[:, 7]
        e2 = r[:, 2] * xb + r[:, 5] * yb + r[:, 8]
        sg = r[:, 12]
        m = jnp.minimum(jnp.minimum(e0 * sg, e1 * sg), e2 * sg)
        zz = e0 * r[:, 9] + e1 * r[:, 10] + e2 * r[:, 11]
        covered = (m >= 0.0) & (zz >= 0.0) & (zz <= 1.0)
        zq = jnp.clip(zz * Z_LEVELS, 0, Z_LEVELS).astype(jnp.int32)
        keys = jnp.where(covered, (zq << IDX_BITS) | ids[:, None],
                         jnp.int32(SKY_KEY))
        winner = jnp.min(keys, axis=0)                        # (P,)
        win_mask = (keys == winner[None, :]) & covered        # (K,P)
        out = []
        for d in range(D):
            # attr columns carry attr*inv_area: raw edge values are the
            # barycentric weights directly
            cd = (e0 * r[:, 14 + d] + e1 * r[:, 14 + D + d]
                  + e2 * r[:, 14 + 2 * D + d])
            acc = jnp.sum(jnp.where(win_mask, cd, 0.0), axis=0)
            out.append(jnp.where(winner != SKY_KEY, acc, bgv[d]))
        return winner, jnp.stack(out, axis=-1)                # (P,), (P,D)

    if batch_tiles and batch_tiles < nt:
        keys, rgba = lax.map(lambda a: tile_fn(*a), (rows, ids, X, Y),
                             batch_size=batch_tiles)
    else:
        keys, rgba = jax.vmap(tile_fn)(rows, ids, X, Y)

    def detile(arr, ch=None):
        shape = (nty, ntx, tile_h, tile_w) + ((ch,) if ch else ())
        arr = arr.reshape(shape)
        arr = jnp.moveaxis(arr, 2, 1)
        arr = arr.reshape((nty * tile_h, ntx * tile_w)
                          + ((ch,) if ch else ()))
        return arr[:height, :width]

    return detile(keys), detile(rgba, D)


@functools.partial(jax.jit,
                   static_argnums=(3, 4, 6, 7, 8, 10, 11, 12, 13, 14))
def render_gouraud_binned(verts, faces, vtx_colors, width: int, height: int,
                          mvp=None, tile_w: int = 128, tile_h: int = 16,
                          capacity: int = 64, bg=None, span_x: int = 8,
                          span_y: int = 8, batch_tiles: int = 128,
                          perspective_correct: bool = False,
                          near_clip: bool = False):
    """Binned Gouraud render.  ``perspective_correct`` interpolates vertex
    attributes hyperbolically (attr/w and 1/w planes, divided per pixel);
    screen-affine interpolation is the default, matching classic software
    rasterizers.  Depth is NDC z either way (z/w already interpolates
    linearly in screen space).  ``near_clip`` cuts triangles crossing the
    near plane into sub-triangles (default culls them whole, doubling
    triangle slots when on)."""
    dtype = verts.dtype
    if mvp is None:
        mvp = jnp.eye(4, dtype=dtype)
    if bg is None:
        bg = jnp.zeros(4, dtype)
    attrs = vtx_colors[faces]
    if near_clip:
        tri, attrs = setup_triangles_clipped(verts, faces, mvp, attrs,
                                             width, height)
    else:
        tri = setup_triangles(verts, faces, mvp, width, height)
    A, B, C, inv_area, sign, valid = edge_coeffs(tri["sxy"], tri["z"],
                                                 tri["valid"])
    zsc = tri["z"] * inv_area[:, None]
    bins, counts, overflow = bin_triangles(tri["sxy"], valid, width, height,
                                           tile_w, tile_h, capacity,
                                           span_x, span_y)
    bg_eff = bg
    if perspective_correct:
        iw = tri["inv_w"][..., None]                       # (F, 3, 1)
        attrs = jnp.concatenate([attrs * iw, iw], axis=-1)  # (F, 3, D+1)
        bg_eff = jnp.concatenate([bg, jnp.ones(1, dtype)])
    keys, rgba = raster_binned_fused(bins, A, B, C, zsc, inv_area, sign,
                                     valid, attrs, bg_eff, width, height,
                                     tile_w, tile_h, batch_tiles)
    if perspective_correct:
        denom = rgba[..., -1:]
        hit = keys != SKY_KEY
        rgba = jnp.where(hit[..., None],
                         rgba[..., :-1] / jnp.where(denom != 0.0, denom, 1.0),
                         rgba[..., :-1])
    zq = (keys >> IDX_BITS).astype(dtype) / Z_LEVELS
    return rgba, zq, overflow


@functools.partial(
    jax.jit,
    static_argnums=(3, 4, 6, 7, 8, 10, 11, 12, 13, 14, 15, 16, 17, 18,
                    19, 20, 21, 22, 23, 24, 25, 27))
def render_gouraud_pallas(verts, faces, vtx_colors, width: int, height: int,
                          mvp=None, tile_w: int = 128, tile_h: int = 16,
                          capacity: int = 512, bg=None, span_x: int = 8,
                          span_y: int = 8, interpret: bool = False,
                          kcc: int = 32, flat: bool = False,
                          near_clip: bool = False, u8: bool = False,
                          opaque: bool = False, z_clip: bool = True,
                          wide_split: bool = False,
                          resident_out: bool = False, mxu: int = 0,
                          mega: int = 0, wf: int = 0, out8: bool = False,
                          ktail: int = 0, pre=None, tiled: bool = False):
    """Binned Gouraud render through the fused Pallas tile kernel (the TPU
    fast path; ``interpret=True`` runs the kernel interpreted for CPU
    tests).  Same outputs as render_gouraud_binned.

    ``flat=True`` skips materialising (NT, capacity) bins — the kernel
    consumes the sorted pair array directly (capacity then acts as the
    kernel's SMEM block size AND the per-tile run limit).  Saves the
    ~1.9 ms/frame windowed gather at 1080p/10k-tri.

    ``u8=True`` (requires ``flat``) is the video path: u8 quantisation
    fused into the kernel epilogue and no depth output — returns
    (rgba (H, W, 4) uint8, None, overflow).  Exactly
    clip(rgba_f32 * 255, 0, 255) truncated.

    ``mxu`` (flat+u8 only) switches the kernel's chunk walk to one
    MXU matmul over an affine-plane table (build_table_mxu): 1 =
    HIGHEST precision (+-1 u8 slips); 2 = DEFAULT single-pass bf16 —
    measurement-only, bf16 rounds the pixel coordinates themselves and
    distorts coverage by pixels at 1080p.

    ``pre``: optional ``(v4f, attrsf)`` from :func:`pregather_mesh` +
    ``vtx_colors[faces]`` — hoists the frame-invariant per-face gathers
    out of device frame loops (XLA re-runs them every iteration
    otherwise; ~0.07 ms/frame at 10k faces, exp_r4_champprof2).

    ``out8`` (u8+resident_out): kernel out shaped (NT, P/128, 128)
    sublane-major instead of (NT, 1, P) so the array is born in XLA's
    native T(8,128) layout — drops the post-kernel relayout copy before
    the detile (exp_r4_out8).  ``ktail`` (u8, non-mxu): walk each run's
    kcc-remainder in ktail-slot chunks instead of one padded kcc chunk
    (bit-exact; spilled slots can only lose ties).

    ``tiled`` (u8 only): skip the device detile entirely and return the
    per-tile (NT, P, 4) uint8 layout — the video-pipeline deliverable
    when the consumer detiles on host (VideoCap's encode worker via
    native MediaDetileU8, overlapped with encode; see
    detile_u8_host / viewport_mask for the layout contract)."""
    from . import pallas_raster
    if mxu:
        assert flat and u8, "mxu walk requires flat=True, u8=True"
    dtype = verts.dtype
    if mvp is None:
        mvp = jnp.eye(4, dtype=dtype)
    if bg is None:
        bg = jnp.zeros(4, dtype)
    if pre is not None:
        v4f, attrs = pre
    else:
        v4f, attrs = None, vtx_colors[faces]
    if near_clip:
        tri, attrs = setup_triangles_clipped(verts, faces, mvp, attrs,
                                             width, height, v4f=v4f)
    else:
        tri = setup_triangles(verts, faces, mvp, width, height, v4f=v4f)
    A, B, C, inv_area, sign, valid = edge_coeffs(tri["sxy"], tri["z"],
                                                 tri["valid"])
    zsc = tri["z"] * inv_area[:, None]
    if flat:
        sorted_pad, starts, counts, overflow = bin_triangles_flat(
            tri["sxy"], valid, width, height, tile_w, tile_h, capacity,
            span_x, span_y, edges=(A, B, C, sign),
            wide_split=wide_split)
        if not z_clip:
            # skipping the per-pixel z-range test is sound only when
            # every valid vertex z is in [0, 1] (interior zz is then a
            # convex combination); verify and fold into the overflow
            # flag so the bench ladder falls back to a z-clipped config
            z_ok = jnp.all(jnp.where(tri["valid"][:, None],
                                     (tri["z"] >= 0.0) & (tri["z"] <= 1.0),
                                     True))
            overflow = overflow | ~z_ok
        if mxu:
            # MXU chunk walk (pallas_raster._make_kernel_flat mxu):
            # affine-plane table, u8 video path only
            assert u8, "mxu walk is wired for the u8 video path"
            table = pallas_raster.build_table_mxu(A, B, C, zsc, inv_area,
                                                  sign, valid, attrs)
        else:
            table = pallas_raster.build_table(A, B, C, zsc, inv_area, sign,
                                              valid, attrs)
        if out8 or ktail:
            assert u8, "out8/ktail are wired for the u8 video path"
        if mega or wf:
            assert u8, "mega/wf loops are wired for the u8 video path"
            assert not (mega and wf), "mega and wf are exclusive"
            ntx = (width + tile_w - 1) // tile_w
            nty = (height + tile_h - 1) // tile_h
            mega = clamp_mega(mega, ntx * nty)
            wf = clamp_mega(wf, ntx * nty)
        if u8:
            if mega:
                overflow = overflow | mega_window_overflow(
                    starts, counts, capacity, mega)
            rgba8 = pallas_raster.render_binned_pallas_flat_u8(
                sorted_pad, starts, counts, table, bg, width, height,
                tile_w, tile_h, capacity, interpret, kcc, opaque, z_clip,
                resident_out, mxu, mega, wf, out8, ktail, tiled)
            return rgba8, None, overflow
        assert not tiled, "tiled output is wired for the u8 video path"
        keys, rgba = pallas_raster.render_binned_pallas_flat(
            sorted_pad, starts, counts, table, bg, width, height,
            tile_w, tile_h, capacity, interpret, kcc)
    else:
        assert not u8, "u8 output requires flat=True"
        bins, counts, overflow = bin_triangles(tri["sxy"], valid, width,
                                               height, tile_w, tile_h,
                                               capacity, span_x, span_y)
        keys, rgba = pallas_raster.render_binned_pallas(
            bins, counts, A, B, C, zsc, inv_area, sign, valid, attrs, bg,
            width, height, tile_w, tile_h, interpret, kcc=kcc)
    zq = (keys >> IDX_BITS).astype(dtype) / Z_LEVELS
    return rgba, zq, overflow


@functools.partial(
    jax.jit,
    static_argnums=(3, 4, 6, 7, 8, 10, 11, 12, 13, 14, 15, 16, 17, 18,
                    19, 20))
def render_gouraud_pallas_batch(verts, faces, vtx_colors, width: int,
                                height: int, mvps=None, tile_w: int = 128,
                                tile_h: int = 32, capacity: int = 512,
                                bg=None, span_x: int = 8, span_y: int = 4,
                                interpret: bool = False, flat: bool = False,
                                kcc: int = 32, u8: bool = False,
                                opaque: bool = False, z_clip: bool = True,
                                dynrows: int = 0, rows_cap: int = 0,
                                mxu: int = 0):
    """Batched Pallas render: B frames (mvps (B, 4, 4)) in one kernel
    launch.  Per-frame prep (projection, edge setup, binning, tables) is
    vmapped; tiles of all frames share one grid.  Amortises the
    per-dispatch overheads that cap single-frame throughput.  ``flat``
    uses the gatherless binning (see render_gouraud_pallas).

    ``dynrows=g`` (requires flat+u8+opaque) switches to the pair-ordered
    pre-gathered-rows kernel with g frames per program
    (pallas_raster.render_binned_dynrows_batch_u8): prep additionally
    gathers table rows into sorted pair order (``rows_cap`` rows per
    frame, default capacity-guarded 49152), and real pair counts beyond
    rows_cap - capacity raise the overflow flag so callers fall back.
    Bit-exact vs the flat kernel.
    Returns (rgba (B, H, W, 4), z (B, H, W), overflow)."""
    from . import pallas_raster
    if mxu:
        assert flat and u8 and not dynrows, \
            "mxu walk requires flat=True, u8=True"
    dtype = verts.dtype
    if bg is None:
        bg = jnp.zeros(4, dtype)
    F = faces.shape[0]
    attrs = vtx_colors[faces]

    if flat:
        def prep(mvp):
            tri = setup_triangles(verts, faces, mvp, width, height)
            A, B, C, ia, sg, vl = edge_coeffs(tri["sxy"], tri["z"],
                                              tri["valid"])
            zsc = tri["z"] * ia[:, None]
            sorted_pad, starts, counts, ovf = bin_triangles_flat(
                tri["sxy"], vl, width, height, tile_w, tile_h, capacity,
                span_x, span_y, edges=(A, B, C, sg))
            if not z_clip:
                # see render_gouraud_pallas: the skipped per-pixel
                # z-range test is sound only for in-frustum geometry
                z_ok = jnp.all(jnp.where(
                    tri["valid"][:, None],
                    (tri["z"] >= 0.0) & (tri["z"] <= 1.0), True))
                ovf = ovf | ~z_ok
            if mxu:
                table = pallas_raster.build_table_mxu(A, B, C, zsc, ia,
                                                      sg, vl, attrs)
            else:
                table = pallas_raster.build_table(A, B, C, zsc, ia, sg,
                                                  vl, attrs)
            if dynrows:
                cap = rows_cap or 49152
                rows = jnp.take(table, sorted_pad[:cap] & IDX_MASK,
                                axis=0)
                # real pairs end at the last tile's run end; the kernel
                # may walk up to `capacity` rows past a run start
                ovf = ovf | (starts[-1] + counts[-1] > cap - capacity)
                return rows, starts, counts, table, ovf
            return sorted_pad, starts, counts, table, ovf

        sps, starts, counts, tables, ovfs = jax.vmap(prep)(mvps)
        if dynrows:
            assert u8 and opaque and not z_clip, \
                "dynrows kernel is the opaque u8 video path"
            rgba8 = pallas_raster.render_binned_dynrows_batch_u8(
                sps, starts, counts, bg, width, height, tile_w, tile_h,
                dynrows, kcc, interpret)
            return rgba8, None, jnp.any(ovfs)
        if u8:
            rgba8 = pallas_raster.render_binned_pallas_flat_batch_u8(
                sps, starts, counts, tables, bg, width, height, tile_w,
                tile_h, capacity, interpret, kcc, opaque, z_clip, mxu)
            return rgba8, None, jnp.any(ovfs)
        keys, rgba = pallas_raster.render_binned_pallas_flat_batch(
            sps, starts, counts, tables, bg, width, height, tile_w,
            tile_h, capacity, interpret, kcc)
        zq = (keys >> IDX_BITS).astype(dtype) / Z_LEVELS
        return rgba, zq, jnp.any(ovfs)

    assert not u8, "u8 output requires flat=True"

    def prep(mvp):
        tri = setup_triangles(verts, faces, mvp, width, height)
        A, B, C, ia, sg, vl = edge_coeffs(tri["sxy"], tri["z"],
                                          tri["valid"])
        zsc = tri["z"] * ia[:, None]
        bins, counts, ovf = bin_triangles(tri["sxy"], vl, width, height,
                                          tile_w, tile_h, capacity,
                                          span_x, span_y)
        table = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl, attrs)
        safe = jnp.where(bins == NO_TRI, F, bins)
        return safe, counts, table, ovf

    safes, counts, tables, ovfs = jax.vmap(prep)(mvps)
    keys, rgba = pallas_raster.render_binned_pallas_batch(
        safes, counts, tables, bg, width, height, tile_w, tile_h,
        interpret)
    zq = (keys >> IDX_BITS).astype(dtype) / Z_LEVELS
    return rgba, zq, jnp.any(ovfs)


@functools.partial(
    jax.jit,
    static_argnums=(3, 4, 6, 7, 8, 10, 11, 12, 13, 14, 15, 16, 17, 18,
                    19, 20))
def render_gouraud_pallas_loop(verts, faces, vtx_colors, width: int,
                               height: int, mvps=None, tile_w: int = 32,
                               tile_h: int = 32, capacity: int = 1024,
                               bg=None, span_x: int = 5, span_y: int = 3,
                               interpret: bool = False, kcc: int = 32,
                               opaque: bool = True, z_clip: bool = False,
                               resident_out: bool = True, mega: int = 8,
                               out8: bool = True, ktail: int = 0,
                               tiled: bool = False):
    """Fused-loop u8 video render: B frames (mvps (B, 4, 4)) in ONE
    jitted program — single-frame prep + champion flat kernel inside a
    device fori_loop, frame-invariant gathers hoisted via
    :func:`pregather_mesh` (XLA re-gathers inside loop bodies otherwise;
    exp_r4_champprof2).  This is the production mesh->video frame
    producer (pipeline.MeshVideoPipeline): unlike the bench's
    checksum-reducing loop it RETURNS the frames, and with ``tiled=True``
    they stay in the kernel's per-tile (NT, P, 4) layout so the detile
    runs in the VideoCap encode worker instead of on device
    (video.py put_frame_tiled_u8; ~0.065 ms/frame, exp_r4_champprof3).

    Defaults are the round-4 champion race winner ((32, 32) span (5, 3)
    kcc32 mega8 out8 resident_out, z_clip=False with the z-range check
    folded into the overflow flag).  Returns
    (frames (B, H, W, 4) u8 — or (B, NT, P, 4) when tiled — , overflow).
    Bit-identical per frame to render_gouraud_pallas with the same
    config (asserted in tests/test_pipeline.py)."""
    dtype = verts.dtype
    if bg is None:
        bg = jnp.zeros(4, dtype)
    Bn = mvps.shape[0]
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    if mega:
        mega = clamp_mega(mega, ntx * nty)
    pre = (pregather_mesh(verts, faces), vtx_colors[faces])

    def body(i, carry):
        acc, ovfa = carry
        out, _, ovf = render_gouraud_pallas.__wrapped__(
            verts, faces, vtx_colors, width, height, mvps[i],
            tile_w=tile_w, tile_h=tile_h, capacity=capacity, bg=bg,
            span_x=span_x, span_y=span_y, interpret=interpret, kcc=kcc,
            flat=True, u8=True, opaque=opaque, z_clip=z_clip,
            resident_out=resident_out, mega=mega, out8=out8,
            ktail=ktail, pre=pre, tiled=tiled)
        acc = lax.dynamic_update_slice(acc, out[None],
                                       (i,) + (0,) * out.ndim)
        return acc, ovfa | ovf

    if tiled:
        acc0 = jnp.zeros((Bn, ntx * nty, tile_h * tile_w, 4), jnp.uint8)
    else:
        acc0 = jnp.zeros((Bn, height, width, 4), jnp.uint8)
    return lax.fori_loop(0, Bn, body, (acc0, jnp.asarray(False)))


@functools.partial(
    jax.jit, static_argnums=(4, 5, 7, 8, 9, 11, 12, 13, 14, 15))
def render_textured_pallas(verts, faces, uvs, tex, width: int, height: int,
                           mvp=None, tile_w: int = 128, tile_h: int = 8,
                           capacity: int = 512, bg=None, span_x: int = 2,
                           span_y: int = 10, interpret: bool = False,
                           kcc: int = 16,
                           perspective_correct: bool = True):
    """Textured deferred render through the fused Pallas tile kernel.

    UVs ride the kernel as the 4 interpolated attributes
    [u*w^-1, v*w^-1, w^-1, 1] (affine: [u, v, 1, 1]); the winner's (u, v)
    then drives one nearest texel fetch per pixel.  The XLA fused pass
    (render_textured_binned) measures ~65 ms/frame at 1080p/10k-tri;
    this path does the visibility+interpolation in the same ~2.5 ms as
    the Gouraud kernel, leaving only the ~4 ms per-pixel gather
    (tools/exp_textured.py).  Same sampling semantics as
    render_textured_binned (clamped nearest, cpp:560-573 quirk family).
    Returns (rgba (H, W, 4), z (H, W), overflow)."""
    from . import pallas_raster
    dtype = verts.dtype
    if mvp is None:
        mvp = jnp.eye(4, dtype=dtype)
    if bg is None:
        bg = jnp.zeros(4, dtype)
    tri = setup_triangles(verts, faces, mvp, width, height)
    A, B, C, inv_area, sign, valid = edge_coeffs(tri["sxy"], tri["z"],
                                                 tri["valid"])
    zsc = tri["z"] * inv_area[:, None]
    sorted_pad, starts, counts, overflow = bin_triangles_flat(
        tri["sxy"], valid, width, height, tile_w, tile_h, capacity,
        span_x, span_y, edges=(A, B, C, sign))
    fuv = uvs[faces]                                       # (F, 3, 2)
    if perspective_correct:
        iw = tri["inv_w"][..., None]
        attrs = jnp.concatenate(
            [fuv * iw, iw, jnp.ones_like(iw)], axis=-1)    # (F, 3, 4)
    else:
        attrs = jnp.concatenate(
            [fuv, jnp.ones_like(fuv)], axis=-1)            # (F, 3, 4)
    table = pallas_raster.build_table(A, B, C, zsc, inv_area, sign,
                                      valid, attrs)
    keys, uvq = pallas_raster.render_binned_pallas_flat(
        sorted_pad, starts, counts, table, jnp.zeros(4, dtype), width,
        height, tile_w, tile_h, capacity, interpret, kcc)
    hit = keys != SKY_KEY
    if perspective_correct:
        denom = uvq[..., 2:3]
        uv = uvq[..., :2] / jnp.where(denom != 0.0, denom, 1.0)
    else:
        uv = uvq[..., :2]
    th_t, tw_t = tex.shape[0], tex.shape[1]
    ui = jnp.clip((uv[..., 0] * tw_t).astype(jnp.int32), 0, tw_t - 1)
    vi = jnp.clip((uv[..., 1] * th_t).astype(jnp.int32), 0, th_t - 1)
    texel = jnp.take(tex.reshape(-1, 4), vi * tw_t + ui, axis=0)
    rgba = jnp.where(hit[..., None], texel.astype(dtype),
                     jnp.asarray(bg, dtype)[None, None, :])
    zq = (keys >> IDX_BITS).astype(dtype) / Z_LEVELS
    return rgba, zq, overflow


def pack_texture_u8(tex_u8):
    """(th, tw, 4) uint8 texture -> (th*tw,) i32 packed texels (LE: r in
    the low byte), the gather-side counterpart of the kernel's texel
    index plane."""
    assert tex_u8.dtype == jnp.uint8 and tex_u8.shape[-1] == 4
    return lax.bitcast_convert_type(tex_u8, jnp.int32).reshape(-1)


def _tex_prep(verts, faces, fuv_all, mvp, width, height, tile_w, tile_h,
              capacity, span_x, span_y, perspective_correct, mxu,
              v4f=None, z_clip=True):
    """Per-frame prep for the tex_resolve kernels: projection, edges,
    gatherless binning, UVW attribute table.  Shared by the vmap-batched
    and fused-loop entries (identical ops -> identical bits).  ``v4f``
    hoists the per-face vertex gather out of frame loops (see
    :func:`pregather_mesh`); both entries pass it so their per-frame ops
    stay identical."""
    from . import pallas_raster
    tri = setup_triangles(verts, faces, mvp, width, height, v4f=v4f)
    A, B, C, ia, sg, vl = edge_coeffs(tri["sxy"], tri["z"],
                                      tri["valid"])
    zsc = tri["z"] * ia[:, None]
    sorted_pad, starts, counts, ovf = bin_triangles_flat(
        tri["sxy"], vl, width, height, tile_w, tile_h, capacity,
        span_x, span_y, edges=(A, B, C, sg))
    if not z_clip:
        # same caller-verified contract as render_gouraud_pallas: the
        # per-pixel z-range test may be skipped only when every valid
        # vertex z is in [0, 1]; verified here and folded into the
        # overflow flag so callers fall back to a z-clipped config
        z_ok = jnp.all(jnp.where(tri["valid"][:, None],
                                 (tri["z"] >= 0.0) & (tri["z"] <= 1.0),
                                 True))
        ovf = ovf | ~z_ok
    if perspective_correct:
        iw = tri["inv_w"][..., None]
        attrs = jnp.concatenate(
            [fuv_all * iw, iw, jnp.ones_like(iw)], axis=-1)
    else:
        attrs = jnp.concatenate(
            [fuv_all, jnp.ones_like(fuv_all)], axis=-1)
    if mxu:
        # affine UVW planes: same MXU chunk walk as the color path
        # (u/v planes precombine per-edge weights -> texel index
        # can flip to the neighbouring texel at UV knife edges)
        table = pallas_raster.build_table_mxu(A, B, C, zsc, ia, sg,
                                              vl, attrs)
    else:
        table = pallas_raster.build_table(A, B, C, zsc, ia, sg, vl,
                                          attrs)
    return sorted_pad, starts, counts, table, ovf


def _tex_resolve_finish(pk, fb, tex_l, th_t, tw_t, bpr, fb_tile_cap,
                        ntx, nty, tile_h, tile_w, height, width,
                        fb_subrow=True, tiled=False):
    """Fallback + detile epilogue shared by the tex_resolve entries:
    finish footprint-missed pixels with a compacted gather ladder and
    detile the packed planes to (B, H, W, 4) uint8.  ``fb_subrow``
    compacts at 128-pixel SUB-ROW granularity instead of whole
    (tile_h*tile_w)-pixel tiles: misses cluster in a few pixel rows of
    each bad tile, so the compacted gather volume drops ~3x for the
    same coverage (value-identical — the same texels are fetched).
    ``tiled=True`` skips the device detile and returns (B, NT, P, 4)
    uint8 in the kernel's per-tile layout (same viewport_mask /
    detile_u8_host contract as the flat path's tiled output — the
    VideoCap encode worker detiles on host)."""
    from . import pallas_raster
    Bn, nt, P = pk.shape
    gran = 128 if fb_subrow else P
    units = (Bn * nt * P) // gran
    upt = P // gran                     # units per tile
    pk2 = pk.reshape(units, gran)
    fb2 = fb.reshape(units, gran)

    # fallback texel table: f32 4-wide rows gather >4x faster than flat
    # i32 element gathers on this backend (tools/exp_tex_idx.py); only
    # column 0 carries data (the packed texel, bitcast)
    tex_rows = jnp.zeros((th_t * bpr * 128, 4), jnp.float32)
    tex_rows = tex_rows.at[:, 0].set(
        lax.bitcast_convert_type(tex_l.reshape(-1), jnp.float32))

    def gather_rows(idx_plane):
        g = jnp.take(tex_rows, jnp.maximum(idx_plane, 0).reshape(-1),
                     axis=0)[:, 0]
        return lax.bitcast_convert_type(g.reshape(idx_plane.shape),
                                        jnp.int32)

    # tile-compacted fallback: see render_textured_pallas_batch's doc.
    # GEOMETRIC tier ladder: each compacted branch gathers its STATIC
    # cap's worth of rows (csize * P) whatever n_bad is — the old
    # 16/128/cap ladder paid the 128 tier's whole 0.70 ms/frame for the
    # bench's ~20-60 missed tiles (exp_r4_texprof2: the cond + its
    # gather/bitcast were 2nd only to the kernel).  Power-of-two tiers
    # bound the overshoot at 2x the demand.
    tile_bad = jnp.any(fb2 >= 0, axis=1)               # (units,)
    n_bad = jnp.sum(tile_bad)
    # fb_tile_cap is in TILE units; the sub-row ladder scales it (and
    # the geometric tiers) by units-per-tile so the same tile coverage
    # stays reachable before the whole-plane escape
    cap = min(fb_tile_cap * upt, units)
    ladder = [c * upt for c in (16, 32, 64, 128, 256, 512)]
    caps = [c for c in ladder if c < cap] + [cap]
    tids = jnp.nonzero(tile_bad, size=cap, fill_value=0)[0]

    def compacted_k(csize):
        def br(_):
            sel = tids[:csize]
            sel_fb = jnp.take(fb2, sel, axis=0)        # (csize, gran)
            gi = gather_rows(sel_fb)
            merged = jnp.where(sel_fb >= 0, gi,
                               jnp.take(pk2, sel, axis=0))
            # duplicate fill ids all write tile sel[k]'s own merged
            # row, so .at[].set collisions are value-identical
            return pk2.at[sel].set(merged)
        return br

    def full(_):
        return jnp.where(fb2 >= 0, gather_rows(fb2), pk2)

    tier = (n_bad > 0).astype(jnp.int32)
    for c in caps:
        tier = tier + (n_bad > c).astype(jnp.int32)
    final = lax.switch(
        tier,
        [lambda _: pk2] + [compacted_k(c) for c in caps] + [full],
        None)

    if tiled:
        return lax.bitcast_convert_type(final.reshape(Bn, nt, P),
                                        jnp.uint8)     # (B, NT, P, 4)

    def det(p):
        return pallas_raster._detile_plane(p, nty, ntx, tile_h, tile_w,
                                           height, width)

    final = jax.vmap(det)(final.reshape(Bn, nt, P))
    return lax.bitcast_convert_type(final, jnp.uint8)  # (B, H, W, 4)


@functools.partial(
    jax.jit,
    static_argnums=(4, 5, 7, 8, 9, 11, 12, 13, 14, 15, 16, 17, 18, 19,
                    20, 21, 22, 23, 24, 25, 26, 27, 28))
def render_textured_pallas_batch(verts, faces, uvs, tex_u8, width: int,
                                 height: int, mvps=None,
                                 tile_w: int = 32, tile_h: int = 32,
                                 capacity: int = 512, bg=None,
                                 span_x: int = 5, span_y: int = 3,
                                 interpret: bool = False, kcc: int = 16,
                                 perspective_correct: bool = True,
                                 tex_nw: int = 16,
                                 fb_tile_cap: int = 1024, mxu: int = 0,
                                 tex_split: bool = True, mega: int = 0,
                                 tex_dyn: bool = False,
                                 out8: bool = False, ktail: int = 0,
                                 tex_when: int = 0, z_clip: bool = True,
                                 tex_skip: bool = True,
                                 fb_subrow: bool = True,
                                 tiled: bool = False):
    """Batched u8-texture render: B frames (mvps (B, 4, 4)) in one
    launch.  The tile kernel fetches texels IN-KERNEL from the
    VMEM-resident packed texture through per-tile UV-footprint windows
    (pallas_raster tex_resolve mode) — every XLA per-pixel gather
    formulation measured per-row bound at ~4-19 ms/frame at 1080p
    (tools/exp_tex_idx.py), so the fetch had to move into the kernel.
    Pixels the footprint misses (high UV-frequency tiles) fall back to
    one XLA gather pass guarded by lax.cond on whether any exist.  Sky
    pixels take the u8-quantised bg.  Sampling semantics: clamped
    nearest (reference DrawTexture inverse-UV family, cpp:754-777).

    Default tiles are (32, 32) with ``tex_nw=16`` windows, unlike the
    color path's historical (128, 8): the footprint windows are
    texture-row aligned, so a wide pixel tile whose screen-x maps to
    texture-v (any rotated mesh) needs the footprint to span many
    texture rows — measured 20.6% unresolved on the rotating bench mesh
    with (128, 8) tiles + 8 windows vs 6.4% at (64, 16) + 16
    (tools/exp_tex_resolve.py, exp_fp_hist.py).  The round-3 ladder
    picked (64, 32) span (3, 4) = 3.29 ms/frame (tools/
    exp_r3_texladder.py); once the geometric fallback tiers made misses
    cheap, (32, 32) span (5, 3) re-measured FASTER — 2.960 vs 3.057
    ms/frame (tools/exp_r4_tex3232.py, 2026-08-19), checksums
    bit-identical across tile configs.  The remaining misses cluster in a few
    steep-UV-gradient tiles, so the fallback gathers ONLY those tiles
    (``fb_tile_cap`` static compaction via nonzero(size=...), ~2 ns/row
    -> ~0.2 ms/frame) unless they exceed the cap (whole-plane gather).
    Returns (rgba (B, H, W, 4) uint8, overflow)."""
    from . import pallas_raster
    if bg is None:
        bg = jnp.zeros(4, jnp.float32)
    th_t, tw_t = int(tex_u8.shape[0]), int(tex_u8.shape[1])
    fuv_all = uvs[faces]                                   # (F, 3, 2)
    v4f = pregather_mesh(verts, faces)

    def prep(mvp):
        return _tex_prep(verts, faces, fuv_all, mvp, width, height,
                         tile_w, tile_h, capacity, span_x, span_y,
                         perspective_correct, mxu, v4f=v4f, z_clip=z_clip)

    sps, starts, counts, tables, ovfs = jax.vmap(prep)(mvps)
    if mega:
        ntx = (width + tile_w - 1) // tile_w
        nty = (height + tile_h - 1) // tile_h
        mega = clamp_mega(mega, ntx * nty)
    if mega:
        ovfs = ovfs | jax.vmap(
            lambda s, c: mega_window_overflow(s, c, capacity, mega)
        )(starts, counts)
    bpr = (tw_t + 127) // 128
    packed_tex = pack_texture_u8(tex_u8).reshape(th_t, tw_t)
    tex_pad = jnp.pad(packed_tex, ((0, 0), (0, bpr * 128 - tw_t)))
    tex_l = tex_pad.reshape(th_t * bpr, 128)
    pk, fb = pallas_raster.render_binned_tex_resolve_batch(
        sps, starts, counts, tables, tex_l, bg, width, height, tile_w,
        tile_h, capacity, (th_t, tw_t), interpret, kcc, tex_nw,
        detile=False, mxu=mxu, tex_split=tex_split,
        mega=mega, tex_dyn=tex_dyn, out8=out8,
        ktail=ktail, tex_when=tex_when,
        z_clip=z_clip, tex_skip=tex_skip)             # (B, NT, P) each
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    rgba = _tex_resolve_finish(pk, fb, tex_l, th_t, tw_t, bpr,
                               fb_tile_cap, ntx, nty, tile_h, tile_w,
                               height, width, fb_subrow=fb_subrow,
                               tiled=tiled)
    return rgba, jnp.any(ovfs)


@functools.partial(
    jax.jit,
    static_argnums=(4, 5, 7, 8, 9, 11, 12, 13, 14, 15, 16, 17, 18, 19,
                    20, 21, 22, 23, 24, 25, 26, 27))
def render_textured_pallas_loop(verts, faces, uvs, tex_u8, width: int,
                                height: int, mvps=None,
                                tile_w: int = 32, tile_h: int = 32,
                                capacity: int = 1024, bg=None,
                                span_x: int = 5, span_y: int = 3,
                                interpret: bool = False, kcc: int = 32,
                                perspective_correct: bool = True,
                                tex_nw: int = 14,
                                fb_tile_cap: int = 1024,
                                tex_split: bool = True,
                                tex_dyn: bool = False,
                                out8: bool = True, ktail: int = 0,
                                tex_when: int = 0, mega: int = 8,
                                z_clip: bool = True,
                                tex_skip: bool = True,
                                fb_subrow: bool = True,
                                tiled: bool = False):
    """Fused-loop textured render: B frames in ONE jitted program, a
    device-side fori_loop running SINGLE-frame prep + tex_resolve kernel
    + fallback per iteration.  The flat color path measured the vmapped
    batch prep ~0.4 ms/frame slower than per-frame prep inside a fori
    (layout/copy overhead the single-frame prep fuses away — bench.py
    ladder note); this entry gives the textured path the same structure.
    Output bit-identical to render_textured_pallas_batch (same per-frame
    ops; asserted in tests/test_textured_raster.py).

    Defaults carry the session-F device races (exp_r4_texfinal /
    exp_r4f_texskip, 2026-08-19, checksums identical across configs):
    out8 + kcc=32 + tex_nw=14 took the kcc16/nw16/from_sub control
    2.941 -> 2.824 ms/frame at the (32, 32) span (5, 3) champion
    tiles, and tex_skip (+fb_subrow) took it to **2.180** — the
    empty-tile epilogue shortcut alone is worth 0.66 ms/frame (about
    half the tiles are sky on the bench mesh and each was paying the
    full footprint resolve).  nw14 trades a few more footprint misses
    to the geometric fallback tiers for two fewer window walks;
    bit-exactness is structural (the fallback fetches the same texel).
    mega=8 with capacity=1024 is a further bit-exact ~0.12 ms
    (exp_r4f_texmega3; bench race 2026-08-20: mega8 2.09 vs 2.20
    control) — DEFAULT since session H.  mega needs capacity >= 1024
    (the 2*Kb id window overflows at 512 on dense meshes — texmega2
    lesson); the defaults move together, and mega_window_overflow
    still feeds the fallback for pathological tiles."""
    from . import pallas_raster
    if bg is None:
        bg = jnp.zeros(4, jnp.float32)
    th_t, tw_t = int(tex_u8.shape[0]), int(tex_u8.shape[1])
    fuv_all = uvs[faces]                                   # (F, 3, 2)
    v4f = pregather_mesh(verts, faces)
    bpr = (tw_t + 127) // 128
    packed_tex = pack_texture_u8(tex_u8).reshape(th_t, tw_t)
    tex_pad = jnp.pad(packed_tex, ((0, 0), (0, bpr * 128 - tw_t)))
    tex_l = tex_pad.reshape(th_t * bpr, 128)
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    Bn = mvps.shape[0]
    if mega:
        mega = clamp_mega(mega, ntx * nty)

    def body(i, carry):
        acc, ovfa = carry
        sp, st, cn, tb, ovf = _tex_prep(
            verts, faces, fuv_all, mvps[i], width, height, tile_w,
            tile_h, capacity, span_x, span_y, perspective_correct, 0,
            v4f=v4f, z_clip=z_clip)
        if mega:
            ovf = ovf | mega_window_overflow(st, cn, capacity, mega)
        pk, fbm = pallas_raster.render_binned_tex_resolve_batch(
            sp[None], st[None], cn[None], tb[None], tex_l, bg, width,
            height, tile_w, tile_h, capacity, (th_t, tw_t), interpret,
            kcc, tex_nw, detile=False, mxu=0, tex_split=tex_split,
            mega=mega, tex_dyn=tex_dyn, out8=out8, ktail=ktail,
            tex_when=tex_when, z_clip=z_clip, tex_skip=tex_skip)
        rgba = _tex_resolve_finish(pk, fbm, tex_l, th_t, tw_t, bpr,
                                   fb_tile_cap, ntx, nty, tile_h,
                                   tile_w, height, width,
                                   fb_subrow=fb_subrow, tiled=tiled)
        acc = lax.dynamic_update_slice(acc, rgba, (i, 0, 0, 0))
        return acc, ovfa | ovf

    if tiled:
        acc0 = jnp.zeros((Bn, ntx * nty, tile_h * tile_w, 4), jnp.uint8)
    else:
        acc0 = jnp.zeros((Bn, height, width, 4), jnp.uint8)
    acc, ovf = lax.fori_loop(0, Bn, body,
                             (acc0, jnp.asarray(False)))
    return acc, ovf


@functools.partial(jax.jit,
                   static_argnums=(4, 5, 7, 8, 9, 11, 12, 13, 14))
def render_textured_binned(verts, faces, uvs, tex, width: int, height: int,
                           mvp=None, tile_w: int = 128, tile_h: int = 16,
                           capacity: int = 64, bg=None, span_x: int = 8,
                           span_y: int = 8, batch_tiles: int = 128,
                           perspective_correct: bool = True):
    """Binned z-buffered render with per-pixel texture sampling.

    UVs ride the fused pass as interpolated attributes; the winner's (u, v)
    then drives ONE nearest-neighbour texel fetch per pixel from ``tex``
    (th_t, tw_t, 4).  That final fetch is a per-pixel gather — TPU random
    gathers run ~7-9 GB/s, so this path costs ~5-15 ms/frame at 1080p on
    top of the Gouraud pipeline; see ROADMAP.md for the planned
    footprint-bounded kernel variant.
    """
    dtype = verts.dtype
    if mvp is None:
        mvp = jnp.eye(4, dtype=dtype)
    if bg is None:
        bg = jnp.zeros(4, dtype)
    tri = setup_triangles(verts, faces, mvp, width, height)
    A, B, C, inv_area, sign, valid = edge_coeffs(tri["sxy"], tri["z"],
                                                 tri["valid"])
    zsc = tri["z"] * inv_area[:, None]
    bins, counts, overflow = bin_triangles(tri["sxy"], valid, width, height,
                                           tile_w, tile_h, capacity,
                                           span_x, span_y)
    attrs = uvs[faces]                                     # (F, 3, 2)
    if perspective_correct:
        iw = tri["inv_w"][..., None]
        attrs = jnp.concatenate([attrs * iw, iw], axis=-1)  # (F, 3, 3)
        bg_eff = jnp.zeros(3, dtype)
    else:
        bg_eff = jnp.zeros(2, dtype)
    keys, uvq = raster_binned_fused(bins, A, B, C, zsc, inv_area, sign,
                                    valid, attrs, bg_eff, width, height,
                                    tile_w, tile_h, batch_tiles)
    hit = keys != SKY_KEY
    if perspective_correct:
        denom = uvq[..., 2:3]
        uvq = uvq[..., :2] / jnp.where(denom != 0.0, denom, 1.0)
    th_t, tw_t = tex.shape[0], tex.shape[1]
    ui = jnp.clip((uvq[..., 0] * tw_t).astype(jnp.int32), 0, tw_t - 1)
    vi = jnp.clip((uvq[..., 1] * th_t).astype(jnp.int32), 0, th_t - 1)
    texel = jnp.take(tex.reshape(-1, 4), vi * tw_t + ui, axis=0)
    rgba = jnp.where(hit[..., None], texel, bg[None, None, :])
    zq = (keys >> IDX_BITS).astype(dtype) / Z_LEVELS
    return rgba, zq, overflow


# ---------------------------------------------------------------------------
# Alpha-blended pass (BASELINE config 2: textured quads, blend + z-test)
# ---------------------------------------------------------------------------

def render_blended(verts, faces, uvs, tex, width: int, height: int,
                   mvp=None, opaque_depth=None, bg=None):
    """Painter's-order alpha blending with z-test against opaque depth.

    Triangles are drawn in face order (callers sort back-to-front); each
    triangle samples ``tex`` (Th, Tw, 4) by barycentric UV (nearest) and
    src-over blends where it passes the z-test.  Scan over triangles — this
    path is for quad batches (small F), not meshes.
    """
    dtype = verts.dtype
    H, W = height, width
    if mvp is None:
        mvp = jnp.eye(4, dtype=dtype)
    if bg is None:
        bg = jnp.zeros(4, dtype)
    tri = setup_triangles(verts, faces, mvp, width, height)
    A, B, C, inv_area, sign, valid = edge_coeffs(tri["sxy"], tri["z"],
                                                 tri["valid"])
    if opaque_depth is None:
        opaque_depth = jnp.ones((H, W), dtype)
    fuv = uvs[faces]  # (F, 3, 2)

    X = lax.broadcasted_iota(dtype, (H, W), 1)
    Y = lax.broadcasted_iota(dtype, (H, W), 0)
    fb0 = jnp.broadcast_to(bg, (H, W, 4)).astype(dtype)
    th, tw = tex.shape[0], tex.shape[1]
    tex_flat = tex.reshape(-1, 4)

    def step(fb, xs):
        a, b, c, ia, sg, vl, z3, uv3 = xs
        e = (a[:, None, None] * X[None] + b[:, None, None] * Y[None]
             + c[:, None, None])                       # (3, H, W)
        wgt = e * ia                                   # barycentric
        z = jnp.einsum("thw,t->hw", wgt, z3)
        covered = jnp.all(e * sg >= 0.0, axis=0) & vl
        covered &= (z >= 0.0) & (z <= opaque_depth)
        u = jnp.einsum("thw,t->hw", wgt, uv3[:, 0])
        v = jnp.einsum("thw,t->hw", wgt, uv3[:, 1])
        ui = jnp.clip((u * tw).astype(jnp.int32), 0, tw - 1)
        vi = jnp.clip((v * th).astype(jnp.int32), 0, th - 1)
        texel = jnp.take(tex_flat, vi * tw + ui, axis=0)  # (H, W, 4)
        alpha = texel[..., 3:4]
        blended = fb[..., :3] * (1 - alpha) + texel[..., :3] * alpha
        new = jnp.concatenate([blended, jnp.maximum(fb[..., 3:], alpha)], -1)
        return jnp.where(covered[..., None], new, fb), None

    fb, _ = lax.scan(step, fb0, (A, B, C, inv_area, sign, valid,
                                 tri["z"], fuv))
    return fb
