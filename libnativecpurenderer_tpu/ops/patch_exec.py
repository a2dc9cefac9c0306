"""Patch-bounded display-list executor (the fast canvas path).

The round-1 executor paid ~0.7 ms/command at 1080p: ``lax.cond`` around the
framebuffer rewrite defeats XLA's in-place aliasing of the 33 MB scan carry
(ROADMAP).  Measured on v5e (tools/exp_patch_scan.py, exp_patch_prod.py):
a loop whose fb path is an *unconditional* ``dynamic_slice -> blend ->
dynamic_update_slice`` chain aliases in place at ~43 us/command, with any
``lax.switch`` confined to PATCH-sized values.  This module is that
production executor:

* one loop step per command; the fb update is always slice/blend/update of
  a (P, P) window at the command's AABB — commands routed here by
  ``context.flush`` are guaranteed to fit P;
* texture sampling never gathers from (or even touches) the full atlas
  inside a branch: the loop body unconditionally ``dynamic_slice``s the
  command's (R, R, 4) texel region — contiguous HBM read, host-verified to
  cover the command's footprint — and the branches sample that small
  region either by one-hot MXU matmuls (separable = axis-aligned mappings;
  exact under Precision.HIGHEST) or by a region-confined gather (rotated
  transforms).  Keeping the atlas out of the conditional branches matters:
  an atlas-sized ``dynamic_slice`` inside ``lax.switch`` made XLA copy the
  whole atlas every iteration (measured: 3.3 ms/command with a 64 MB
  atlas, scaling linearly with atlas size — tools/exp_bisect_bench.py);
* the command count is a *dynamic* scalar driving ``lax.fori_loop``, so one
  compilation per (fb shape, P, R) serves every display-list length with
  zero padding cost.

Commands whose texel footprint exceeds R (or whose AABB exceeds the
largest patch) run on the round-1 full-frame scan instead
(``plan_segments`` routes them to a "full" segment).

Semantics are identical to ops/executor.py (same branch math, same blend,
same reference quirks — cpp:515-549, 555-573, 720-948); the golden suite
runs both paths and compares bit-for-bit
(tests/test_fuzz_canvas.py::test_fuzz_segmented_vs_scan).
"""

from __future__ import annotations

import collections
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import canvas_kernel
from . import commands as C
from . import executor
from .. import config
from . import noise
from ..fastrec import mod as _fast_loaded

_fast = (_fast_loaded
         if _fast_loaded is not None
         and hasattr(_fast_loaded, "routes_for_size") else None)

# sampling routes (host-computed in context.flush / plan_segments)
ROUTE_MXU = 0       # separable mapping, footprint fits R
ROUTE_REGION = 1    # non-separable, footprint fits R
ROUTE_FULL = 2      # footprint exceeds R: full-frame scan segment

_SAMPLING_KINDS_T = (C.KIND_TEX, C.KIND_TEX_FAST, C.KIND_SPLIT_TEX,
                     C.KIND_HITEFFECT)
_SAMPLING_KINDS = frozenset(_SAMPLING_KINDS_T)
# kind-indexed membership LUT: np.isin costs ~50 us per call on the
# hot flush path (sorting machinery); kinds are small ints, so a table
# lookup does the same in ~2 us
_SAMPLING_LUT = np.zeros(C.N_KINDS + 8, np.bool_)
for _k in _SAMPLING_KINDS_T:
    _SAMPLING_LUT[_k] = True


def sel_for(kind: int, route) -> int:
    """Switch index for a command: arith kinds use the executor branch
    table directly; fitted sampling gets dedicated region branches."""
    if route is None:
        return kind
    assert route in (ROUTE_MXU, ROUTE_REGION), "ROUTE_FULL is not patchable"
    return C.N_KINDS + (kind - C.KIND_TEX) * 2 + route


_HIGH = jax.lax.Precision.HIGHEST


def _clamp_uv(u, size):
    """InterpolateColorFromBuffer clamp quirk (cpp:560-563): [0, size-2]."""
    u = jnp.where(u < 0.0, jnp.zeros_like(u), u)
    return jnp.where(u >= size - 1.0, size - 2.0, u)


def _kind_uv(p, kind, ix_raw, iy_raw, ivx, ivy):
    """Shared uv math for a sampling ``kind``: membership + clamped texel
    coords, given raw pixel coords and inverse-mapped coords (any shape).
    Mirrors ops/executor.py's branches exactly (snapped coords for both
    membership and uv — raw coords are not structure-stable, see
    executor._inv_point)."""
    if kind == C.KIND_TEX_FAST:
        ix, iy = ix_raw, iy_raw
        member = None  # all-true
    elif kind == C.KIND_HITEFFECT:
        fast = p[29] > 0.0
        ix = jnp.where(fast, ix_raw, ivx)
        iy = jnp.where(fast, iy_raw, ivy)
        member = fast | ((ix >= p[14]) & (ix <= p[16])
                         & (iy >= p[15]) & (iy <= p[17]))
    else:
        ix, iy = ivx, ivy
        member = ((ix >= p[14]) & (ix <= p[16])
                  & (iy >= p[15]) & (iy <= p[17]))
    u = (ix - p[14]) * p[18]
    v = (iy - p[15]) * p[19]
    if kind == C.KIND_SPLIT_TEX:
        tw, th = p[22], p[23]
        u = (p[24] + (p[25] - p[24]) * u / tw) * tw
        v = (p[26] + (p[27] - p[26]) * v / th) * th
    uc = _clamp_uv(u, p[22])
    vc = _clamp_uv(v, p[23])
    ui = uc.astype(jnp.int32) + p[20].astype(jnp.int32)
    vi = vc.astype(jnp.int32) + p[21].astype(jnp.int32)
    return ui, vi, uc, vc, member


def _corner_origin(p, kind, px0, py0, P, AH, AW, R, dtype):
    """(v0, u0) scalar region origin for one sampling kind: texel indices
    are affine in screen coords (then clamped monotonically), so the grid
    min is attained at the patch-window corners."""
    cx = px0.astype(dtype) + jnp.asarray([0.0, P - 1.0, 0.0, P - 1.0],
                                         dtype)
    cy = py0.astype(dtype) + jnp.asarray([0.0, 0.0, P - 1.0, P - 1.0],
                                         dtype)
    ivx = p[0] * cx + p[2] * cy + p[4]
    ivy = p[1] * cx + p[3] * cy + p[5]
    ui, vi, _, _, _ = _kind_uv(p, kind, cx, cy, ivx, ivy)
    u0 = jnp.clip(jnp.min(ui), 0, AW - R)
    v0 = jnp.clip(jnp.min(vi), 0, AH - R)
    return v0.astype(jnp.int32), u0.astype(jnp.int32)


def _build_region_branches(P, R, px0, py0, Xp, Yp, dtype):
    """The 8 fitted-sampling branches (4 kinds x {MXU, region-gather}).
    Operand = (p, region, u0, v0); the atlas itself is never touched here.
    """
    xs1 = px0.astype(dtype) + lax.broadcasted_iota(dtype, (P,), 0)
    ys1 = py0.astype(dtype) + lax.broadcasted_iota(dtype, (P,), 0)
    jR = jnp.arange(R, dtype=jnp.int32)
    t_false = jnp.array(False)

    def apply_ct(p, r, g, b, a):
        return r * p[10], g * p[11], b * p[12], a * p[13]

    def pack(r, g, b, a):
        bc = jnp.broadcast_to
        sh = (P, P)
        return jnp.stack(
            [bc(r, sh).astype(dtype), bc(g, sh).astype(dtype),
             bc(b, sh).astype(dtype), bc(a, sh).astype(dtype)], axis=-1)

    def aabb_1d(p):
        return ((xs1 >= p[6]) & (xs1 < p[7]),
                (ys1 >= p[8]) & (ys1 < p[9]))

    # ------------------------------------------------------------------ #
    # separable (axis-aligned) MXU path: 1-D per-axis texel indices,
    # one-hot selection matmuls — no gather at all
    # ------------------------------------------------------------------ #
    def mk_mxu(kind):
        def br(args):
            p, region, u0, v0 = args
            # bar + snap, matching the scan executor's _inv_point
            # (see its contraction note)
            ivx = executor._snap(lax.optimization_barrier(p[0] * xs1)
                                 + p[4])
            ivy = executor._snap(lax.optimization_barrier(p[3] * ys1)
                                 + p[5])
            ui, vi, uc, vc, _ = _kind_uv(p, kind, xs1, ys1, ivx, ivy)
            rsel = (vi[:, None] - v0 == jR[None, :]).astype(dtype)  # (P,R)
            csel = (jR[:, None] == ui[None, :] - u0).astype(dtype)  # (R,P)
            # one-hot selection rides the MXU; HIGHEST keeps f32 exact
            texel = jnp.einsum("pj,jic,iq->pqc", rsel,
                               region.astype(dtype), csel,
                               precision=_HIGH)
            if kind == C.KIND_HITEFFECT:
                tw, th = p[22], p[23]
                tx = jnp.floor(uc)[None, :]          # col-wise
                ty = jnp.floor(vc)[:, None]          # row-wise
                na = noise.hit_effect_alpha(ty / tw, tx / th, p[24], p[25])
                a = na * texel[..., 3]
                r, g, b, a = apply_ct(p, p[26], p[27], p[28], a)
            else:
                r, g, b, a = apply_ct(p, texel[..., 0], texel[..., 1],
                                      texel[..., 2], texel[..., 3])
            acol, arow = aabb_1d(p)
            mask = _sep_mask(p, kind, ivx, ivy, acol, arow)
            return mask, pack(r, g, b, a), t_false
        return br

    def _sep_mask(p, kind, ivx, ivy, acol, arow):
        if kind == C.KIND_TEX_FAST:
            mcol = jnp.ones((P,), bool)
            mrow = jnp.ones((P,), bool)
        elif kind == C.KIND_HITEFFECT:
            fast = p[29] > 0.0
            ix = jnp.where(fast, xs1, ivx)
            iy = jnp.where(fast, ys1, ivy)
            mcol = fast | ((ix >= p[14]) & (ix <= p[16]))
            mrow = fast | ((iy >= p[15]) & (iy <= p[17]))
        else:
            mcol = (ivx >= p[14]) & (ivx <= p[16])
            mrow = (ivy >= p[15]) & (ivy <= p[17])
        return (mrow & arow)[:, None] & (mcol & acol)[None, :]

    # ------------------------------------------------------------------ #
    # non-separable region-gather path: full 2-D inverse mapping, gather
    # confined to the (R, R) region
    # ------------------------------------------------------------------ #
    def mk_region(kind):
        def br(args):
            p, region, u0, v0 = args
            bar = lax.optimization_barrier
            ivx = executor._snap(bar(p[0] * Xp) + bar(p[2] * Yp) + p[4])
            ivy = executor._snap(bar(p[1] * Xp) + bar(p[3] * Yp) + p[5])
            ui, vi, uc, vc, member = _kind_uv(p, kind, Xp, Yp, ivx, ivy)
            flat = (vi - v0) * R + (ui - u0)
            texel = jnp.take(region.reshape(-1, 4).astype(dtype), flat,
                             axis=0)
            if kind == C.KIND_HITEFFECT:
                tw, th = p[22], p[23]
                na = noise.hit_effect_alpha(jnp.floor(vc) / tw,
                                            jnp.floor(uc) / th,
                                            p[24], p[25])
                a = na * texel[..., 3]
                r, g, b, a = apply_ct(p, p[26], p[27], p[28], a)
            else:
                r, g, b, a = apply_ct(p, texel[..., 0], texel[..., 1],
                                      texel[..., 2], texel[..., 3])
            aabb = ((Xp >= p[6]) & (Xp < p[7])
                    & (Yp >= p[8]) & (Yp < p[9]))
            mask = aabb if member is None else (member & aabb)
            return mask, pack(r, g, b, a), t_false
        return br

    out = []
    for kind in _SAMPLING_KINDS_T:
        out.append(mk_mxu(kind))
        out.append(mk_region(kind))
    return out


def render_patch_list(fb, sels, params, n, atlas, P: int, R: int,
                      with_region: bool = True):
    """Fold ``n`` patch-sized commands into fb (pure function).

    fb: (H, W, 4); sels: (Nmax,) i32 switch indices (see ``sel_for``);
    params: (Nmax, PARAM_W) fb.dtype; n: dynamic i32 count; P/R static.
    ``with_region=False`` compiles the arith-only variant (no sampling
    sels allowed): it skips the per-command region staging, whose
    ~1 MB/iteration contiguous read is pure waste for gather-free kinds.
    """
    H, W = fb.shape[0], fb.shape[1]
    AH, AW = atlas.shape[0], atlas.shape[1]
    assert R <= AH and R <= AW, (R, atlas.shape)
    dtype = fb.dtype

    if not with_region:
        def body_arith(i, fb):
            sel = lax.dynamic_index_in_dim(sels, i, keepdims=False)
            p = lax.dynamic_index_in_dim(params, i, keepdims=False)
            px0 = jnp.clip(p[6].astype(jnp.int32), 0, W - P)
            py0 = jnp.clip(p[8].astype(jnp.int32), 0, H - P)
            Xp = px0.astype(dtype) + lax.broadcasted_iota(dtype, (P, P), 1)
            Yp = py0.astype(dtype) + lax.broadcasted_iota(dtype, (P, P), 0)
            branches = executor._build_branches(Xp, Yp, None, AW, dtype,
                                                no_sampling=True)
            mask, rgba, store = lax.switch(sel, branches, p)
            old = lax.dynamic_slice(fb, (py0, px0, jnp.int32(0)),
                                    (P, P, 4))
            new = executor._blend_into(old, mask, rgba, store)
            return lax.dynamic_update_slice(fb, new,
                                            (py0, px0, jnp.int32(0)))

        return lax.fori_loop(0, n, body_arith, fb)

    # scalar-only region-origin switch (arith kinds -> (0, 0))
    def origin_noop(p, px0, py0):
        z = jnp.int32(0)
        return z, z

    origin_branches = []
    for kind in range(C.N_KINDS):
        if kind in _SAMPLING_KINDS:
            origin_branches.append(
                lambda p, px0, py0, kind=kind: _corner_origin(
                    p, kind, px0, py0, P, AH, AW, R, dtype))
        else:
            origin_branches.append(origin_noop)
    for kind in _SAMPLING_KINDS_T:
        for _route in (ROUTE_MXU, ROUTE_REGION):
            origin_branches.append(
                lambda p, px0, py0, kind=kind: _corner_origin(
                    p, kind, px0, py0, P, AH, AW, R, dtype))

    def body(i, fb):
        sel = lax.dynamic_index_in_dim(sels, i, keepdims=False)
        p = lax.dynamic_index_in_dim(params, i, keepdims=False)
        px0 = jnp.clip(p[6].astype(jnp.int32), 0, W - P)
        py0 = jnp.clip(p[8].astype(jnp.int32), 0, H - P)
        # region staging is UNCONDITIONAL: an atlas-sized dynamic_slice
        # inside lax.switch makes XLA copy the whole atlas per iteration
        v0, u0 = lax.switch(sel, origin_branches, p, px0, py0)
        region = lax.dynamic_slice(atlas, (v0, u0, jnp.int32(0)),
                                   (R, R, 4))
        Xp = px0.astype(dtype) + lax.broadcasted_iota(dtype, (P, P), 1)
        Yp = py0.astype(dtype) + lax.broadcasted_iota(dtype, (P, P), 0)
        # arith branches ignore the region operand
        ar = executor._build_branches(Xp, Yp, None, AW, dtype,
                                      no_sampling=True)
        arith = [lambda args, b=b: b(args[0]) for b in ar]
        branches = arith + _build_region_branches(P, R, px0, py0, Xp, Yp,
                                                  dtype)
        mask, rgba, store = lax.switch(sel, branches, (p, region, u0, v0))
        old = lax.dynamic_slice(fb, (py0, px0, jnp.int32(0)), (P, P, 4))
        new = executor._blend_into(old, mask, rgba, store)
        return lax.dynamic_update_slice(fb, new, (py0, px0, jnp.int32(0)))

    return lax.fori_loop(0, n, body, fb)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(5, 6, 7))
def _run(fb, sels, params, n, atlas, P: int, R: int,
         with_region: bool = True):
    return render_patch_list(fb, sels, params, n, atlas, P, R, with_region)


# --------------------------------------------------------------------- #
# whole-flush executor: ONE upload + ONE execution per flush
# --------------------------------------------------------------------- #
#
# The axon tunnel costs ~1 ms per queue item (transfer or execution) even
# fully pipelined (tools/exp_dispatch_cost.py), so a flush that dispatches
# per segment pays 2-3 ms of pure transport per segment.  render_flush
# folds every segment of a flush into a single jitted call keyed on the
# static segment plan; command rows and per-segment (lo, n) bounds travel
# in one packed array.  Layout: rows [0, nbase) are commands (cols 0-31 =
# params, col 32 = switch sel), row nbase+k holds segment k's (lo, n) in
# cols 0-1.  Counts stay dynamic, so one compilation per plan structure
# serves all frames with that shape.

PACKED_W = C.PARAM_W + 1


def _patch_span(fb, sels, params, lo, n, atlas, P, R, with_region, dtype):
    H, W = fb.shape[0], fb.shape[1]
    AH, AW = atlas.shape[0], atlas.shape[1]

    def body(i, fb):
        idx = lo + i
        sel = lax.dynamic_index_in_dim(sels, idx, keepdims=False)
        p = lax.dynamic_index_in_dim(params, idx, keepdims=False)
        px0 = jnp.clip(p[6].astype(jnp.int32), 0, W - P)
        py0 = jnp.clip(p[8].astype(jnp.int32), 0, H - P)
        Xp = px0.astype(dtype) + lax.broadcasted_iota(dtype, (P, P), 1)
        Yp = py0.astype(dtype) + lax.broadcasted_iota(dtype, (P, P), 0)
        if with_region:
            origin_branches = _origin_table(P, AH, AW, R, dtype)
            v0, u0 = lax.switch(sel, origin_branches, p, px0, py0)
            # region staging is UNCONDITIONAL: an atlas-sized
            # dynamic_slice inside lax.switch makes XLA copy the whole
            # atlas per iteration (tools/exp_bisect_bench.py)
            region = lax.dynamic_slice(atlas, (v0, u0, jnp.int32(0)),
                                       (R, R, 4))
            ar = executor._build_branches(Xp, Yp, None, AW, dtype,
                                          no_sampling=True)
            arith = [lambda args, b=b: b(args[0]) for b in ar]
            branches = arith + _build_region_branches(P, R, px0, py0,
                                                      Xp, Yp, dtype)
            mask, rgba, store = lax.switch(sel, branches,
                                           (p, region, u0, v0))
        else:
            branches = executor._build_branches(Xp, Yp, None, AW, dtype,
                                                no_sampling=True)
            mask, rgba, store = lax.switch(sel, branches, p)
        old = lax.dynamic_slice(fb, (py0, px0, jnp.int32(0)), (P, P, 4))
        new = executor._blend_into(old, mask, rgba, store)
        return lax.dynamic_update_slice(fb, new, (py0, px0, jnp.int32(0)))

    return lax.fori_loop(0, n, body, fb)


def _patch_step_static(fb, sel: int, p, atlas, P, R, dtype):
    """One patch command with a STATIC switch index: the branch is picked
    at trace time (no lax.switch), so XLA sees a straight slice/compute/
    update chain.  Used by unrolled/vectorised executor variants and
    experiments (tools/exp_samp_unroll.py)."""
    H, W = fb.shape[0], fb.shape[1]
    AH, AW = atlas.shape[0], atlas.shape[1]
    px0 = jnp.clip(p[6].astype(jnp.int32), 0, W - P)
    py0 = jnp.clip(p[8].astype(jnp.int32), 0, H - P)
    Xp = px0.astype(dtype) + lax.broadcasted_iota(dtype, (P, P), 1)
    Yp = py0.astype(dtype) + lax.broadcasted_iota(dtype, (P, P), 0)
    if sel >= C.N_KINDS:
        kind = C.KIND_TEX + (sel - C.N_KINDS) // 2
        v0, u0 = _corner_origin(p, kind, px0, py0, P, AH, AW, R, dtype)
        region = lax.dynamic_slice(atlas, (v0, u0, jnp.int32(0)),
                                   (R, R, 4))
        br = _build_region_branches(P, R, px0, py0, Xp, Yp,
                                    dtype)[sel - C.N_KINDS]
        mask, rgba, store = br((p, region, u0, v0))
    else:
        br = executor._build_branches(Xp, Yp, None, AW, dtype,
                                      no_sampling=True)[sel]
        mask, rgba, store = br(p)
    old = lax.dynamic_slice(fb, (py0, px0, jnp.int32(0)), (P, P, 4))
    new = executor._blend_into(old, mask, rgba, store)
    return lax.dynamic_update_slice(fb, new, (py0, px0, jnp.int32(0)))


def _origin_table(P, AH, AW, R, dtype):
    def origin_noop(p, px0, py0):
        z = jnp.int32(0)
        return z, z

    table = []
    for kind in range(C.N_KINDS):
        if kind in _SAMPLING_KINDS:
            table.append(lambda p, px0, py0, kind=kind: _corner_origin(
                p, kind, px0, py0, P, AH, AW, R, dtype))
        else:
            table.append(origin_noop)
    for kind in _SAMPLING_KINDS_T:
        for _route in (ROUTE_MXU, ROUTE_REGION):
            table.append(lambda p, px0, py0, kind=kind: _corner_origin(
                p, kind, px0, py0, P, AH, AW, R, dtype))
    return table


def _full_span(fb, sels, params, lo, n, atlas, dtype):
    """Full-frame arith commands (fill/set_color/huge rects...): one
    whole-fb blend per command, gather-free branches only."""
    H, W = fb.shape[0], fb.shape[1]
    X = lax.broadcasted_iota(dtype, (H, W), 1)
    Y = lax.broadcasted_iota(dtype, (H, W), 0)
    branches = executor._build_branches(X, Y, None, atlas.shape[1], dtype,
                                        no_sampling=True)

    def body(i, fb):
        idx = lo + i
        sel = lax.dynamic_index_in_dim(sels, idx, keepdims=False)
        p = lax.dynamic_index_in_dim(params, idx, keepdims=False)
        mask, rgba, store = lax.switch(sel, branches, p)
        return executor._blend_into(fb, mask, rgba, store)

    return lax.fori_loop(0, n, body, fb)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3, 4))
def render_flush(fb, packed, atlas, plan: tuple, nbase: int):
    """Execute a whole flush plan in one device program.

    packed: (nbase + len(plan), PACKED_W) fb.dtype — see module comment.
    plan: static tuple of ('patch', P, R, with_region) / ('fullarith',).
    """
    dtype = fb.dtype
    params = packed[:, : C.PARAM_W]
    sels = packed[:, C.PARAM_W].astype(jnp.int32)
    for k, seg in enumerate(plan):
        lo = packed[nbase + k, 0].astype(jnp.int32)
        n = packed[nbase + k, 1].astype(jnp.int32)
        if seg[0] == "patch":
            _, P, R, with_region = seg
            fb = _patch_span(fb, sels, params, lo, n, atlas, P, R,
                             with_region, dtype)
        else:
            fb = _full_span(fb, sels, params, lo, n, atlas, dtype)
    return fb


# Unrolled flush: the fori_loop + lax.switch structure above serialises
# the per-command chains and costs ~45-50 us/command of pure structure —
# the SAME 42-command sampling span measures 2.29 ms on the loop vs
# 0.39 ms unrolled (tools/exp_samp_unroll.py, v5e): with static branch
# picks XLA overlaps the independent slice/compute/update chains.  The
# price is one compilation per distinct (plan, sel-sequence) signature,
# so context.flush uses this path only while its signature cache is
# small (real workloads repeat frame structures; the persistent compile
# cache keeps warm starts cheap) and falls back to the loop above.

def _patch_group_step(fb, sel: int, params, i0: int, g: int, atlas,
                      P: int, R: int, dtype, barriers: bool):
    """``g`` consecutive same-sel patch commands with the fb-INDEPENDENT
    stage batched (exp_r5_canvas3/4: the unrolled flush is per-op-
    overhead bound, ~6 small device ops per command).

    Every branch's (mask, rgba, store) depends only on the param row and
    the atlas — never on fb — so one vmapped compute evaluates the whole
    group in a handful of fused ops (the per-command atlas regions
    collapse into ONE window gather, the one-hot einsums into ONE
    batched MXU dot).  The per-command residue is the sequential
    dynamic-slice -> blend -> dynamic-update-slice chain, which is pure
    elementwise and keeps EXACT sequential blend semantics: overlapping
    patches, pad rows (all-false mask -> blend returns ``old`` bitwise)
    and command order behave identically to the per-command unrolled
    path, bit-for-bit (the rounding-sensitive products are individually
    barriered inside the branch bodies, same as there)."""
    H, W = fb.shape[0], fb.shape[1]
    AH, AW = atlas.shape[0], atlas.shape[1]
    pg = lax.slice_in_dim(params, i0, i0 + g)          # (g, PARAM_W)
    px0s = jnp.clip(pg[:, 6].astype(jnp.int32), 0, W - P)
    py0s = jnp.clip(pg[:, 8].astype(jnp.int32), 0, H - P)

    def compute(p, px0, py0):
        Xp = px0.astype(dtype) + lax.broadcasted_iota(dtype, (P, P), 1)
        Yp = py0.astype(dtype) + lax.broadcasted_iota(dtype, (P, P), 0)
        if sel >= C.N_KINDS:
            kind = C.KIND_TEX + (sel - C.N_KINDS) // 2
            v0, u0 = _corner_origin(p, kind, px0, py0, P, AH, AW, R,
                                    dtype)
            region = lax.dynamic_slice(atlas, (v0, u0, jnp.int32(0)),
                                       (R, R, 4))
            br = _build_region_branches(P, R, px0, py0, Xp, Yp,
                                        dtype)[sel - C.N_KINDS]
            return br((p, region, u0, v0))
        br = executor._build_branches(Xp, Yp, None, AW, dtype,
                                      no_sampling=True)[sel]
        return br(p)

    masks, rgbas, stores = jax.vmap(compute)(pg, px0s, py0s)
    for j in range(g):
        old = lax.dynamic_slice(fb, (py0s[j], px0s[j], jnp.int32(0)),
                                (P, P, 4))
        new = executor._blend_into(old, masks[j], rgbas[j], stores[j])
        fb = lax.dynamic_update_slice(fb, new,
                                      (py0s[j], px0s[j], jnp.int32(0)))
        if barriers:
            fb = lax.optimization_barrier(fb)
    return fb


def _unrolled_body(fb, params, atlas, sig: tuple, barriers: bool = True,
                   group_g: int = 0):
    """sig: tuple of segments; each is ('patch', P, R, ((sel, cnt), ...))
    or ('fullarith', (sels...)).  params: (ncmd, PARAM_W) rows in segment
    order, ncmd = total expanded count.  Patch runs are run-length
    encoded with BUCKETED counts (context._dispatch_group): the rows
    beyond a run's real length are all-zero, which is an exact no-op for
    every bucketable sel (zero AABB -> all-false mask), so churning
    command counts collapse onto one compiled signature.

    ``barriers``: a barrier between commands stops XLA fusing one
    command's math into another's — each command's rounding then
    matches the loop executor's isolated body bit-for-bit.  The
    rounding-sensitive PRODUCTS are individually barriered inside the
    branch bodies already (executor._blend_into, _inv_point/mk_region),
    so barriers=False is expected bit-equal while letting XLA fuse
    consecutive full-frame blends into one HBM pass (each full-frame
    command is otherwise a ~66 MB read+write at 1080p f32 — bandwidth
    bound); measured on device before flipping any default
    (tools/exp_r3_barriers.py)."""
    dtype = fb.dtype
    H, W = fb.shape[0], fb.shape[1]
    AW = atlas.shape[1]
    i = 0
    full_branches = None
    for seg in sig:
        if seg[0] == "patch":
            _, P, R, runs = seg
            for sel, cnt in runs:
                if group_g > 1 and cnt > 1:
                    for g0 in range(0, cnt, group_g):
                        g = min(group_g, cnt - g0)
                        fb = _patch_group_step(fb, sel, params, i + g0,
                                               g, atlas, P, R, dtype,
                                               barriers)
                    i += cnt
                    continue
                for _ in range(cnt):
                    fb = _patch_step_static(fb, sel, params[i], atlas, P,
                                            R, dtype)
                    if barriers:
                        fb = lax.optimization_barrier(fb)
                    i += 1
        else:
            if full_branches is None:
                X = lax.broadcasted_iota(dtype, (H, W), 1)
                Y = lax.broadcasted_iota(dtype, (H, W), 0)
                full_branches = executor._build_branches(
                    X, Y, None, AW, dtype, no_sampling=True)
            for sel in seg[1]:
                mask, rgba, store = full_branches[sel](params[i])
                fb = executor._blend_into(fb, mask, rgba, store)
                if barriers:
                    fb = lax.optimization_barrier(fb)
                i += 1
    return fb


# Per-signature jit entries live in an LRU so a long-lived process can
# EVICT stale compiled programs instead of saturating the compile cap
# and regressing to the loop executor forever (round-3 verdict item 8).
# Each entry holds its own jax.jit closures; dropping the entry releases
# the underlying executables (jit caches are weakly keyed by the wrapped
# function).  Eviction policy (what to evict, when) is owned by
# context.RenderContext._unroll_pack, which calls evict_unrolled().
_UNROLL_FN_CACHE: "collections.OrderedDict" = collections.OrderedDict()


def _unroll_entry(sig: tuple, barriers: bool) -> dict:
    group_g = config.canvas_group_g()
    key = (sig, barriers, group_g)
    ent = _UNROLL_FN_CACHE.pop(key, None)
    if ent is None:
        def _flush(fb, params, atlas):
            return _unrolled_body(fb, params, atlas, sig, barriers,
                                  group_g)

        def _step(fb0, params, atlas):
            fb = _unrolled_body(fb0, params, atlas, sig, barriers,
                                group_g)
            return executor.quantize_u8(fb)

        def _step_batch(fb0, params_b, atlas):
            def one(params):
                fb = _unrolled_body(fb0, params, atlas, sig, barriers,
                                    group_g)
                return executor.quantize_u8(fb)
            return jax.vmap(one)(params_b)

        ent = {"flush": jax.jit(_flush, donate_argnums=(0,)),
               "step": jax.jit(_step),
               "step_batch": jax.jit(_step_batch)}
    _UNROLL_FN_CACHE[key] = ent          # (re-)insert at MRU end
    return ent


def evict_unrolled(sig: tuple) -> None:
    """Drop the compiled entries for ``sig`` (all barrier/group modes)."""
    for key in [k for k in _UNROLL_FN_CACHE if k[0] == sig]:
        del _UNROLL_FN_CACHE[key]


def render_flush_unrolled(fb, params, atlas, sig: tuple,
                          barriers: bool = True):
    return _unroll_entry(sig, barriers)["flush"](fb, params, atlas)


def frame_step_unrolled(fb0, params, atlas, sig: tuple,
                        barriers: bool = True):
    """One whole pipeline frame in ONE device program: start from the
    shared (NON-donated) initial framebuffer, run the unrolled flush,
    quantise to u8.  Replaces the eager fb0.copy -> flush -> quantize
    chain (3 tunnel queue items + an explicit 33 MB device copy at
    1080p f32) with a single dispatch whose initial copy and final
    quantise fuse into the command chain.  Bit-exact vs the eager
    chain: commands stay barrier-isolated, and quantize is a single
    rounding (mul by 255 + C-cast truncation) on the barriered fb."""
    return _unroll_entry(sig, barriers)["step"](fb0, params, atlas)


def frame_step_unrolled_batch(fb0, params_b, atlas, sig: tuple,
                              barriers: bool = True):
    """A whole pipeline batch in ONE device program: vmap of the
    frame-step body over the stacked (B, rows, PARAM_W) params, with
    fb0/atlas broadcast and one shared signature.  Collapses B
    per-frame dispatches into a single one (~0.5 ms host each through
    the dev tunnel).  Bit-exact vs the per-frame step on CPU
    (tests/test_pipeline.py); gated by config.pipeline_vmap() until the
    device A/B (tools/exp_r3_pipevmap.py) confirms the vmapped XLA
    schedule also wins on TPU."""
    return _unroll_entry(sig, barriers)["step_batch"](fb0, params_b,
                                                      atlas)


# --------------------------------------------------------------------- #
# host-side flush planning
# --------------------------------------------------------------------- #

PATCH_SIZES = (128, 256, 512)
# command-array length buckets; the loop trip count is dynamic, so padding
# is never executed — buckets only bound the number of compiled variants
LEN_BUCKETS = (16, 64, 256, 1024, 4096)
# texel indices can shift by a pixel between host f64 planning and device
# f32 math; keep the footprint this far under R so the one-hot/gather
# windows always cover
_R_MARGIN = 8


def _sampling_route(kind, p, P, W, H, r_choices):
    """Route + region size for one sampling command, from exact host f64
    math over the (P, P) patch window the device will evaluate."""
    px0 = min(max(int(p[6]), 0), W - P)
    py0 = min(max(int(p[8]), 0), H - P)
    xs = np.array([px0, px0 + P - 1, px0, px0 + P - 1], np.float64)
    ys = np.array([py0, py0, py0 + P - 1, py0 + P - 1], np.float64)
    fast = kind == C.KIND_TEX_FAST or (
        kind == C.KIND_HITEFFECT and p[29] > 0.0)
    sep = fast or (p[1] == 0.0 and p[2] == 0.0)
    if fast:
        ix, iy = xs, ys
    else:
        ix = p[0] * xs + p[2] * ys + p[4]
        iy = p[1] * xs + p[3] * ys + p[5]
    u = (ix - p[14]) * p[18]
    v = (iy - p[15]) * p[19]
    tw, th = p[22], p[23]
    if kind == C.KIND_SPLIT_TEX:
        u = (p[24] + (p[25] - p[24]) * u / tw) * tw
        v = (p[26] + (p[27] - p[26]) * v / th) * th
    # the affine map attains extrema at window corners; clamping (the
    # cpp:560-563 quirk) only shrinks the span
    u = np.clip(u, 0.0, max(tw - 2.0, 0.0))
    v = np.clip(v, 0.0, max(th - 2.0, 0.0))
    ui = u.astype(np.int64)
    vi = v.astype(np.int64)
    need = max(ui.max() - ui.min(), vi.max() - vi.min()) + 1
    # the margin guards host-f64 vs device-f32 drift of the footprint,
    # but the device's _clamp_uv bounds texel indices to the texture's
    # own extent, so the true span can never exceed max(tw, th) - 1
    cap = int(max(tw - 1.0, th - 1.0)) + 1
    need = min(need + _R_MARGIN, max(cap, 1))
    for r in r_choices:
        if need <= r:
            return (ROUTE_MXU if sep else ROUTE_REGION), r
    return ROUTE_FULL, 0


def _routes_table(kinds, params, W, H, r_choices, sizes):
    """Vectorised _sampling_route for ALL commands, lazily per patch size.

    The per-command python version costs ~40 us x ~40 sampling commands
    per flush (host-bound at 1080p); this computes identical f64 corner
    math for every command in a handful of (N, 4) numpy passes.  Returns
    a getter P -> (routes (N,) i64, rneeds (N,) i64) with entries only
    meaningful at sampling-kind indices; each P is computed on first use
    (a flush usually needs one)."""
    kinds = np.asarray(kinds)
    p = np.asarray(params, np.float64)
    N = len(kinds)
    fast = (kinds == C.KIND_TEX_FAST) | (
        (kinds == C.KIND_HITEFFECT) & (p[:, 29] > 0.0))
    sep = fast | ((p[:, 1] == 0.0) & (p[:, 2] == 0.0))
    split = kinds == C.KIND_SPLIT_TEX
    tw = p[:, 22:23]
    th = p[:, 23:24]
    out = {}

    if _fast is not None:
        # native corner math (native/fastrec.c routes_for_size): same
        # f64 ops; ~0.3 ms/frame of numpy call overhead at 60 commands
        pc = np.ascontiguousarray(p)
        fa = np.ascontiguousarray(fast, np.uint8)
        se = np.ascontiguousarray(sep, np.uint8)
        sp = np.ascontiguousarray(split, np.uint8)
        sm = np.ascontiguousarray(_SAMPLING_LUT[kinds], np.uint8)

        def for_size_native(P):
            routes, rneeds = _fast.routes_for_size(
                pc, fa, se, sp, sm, P, W, H, _R_MARGIN,
                tuple(int(r) for r in r_choices),
                ROUTE_MXU, ROUTE_REGION, ROUTE_FULL)
            return routes, rneeds

        def get(P):
            if P not in out:
                out[P] = for_size_native(P)
            return out[P]

        return get

    def for_size(P):
        px0 = np.clip(p[:, 6].astype(np.int64), 0, W - P).astype(np.float64)
        py0 = np.clip(p[:, 8].astype(np.int64), 0, H - P).astype(np.float64)
        xs = px0[:, None] + np.array([0.0, P - 1.0, 0.0, P - 1.0])
        ys = py0[:, None] + np.array([0.0, 0.0, P - 1.0, P - 1.0])
        ix = np.where(fast[:, None],
                      xs, p[:, 0:1] * xs + p[:, 2:3] * ys + p[:, 4:5])
        iy = np.where(fast[:, None],
                      ys, p[:, 1:2] * xs + p[:, 3:4] * ys + p[:, 5:6])
        u = (ix - p[:, 14:15]) * p[:, 18:19]
        v = (iy - p[:, 15:16]) * p[:, 19:20]
        with np.errstate(divide="ignore", invalid="ignore"):
            us = (p[:, 24:25] + (p[:, 25:26] - p[:, 24:25]) * u / tw) * tw
            vs = (p[:, 26:27] + (p[:, 27:28] - p[:, 26:27]) * v / th) * th
        u = np.where(split[:, None], us, u)
        v = np.where(split[:, None], vs, v)
        u = np.clip(u, 0.0, np.maximum(tw - 2.0, 0.0))
        v = np.clip(v, 0.0, np.maximum(th - 2.0, 0.0))
        ui = u.astype(np.int64)
        vi = v.astype(np.int64)
        need = np.maximum(ui.max(1) - ui.min(1),
                          vi.max(1) - vi.min(1)) + 1
        # drift margin, capped by the texture extent (see _sampling_route)
        cap = np.maximum((np.maximum(tw[:, 0] - 1.0, th[:, 0] - 1.0)
                          ).astype(np.int64) + 1, 1)
        need = np.minimum(need + _R_MARGIN, cap)
        routes = np.full(N, ROUTE_FULL, np.int64)
        rneeds = np.zeros(N, np.int64)
        for r in reversed(r_choices):
            ok = need <= r
            routes[ok] = np.where(sep[ok], ROUTE_MXU, ROUTE_REGION)
            rneeds[ok] = r
        return routes, rneeds

    def get(P):
        if P not in out:
            out[P] = for_size(P)
        return out[P]

    return get


def plan_segments(kinds, params, W, H, atlas_shape):
    """Split a recorded command list into ordered executor segments.

    Returns a list of
      ('patch', P, R, lo, hi, sels, with_region)  — patch loop
      ('fullarith', lo, hi)                       — full-frame, gather-free
      ('fullsamp', lo, hi)                        — full-frame sampling
                                                    (round-1 scan path)
    covering [0, n) contiguously — blending is order-dependent, so
    segments execute in sequence.  context.flush folds consecutive
    patch/fullarith segments into ONE render_flush call; fullsamp
    segments (big texture blits: whole-atlas gathers) dispatch on the
    old scan executor.
    """
    n = len(kinds)
    sizes = [s for s in PATCH_SIZES if s <= min(W, H)]
    r_choices = [r for r in (128, 256, 512)
                 if r <= min(atlas_shape[0], atlas_shape[1])]
    # region slices are unconditional in the sampling loop body, so R must
    # be a valid atlas slice
    r_floor = min(128, atlas_shape[0], atlas_shape[1])

    # pass 1: patch-size class per command (None -> full-frame scan)
    pnp = np.asarray(params)
    ext = np.maximum(pnp[:, 7] - pnp[:, 6], pnp[:, 9] - pnp[:, 8])
    sidx = np.searchsorted(np.asarray(sizes, np.float64), ext)
    Ps = [sizes[i] if i < len(sizes) else None for i in sidx]
    # base-kind (gather-free) commands whose window would cover >= half
    # the frame go full-frame instead: a P=512 patch at 540p evaluates
    # 0.26 Mpx vs the 0.52 Mpx frame, and the unrolled full-frame arith
    # branch costs ~0.1 ms — cheaper than the big patch's fusion chain.
    # It also keeps the SEGMENT-class structure independent of a judge
    # line's rotating extent (class 256<->512 flips churned one compiled
    # signature per frame, exp_r5 mil3).  Sampling commands always stay
    # patched: full-frame sampling means whole-atlas gathers (fullsamp).
    karr = np.asarray(kinds)
    for idx in range(n):
        if (Ps[idx] is not None and 2 * Ps[idx] * Ps[idx] >= W * H
                and int(karr[idx]) not in _SAMPLING_KINDS):
            Ps[idx] = None

    any_sampling = bool(_SAMPLING_LUT[np.asarray(kinds)].any())
    routes_tab = (_routes_table(kinds, params, W, H, r_choices, sizes)
                  if (any_sampling and r_choices and sizes) else None)

    # pass 2: group consecutive SAME-class commands into patch segments.
    # Folding mixed classes to the run's max P was measured catastrophic
    # (exp_r5_milflush2): a milrenderer frame holds ~160 class-128 note
    # commands and ~3 class-512 judge lines, and the max-fold dragged
    # every note to a 512x512 window — 16x the evaluated pixels on 98%
    # of commands, 0.2-0.9 s per flush program.  Same-class runs keep
    # each command at its own window size; all segments still pack into
    # ONE device program per dispatch group, so the split costs only
    # extra signature entries.  Routes are computed against the run's P;
    # footprint-overflow (ROUTE_FULL) demotes the command to a full
    # segment, splitting the run.
    segs = []
    i = 0
    while i < n:
        if Ps[i] is None:
            j = i
            while j < n and Ps[j] is None:
                j += 1
            segs.append(("full", i, j))
            i = j
            continue
        j = i
        P = Ps[i]
        while j < n and Ps[j] == P:
            j += 1
        # routes for [i, j) under P; demotions split the run
        lo = i
        routes = []
        for k_i in range(i, j):
            k = int(kinds[k_i])
            if k in _SAMPLING_KINDS:
                if routes_tab is None:
                    route, rneed = ROUTE_FULL, 0
                else:
                    rt, rn = routes_tab(P)
                    route = int(rt[k_i])
                    rneed = int(rn[k_i])
            else:
                route, rneed = None, 0
            if route == ROUTE_FULL:
                if k_i > lo:
                    segs.append(_mk_patch(kinds, lo, k_i, P, routes,
                                          r_floor))
                segs.append(("full", k_i, k_i + 1))
                lo = k_i + 1
                routes = []
            else:
                routes.append((route, rneed))
        if j > lo:
            segs.append(_mk_patch(kinds, lo, j, P, routes, r_floor))
        i = j

    # split full segments by sampling-ness, merging adjacent same-type runs
    out = []
    for s in segs:
        if s[0] != "full":
            out.append(s)
            continue
        _, lo, hi = s
        for k_i in range(lo, hi):
            cls = ("fullsamp" if int(kinds[k_i]) in _SAMPLING_KINDS
                   else "fullarith")
            if out and out[-1][0] == cls and out[-1][2] == k_i:
                out[-1] = (cls, out[-1][1], k_i + 1)
            else:
                out.append((cls, k_i, k_i + 1))
    return _fold_kernel_runs(out)


# measured on v5e through the axon tunnel (tools/exp_canvas_decomp.py,
# tools/exp_samp_unroll.py): with the unrolled executor a full-frame
# arith command costs ~0.10 ms and a patch command ~0.01 ms; one
# tile-kernel dispatch (incl. fb tile/detile + launch) ~2.2 ms
# regardless of command count — so the kernel route only wins for big
# stacks of full-frame commands
EST_FULL_MS = 0.10
EST_PATCH_MS = 0.01
EST_KERNEL_MS = 2.2


def _seg_bounds(s):
    return (s[1], s[2]) if s[0] in ("fullarith", "fullsamp") else (s[3], s[4])


def _fold_kernel_runs(segs):
    """Replace maximal runs of all-arithmetic segments with a ('kernel',
    lo, hi) segment when the tile kernel is estimated cheaper than the
    scan/patch paths (ops/canvas_kernel.py; the kernel's cost is a fixed
    ~2.2 ms while full-frame scan commands cost ~0.35 ms EACH, so e.g.
    a stack of 10+ full-frame fills/gradients flips)."""
    from .. import config
    if not config.canvas_kernel_enabled():
        return segs
    out = []
    i = 0
    while i < len(segs):
        j = i
        est = 0.0
        while j < len(segs):
            s = segs[j]
            if s[0] == "fullarith":
                est += EST_FULL_MS * (s[2] - s[1])
            elif s[0] == "patch" and all(x < C.N_KINDS for x in s[5]):
                est += EST_PATCH_MS * (s[4] - s[3])
            else:
                break
            j += 1
        lo = _seg_bounds(segs[i])[0] if j > i else 0
        hi = _seg_bounds(segs[j - 1])[1] if j > i else 0
        if (j > i and est > EST_KERNEL_MS
                and hi - lo <= canvas_kernel.CMD_BUCKETS[-1]):
            out.append(("kernel", lo, hi))
            i = j
        elif j > i:
            out.extend(segs[i:j])
            i = j
        else:
            out.append(segs[i])
            i += 1
    return out


def _mk_patch(kinds, lo, hi, P, routes, r_floor):
    R = max([r_floor] + [r for _, r in routes])
    sels = [sel_for(int(kinds[lo + j]), routes[j][0])
            for j in range(hi - lo)]
    with_region = any(s >= C.N_KINDS for s in sels)
    return ("patch", P, R, lo, hi, sels, with_region)


def len_bucket(n: int) -> int:
    for b in LEN_BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"display list too long for patch executor ({n})")
