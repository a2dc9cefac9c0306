#!/usr/bin/env python
"""Round-2 probes for the in-kernel texel resolve (pallas_raster
tex_resolve design), on the real TPU:

  A. (1, 1024) <-> (8, 128) via aligned static lane slices + sublane
     concat (the Mosaic-legal stand-in for the forbidden
     lanes<->sublanes reshape).
  B. vector min -> scalar -> pl.ds dynamic sublane offset load (the
     footprint window fetch needs offsets derived from per-tile vector
     reductions).
  C. Full mini-epilogue: resident (th*bpr, 128) texture layout, 8
     scalar-offset windows, 8 lane-gathers + selects, resolved mask.

Run: nohup python tools/exp_dyngather2.py > /tmp/exp_dyngather2.log 2>&1 &
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

P = 1024


def to_8x128(v):
    return jnp.concatenate(
        [v[:, k * 128:(k + 1) * 128] for k in range(8)], axis=0)


def from_8x128(v):
    # direct slice+lane-concat fails ("result/input offset mismatch on
    # non-concat dimension": row k keeps sublane offset k); a masked
    # sublane sum-reduce lands each row at canonical offset 0
    i0 = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    rows = [jnp.sum(jnp.where(i0 == k, v, 0), axis=0, keepdims=True)
            for k in range(8)]
    return jnp.concatenate(rows, axis=1)


def probe_a():
    def kernel(x_ref, o_ref):
        x = x_ref[...]                       # (1, 1024)
        y = to_8x128(x)                      # (8, 128)
        ii = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        g = jnp.take_along_axis(y, (127 - ii), axis=1)
        o_ref[...] = from_8x128(g)

    x_np = np.arange(P, dtype=np.int32)[None]
    fn = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((1, P), jnp.int32))
    t0 = time.time()
    out = np.asarray(fn(jnp.asarray(x_np)))
    want = x_np.reshape(8, 128)[:, ::-1].reshape(1, P)
    print(f"A slice-reshape+gather: ok={(out == want).all()} "
          f"{time.time() - t0:.1f}s", flush=True)


def probe_b():
    def kernel(x_ref, v_ref, o_ref):
        vi = v_ref[...]                      # (1, 1024) i32
        v0 = jnp.min(vi)                     # scalar from vector
        o_ref[...] = x_ref[pl.ds(v0, 1), :]  # dynamic sublane offset

    rng = np.random.default_rng(0)
    x_np = rng.integers(0, 1000, (64, 128)).astype(np.int32)
    v_np = rng.integers(5, 60, (1, P)).astype(np.int32)
    fn = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32))
    t0 = time.time()
    try:
        out = np.asarray(fn(jnp.asarray(x_np), jnp.asarray(v_np)))
        want = x_np[v_np.min():v_np.min() + 1]
        print(f"B vecmin-scalar-ds: ok={(out == want).all()} "
              f"{time.time() - t0:.1f}s", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"B vecmin-scalar-ds FAIL {type(e).__name__}: {msg}",
              flush=True)


def probe_c():
    """Windowed footprint resolve: tex laid out (th*bpr, 128); per call
    compute v0/ub0/BW from the (vi, ui) planes, fetch 8 windows at
    scalar offsets, gather per pixel, compare against numpy."""
    th, tw = 256, 256
    bpr = tw // 128
    NW = 8

    def kernel(tex_ref, vi_ref, ui_ref, hit_ref, o_ref, r_ref):
        vi1 = vi_ref[...]
        ui1 = ui_ref[...]
        hit1 = hit_ref[...] != 0
        big = jnp.int32(1 << 20)
        vim = jnp.where(hit1, vi1, big)
        uim = jnp.where(hit1, ui1 // 128, big)
        v0 = jnp.minimum(jnp.min(vim), th - 1)
        ub0 = jnp.minimum(jnp.min(uim), bpr - 1)
        ubx = jnp.where(hit1, ui1 // 128, jnp.int32(-1))
        bw = jnp.clip(jnp.max(ubx) - ub0 + 1, 1, NW)
        fh = NW // bw                        # rows available
        vi = to_8x128(vi1)
        ui = to_8x128(ui1)
        hit = to_8x128(hit1.astype(jnp.int32)) != 0
        blk = (vi - v0) * bw + (ui // 128 - ub0)
        lane = ui % 128
        resolved = (hit & (vi >= v0) & (vi - v0 < fh)
                    & (ui // 128 >= ub0) & (ui // 128 - ub0 < bw))
        acc = jnp.zeros((8, 128), jnp.int32)
        for w in range(NW):
            off = (v0 + w // bw) * bpr + ub0 + w % bw
            off = jnp.minimum(off, th * bpr - 1)
            row = tex_ref[pl.ds(off, 1), :]          # (1, 128)
            rb = jnp.broadcast_to(row, (8, 128))
            g = jnp.take_along_axis(rb, lane, axis=1)
            acc = jnp.where(blk == w, g, acc)
        o_ref[...] = from_8x128(jnp.where(resolved, acc, -7))
        r_ref[...] = from_8x128(resolved.astype(jnp.int32))

    rng = np.random.default_rng(2)
    tex_np = rng.integers(0, 1 << 30, (th, tw)).astype(np.int32)
    tex_l = tex_np.reshape(th * bpr, 128)
    # coherent uv plane: a small drifting footprint + some sky
    base_v, base_u = 37, 120                 # straddles the 128 boundary
    vi_np = (base_v + rng.integers(0, 3, (1, P))).astype(np.int32)
    ui_np = (base_u + rng.integers(0, 40, (1, P))).astype(np.int32)
    hit_np = (rng.random((1, P)) < 0.9).astype(np.int32)

    fn = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((1, P), jnp.int32),
                   jax.ShapeDtypeStruct((1, P), jnp.int32)])
    t0 = time.time()
    try:
        out, res = fn(jnp.asarray(tex_l), jnp.asarray(vi_np),
                      jnp.asarray(ui_np), jnp.asarray(hit_np))
        out, res = np.asarray(out), np.asarray(res)
        want = tex_np[vi_np, ui_np]
        hit = hit_np != 0
        ok_vals = (out[hit & (res != 0)] ==
                   want[hit & (res != 0)]).all()
        frac = res[hit].mean()
        print(f"C footprint resolve: vals_ok={ok_vals} "
              f"resolved_frac={frac:.3f} {time.time() - t0:.1f}s",
              flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"C footprint FAIL {type(e).__name__}: {msg}", flush=True)

    # timing: rough per-call cost of the epilogue at tile scale
    try:
        t0 = time.time()
        for _ in range(50):
            fn(jnp.asarray(tex_l), jnp.asarray(vi_np),
               jnp.asarray(ui_np), jnp.asarray(hit_np))
        jax.block_until_ready(fn(jnp.asarray(tex_l), jnp.asarray(vi_np),
                                 jnp.asarray(ui_np),
                                 jnp.asarray(hit_np)))
        print(f"C 51 calls {time.time() - t0:.2f}s (launch-bound)",
              flush=True)
    except Exception:
        pass


if __name__ == "__main__":
    print("backend:", jax.devices()[0].platform, flush=True)
    for p in (probe_a, probe_b, probe_c):
        try:
            p()
        except Exception as e:
            msg = str(e).splitlines()[0][:200]
            print(f"{p.__name__} FAIL {type(e).__name__}: {msg}",
                  flush=True)
