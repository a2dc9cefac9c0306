#!/usr/bin/env python
"""Probe Mosaic's tpu.dynamic_gather (jnp.take_along_axis lowering) on
the real TPU: which (shape, axis, dtype) combos compile and return
correct values, and what a per-tile footprint-resolve epilogue would
cost.  Feeds the textured-raster in-kernel texel fetch design
(pallas_raster tex_resolve mode).

Run: nohup python tools/exp_dyngather.py > /tmp/exp_dyngather.log 2>&1 &
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

sys.path.insert(0, ".")


def probe(shape, axis, dtype):
    """take_along_axis(x, idx, axis) with x, idx, out all `shape`."""
    rng = np.random.default_rng(0)
    x_np = rng.integers(0, 1000, shape).astype(dtype)
    idx_np = rng.integers(0, shape[axis], shape).astype(np.int32)

    def kernel(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...],
                                         axis=axis)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
    )
    t0 = time.time()
    out = np.asarray(fn(jnp.asarray(x_np), jnp.asarray(idx_np)))
    dt = time.time() - t0
    want = np.take_along_axis(x_np, idx_np, axis=axis)
    ok = (out == want).all()
    return ok, dt


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    for shape, axis, dtype in [
        ((8, 128), 1, np.int32),
        ((8, 128), 1, np.float32),
        ((1, 128), 1, np.int32),
        ((8, 256), 1, np.int32),
        ((8, 1024), 1, np.int32),
        ((1, 1024), 1, np.int32),
        ((8, 128), 0, np.int32),
        ((256, 128), 1, np.int32),
    ]:
        try:
            ok, dt = probe(shape, axis, dtype)
            print(f"gather {shape} axis={axis} {np.dtype(dtype).name}: "
                  f"ok={ok} compile+run {dt:.1f}s", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"gather {shape} axis={axis} {np.dtype(dtype).name}: "
                  f"FAIL {type(e).__name__}: {msg}", flush=True)

    # footprint-assembly probe: dynamic-offset loads from a resident
    # (256, 256) texture + lane-concat into a (1, 128) footprint row,
    # broadcast to (8, 128) and gathered per-pixel
    def fp_kernel(tex_ref, uv_ref, o_ref):
        v0 = uv_ref[0]
        u0 = uv_ref[1]
        rows = [tex_ref[pl.ds(v0 + r, 1), pl.ds(u0, 32)]
                for r in range(4)]                    # 4 x (1, 32)
        fp = jnp.concatenate(rows, axis=1)            # (1, 128)
        fpb = jnp.broadcast_to(fp, (8, 128))
        ii = lax.broadcasted_iota(jnp.int32, (8, 128), 1) % 128
        o_ref[...] = jnp.take_along_axis(fpb, ii, axis=1)

    try:
        rng = np.random.default_rng(1)
        tex_np = rng.integers(0, 1 << 30, (256, 256)).astype(np.int32)
        fn = pl.pallas_call(
            fp_kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((256, 256), lambda i: (0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )
        print("fp probe: needs SMEM uv — switching to scalar prefetch",
              flush=True)
    except Exception as e:
        print(f"fp spec build FAIL: {e}", flush=True)

    from jax.experimental.pallas import tpu as pltpu

    def fp_kernel2(uv_ref, tex_ref, o_ref):
        v0 = uv_ref[0]
        u0 = uv_ref[1]
        rows = [tex_ref[pl.ds(v0 + r, 1), pl.ds(u0, 32)]
                for r in range(4)]
        fp = jnp.concatenate(rows, axis=1)
        fpb = jnp.broadcast_to(fp, (8, 128))
        ii = lax.broadcasted_iota(jnp.int32, (8, 128), 1) % 128
        o_ref[...] = jnp.take_along_axis(fpb, ii, axis=1)

    try:
        rng = np.random.default_rng(1)
        tex_np = rng.integers(0, 1 << 30, (256, 256)).astype(np.int32)
        uv_np = np.array([7, 33], np.int32)
        fn = pl.pallas_call(
            fp_kernel2,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec((256, 256), lambda i, s: (0, 0))],
                out_specs=pl.BlockSpec((8, 128), lambda i, s: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )
        t0 = time.time()
        out = np.asarray(fn(jnp.asarray(uv_np), jnp.asarray(tex_np)))
        dt = time.time() - t0
        want = np.concatenate(
            [tex_np[7 + r, 33:65] for r in range(4)])[None].repeat(8, 0)
        ii = np.arange(128)[None].repeat(8, 0) % 128
        want = np.take_along_axis(want, ii, axis=1)
        print(f"footprint probe: ok={(out == want).all()} {dt:.1f}s",
              flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"footprint probe FAIL {type(e).__name__}: {msg}",
              flush=True)


if __name__ == "__main__":
    main()
