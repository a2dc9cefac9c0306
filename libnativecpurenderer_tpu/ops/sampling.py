"""Texture sampling / resampling device ops.

Mirrors ``InterpolateColorFromBuffer`` (``libNativeCPURenderer.cpp:555-573``,
nearest-neighbour — the bilinear path is commented out in the reference) and
``ResampleTexture`` (cpp:950-976).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def clamp_coord(x, size):
    """Reference clamp quirk (cpp:560-563): x<0 -> 0, x>=size-1 -> size-2."""
    x = jnp.where(x < 0.0, 0.0, x)
    return jnp.where(x >= size - 1.0, size - 2.0, x)


@functools.partial(jax.jit, static_argnums=(5, 6))
def resample_region(atlas, ox, oy, tw, th, out_w: int, out_h: int):
    """ResampleTexture semantics (cpp:950-976): for each output texel (i, j)
    sample the source at ((i/out_w)*tw, (j/out_h)*th), nearest with the
    reference clamp."""
    dtype = atlas.dtype
    i = jax.lax.broadcasted_iota(dtype, (out_h, out_w), 1)
    j = jax.lax.broadcasted_iota(dtype, (out_h, out_w), 0)
    x = clamp_coord(i / out_w * tw, tw)
    y = clamp_coord(j / out_h * th, th)
    xi = x.astype(jnp.int32) + jnp.int32(ox)
    yi = y.astype(jnp.int32) + jnp.int32(oy)
    flat = yi * atlas.shape[1] + xi
    return jnp.take(atlas.reshape(-1, 4), flat, axis=0)


@functools.partial(jax.jit, static_argnums=(5, 6))
def read_region(atlas, ox, oy, tw, th, w: int, h: int):
    """Copy a (h, w, 4) region out of the atlas (static shape)."""
    oy = jnp.asarray(oy, jnp.int32)
    ox = jnp.asarray(ox, jnp.int32)
    return jax.lax.dynamic_slice(
        atlas, (oy, ox, jnp.asarray(0, jnp.int32)), (h, w, 4))
