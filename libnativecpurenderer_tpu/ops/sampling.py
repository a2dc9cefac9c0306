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
def resample_region_bilinear(atlas, ox, oy, tw, th, out_w: int, out_h: int):
    """Bilinear variant of resample_region — the quality upgrade the
    reference left commented out (cpp:575-620).  Opt-in (reference parity
    default stays nearest); sample positions use texel centres."""
    dtype = atlas.dtype
    i = jax.lax.broadcasted_iota(dtype, (out_h, out_w), 1)
    j = jax.lax.broadcasted_iota(dtype, (out_h, out_w), 0)
    x = jnp.clip((i + 0.5) / out_w * tw - 0.5, 0.0, tw - 1.0)
    y = jnp.clip((j + 0.5) / out_h * th - 0.5, 0.0, th - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, jnp.asarray(tw, jnp.int32) - 1)
    y1i = jnp.minimum(y0i + 1, jnp.asarray(th, jnp.int32) - 1)
    flat = atlas.reshape(-1, 4)
    aw = atlas.shape[1]
    oxi = jnp.asarray(ox, jnp.int32)
    oyi = jnp.asarray(oy, jnp.int32)

    def tap(yy, xx):
        return jnp.take(flat, (yy + oyi) * aw + (xx + oxi), axis=0)

    t00 = tap(y0i, x0i)
    t01 = tap(y0i, x1i)
    t10 = tap(y1i, x0i)
    t11 = tap(y1i, x1i)
    top = t00 * (1 - fx) + t01 * fx
    bot = t10 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


@functools.partial(jax.jit, static_argnums=(5, 6))
def read_region(atlas, ox, oy, tw, th, w: int, h: int):
    """Copy a (h, w, 4) region out of the atlas (static shape)."""
    oy = jnp.asarray(oy, jnp.int32)
    ox = jnp.asarray(ox, jnp.int32)
    return jax.lax.dynamic_slice(
        atlas, (oy, ox, jnp.asarray(0, jnp.int32)), (h, w, 4))
