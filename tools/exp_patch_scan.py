#!/usr/bin/env python
"""Experiment: does a PURE dynamic_update_slice scan alias the fb carry?

ROADMAP records that the full executor pays ~0.7 ms/command at 1080p
because lax.cond around the fb rewrite defeats XLA's in-place aliasing of
the 33 MB carry.  Hypothesis: a scan whose fb path is an unconditional
slice -> blend -> dynamic_update_slice chain (any lax.switch confined to
the PATCH-sized values, never the carry) aliases in place, making
per-command cost ~ patch work only.

Variants measured at 1080p f32, 64 commands, patch 128:
  A  pure DUS scan (no switch)                — aliasing floor
  B  DUS scan + lax.switch on patch rgba/mask — production shape
  C  B + gather from a texture atlas          — sampling production shape
  D  unrolled chain (bucketed)                — fallback if scan copies
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

H, W = 1080, 1920
K = 64
P = 128


def timeit(fn, fb0, xs, n=50, reps=3):
    out = fn(fb0, xs)
    out.block_until_ready()
    float(jnp.sum(out[0, 0]))  # checksum sync
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn(fb0, xs)
        for _ in range(n - 1):
            o = fn(o, xs)
        float(jnp.sum(o[0, 0]))
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    return best


def main():
    rng = np.random.default_rng(0)
    fb0 = jnp.zeros((H, W, 4), jnp.float32)
    ox = jnp.asarray(rng.integers(0, W - P, K), jnp.int32)
    oy = jnp.asarray(rng.integers(0, H - P, K), jnp.int32)
    kinds = jnp.asarray(rng.integers(0, 3, K), jnp.int32)
    rgba = jnp.asarray(rng.uniform(0.2, 1.0, (K, 4)), jnp.float32)
    atlas = jnp.asarray(rng.uniform(0, 1, (2048, 2048, 4)), jnp.float32)
    atlas_flat = atlas.reshape(-1, 4)

    def blend(old, rgba_p, mask):
        a = rgba_p[..., 3:4]
        new_rgb = old[..., :3] * (1 - a) + rgba_p[..., :3] * a
        new = jnp.concatenate([new_rgb, a], -1)
        return jnp.where(mask[..., None], new, old)

    # A: pure DUS scan
    @jax.jit
    def runA(fb, xs):
        def step(fb, x):
            x0, y0, col = x
            old = lax.dynamic_slice(fb, (y0, x0, 0), (P, P, 4))
            mask = jnp.ones((P, P), bool)
            new = blend(old, jnp.broadcast_to(col, (P, P, 4)), mask)
            return lax.dynamic_update_slice(fb, new, (y0, x0, 0)), None
        fb, _ = lax.scan(step, fb, (ox, oy, rgba))
        return fb

    # B: switch on patch values only
    @jax.jit
    def runB(fb, xs):
        Xi = lax.broadcasted_iota(jnp.float32, (P, P), 1)
        Yi = lax.broadcasted_iota(jnp.float32, (P, P), 0)

        def mk(i):
            def br(col):
                m = ((Xi + Yi) % (3.0 + i)) > 1.0
                return m, jnp.broadcast_to(col, (P, P, 4)) * (0.5 + 0.1 * i)
            return br
        branches = [mk(i) for i in range(3)]

        def step(fb, x):
            x0, y0, k, col = x
            old = lax.dynamic_slice(fb, (y0, x0, 0), (P, P, 4))
            mask, rp = lax.switch(k, branches, col)
            new = blend(old, rp, mask)
            return lax.dynamic_update_slice(fb, new, (y0, x0, 0)), None
        fb, _ = lax.scan(step, fb, (ox, oy, kinds, col_arg := rgba))
        return fb

    # C: with an atlas gather per patch (sampling production shape)
    @jax.jit
    def runC(fb, xs):
        Xi = lax.broadcasted_iota(jnp.float32, (P, P), 1)
        Yi = lax.broadcasted_iota(jnp.float32, (P, P), 0)

        def step(fb, x):
            x0, y0, k, col = x
            u = (Xi * 1.7 + k).astype(jnp.int32) % 2047
            v = (Yi * 0.9).astype(jnp.int32) % 2047
            texel = jnp.take(atlas_flat, v * 2048 + u, axis=0)
            old = lax.dynamic_slice(fb, (y0, x0, 0), (P, P, 4))
            mask = texel[..., 3] > 0.3
            new = blend(old, texel * col, mask)
            return lax.dynamic_update_slice(fb, new, (y0, x0, 0)), None
        fb, _ = lax.scan(step, fb, (ox, oy, kinds, rgba))
        return fb

    # D: unrolled chain
    @jax.jit
    def runD(fb, xs):
        for i in range(K):
            old = lax.dynamic_slice(fb, (oy[i], ox[i], 0), (P, P, 4))
            new = blend(old, jnp.broadcast_to(rgba[i], (P, P, 4)),
                        jnp.ones((P, P), bool))
            fb = lax.dynamic_update_slice(fb, new, (oy[i], ox[i], 0))
        return fb

    for name, fn in [("A pure-DUS scan", runA),
                     ("B +switch(patch)", runB),
                     ("C +atlas gather", runC),
                     ("D unrolled chain", runD)]:
        dt = timeit(fn, fb0, None)
        print(f"{name}: {dt * 1e3:.3f} ms/frame = "
              f"{dt / K * 1e6:.1f} us/cmd  ({K} cmds, {P}px patch, 1080p)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
