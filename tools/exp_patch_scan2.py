#!/usr/bin/env python
"""Experiment 2: make SAMPLING commands cheap in the patch scan.

exp_patch_scan found the DUS carry aliases (40 us/cmd) but a 128^2-patch
atlas gather costs 356 us/cmd.  Candidates:

  C   baseline: flat gather from the full 2048^2 atlas        (from exp 1)
  C2  dynamic_slice a (R, R, 4) texel region (contiguous HBM read),
      then gather within the small region
  C3  separable one-hot MXU sampling: out[y,x] = tex[r(y), c(x)] =
      Rsel @ region @ Csel per channel — no gather at all (valid for
      axis-aligned mappings, which covers TEX_FAST and most TEX/SPLIT_TEX)
  C4  C3 but region sliced per command from the atlas
  E   patch scan at P=256 (how does patch size scale)
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
R = 256  # texel region bound


def timeit(fn, fb0, n=50, reps=3):
    out = fn(fb0)
    out.block_until_ready()
    float(jnp.sum(out[0, 0]))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn(fb0)
        for _ in range(n - 1):
            o = fn(o)
        float(jnp.sum(o[0, 0]))
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    return best


def main():
    rng = np.random.default_rng(0)
    fb0 = jnp.zeros((H, W, 4), jnp.float32)
    ox = jnp.asarray(rng.integers(0, W - P, K), jnp.int32)
    oy = jnp.asarray(rng.integers(0, H - P, K), jnp.int32)
    tox = jnp.asarray(rng.integers(0, 2048 - R, K), jnp.int32)
    toy = jnp.asarray(rng.integers(0, 2048 - R, K), jnp.int32)
    scale = jnp.asarray(rng.uniform(0.5, 1.9, (K, 2)), jnp.float32)
    rgba = jnp.asarray(rng.uniform(0.2, 1.0, (K, 4)), jnp.float32)
    atlas = jnp.asarray(rng.uniform(0, 1, (2048, 2048, 4)), jnp.float32)
    atlas_flat = atlas.reshape(-1, 4)

    def blend(old, rgba_p, mask):
        a = rgba_p[..., 3:4]
        new_rgb = old[..., :3] * (1 - a) + rgba_p[..., :3] * a
        new = jnp.concatenate([new_rgb, a], -1)
        return jnp.where(mask[..., None], new, old)

    Xi = lax.broadcasted_iota(jnp.float32, (P, P), 1)
    Yi = lax.broadcasted_iota(jnp.float32, (P, P), 0)

    def scan_over(step):
        @jax.jit
        def run(fb):
            fb, _ = lax.scan(step, fb, (ox, oy, tox, toy, scale, rgba))
            return fb
        return run

    # C2: region slice + gather within region
    def stepC2(fb, x):
        x0, y0, tx, ty, sc, col = x
        region = lax.dynamic_slice(atlas, (ty, tx, 0), (R, R, 4))
        u = jnp.clip((Xi * sc[0]).astype(jnp.int32), 0, R - 1)
        v = jnp.clip((Yi * sc[1]).astype(jnp.int32), 0, R - 1)
        texel = jnp.take(region.reshape(-1, 4), v * R + u, axis=0)
        old = lax.dynamic_slice(fb, (y0, x0, 0), (P, P, 4))
        new = blend(old, texel * col, texel[..., 3] > 0.3)
        return lax.dynamic_update_slice(fb, new, (y0, x0, 0)), None

    # C3: one-hot separable MXU sampling, region pre-sliced = whole atlas
    # row/col windows (static (R) one-hots against dynamic starts)
    def mxu_sample(region, sc):
        # rsel[y, j] = 1 iff j == floor(y * sy);  csel[i, x] = 1 iff
        # i == floor(x * sx)
        rows = jnp.clip((jnp.arange(P, dtype=jnp.float32) * sc[1])
                        .astype(jnp.int32), 0, R - 1)
        cols = jnp.clip((jnp.arange(P, dtype=jnp.float32) * sc[0])
                        .astype(jnp.int32), 0, R - 1)
        rsel = (rows[:, None] ==
                jnp.arange(R, dtype=jnp.int32)[None, :]).astype(jnp.float32)
        csel = (jnp.arange(R, dtype=jnp.int32)[:, None] ==
                cols[None, :]).astype(jnp.float32)
        # region (R, R, 4) -> (P, P, 4): einsum over MXU
        return jnp.einsum("yj,jic,ix->yxc", rsel, region, csel,
                          preferred_element_type=jnp.float32)

    def stepC3(fb, x):
        x0, y0, tx, ty, sc, col = x
        region = lax.dynamic_slice(atlas, (ty, tx, 0), (R, R, 4))
        texel = mxu_sample(region, sc)
        old = lax.dynamic_slice(fb, (y0, x0, 0), (P, P, 4))
        new = blend(old, texel * col, texel[..., 3] > 0.3)
        return lax.dynamic_update_slice(fb, new, (y0, x0, 0)), None

    # C baseline for reference
    def stepC(fb, x):
        x0, y0, tx, ty, sc, col = x
        u = (Xi * sc[0]).astype(jnp.int32) % 2047
        v = (Yi * sc[1]).astype(jnp.int32) % 2047
        texel = jnp.take(atlas_flat, (ty + v) * 2048 + (tx + u), axis=0)
        old = lax.dynamic_slice(fb, (y0, x0, 0), (P, P, 4))
        new = blend(old, texel * col, texel[..., 3] > 0.3)
        return lax.dynamic_update_slice(fb, new, (y0, x0, 0)), None

    for name, step in [("C  full-atlas gather", stepC),
                       ("C2 region slice+gather", stepC2),
                       ("C3 region slice+MXU", stepC3)]:
        dt = timeit(scan_over(step), fb0)
        print(f"{name}: {dt * 1e3:.3f} ms/frame = "
              f"{dt / K * 1e6:.1f} us/cmd")
        sys.stdout.flush()

    # numerically confirm C3 == C2 sampling (same indices)
    region = lax.dynamic_slice(atlas, (toy[0], tox[0], 0), (R, R, 4))
    u = jnp.clip((Xi * scale[0, 0]).astype(jnp.int32), 0, R - 1)
    v = jnp.clip((Yi * scale[0, 1]).astype(jnp.int32), 0, R - 1)
    g = jnp.take(region.reshape(-1, 4), v * R + u, axis=0)
    m = mxu_sample(region, scale[0])
    print("C3 vs C2 sample maxdiff:", float(jnp.max(jnp.abs(g - m))))


if __name__ == "__main__":
    main()
