#!/usr/bin/env python
"""Phase-A probe for a megaloop raster kernel: does the ~0.29 us/program
fixed cost (tools/exp_r3_fatframes --t32 zero-counts floor; 0.58
ms/frame at the champion's 2040 programs) come from GRID machinery that
an in-kernel fori over tiles would eliminate, or from per-tile work that
survives as loop-iteration cost?

  ctrl:  grid=(NT,)    — zero-work program: scalar reads + one resident
         dynamic row store (the champion's fixed-cost skeleton).
  mega*: grid=(NT/TPG,) — ONE program loops TPG tiles via fori, same
         scalar reads + stores per tile.

If mega at TPG>=24 measures well below ctrl, the megaloop design has
headroom (next phase: consecutive-run SMEM id window per program, walk
inside the loop); if it matches ctrl, the fixed cost is per-tile DMA/
store latency and the design is dead — record either way in ROADMAP.

Timing: fori-loop n-subtraction with a carry data-dependence so XLA
cannot hoist the pallas_call (same guard as exp_r3_texladder).

Run on device: python tools/exp_r4_megaloop.py
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

INTERP = "--interp" in sys.argv          # CPU interpret-mode smoke
if INTERP:
    jax.config.update("jax_platforms", "cpu")

W, H = 1920, 1080
TW, TH = 32, 32
P = TH * TW
NTX = (W + TW - 1) // TW
NTY = (H + TH - 1) // TH
NT = NTX * NTY          # 60 * 34 = 2040


def make_ctrl():
    def kernel(scal_ref, out_ref):
        i = pl.program_id(0)
        c = scal_ref[i]
        bg = scal_ref[3 * NT]
        row = jnp.full((1, P), bg + c, jnp.int32)
        out_ref[pl.ds(i, 1), 0] = row
    return kernel


def make_mega(tpg: int):
    def kernel(scal_ref, out_ref):
        p = pl.program_id(0)
        bg = scal_ref[3 * NT]

        def body(t, acc):
            tile = p * tpg + t
            c = scal_ref[tile]
            out_ref[pl.ds(tile, 1), 0] = jnp.full((1, P), bg + c,
                                                  jnp.int32)
            return acc
        lax.fori_loop(0, tpg, body, 0)
    return kernel


@functools.partial(jax.jit, static_argnums=(1,))
def launch(scalars, tpg: int):
    grid = NT if tpg == 1 else NT // tpg
    kern = make_ctrl() if tpg == 1 else make_mega(tpg)
    return pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((NT, 1, P), jnp.int32)],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[],
            out_specs=[pl.BlockSpec((NT, 1, P), lambda i, s: (0, 0, 0))],
            scratch_shapes=[],
        ),
        interpret=INTERP,
    )(scalars)[0]


@functools.partial(jax.jit, static_argnums=(1, 2))
def reps(scal0, tpg: int, n: int):
    def body(i, acc):
        s = scal0 + (acc & jnp.int32(0))      # defeat hoisting
        out = launch.__wrapped__(s, tpg)
        return acc + out[0, 0, 0] + out[NT - 1, 0, P - 1]
    return lax.fori_loop(0, n, body, jnp.int32(0))


def main():
    rng = np.random.default_rng(0)
    scal = np.zeros(3 * NT + 1, np.int32)
    scal[:NT] = 0                          # counts: zero work
    scal[3 * NT] = 7                       # bg sentinel
    scal = jnp.asarray(scal)

    for tpg in (1, 8, 24, 120, 255 if NT % 255 == 0 else 60):
        if NT % tpg:
            print(f"tpg={tpg}: skipped (NT % tpg != 0)")
            continue
        try:
            t0 = time.time()
            chk = int(reps(scal, tpg, 2))
            print(f"tpg={tpg}: compile {time.time() - t0:.0f}s chk {chk}",
                  flush=True)
            walls = {}
            for n in (8, 24):
                int(reps(scal, tpg, n))
            for n in (8, 24):
                best = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    int(reps(scal, tpg, n))
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                walls[n] = best
            per = (walls[24] - walls[8]) / 16.0
            print(f"tpg={tpg}: {per * 1e3:.3f} ms/launch "
                  f"({per / NT * 1e9:.0f} ns/tile)", flush=True)
        except Exception as e:
            print(f"tpg={tpg}: FAILED {type(e).__name__}: {str(e)[:400]}",
                  flush=True)


if __name__ == "__main__":
    main()
