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


KB = 512


def make_ctrl_smem(nread: int):
    """A2: the grid design WITH the champion's two scalar-indexed SMEM
    id blocks (and a forced read from each), isolating the per-program
    SMEM block-DMA cost the A1 toy lacked."""
    def kernel(scal_ref, b0, b1, out_ref):
        i = pl.program_id(0)
        c = scal_ref[i]
        bg = scal_ref[3 * NT]
        if nread == 0:                     # A3: vector read (VMEM block)
            v = jnp.min(jnp.minimum(b0[0, 0, :], b1[0, 0, :]))
        else:
            v = b0[0, 0, 0] + b1[0, 0, 0]
            for j in range(1, nread):
                v += b0[0, 0, j * (KB // nread)]
        # min(v, 0) == 0 for the generated non-negative ids, but Mosaic
        # cannot prove it, so the block reads stay live
        out_ref[pl.ds(i, 1), 0] = jnp.full((1, P), bg + c,
                                           jnp.int32) + jnp.minimum(
                                               v, jnp.int32(0))
    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3))
def launch_smem(scalars, blocks, nread: int, vmem: bool):
    if vmem:        # default memory space = VMEM block
        in_specs = [
            pl.BlockSpec((1, 1, KB), lambda i, s: (s[2 * NT + i], 0, 0)),
            pl.BlockSpec((1, 1, KB),
                         lambda i, s: (s[2 * NT + i] + 1, 0, 0)),
        ]
    else:
        in_specs = [
            pl.BlockSpec((1, 1, KB), lambda i, s: (s[2 * NT + i], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, KB),
                         lambda i, s: (s[2 * NT + i] + 1, 0, 0),
                         memory_space=pltpu.SMEM),
        ]
    return pl.pallas_call(
        make_ctrl_smem(nread),
        out_shape=[jax.ShapeDtypeStruct((NT, 1, P), jnp.int32)],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NT,),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((NT, 1, P), lambda i, s: (0, 0, 0))],
            scratch_shapes=[],
        ),
        interpret=INTERP,
    )(scalars, blocks, blocks)[0]


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def reps_smem(scal0, blocks, nread: int, vmem: bool, n: int):
    def body(i, acc):
        s = scal0 + (acc & jnp.int32(0))
        out = launch_smem.__wrapped__(s, blocks, nread, vmem)
        return acc + out[0, 0, 0] + out[NT - 1, 0, P - 1]
    return lax.fori_loop(0, n, body, jnp.int32(0))


def main():
    rng = np.random.default_rng(0)
    scal = np.zeros(3 * NT + 1, np.int32)
    scal[:NT] = 0                          # counts: zero work
    scal[3 * NT] = 7                       # bg sentinel
    scal = jnp.asarray(scal)

    # A2 scalars: realistic run starts (~73 pairs/tile, the champion's
    # ~150k-slot frame) -> block index advances every ~7 tiles
    counts = rng.poisson(73, NT).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)])[:NT]
    scal2 = np.zeros(3 * NT + 1, np.int32)
    scal2[2 * NT:3 * NT] = (starts // KB).astype(np.int32)
    scal2[3 * NT] = 7
    nblocks = int(starts[-1] // KB) + 3
    blocks = jnp.asarray(rng.integers(0, 100, (nblocks, 1, KB), np.int32))
    scal2 = jnp.asarray(scal2)

    for tag, nread, vmem in (("A2_smem_r2", 1, False),
                             ("A2_smem_r8", 8, False),
                             ("A3_vmem_vec", 0, True)):
        try:
            t0 = time.time()
            chk = int(reps_smem(scal2, blocks, nread, vmem, 2))
            print(f"{tag}: compile {time.time() - t0:.0f}s chk {chk}",
                  flush=True)
            walls = {}
            for n in (8, 24):
                int(reps_smem(scal2, blocks, nread, vmem, n))
            for n in (8, 24):
                best = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    int(reps_smem(scal2, blocks, nread, vmem, n))
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                walls[n] = best
            per = (walls[24] - walls[8]) / 16.0
            print(f"{tag}: {per * 1e3:.3f} ms/launch "
                  f"({per / NT * 1e9:.0f} ns/tile)", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:400]}",
                  flush=True)

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
