#!/usr/bin/env python
"""Bisect the Mosaic compiler crash on the mxu chunk walk.

exp_r4_mxu: every mxu=1/2 config dies with `tpu_compile_helper
subprocess exit code 1` (HTTP 500 from the remote compile) while
interpret mode is bit-correct — a Mosaic legalization/compiler fault,
not a semantics bug.  Suspects, probed in isolation on a tiny grid:

  A  dot_general (kcc,4)x(4,P) f32, precision HIGHEST
  B  dot_general (nq*kcc,4)x(4,P) (tall LHS, the shipped shape)
  C  B + reshape (nq*kcc,P)->(nq,kcc,P)   [sublane split to 3D]
  D  C + indexing V[q] back to 2D slabs
  E  the 7-slab sublane concat building mcoef from rows slices
  F  per-quantity loop: nq separate (kcc,4)x(4,P) dots (no concat,
     no 3D reshape) — the fallback formulation if B/C/E is the crash

Each variant compiles separately; the first FAILED line names the
culprit.  Run: nohup python tools/exp_r4_mxu_bisect.py > /tmp/exp_mxu_bisect.log 2>&1 &
"""

import sys
import traceback

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

sys.path.insert(0, ".")

KCC = 16
P = 1024
NQ = 7


def run(name, kernel, n_out=1):
    try:
        out_shapes = tuple(
            jax.ShapeDtypeStruct((1, P), jnp.float32) for _ in range(n_out))
        f = pl.pallas_call(
            kernel,
            grid=(2,),
            in_specs=[pl.BlockSpec((NQ * KCC, 4), lambda i: (0, 0)),
                      pl.BlockSpec((KCC, P), lambda i: (0, 0))],
            out_specs=(tuple(pl.BlockSpec((1, P), lambda i: (0, 0))
                             for _ in range(n_out)) if n_out > 1
                       else pl.BlockSpec((1, P), lambda i: (0, 0))),
            out_shape=(out_shapes if n_out > 1 else out_shapes[0]),
        )
        coef = jnp.ones((NQ * KCC, 4), jnp.float32)
        aux = jnp.ones((KCC, P), jnp.float32)
        outs = jax.jit(lambda a, b: f(a, b))(coef, aux)
        o = outs[0] if isinstance(outs, (tuple, list)) else outs
        print(f"{name}: OK chk {float(jnp.sum(o)):.6g}", flush=True)
    except Exception as e:
        msg = str(e).replace(chr(10), " ")[:200]
        print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)
        if "-v" in sys.argv:
            traceback.print_exc()


def p4(aux_ref):
    x1 = aux_ref[0:1, :]
    y1 = aux_ref[1:2, :]
    return jnp.concatenate(
        [x1, y1, jnp.ones((1, P), jnp.float32),
         jnp.zeros((1, P), jnp.float32)], axis=0)          # (4, P)


def kA(coef_ref, aux_ref, o_ref):
    V = lax.dot_general(coef_ref[:KCC, :], p4(aux_ref),
                        (((1,), (0,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)   # (KCC, P)
    o_ref[0, :] = jnp.sum(V, axis=0)


def kB(coef_ref, aux_ref, o_ref):
    V = lax.dot_general(coef_ref[:, :], p4(aux_ref),
                        (((1,), (0,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)   # (NQ*KCC, P)
    o_ref[0, :] = jnp.sum(V, axis=0)


def kC(coef_ref, aux_ref, o_ref):
    V = lax.dot_general(coef_ref[:, :], p4(aux_ref),
                        (((1,), (0,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    V = V.reshape(NQ, KCC, P)
    o_ref[0, :] = jnp.sum(V[0], axis=0)


def kD(coef_ref, aux_ref, o_ref):
    V = lax.dot_general(coef_ref[:, :], p4(aux_ref),
                        (((1,), (0,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    V = V.reshape(NQ, KCC, P)
    acc = jnp.zeros((1, P), jnp.float32)
    for q in range(NQ):
        acc = acc + jnp.sum(V[q], axis=0, keepdims=True)
    o_ref[0, :] = acc[0, :]


def kE(coef_ref, aux_ref, o_ref):
    rows = aux_ref[:, :]          # (KCC, P) stand-in for the table rows
    mcoef = jnp.concatenate(
        [rows[:, 4 * q:4 * (q + 1)] for q in range(NQ)], axis=0)
    V = lax.dot_general(mcoef, p4(aux_ref),
                        (((1,), (0,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    o_ref[0, :] = jnp.sum(V, axis=0)


def kF(coef_ref, aux_ref, o_ref):
    pp = p4(aux_ref)
    acc = jnp.zeros((1, P), jnp.float32)
    for q in range(NQ):
        Vq = lax.dot_general(coef_ref[q * KCC:(q + 1) * KCC, :], pp,
                             (((1,), (0,)), ((), ())),
                             precision=lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
        acc = acc + jnp.sum(Vq, axis=0, keepdims=True)
    o_ref[0, :] = acc[0, :]


def kE1(coef_ref, aux_ref, o_ref):
    # lane-slice LHS, NO concat: is the 4-lane slice itself the crasher?
    rows = aux_ref[:, :]
    V = lax.dot_general(rows[:, 0:4], p4(aux_ref),
                        (((1,), (0,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    o_ref[0, :] = jnp.sum(V, axis=0)


def kE2(coef_ref, aux_ref, o_ref):
    # sublane concat of two lane-sliced slabs (minimal E)
    rows = aux_ref[:, :]
    mcoef = jnp.concatenate([rows[:, 0:4], rows[:, 4:8]], axis=0)
    V = lax.dot_general(mcoef, p4(aux_ref),
                        (((1,), (0,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    o_ref[0, :] = jnp.sum(V, axis=0)


def kE3(coef_ref, aux_ref, o_ref):
    # F-style per-quantity dots but with lane-sliced LHS from rows
    rows = aux_ref[:, :]
    pp = p4(aux_ref)
    acc = jnp.zeros((1, P), jnp.float32)
    for q in range(NQ):
        Vq = lax.dot_general(rows[:, 4 * q:4 * (q + 1)], pp,
                             (((1,), (0,)), ((), ())),
                             precision=lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
        acc = acc + jnp.sum(Vq, axis=0, keepdims=True)
    o_ref[0, :] = acc[0, :]


def kA_default(coef_ref, aux_ref, o_ref):
    V = lax.dot_general(coef_ref[:KCC, :], p4(aux_ref),
                        (((1,), (0,)), ((), ())),
                        precision=lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
    o_ref[0, :] = jnp.sum(V, axis=0)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    run("A  (kcc,4)x(4,P) HIGHEST", kA)
    run("A' (kcc,4)x(4,P) DEFAULT", kA_default)
    run("B  (nq*kcc,4)x(4,P)", kB)
    run("C  B + 3D reshape", kC)
    run("D  C + V[q] slabs", kD)
    run("E  7-slab sublane concat + dot", kE)
    run("E1 lane-slice LHS, no concat", kE1)
    run("E2 2-slab sublane concat + dot", kE2)
    run("E3 per-quantity dots, lane-sliced LHS", kE3)
    run("F  per-quantity dots", kF)
