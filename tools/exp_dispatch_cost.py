#!/usr/bin/env python
"""Pin down the axon tunnel's per-item costs: what does a frame cost as a
function of (#executions, #host->device transfers) in the steady pipeline?

Each config runs 30 'frames'; each frame chains k tiny jitted executions
(donated carry) and optionally t fresh small transfers consumed by the
first execution.  One checksum sync at the end.
"""

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N = 512


@jax.jit
def step_const(x):
    return x * 1.000001 + 0.5


@jax.jit
def step_with_arg(x, a):
    return x * 1.000001 + jnp.sum(a) * 1e-9


def run(frames, k_exec, t_xfer):
    x = jnp.zeros((N, N), jnp.float32)
    # warm
    for _ in range(2):
        a = jnp.asarray(np.ones((64, 32), np.float32))
        x = step_with_arg(x, a)
        for _ in range(k_exec - 1):
            x = step_const(x)
    float(np.asarray(x[0, 0]))
    t0 = time.perf_counter()
    for f in range(frames):
        if t_xfer:
            arrs = [jnp.asarray(np.full((64, 32), f, np.float32))
                    for _ in range(t_xfer)]
            x = step_with_arg(x, arrs[0])
            rest = k_exec - 1
        else:
            rest = k_exec
        for _ in range(rest):
            x = step_const(x)
    float(np.asarray(x[0, 0]))
    return (time.perf_counter() - t0) / frames


def main():
    frames = 30
    for k_exec, t_xfer in [(1, 0), (2, 0), (4, 0), (8, 0),
                           (1, 1), (1, 2), (1, 4),
                           (2, 2), (4, 4)]:
        dt = run(frames, k_exec, t_xfer)
        print(f"execs={k_exec} xfers={t_xfer}: {dt * 1e3:.2f} ms/frame")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
