#!/usr/bin/env python
"""Root-cause probe for the vmap/lax.map canvas-scan TPU worker crash.

Round-2 found that wrapping the canvas display-list executor's command
scan in vmap or lax.map at 1080p reliably kills the TPU worker
(CLAUDE.md trap; pipeline.py dispatches frames individually as the
workaround).  This driver bisects the failure boundary: each config runs
in a SUBPROCESS (so a worker crash doesn't take the driver down) and
reports ok/crash per (height, width, command bucket, wrapper, kinds).

Usage:
  python tools/exp_r3_vmapcrash.py            # run the bisection grid
  python tools/exp_r3_vmapcrash.py one H W N WRAP KINDS   # single probe
"""

import subprocess
import sys

sys.path.insert(0, ".")


def probe(h, w, n, wrap, kinds):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from libnativecpurenderer_tpu import atlas as atlas_mod
    from libnativecpurenderer_tpu.ops import commands as C
    from libnativecpurenderer_tpu.ops import executor

    B = 2
    rng = np.random.default_rng(0)
    if kinds == "tex":
        # the round-2 pipeline actually batched SAMPLING commands (full
        # -frame atlas gathers in the scan executor) — record real
        # draw_texture/draw_splitted_texture commands via a context
        import libnativecpurenderer_tpu as R
        ctx = R.RenderContext(w, h, True)
        texs = [R.Texture._from_array(rng.random((128, 128, 4)), True)
                for _ in range(4)]
        for i in range(n):
            x = float(rng.uniform(0, w - 140))
            y = float(rng.uniform(0, h - 140))
            if i % 2:
                ctx.draw_texture(texs[i % 4], x, y, 80.0, 80.0)
            else:
                ctx.draw_splitted_texture(texs[i % 4], x, y, 100.0,
                                          50.0, 0.1, 0.9, 0.0, 1.0)
        k1, p1 = ctx._cmds.snapshot()
        karr = np.stack([np.asarray(k1)] * B)
        parr = np.stack([np.asarray(p1, np.float32)] * B)
        n = karr.shape[1]
    else:
        karr = np.zeros((B, n), np.int32)
        parr = np.zeros((B, n, C.PARAM_W), np.float32)
    for b in range(B if kinds != "tex" else 0):
        for i in range(n):
            if kinds == "rect":
                karr[b, i] = C.KIND_RECT
                x, y = rng.uniform(0, w - 40), rng.uniform(0, h - 30)
                parr[b, i, 0] = 1.0
                parr[b, i, 3] = 1.0
                parr[b, i, 6:10] = (x, x + 40, y, y + 30)
                parr[b, i, 14:18] = (x, y, x + 40, y + 30)
                parr[b, i, 10:14] = 1.0
                parr[b, i, 18:22] = rng.uniform(0.2, 1, 4)
            else:                      # mixed: rect + fill + vgrd
                k = (C.KIND_RECT, C.KIND_FILL, C.KIND_VGRD)[i % 3]
                karr[b, i] = k
                parr[b, i, 0] = 1.0
                parr[b, i, 3] = 1.0
                parr[b, i, 6:10] = (0, w, 0, h)
                parr[b, i, 10:14] = 1.0
                parr[b, i, 14:22] = rng.uniform(0, 1, 8)

    store = atlas_mod.get_store(np.dtype(np.float32))
    fb0 = jnp.zeros((h, w, 4), jnp.float32)
    kj = jnp.asarray(karr)
    pj = jnp.asarray(parr)

    def one(k, p):
        return executor.render_command_list(fb0, k, p, store.device, 0, 0)

    if wrap == "vmap":
        out = jax.jit(jax.vmap(one))(kj, pj)
    elif wrap == "map":
        out = jax.jit(lambda a, b: jax.lax.map(
            lambda ab: one(ab[0], ab[1]), (a, b)))(kj, pj)
    else:                              # loop: the production workaround
        out = jnp.stack([one(kj[i], pj[i]) for i in range(B)])
    print("SUM", float(jnp.sum(out.astype(jnp.float32))), flush=True)


def main():
    grid = []
    if "--tex-only" not in sys.argv:
        for wrap in ("vmap", "map"):
            for h, w in ((270, 480), (540, 960), (1080, 1920)):
                for n in (16, 64):
                    grid.append((h, w, n, wrap, "rect"))
        grid.append((1080, 1920, 16, "vmap", "mixed"))
        grid.append((1080, 1920, 16, "loop", "rect"))
    # sampling commands (full-frame atlas gathers) — the round-2
    # pipeline's actual batched workload
    grid.append((1080, 1920, 30, "vmap", "tex"))
    grid.append((1080, 1920, 30, "map", "tex"))
    grid.append((540, 960, 30, "vmap", "tex"))
    for h, w, n, wrap, kinds in grid:
        r = subprocess.run(
            [sys.executable, __file__, "one", str(h), str(w), str(n),
             wrap, kinds],
            capture_output=True, text=True, timeout=1200)
        ok = r.returncode == 0 and "SUM" in r.stdout
        tail = (r.stdout + r.stderr).strip().splitlines()
        tail = tail[-1][:140] if tail else ""
        print(f"{wrap:5s} {h:4d}x{w:4d} n={n:3d} {kinds:5s} -> "
              f"{'ok' if ok else 'CRASH rc=%d' % r.returncode} | {tail}",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        probe(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
              sys.argv[5], sys.argv[6])
    else:
        main()
