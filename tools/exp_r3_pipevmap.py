"""A/B: vmapped whole-batch pipeline frame step vs per-frame dispatches.

The round-1 "vmap at 1080p crashes the TPU worker" trap measured
unreproducible (tools/exp_r3_vmapcrash*.py, ROADMAP), which re-opens
batch-level vmap designs for the production frame path.  This measures
the real candidate: when every frame in a pipeline batch shares one
unrolled-flush signature (the common case — frames of a scene repeat
the same command structure), the B per-frame ``frame_step_unrolled``
dispatches can collapse into ONE vmapped device program.

  A (shipped): pipeline._flush_segmented_frames — B async dispatches.
  B (candidate): jax.vmap(frame_step) over the stacked (B, rows, PARAM_W)
     params, fb0/atlas broadcast, sig static.

Host dispatch costs ~0.5 ms each through the tunnel; at B=15 the B path
saves ~7 ms/batch of host work IF the vmapped program's device time does
not regress (the old crash risk; also XLA may schedule the mapped frames
worse than the pipelined queue).  Ship only on a measured win.

Run on device:  python tools/exp_r3_pipevmap.py
"""

import functools
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402

if "--small" in sys.argv:      # CPU smoke: structure only, not perf
    jax.config.update("jax_platforms", "cpu")
    W, H = 480, 272
    BATCH, BATCHES = 4, 2
else:
    W, H = 1920, 1080
    BATCH = 15
    BATCHES = 5      # frames per timed rep = 75

import jax.numpy as jnp  # noqa: E402

import libnativecpurenderer_tpu as R  # noqa: E402
from libnativecpurenderer_tpu.ops import patch_exec  # noqa: E402


def build_scene():
    rec = R.MultiThreadedVideoRenderContextPreparer(None, W, H, True)
    rng = np.random.default_rng(0)
    texs = [R.Texture._from_array(rng.random((128, 128, 4)), True)
            for _ in range(4)]

    def draw(t):
        rec.fill_color(0.05, 0.05, 0.08, 0.25)
        r2 = np.random.default_rng(42)
        for i in range(24):
            x = float(r2.uniform(0, W - 140) + 40 * math.sin(t * 2 + i))
            y = float(r2.uniform(0, H - 140))
            rec.draw_splitted_texture(texs[i % 4], x, y, 100.0, 50.0,
                                      0.1, 0.9, 0.0, 1.0)
        for i in range(8):
            rec.draw_rect(float(r2.uniform(0, W - 60)),
                          float(r2.uniform(0, H - 60)),
                          40.0, 24.0, 0.2, 0.8, 0.4, 0.7)

    snaps = []
    for f in range(BATCH * BATCHES):
        draw(f * 0.016)
        k, p = rec._cmds.snapshot()
        snaps.append((k.copy(), p.copy()))
        rec._cmds.clear()
    return rec, snaps


# the shipped batch path (ops/patch_exec.py), gated in production by
# config.pipeline_vmap() — this A/B is the gate's evidence
frame_step_batch = patch_exec.frame_step_unrolled_batch


def main():
    rec, snaps = build_scene()
    fb0 = jnp.zeros((H, W, 4), rec._dtype)

    from libnativecpurenderer_tpu import atlas as atlas_mod
    store = atlas_mod.get_store(rec._dtype)
    atlas = store.device

    # --- plan every frame once on the host; group by signature --------
    ctx = R.RenderContext(W, H, True, dtype=rec._dtype)
    packed = []
    for k, p in snaps:
        segs = patch_exec.plan_segments(k, p, W, H, atlas.shape)
        assert all(s[0] in ("patch", "fullarith") for s in segs), segs
        ps = None
        for _ in range(4):         # warm the min-seen signature gate
            ps = ctx._unroll_pack(segs, k, p)
            if ps is not None:
                break
        assert ps is not None, "unroll gate never opened (compile cap?)"
        packed.append(ps)
    sigs = {id(s): s for s, _ in packed}
    uniq = {repr(s): s for s, _ in packed}
    print(f"{len(snaps)} frames, {len(uniq)} distinct sigs "
          f"(vmap path needs 1/batch)")

    # --- A: shipped per-frame path ------------------------------------
    def run_a():
        chk = jnp.float32(0.0)
        for sig, rows in packed:
            u8 = patch_exec.frame_step_unrolled(fb0, jnp.asarray(rows),
                                                atlas, sig)
            chk = chk + jnp.sum(u8[0, :64, 0].astype(jnp.float32))
        return float(chk)

    # --- B: one vmapped dispatch per same-sig batch --------------------
    rows_np = {}
    for b in range(BATCHES):
        grp = packed[b * BATCH:(b + 1) * BATCH]
        sig0 = grp[0][0]
        assert all(s == sig0 for s, _ in grp), "sig churn in batch"
        rows_np[b] = (sig0, np.stack([r for _, r in grp]))

    def run_b():
        chk = jnp.float32(0.0)
        for b in range(BATCHES):
            sig, rows = rows_np[b]
            u8 = frame_step_batch(fb0, jnp.asarray(rows), atlas, sig)
            chk = chk + jnp.sum(u8[:, 0, :64, 0].astype(jnp.float32))
        return float(chk)

    n_frames = len(packed)
    t0 = time.perf_counter()
    ca = run_a()
    print(f"A warm {time.perf_counter() - t0:.1f}s chk {ca:.0f}")
    t0 = time.perf_counter()
    cb = run_b()
    print(f"B warm {time.perf_counter() - t0:.1f}s chk {cb:.0f} "
          f"({'BIT-EQUAL' if ca == cb else 'MISMATCH'})")

    for name, fn in (("A perframe", run_a), ("B vmapbatch", run_b),
                     ("A perframe", run_a), ("B vmapbatch", run_b)):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            dt = (time.perf_counter() - t0) / n_frames
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best * 1e3:.2f} ms/frame ({1 / best:.1f} fps)")


if __name__ == "__main__":
    main()
