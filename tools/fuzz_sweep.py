#!/usr/bin/env python
"""Extended differential fuzz sweeps (slow; not part of the CI suite).

Runs the golden-suite fuzz generators far past their CI seed ranges.
Round-3 yield: canvas_kernel's unsnapped inverse mapping (knife-edge
membership flips vs the scan executor) at sweep seeds 23/25 — now CI
regressions in tests/test_fuzz_canvas.py.

Sweeps:
  canvas   — executor vs NumPy f64 oracle + segmented-vs-scan,
             seeds [6, 120)
  kernel   — kernel-route vs scan, seeds [3, 40)
  raster   — flat Pallas kernel (interpret) vs naive XLA reference,
             40 random camera orbits, alternating near_clip
  angles   — adversarial integer-coordinate knife-edge scenes every
             7 degrees
  sharded  — 8-virtual-device sharded canvas step vs single-device,
             12 random streams x 2*data-axis frames
  mxu      — MXU chunk walk vs FMA walk (interpret), 24 random
             cameras; reports worst any-diff / winner-flip pixel rates

Usage: python tools/fuzz_sweep.py [sweep ...]   (default: all)
Run under nohup; ~10-20 min total on this host.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from libnativecpurenderer_tpu import config  # noqa: E402

config.set_default_dtype(np.float64)

FAILS = 0


def _fail(msg):
    global FAILS
    FAILS += 1
    print("FAIL", msg, flush=True)


def sweep_canvas():
    import test_fuzz_canvas as tfc
    for seed in range(6, 120):
        for name, fn in (("oracle", tfc.test_fuzz_commands_match_oracle),
                         ("seg_vs_scan", tfc.test_fuzz_segmented_vs_scan)):
            try:
                fn(seed)
            except Exception as e:
                _fail(f"canvas {name} seed {seed}: {repr(e)[:200]}")
        if seed % 20 == 0:
            print("canvas seed", seed, flush=True)


def sweep_kernel():
    import test_fuzz_canvas as tfc
    for seed in range(3, 40):
        try:
            tfc.test_fuzz_kernel_route_vs_scan(seed)
        except Exception as e:
            _fail(f"kernel seed {seed}: {repr(e)[:200]}")
    print("kernel done", flush=True)


def sweep_raster():
    from libnativecpurenderer_tpu.models import mesh
    from libnativecpurenderer_tpu.ops import raster3d
    W, H = 64, 32
    verts, faces = mesh.icosphere(2)
    colors = np.concatenate([np.abs(verts), np.ones((len(verts), 1))], 1)
    v = jnp.asarray(verts, jnp.float32)
    f = jnp.asarray(faces, jnp.int32)
    c = jnp.asarray(colors, jnp.float32)
    rng = np.random.default_rng(99)
    for t in range(40):
        eye = rng.uniform(-1, 1, 3)
        eye = eye / np.linalg.norm(eye) * rng.uniform(1.1, 4.0)
        m = (mesh.perspective(rng.uniform(0.7, 1.4), W / H, 0.1, 10.0)
             @ mesh.look_at(eye, [0, 0, 0], [0, 1, 0]))
        m = jnp.asarray(m, jnp.float32)
        nc = bool(t % 2)
        try:
            fb_n, z_n = raster3d.render_gouraud(v, f, c, W, H, m)
            fb_p, z_p, ovf = raster3d.render_gouraud_pallas(
                v, f, c, W, H, m, tile_w=32, tile_h=8, capacity=128,
                span_x=6, span_y=8, interpret=True, flat=True,
                near_clip=nc)
            if bool(ovf):
                continue
            if nc:
                # near-clip adds coverage the naive path drops; compare
                # only where the naive reference rendered
                cov = np.asarray(z_n) < 1.0
                a = np.asarray(fb_p)[cov]
                b = np.asarray(fb_n)[cov]
            else:
                a, b = np.asarray(fb_p), np.asarray(fb_n)
            err = float(np.abs(a - b).max()) if a.size else 0.0
            if err > 2e-5:
                _fail(f"raster cam {t} nc={nc} err {err}")
        except Exception as e:
            _fail(f"raster cam {t} nc={nc}: {repr(e)[:200]}")
        if t % 10 == 0:
            print("raster cam", t, flush=True)


def sweep_angles():
    import test_fuzz_canvas as tfc
    for ang in range(5, 360, 7):
        try:
            tfc.test_adversarial_knife_edge_across_executors(ang)
        except Exception as e:
            _fail(f"angle {ang}: {repr(e)[:200]}")
    print("angles done", flush=True)


def sweep_sharded():
    import test_fuzz_canvas as tfc
    import libnativecpurenderer_tpu as R
    from libnativecpurenderer_tpu.ops import commands as C
    from libnativecpurenderer_tpu.parallel import sharding

    class _NullGolden:
        def __getattr__(self, name):
            return lambda *a, **k: None

    W, H = 64, 32
    dev_mesh = sharding.make_mesh(jax.devices())
    step, _band = sharding.sharded_canvas_step(dev_mesh, W, H)
    jit_step = jax.jit(step)
    for seed in range(12):
        rng = np.random.default_rng(5000 + seed)
        ctx = R.RenderContext(W, H, True)
        tex_pairs = []
        for _ in range(2):
            w, h = int(rng.integers(2, 12)), int(rng.integers(2, 12))
            arr = rng.random((h, w, 4))
            t = R.Texture(w, h, True, arr.astype(np.float64).tobytes(),
                          is_uint8=False)
            tex_pairs.append((t, t))
        frames_k, frames_p, seq = [], [], []
        B = dev_mesh.shape["data"] * 2
        for _ in range(B):
            ctx.set_color(0, 0, 0, 1)
            tfc._apply_random_ops(rng, ctx, _NullGolden(), tex_pairs, 12)
            k, p = ctx._cmds.snapshot()
            b = C.bucket_for(max(k.shape[0], 1))
            kp = np.zeros(b, np.int32)
            kp[: k.shape[0]] = k
            pp = np.zeros((b, C.PARAM_W), np.float64)
            pp[: p.shape[0]] = p
            frames_k.append(kp)
            frames_p.append(pp)
            seq.append(ctx.uint8_buffer().copy())
            ctx._cmds.clear()
            ctx._fb = jnp.zeros_like(ctx._fb)
            ctx._state.__init__()
        mb = max(f.shape[0] for f in frames_k)
        frames_k = [np.pad(f, (0, mb - f.shape[0])) for f in frames_k]
        frames_p = [np.pad(p, ((0, mb - p.shape[0]), (0, 0)))
                    for p in frames_p]
        out = jit_step(jnp.asarray(np.stack(frames_k)),
                       jnp.asarray(np.stack(frames_p)),
                       ctx._store.device)
        for i in range(B):
            if not np.array_equal(np.asarray(out[i]), seq[i]):
                _fail(f"sharded seed {seed} frame {i}")
        print("sharded seed", seed, flush=True)


def sweep_mxu():
    from libnativecpurenderer_tpu.models import mesh
    from libnativecpurenderer_tpu.ops import raster3d
    W, H = 96, 64
    v_np, f_np = mesh.icosphere(2)
    c_np = np.concatenate([np.abs(v_np), np.ones((len(v_np), 1))], 1)
    v = jnp.asarray(v_np, jnp.float32)
    f = jnp.asarray(f_np, jnp.int32)
    c = jnp.asarray(c_np, jnp.float32)
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    rng = np.random.default_rng(0)
    worst_diff = worst_big = 0.0
    for trial in range(24):
        eye = rng.uniform(-1, 1, 3) * [1.5, 1.5, 0.5] + [0, 0, 2.5]
        m = jnp.asarray(
            proj @ mesh.look_at(eye, [0, 0, 0], [0, 1, 0])
            @ mesh.rotation_x(rng.uniform(0, 6.28))
            @ mesh.rotation_y(rng.uniform(0, 6.28)), jnp.float32)
        kw = dict(tile_w=32, tile_h=8, capacity=128, span_x=8, span_y=8,
                  interpret=True, flat=True, u8=True, opaque=True)
        base, _, o1 = raster3d.render_gouraud_pallas(v, f, c, W, H, m,
                                                     **kw)
        mx, _, o2 = raster3d.render_gouraud_pallas(v, f, c, W, H, m,
                                                   **kw, mxu=1)
        if bool(o1) or bool(o2):
            continue
        a = np.asarray(base).astype(np.int32)
        b = np.asarray(mx).astype(np.int32)
        d = np.abs(a - b)
        diff = np.any(d > 0, axis=-1)
        big = diff & (d.max(axis=-1) > 1)
        worst_diff = max(worst_diff, float(diff.mean()))
        worst_big = max(worst_big, float(big.mean()))
        if big.mean() > 0.002:
            _fail(f"mxu trial {trial} big {big.mean():.5f}")
    print(f"mxu done worst_diff {worst_diff:.4f} worst_big "
          f"{worst_big:.5f}", flush=True)


def sweep_notes():
    """Deep version of tests/test_fastrec.py's adversarial note fuzz:
    reuses the pytest body with a monkeypatch shim over far more
    trials by re-seeding its outer RNG."""
    import tempfile
    import pathlib

    import test_fastrec as tfr
    import conftest as cft

    class _MP:
        def __init__(self):
            self._s = []

        def context(self):
            return self

        def __enter__(self):
            return self

        def __exit__(self, *a):
            for o, n, v in self._s:
                setattr(o, n, v)
            self._s.clear()

        def setattr(self, obj, name, val):
            self._s.append((obj, name, getattr(obj, name)))
            setattr(obj, name, val)

    for round_ in range(10):
        td = pathlib.Path(tempfile.mkdtemp())
        zpath, res = cft.chart_package.__wrapped__(td)
        # re-seed the test's RNG stream by deriving fresh trial seeds:
        # the test itself consumes np.random.default_rng(17); run it
        # as-is once, then with perturbed global state via monkeypatched
        # default_rng inside the module
        orig_rng = np.random.default_rng

        def seeded_rng(seed=None, _r=round_):
            if seed is None:
                return orig_rng()
            return orig_rng((int(seed) * 1000003 + _r * 7919)
                            % (1 << 63))
        np.random.default_rng = seeded_rng
        try:
            tfr.test_note_blit_adversarial_fuzz(td, (zpath, res), _MP())
        except Exception as e:
            _fail(f"notes round {round_}: {repr(e)[:300]}")
        finally:
            np.random.default_rng = orig_rng
        print("notes round", round_, flush=True)


ALL = {"canvas": sweep_canvas, "kernel": sweep_kernel,
       "raster": sweep_raster, "angles": sweep_angles,
       "sharded": sweep_sharded, "mxu": sweep_mxu,
       "notes": sweep_notes}


def main():
    names = sys.argv[1:] or list(ALL)
    for n in names:
        print(f"=== sweep {n}", flush=True)
        ALL[n]()
    print("SWEEPS DONE", FAILS, "failures", flush=True)
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
