"""Multi-device sharding tests (8 virtual CPU devices via conftest)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libnativecpurenderer_tpu.models import mesh as mesh_mod
from libnativecpurenderer_tpu.ops import raster3d
from libnativecpurenderer_tpu.parallel import sharding


@pytest.fixture(scope="module")
def devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_sharded_step_matches_single_device(devices):
    dev_mesh = sharding.make_mesh(devices)
    width, height = 64, 32
    verts_np, faces_np = mesh_mod.icosphere(1)
    colors_np = np.concatenate([np.abs(verts_np),
                                np.ones((len(verts_np), 1))], 1)
    step, (dn, tn, band_h) = sharding.sharded_render_step(
        dev_mesh, width, height, faces_np, colors_np)

    B = dn * 2
    angles = jnp.linspace(0.0, 1.0, B, dtype=jnp.float32)
    verts = jnp.asarray(verts_np, jnp.float32)
    proj = mesh_mod.perspective(1.0, width / height, 0.1, 10.0)
    view = mesh_mod.look_at([0, 0, 2.5], [0, 0, 0], [0, 1, 0])
    pv = jnp.asarray(proj @ view, jnp.float32)
    events = jnp.linspace(0.0, 0.9, B, dtype=jnp.float32)

    frames, mixed, lum = jax.jit(step)(angles, verts, pv, events)
    assert frames.shape == (B, height, width, 4)
    assert lum.shape == (B,)

    # single-device reference via the plain renderer
    for i in [0, B - 1]:
        mvp = pv @ jnp.asarray(mesh_mod.rotation_y(float(angles[i])),
                               jnp.float32)
        fb, _ = raster3d.render_gouraud(
            verts, jnp.asarray(faces_np, jnp.int32),
            jnp.asarray(colors_np, jnp.float32), width, height, mvp)
        np.testing.assert_allclose(np.asarray(frames[i]), np.asarray(fb),
                                   atol=1e-5)
        np.testing.assert_allclose(
            float(lum[i]), float(np.mean(np.asarray(fb)[..., :3])),
            atol=1e-6)


def test_mesh_factoring(devices):
    m = sharding.make_mesh(devices)
    assert m.shape["data"] * m.shape["tile"] == 8


def test_dryrun_entry(devices):
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_sharded_canvas_matches_single_device(devices):
    import libnativecpurenderer_tpu as R
    from libnativecpurenderer_tpu.ops import commands as C

    dev_mesh = sharding.make_mesh(devices)
    W, H = 64, 32
    ctx = R.RenderContext(W, H, True)
    rng = np.random.default_rng(0)
    tex = R.Texture(8, 8, True, rng.random((8, 8, 4)).tobytes(),
                    is_uint8=False)

    frames_k, frames_p = [], []
    seq = []
    B = dev_mesh.shape["data"] * 2
    for i in range(B):
        ctx.set_color(0, 0, 0, 1)
        ctx.save_state()
        ctx.translate(5 + i * 3.0, 4.0)
        ctx.rotate(0.15 * i)
        ctx.draw_rect(0, 0, 12, 8, 0.9, 0.4, 0.2, 0.8)
        ctx.draw_texture(tex, 2, 2, 10, 10)
        ctx.draw_circle(30, 16, 6 + i, 0.1, 0.6, 1.0, 0.5)
        ctx.restore_state()
        k, p = ctx._cmds.snapshot()
        b = C.bucket_for(k.shape[0])
        kp = np.zeros(b, np.int32); kp[: k.shape[0]] = k
        pp = np.zeros((b, C.PARAM_W), np.float64)
        pp[: p.shape[0]] = p
        frames_k.append(kp); frames_p.append(pp)
        seq.append(ctx.uint8_buffer().copy())   # single-device reference
        ctx._cmds.clear()

    step, band_h = sharding.sharded_canvas_step(dev_mesh, W, H)
    out = jax.jit(step)(jnp.asarray(np.stack(frames_k)),
                        jnp.asarray(np.stack(frames_p)),
                        ctx._store.device)
    assert out.shape == (B, H, W, 4)
    for i in range(B):
        np.testing.assert_array_equal(np.asarray(out[i]), seq[i])
