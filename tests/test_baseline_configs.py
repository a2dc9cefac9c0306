"""The five BASELINE.json acceptance configs as explicit tests.

1. single flat-shaded triangle -> 512x512 RGBA framebuffer with depth test
   (golden PNG vs the CPU oracle)
2. textured quad batch (test_files/image.png) with alpha blending + z-test
   at 1280x720
3. 10k-triangle rotating mesh, per-pixel depth + Gouraud shading, 60-frame
   sequence at 1080p (shape/overflow/correctness-vs-naive at reduced frame
   count on CPU; full-rate timing lives in bench.py)
4. hjm_mixer-style overlay of audio + hit per audio_overlay_test.json,
   sample-accurate golden waveform
5. MIDI-driven AV render: rr.mid note events -> synchronized audio mixdown
   + animated frame stream
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

import libnativecpurenderer_tpu as R
from libnativecpurenderer_tpu import media
from libnativecpurenderer_tpu.models import mesh
from libnativecpurenderer_tpu.ops import raster3d
from libnativecpurenderer_tpu.golden import raster_reference as gref

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden_data")


def test_config1_single_triangle_golden_png():
    W = H = 512
    verts = np.array([[-0.6, -0.5, 0.3], [0.7, -0.3, 0.3], [0.05, 0.75, 0.3]])
    faces = np.array([[0, 1, 2]])
    colors = np.tile([0.9, 0.35, 0.2, 1.0], (3, 1))
    fb, z = raster3d.render_gouraud(
        jnp.asarray(verts, jnp.float64), jnp.asarray(faces, jnp.int32),
        jnp.asarray(colors, jnp.float64), W, H)
    u8 = np.asarray(jnp.clip(fb * 255, 0, 255).astype(jnp.uint8))
    assert (np.asarray(z) < 1.0).any()  # depth written

    golden_fp = os.path.join(GOLDEN_DIR, "config1_triangle.png")
    from PIL import Image
    if not os.path.exists(golden_fp):
        gfb, _ = gref.render_gouraud(verts, faces, colors, W, H)
        gu8 = np.clip(gfb * 255, 0, 255).astype(np.uint8)
        Image.fromarray(gu8, "RGBA").save(golden_fp)
    want = np.asarray(Image.open(golden_fp))
    # flat color 0.2*255 == 51.000000000000004: a 1-ULP barycentric-sum
    # difference (XLA FMA contraction) flips the u8 truncation by 1
    diff = np.abs(u8.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1


def test_config2_textured_quads_720p(ref_files):
    from PIL import Image
    W, H = 1280, 720
    img = np.asarray(Image.open(f"{ref_files}/image.png")).astype(np.float64)
    tex = jnp.asarray(img / 255.0, jnp.float64)
    verts, faces, uvs = mesh.quad_batch(6, seed=3)
    # painter's order: back-to-front by z
    order = np.argsort(-verts[faces[:, 0], 2], kind="stable")
    faces = faces[order]
    fb = raster3d.render_blended(
        jnp.asarray(verts, jnp.float64), jnp.asarray(faces, jnp.int32),
        jnp.asarray(uvs, jnp.float64), tex, W, H)
    out = np.asarray(fb)
    assert out.shape == (H, W, 4)
    assert out[..., :3].max() > 0.1      # textured content rendered
    assert out[..., 3].max() <= 1.0 + 1e-9
    # z-test against an opaque depth plane blocks everything behind it
    depth0 = jnp.zeros((H, W), jnp.float64)
    fb_blocked = raster3d.render_blended(
        jnp.asarray(verts, jnp.float64), jnp.asarray(faces, jnp.int32),
        jnp.asarray(uvs, jnp.float64), tex, W, H, opaque_depth=depth0)
    assert float(jnp.abs(fb_blocked).max()) == 0.0


def test_config3_10k_mesh_sequence():
    verts_np, faces_np, colors_np = mesh.mesh_10k()
    assert len(faces_np) == 10000
    W, H = 128, 72  # reduced raster size for CPU CI; geometry identical
    proj = mesh.perspective(1.0, W / H, 0.1, 10.0)
    view = mesh.look_at([0.0, 0.6, 3.2], [0, 0, 0], [0, 1, 0])
    v = jnp.asarray(verts_np, jnp.float64)
    f = jnp.asarray(faces_np, jnp.int32)
    c = jnp.asarray(colors_np, jnp.float64)
    for i in (7,):  # one rotated angle of the 60-frame sweep (the naive
        # O(F*pixels) oracle costs ~17 s/angle on CPU f64; angle 0 adds
        # no coverage beyond rotation, which test_raster3d covers)
        mvp = jnp.asarray(proj @ view @ mesh.rotation_y(i * 0.03),
                          jnp.float64)
        fb_b, z_b, ovf = raster3d.render_gouraud_binned(
            v, f, c, W, H, mvp, tile_w=32, tile_h=8, capacity=2048,
            span_x=8, span_y=8)
        assert not bool(ovf)
        fb_n, z_n = raster3d.render_gouraud(v, f, c, W, H, mvp)
        np.testing.assert_allclose(np.asarray(fb_b), np.asarray(fb_n),
                                   atol=1e-9)


def test_config4_overlay_golden_waveform(ref_files):
    if not media.native_available():
        pytest.skip("needs native ogg decode")
    bgm = R.AudioClip.from_file(f"{ref_files}/audio.ogg")
    hit = R.AudioClip.from_file(f"{ref_files}/hit.ogg")
    hit.resample_like(bgm)
    offsets = json.load(open(f"{ref_files}/audio_overlay_test.json"))[:64]

    # golden: direct numpy additive overlay with truncation
    target = bgm.numpy().copy()
    src = hit.numpy()
    for t in offsets:
        s = int(t * bgm.sample_rate)
        if s >= len(target):
            continue
        n = min(len(src), len(target) - s)
        target[s:s + n] += src[:n]

    mixed = bgm.clone()
    mixed.overlay_many(hit, offsets)
    np.testing.assert_allclose(mixed.numpy(), target, atol=5e-9)

    # WAV bytes: sample-accurate int16 (clamp, x32767, trunc)
    wav = mixed.save_as_wav()
    pcm = np.frombuffer(wav[44:], np.int16).reshape(-1, bgm.channels)
    want16 = (np.clip(target, -1, 1) * 32767.0).astype(np.int16)
    diff = np.abs(pcm.astype(np.int32) - want16.astype(np.int32))
    assert diff.max() <= 1  # float assoc. differences flip at most 1 LSB


def test_config5_midi_av(tmp_path, ref_files):
    if not media.native_available():
        pytest.skip("needs native encoder")
    from libnativecpurenderer_tpu.apps import midi_av
    out = str(tmp_path / "rr_av.mp4")
    # max_frames bounds the render (audio trimmed to match): the full
    # rr.mid at fps 10 is ~1400 frames / 140 s of single-CPU test time;
    # 36 frames exercise the identical pipeline (suite budget,
    # VERDICT r4 item 8)
    n = midi_av.render(f"{ref_files}/rr.mid", out, ref_files,
                       width=192, height=108, fps=10, batch_frames=8,
                       progress=False, max_frames=36)
    assert n == 36
    import cv2
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == n
    # the mp4 carries an audio track (mixdown muxed in; 36 video-only
    # frames of this scene encode to ~15 KB)
    assert os.path.getsize(out) > 25_000
