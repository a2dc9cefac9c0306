"""Test configuration.

Tests run on the CPU backend with 8 virtual devices (sharding tests) and
float64 enabled: with f64 contexts the executor's math matches the C++
reference bit-for-bit, so golden comparisons are exact.  TPU-dtype (f32)
behaviour is covered by tolerance tests.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force off the TPU for tests
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon TPU backend and
# overrides JAX_PLATFORMS; the config update below wins if done before any
# backend is touched.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from libnativecpurenderer_tpu import config  # noqa: E402

REFERENCE_FILES = "/root/reference/test_files"


@pytest.fixture(autouse=True)
def f64_default():
    """Golden tests run in float64 so device math == C++ double math."""
    prev = config.default_dtype()
    config.set_default_dtype(np.float64)
    yield
    config.set_default_dtype(prev)


@pytest.fixture
def ref_files():
    if not os.path.isdir(REFERENCE_FILES):
        pytest.skip("reference test_files not available")
    return REFERENCE_FILES


def _write_wav(path, pcm, rate=44100):
    """pcm: (N, C) float in [-1, 1]"""
    import wave
    with wave.open(path, "wb") as w:
        w.setnchannels(pcm.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(pcm, -1, 1) * 32767).astype("<i2").tobytes())


@pytest.fixture
def chart_package(tmp_path):
    """Minimal Milthm chart v2 zip + res dir (shared by app + sharding tests)."""
    import json
    import zipfile
    from PIL import Image

    res = tmp_path / "res"
    res.mkdir()
    rng = np.random.default_rng(1)
    for name in ["tap", "tap_double", "extap", "extap_double", "hold",
                 "hold_double", "exhold", "exhold_double", "drag",
                 "drag_double", "line_head", "perfect_circ"]:
        arr = rng.integers(0, 255, (16, 16, 4), np.uint8)
        arr[..., 3] = 255
        Image.fromarray(arr, "RGBA").save(str(res / f"{name}.png"))
    (res / "meta.json").write_text(json.dumps(
        {"holdAtlas": [4, 4], "holdDoubleAtlas": [4, 4]}))
    # hit/drag sfx: WAV bytes under the .ogg names the app expects
    sfx = np.zeros((441, 2))
    sfx[:, :] = 0.1
    _write_wav(str(res / "hit.ogg"), sfx)
    _write_wav(str(res / "drag.ogg"), sfx * 0.5)

    # chart zip: 1.0 s of audio, one line, two notes
    bgm = np.zeros((44100, 2))
    bgm_fp = tmp_path / "audio.ogg"
    _write_wav(str(bgm_fp), bgm)
    bg_fp = tmp_path / "bg.png"
    Image.fromarray(rng.integers(0, 255, (32, 48, 3), np.uint8),
                    "RGB").save(str(bg_fp))

    def ease(t=0, p=0):
        return {"type": t, "press": p, "isValueExp": False,
                "cusValueExp": "", "clipLeft": 0.0, "clipRight": 1.0}

    def anim(key, start, end, st, et, bearer_type=0, bearer=0):
        return {"startTime": st, "endTime": et, "type": key,
                "start": start, "end": end, "index": 0,
                "bearer_type": bearer_type, "bearer": bearer,
                "ease": ease()}

    chart = {
        "fmt": 2,
        "meta": {"background_dim": 0.6, "name": "t", "background_artist": "",
                 "music_artist": "", "charter": "", "difficulty_name": "EZ",
                 "difficulty": 1, "offset": 0.0},
        "bpms": [{"time": [0, 0, 1], "bpm": 120}],
        "lines": [{
            "index": 0,
            "animations": [
                anim(12, 1.0, 1.0, [0, 0, 1], [4, 0, 1]),       # Speed
                anim(4, 90.0, 90.0, [0, 0, 1], [4, 0, 1]),      # Rotation
            ],
            "notes": [
                {"time": [0, 1, 2], "type": 0, "isFake": False,
                 "isAlwaysPerfect": False, "endTime": [0, 1, 2], "index": 0},
                {"time": [1, 0, 1], "type": 1, "isFake": False,
                 "isAlwaysPerfect": False, "endTime": [1, 0, 1], "index": 1},
                {"time": [1, 1, 2], "type": 0, "isFake": False,
                 "isAlwaysPerfect": False, "endTime": [2, 0, 1],
                 "index": 2},                                    # hold
            ],
        }],
    }
    zpath = tmp_path / "chart.zip"
    with zipfile.ZipFile(str(zpath), "w") as z:
        z.writestr("meta.json", json.dumps({
            "chart_file": "chart.json", "audio_file": "audio.ogg",
            "image_file": "bg.png"}))
        z.writestr("chart.json", json.dumps(chart))
        z.write(str(bgm_fp), "audio.ogg")
        z.write(str(bg_fp), "bg.png")
    return str(zpath), str(res)


@pytest.fixture(autouse=True)
def unrolled_first_sight():
    """Tests exercise the unrolled flush on first sight and without the
    per-process compile cap (production requires a repeat before
    compiling and bounds cold-run compile cost; see context.py)."""
    prev_cap = config.flush_unroll_compile_cap()
    config.set_flush_unroll_compile_cap(10 ** 9)
    config.set_flush_unroll_min_seen(1)
    yield
    config.set_flush_unroll_min_seen(2)
    config.set_flush_unroll_compile_cap(prev_cap)
