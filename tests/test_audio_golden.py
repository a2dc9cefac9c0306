"""Golden-waveform tests: AudioClip ops vs a direct NumPy f64 model of the
reference's sample loops (cpp:998-1283)."""

import numpy as np
import pytest

import libnativecpurenderer_tpu as R


def golden_resample(buf, old_rate, new_rate, new_channels):
    """ApplyResampleAudioClip (cpp:1063-1120) as literal numpy f64."""
    num_frames, channels = buf.shape
    dur = num_frames / old_rate
    new_num = int(dur * new_rate)
    out = np.zeros((new_num, new_channels), np.float64)
    for i in range(new_num):
        sec_t = i / new_rate
        old_idx = sec_t * old_rate
        lo = int(np.floor(old_idx))
        hi = int(np.ceil(old_idx))
        bound = num_frames - channels  # sic: mixes frames & channels
        lo = max(0, min(lo, bound - 1))
        hi = max(0, min(hi, bound - 1))
        frac = old_idx - lo
        if channels == new_channels:
            for c in range(channels):
                v0 = buf[lo, c]
                v1 = buf[hi, c]
                out[i, c] = v0 + (v1 - v0) * frac
        else:
            s0 = buf[lo].sum() / channels
            s1 = buf[hi].sum() / channels
            out[i, :] = s0 + (s1 - s0) * frac
    return out


def golden_overlay(target, source, start):
    out = target.copy()
    for i in range(source.shape[0]):
        if start + i >= target.shape[0]:
            break
        if start + i < 0:
            continue
        out[start + i] += source[i]
    return out


def test_create_and_props():
    data = [0.1, -0.1, 0.2, -0.2, 0.3, -0.3]
    clip = R.AudioClip(44100, 2, data)
    assert clip.sample_rate == 44100
    assert clip.channels == 2
    assert clip.num_frames == 3
    assert abs(clip.duration - 3 / 44100) < 1e-15
    np.testing.assert_array_equal(clip.numpy().reshape(-1), data)


def test_int16_create():
    data = np.array([16384, -16384, 32767, -32768], np.int16)
    clip = R.Int16CreatedAudioClip(8000, 2, data)
    np.testing.assert_allclose(clip.numpy().reshape(-1),
                               data.astype(np.float64) / 32768.0)


def test_silent_and_gain():
    clip = R.AudioClip.slient(1000, 2, 50)
    assert clip.num_frames == 50
    assert np.all(clip.numpy() == 0)
    clip2 = R.AudioClip(1000, 1, [0.5, -0.5, 0.25])
    clip2.apply_volume_gain(0.5)
    np.testing.assert_allclose(clip2.numpy().reshape(-1), [0.25, -0.25, 0.125])


def test_overlay_frames_and_truncation():
    rng = np.random.default_rng(0)
    t = rng.standard_normal((100, 2)) * 0.1
    s = rng.standard_normal((30, 2)) * 0.1
    target = R.AudioClip._from_array(1000, 2, t)
    source = R.AudioClip._from_array(1000, 2, s)
    target.overlay(source, 85)  # truncates at end (cpp:1146)
    np.testing.assert_allclose(target.numpy(), golden_overlay(t, s, 85),
                               atol=1e-15)


def test_overlay_seconds():
    rng = np.random.default_rng(1)
    t = rng.standard_normal((1000, 1))
    s = rng.standard_normal((10, 1))
    target = R.AudioClip._from_array(100, 1, t)
    source = R.AudioClip._from_array(100, 1, s)
    target.overlay(source, 1.234, time_unit="second")
    np.testing.assert_allclose(target.numpy(),
                               golden_overlay(t, s, int(1.234 * 100)),
                               atol=1e-15)


def test_overlay_mismatch_raises():
    a = R.AudioClip.slient(1000, 2, 10)
    b = R.AudioClip.slient(2000, 2, 10)
    with pytest.raises(ValueError):
        a.overlay(b, 0)
    c = R.AudioClip.slient(1000, 1, 10)
    with pytest.raises(ValueError):
        a.overlay(c, 0)


def test_overlay_auto_resample():
    rng = np.random.default_rng(2)
    t = np.zeros((200, 2))
    s = rng.standard_normal((50, 1))
    target = R.AudioClip._from_array(2000, 2, t)
    source = R.AudioClip._from_array(1000, 1, s)
    target.overlay(source, 10, auto_resample=True)
    rs = golden_resample(s, 1000, 2000, 2)
    np.testing.assert_allclose(target.numpy(), golden_overlay(t, rs, 10),
                               atol=1e-12)


def test_overlay_many_matches_sequential():
    rng = np.random.default_rng(3)
    t = rng.standard_normal((500, 2)) * 0.1
    s = rng.standard_normal((40, 2)) * 0.1
    a = R.AudioClip._from_array(100, 2, t.copy())
    b = R.AudioClip._from_array(100, 2, t.copy())
    src = R.AudioClip._from_array(100, 2, s)
    secs = [0.1, 0.5, 1.23, 4.9]
    for sec in secs:
        a.overlay(src, sec, time_unit="second")
    b.overlay_many(src, secs)
    np.testing.assert_allclose(a.numpy(), b.numpy(), atol=1e-12)


def test_resample_rate_same_channels():
    rng = np.random.default_rng(4)
    s = rng.standard_normal((997, 2))
    clip = R.AudioClip._from_array(44100, 2, s)
    clip.resample(48000, 2)
    want = golden_resample(s, 44100, 48000, 2)
    assert clip.num_frames == want.shape[0]
    assert clip.sample_rate == 48000
    np.testing.assert_allclose(clip.numpy(), want, atol=1e-12)


def test_resample_channel_mix():
    rng = np.random.default_rng(5)
    s = rng.standard_normal((300, 2))
    clip = R.AudioClip._from_array(8000, 2, s)
    clip.resample(8000, 1)  # same rate, channel downmix still resamples
    want = golden_resample(s, 8000, 8000, 1)
    np.testing.assert_allclose(clip.numpy(), want, atol=1e-12)


def test_resample_noop():
    rng = np.random.default_rng(6)
    s = rng.standard_normal((100, 2))
    clip = R.AudioClip._from_array(44100, 2, s)
    clip.resample(44100, 2)
    np.testing.assert_array_equal(clip.numpy(), s)


def test_cut():
    rng = np.random.default_rng(7)
    s = rng.standard_normal((100, 2))
    clip = R.AudioClip._from_array(1000, 2, s)
    clip.cut(10, 40)
    np.testing.assert_array_equal(clip.numpy(), s[10:40])
    assert clip.num_frames == 30
    # cut beyond the end: reference leaves tail uninitialised; we zero-fill
    clip2 = R.AudioClip._from_array(1000, 2, s)
    clip2.cut(90, 120)
    out = clip2.numpy()
    np.testing.assert_array_equal(out[:10], s[90:])
    assert np.all(out[10:] == 0)


def test_cut_seconds():
    s = np.arange(200, dtype=np.float64).reshape(100, 2)
    clip = R.AudioClip._from_array(100, 2, s)
    clip.cut(0.1, 0.4, time_unit="second")
    np.testing.assert_array_equal(clip.numpy(), s[10:40])


def test_apply_speed():
    clip = R.AudioClip.slient(44100, 2, 100)
    clip.apply_speed(1.5)
    assert clip.sample_rate == int(44100 * 1.5)


def test_clone_independent():
    s = np.ones((10, 1))
    a = R.AudioClip._from_array(100, 1, s)
    b = a.clone()
    b.apply_volume_gain(2.0)
    assert np.all(a.numpy() == 1.0)
    assert np.all(b.numpy() == 2.0)


def test_save_as_wav_layout():
    # exact RIFF layout per cpp:1165-1228
    clip = R.AudioClip(8000, 2, [0.5, -0.5, 2.0, -2.0])  # clamps +-1
    wav = clip.save_as_wav()
    assert wav[:4] == b"RIFF"
    assert wav[8:12] == b"WAVE"
    assert wav[12:16] == b"fmt "
    import struct
    assert struct.unpack("<i", wav[4:8])[0] == len(wav) - 8
    fmt, ch, rate, brate, align, bits = struct.unpack("<hhiihh", wav[20:36])
    assert (fmt, ch, rate, bits) == (1, 2, 8000, 16)
    assert wav[36:40] == b"data"
    pcm = np.frombuffer(wav[44:], np.int16)
    # (i16)(clamp(v)*32767) with C truncation toward zero
    np.testing.assert_array_equal(pcm, [16383, -16383, 32767, -32767])


def test_save_as_wav_multichunk_identical():
    # the streamed device fetch (save_as_wav chunks ~2 MB of i16 rows,
    # copy_to_host_async back-to-back) must produce the same bytes as a
    # single-fetch serialisation; this clip spans several chunks
    # (700k stereo frames = 2.8 MB i16 > 2 x rows_per_chunk)
    rng = np.random.default_rng(9)
    s = np.clip(rng.standard_normal((700_000, 2)) * 0.4, -1, 1)
    clip = R.AudioClip._from_array(44100, 2, s)
    wav = clip.save_as_wav()
    import struct
    n = struct.unpack("<i", wav[40:44])[0]
    assert n == 700_000 * 2 * 2 and len(wav) == 44 + n
    pcm = np.frombuffer(wav[44:], "<i2").reshape(-1, 2)
    want = np.trunc(np.clip(s, -1, 1) * 32767).astype(np.int16)
    np.testing.assert_array_equal(pcm, want)


def test_wav_roundtrip_via_stdlib():
    import io
    import wave
    rng = np.random.default_rng(8)
    s = np.clip(rng.standard_normal((500, 2)) * 0.3, -1, 1)
    clip = R.AudioClip._from_array(22050, 2, s)
    w = wave.open(io.BytesIO(clip.save_as_wav()))
    assert w.getnchannels() == 2
    assert w.getframerate() == 22050
    assert w.getnframes() == 500


def test_overlay_many_fft_path_drops_out_of_range():
    """FFT-path overlay_many must drop events starting past the target's end
    (cpp:1146 truncation): left in the impulse train they would wrap the
    circular convolution into the head of the mix (ADVICE r1)."""
    import jax.numpy as jnp

    from libnativecpurenderer_tpu.ops import audio_ops

    rng = np.random.default_rng(9)
    N, n, n_ev = 10000, 20000, 64            # n_ev * n > 1<<20 -> FFT path
    t = rng.standard_normal((N, 2)) * 0.1
    s = rng.standard_normal((n, 2)) * 0.1
    starts = rng.integers(0, N - 1, n_ev)
    starts[0] = 15000                         # past the end: must vanish
    starts[1] = N                             # exactly at the end
    starts[2] = N + n                         # far past

    out = np.asarray(audio_ops.overlay_many(
        jnp.asarray(t), jnp.asarray(s), jnp.asarray(starts, jnp.int32)))

    golden = t.copy()
    for st in starts:
        if st >= N:
            continue
        golden[st:] += s[: N - st]
    np.testing.assert_allclose(out, golden, atol=1e-9)


def test_overlay_groups_matches_sequential():
    # cohorted overlay_groups == sequential overlay_many, exactly, when
    # groups touch disjoint sample ranges (the only cross-group
    # interaction is addition order); in-range/out-of-range drop
    # semantics and distinct clip lengths/counts ride the same cohorts
    rng = np.random.default_rng(11)
    base = rng.standard_normal((30_000, 2)) * 0.1
    pairs = []
    off = 0
    for k, (ln, ev) in enumerate([(300, 3), (121, 5), (1024, 1),
                                  (77, 9), (300, 2)]):
        src = R.AudioClip._from_array(
            44100, 2, rng.standard_normal((ln, 2)) * 0.2)
        secs = [(off + i * (ln + 7)) / 44100.0 for i in range(ev)]
        off += ev * (ln + 7) + 50
        pairs.append((src, secs))
    # one event past the end: dropped in both paths (cpp:1146)
    pairs[1][1].append(29_999 / 44100.0 + 10.0)

    a = R.AudioClip._from_array(44100, 2, base)
    for src, secs in pairs:
        a.overlay_many(src, secs)
    b = R.AudioClip._from_array(44100, 2, base)
    b.overlay_groups(pairs)
    np.testing.assert_array_equal(a.numpy(), b.numpy())
