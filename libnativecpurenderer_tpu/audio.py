"""AudioClip: f32/f64 PCM clips with gain/resample/overlay/cut/speed + WAV.

API parity with the reference binding (``libNativeCPURendererPybind.py:503-
659``) and native engine (``libNativeCPURenderer.cpp:998-1283``).  Sample
data lives on device as a (num_frames, channels) array — the reference's
interleaved f64 heap buffer (h:70-76) — and the per-sample loops run as
batched JAX ops (ops/audio_ops.py).

Decoding of compressed formats (ogg/mp3/...) goes through the native media
runtime (media.py, libav) exactly as the reference delegated to
pydub/FFmpeg; a pure-python WAV path exists as fallback.
"""

from __future__ import annotations

import struct
import typing

import jax.numpy as jnp
import numpy as np

from . import config
from .ops import audio_ops


class AudioClip:
    def __init__(self, sample_rate: int, channels: int,
                 data: typing.Iterable[float]):
        # data is interleaved samples; num_frames = len(data) / channels.
        # (The reference binding passes len(data) as numFrames,
        # pybind:510 — a channels-times over-count that makes the C++ side
        # read past the buffer; defect not replicated.)
        arr = np.asarray(list(data) if not isinstance(data, np.ndarray) else data,
                         dtype=np.float64)
        num_frames = arr.size // channels
        self._init_from_array(sample_rate, channels,
                              arr.reshape(num_frames, channels))

    def _init_from_array(self, sample_rate: int, channels: int,
                         arr: np.ndarray) -> None:
        self._sample_rate = int(sample_rate)
        self._channels = int(channels)
        self._num_frames = int(arr.shape[0])
        # Python-side rate snapshot, refreshed only at construction/wrap
        # time like the reference binding's _update_props (pybind:512-526);
        # cut()'s second->frame conversion reads it (stale after
        # resample/apply_speed — parity, see cut()).
        self._cached_rate = int(sample_rate)
        self._buf = jnp.asarray(arr, dtype=config.default_dtype())

    # ------------------------------------------------------------------ #
    # constructors
    # ------------------------------------------------------------------ #
    @classmethod
    def _from_array(cls, sample_rate, channels, arr) -> "AudioClip":
        clip = cls.__new__(cls)
        clip._init_from_array(sample_rate, channels, np.asarray(arr))
        return clip

    @classmethod
    def _from_device(cls, sample_rate, channels, buf) -> "AudioClip":
        clip = cls.__new__(cls)
        clip._sample_rate = int(sample_rate)
        clip._channels = int(channels)
        clip._num_frames = int(buf.shape[0])
        clip._cached_rate = int(sample_rate)
        clip._buf = buf
        return clip

    @staticmethod
    def slient(sample_rate: int, channels: int, num_frames: int) -> "AudioClip":
        """CreateSilentAudioClip (cpp:1036-1046).  The typo'd name is the
        reference API (pybind:544); ``silent`` is an alias."""
        clip = AudioClip.__new__(AudioClip)
        clip._sample_rate = int(sample_rate)
        clip._channels = int(channels)
        clip._num_frames = int(num_frames)
        clip._cached_rate = int(sample_rate)
        clip._buf = jnp.zeros((int(num_frames), int(channels)),
                              config.default_dtype())
        return clip

    silent = slient

    @staticmethod
    def from_pydub_seg(seg) -> "AudioClip":
        """CreateAudioClipFromPydubSeg (pybind:530-541).  When pydub is
        installed the type is enforced; without it any object exposing the
        AudioSegment surface (sample_width / frame_rate / channels /
        get_array_of_samples / set_sample_width) is accepted, which also
        makes the path testable in images without pydub."""
        try:
            from pydub import AudioSegment  # optional dependency
        except ImportError:
            AudioSegment = None
        if AudioSegment is not None and not isinstance(seg, AudioSegment):
            raise TypeError("seg must be a pydub.AudioSegment")
        if seg.sample_width != 2:
            seg = seg.set_sample_width(2)
        data = seg.get_array_of_samples(array_type_override="h")
        return Int16CreatedAudioClip(seg.frame_rate, seg.channels, data)

    @staticmethod
    def from_file(path: str) -> "AudioClip":
        """Decode an audio file (wav/ogg/mp3/...) to a clip.

        The reference routes decoding through pydub -> ffmpeg
        (pybind:530-541); here the native media runtime (libav) decodes, with
        a stdlib WAV fallback.
        """
        from . import media
        rate, channels, pcm = media.decode_audio(path)
        return AudioClip._from_array(rate, channels, pcm)

    # ------------------------------------------------------------------ #
    # properties (cpp:1230-1244)
    # ------------------------------------------------------------------ #
    @property
    def sample_rate(self) -> int:
        return self._sample_rate

    @property
    def channels(self) -> int:
        return self._channels

    @property
    def num_frames(self) -> int:
        return self._num_frames

    @property
    def duration(self) -> float:
        return self._num_frames / self._sample_rate

    def numpy(self) -> np.ndarray:
        return np.asarray(self._buf)

    # ------------------------------------------------------------------ #
    # ops
    # ------------------------------------------------------------------ #
    def clone(self) -> "AudioClip":
        # CloneAudioClip copies (cpp:1054-1061); a copy is also required
        # here because in-place ops donate their input buffers.
        return AudioClip._from_device(self._sample_rate, self._channels,
                                      jnp.copy(self._buf))

    def apply_volume_gain(self, g: float) -> None:
        """ApplyVolumeGain (cpp:1254-1259)."""
        self._buf = audio_ops.gain(self._buf, jnp.asarray(g, self._buf.dtype))

    def resample(self, sample_rate: int, channels: int) -> None:
        """ApplyResampleAudioClip (cpp:1063-1120); in-place like the ref."""
        if self._sample_rate == sample_rate and self._channels == channels:
            return
        dur = self._num_frames / self._sample_rate
        new_num = int(dur * sample_rate)
        self._buf = audio_ops.resample(
            self._buf, new_num, int(channels), int(sample_rate),
            jnp.asarray(self._sample_rate, self._buf.dtype))
        self._sample_rate = int(sample_rate)
        self._channels = int(channels)
        self._num_frames = new_num

    def resample_like(self, like: "AudioClip") -> None:
        self.resample(like._sample_rate, like._channels)

    def overlay(self, source: "AudioClip", start_time,
                *, time_unit: str = "frame", auto_resample: bool = False) -> None:
        """OverlayAudioClip[Second] (cpp:1129-1163): additive, truncated at
        the target end; mismatched formats raise unless auto_resample."""
        if time_unit not in ("frame", "second"):
            raise ValueError("time_unit must be 'frame' or 'second'")
        if time_unit == "second":
            start_frame = int(start_time * self._sample_rate)
        else:
            start_frame = int(start_time)

        if auto_resample and (self._sample_rate != source._sample_rate
                              or self._channels != source._channels):
            source = source.clone()
            source.resample_like(self)
        if self._sample_rate != source._sample_rate:
            raise ValueError("target and source must have the same sample rate")
        if self._channels != source._channels:
            raise ValueError("target and source must have the channels")
        self._buf = audio_ops.overlay(self._buf, source._buf,
                                      jnp.asarray(start_frame, jnp.int32))

    def overlay_many(self, source: "AudioClip", start_seconds) -> None:
        """TPU extension: N overlays of one source in a single scatter-add
        (replaces N sequential ``overlay`` calls; same semantics).

        The event count is padded to a power-of-two bucket with
        out-of-range sentinel starts (dropped by the scatter), so repeated
        mixdowns share compiled programs instead of recompiling per count.
        """
        starts = (np.asarray(start_seconds, np.float64)
                  * self._sample_rate).astype(np.int64)
        n = len(starts)
        bucket = 1
        while bucket < n:
            bucket *= 2
        if bucket != n:
            pad = np.full(bucket - n, 1 << 30, np.int64)
            starts = np.concatenate([starts, pad])
        if self._sample_rate != source._sample_rate \
                or self._channels != source._channels:
            source = source.clone()
            source.resample_like(self)
        n_src = int(source._buf.shape[0])
        if bucket * n_src <= (1 << 20):
            # scatter path: ALSO bucket the source length (zero-pad rows
            # masked out via a sentinel index) — a mixdown overlaying
            # hundreds of distinct-length clips (hjm_mixer: one clip per
            # (instrument, note)) otherwise compiles a program PER clip
            # length, ~0.2 s each on this host (43 s of the rr.mid mix)
            sb = 1
            while sb < n_src:
                sb *= 2
            src = source._buf
            if sb != n_src:
                src = jnp.concatenate([
                    src, jnp.zeros((sb - n_src,) + src.shape[1:],
                                   src.dtype)])
            self._buf = audio_ops.overlay_many_bucketed(
                self._buf, src, jnp.asarray(n_src, jnp.int32),
                jnp.asarray(starts, jnp.int32))
            return
        self._buf = audio_ops.overlay_many(
            self._buf, source._buf, jnp.asarray(starts, jnp.int32))

    def overlay_groups(self, pairs) -> None:
        """TPU extension: overlay MANY (source clip, start_seconds list)
        groups in a handful of device dispatches.

        Groups are cohorted by (power-of-two event bucket, power-of-two
        source-length bucket) and each cohort runs as ONE fori-loop
        scatter program (ops/audio_ops.overlay_groups) — sequential
        overlay_many calls pay a full defensive copy of the target per
        dispatch on this backend, which dominated hjm_mixer's 212-group
        mixdown (~43 s -> ~2 s).  Each group's adds are value-identical
        to its own overlay_many call; only the ORDER of (already
        unordered) cross-group additions changes, same as the grouped
        flush itself (apps/hjm_mixer.py round-2 note)."""
        cohorts: dict = {}
        for source, secs in pairs:
            starts = (np.asarray(secs, np.float64)
                      * self._sample_rate).astype(np.int64)
            if self._sample_rate != source._sample_rate \
                    or self._channels != source._channels:
                source = source.clone()
                source.resample_like(self)
            eb = 1
            while eb < len(starts):
                eb *= 2
            n_src = int(source._buf.shape[0])
            lb = 1
            while lb < n_src:
                lb *= 2
            cohorts.setdefault((eb, lb), []).append(
                (source._buf, n_src, starts))
        for (eb, lb), grp in sorted(cohorts.items()):
            K = len(grp)
            kb = 1
            while kb < K:
                kb *= 2
            srcs = np.zeros((kb, lb, self._channels),
                            np.asarray(grp[0][0]).dtype)
            lens = np.zeros((kb,), np.int32)
            sts = np.full((kb, eb), 1 << 30, np.int64)
            for k, (buf, n_src, starts) in enumerate(grp):
                srcs[k, :n_src] = np.asarray(buf)
                lens[k] = n_src
                sts[k, : len(starts)] = starts
            self._buf = audio_ops.overlay_groups(
                self._buf, jnp.asarray(srcs), jnp.asarray(lens),
                jnp.asarray(sts, jnp.int32))

    def cut(self, start, end, *, time_unit: str = "frame") -> None:
        """ApplyCutAudioClip (cpp:1265-1279) with the binding's second/frame
        conversion (pybind:614-629).

        Parity quirk: the reference binding converts seconds with the
        Python-CACHED sample rate (``_update_props`` runs only at clip
        construction/wrap, pybind:512-526), so after ``resample`` or
        ``apply_speed`` the conversion uses the STALE pre-change rate.
        Verified against the compiled reference
        (tests/test_cross_engine.py audio_script 'chain')."""
        if time_unit not in ("frame", "second"):
            raise ValueError("time_unit must be 'frame' or 'second'")
        if time_unit == "second":
            start = int(start * self._cached_rate)
            end = int(end * self._cached_rate)
        else:
            start = int(start)
            end = int(end)
        length = end - start
        self._buf = audio_ops.cut(self._buf, start, length)
        self._num_frames = length

    def apply_speed(self, speed: float) -> None:
        """ApplySpeedAudioClip (cpp:1281-1283): reinterpret the sample rate
        (i64 *= f64 truncates)."""
        self._sample_rate = int(self._sample_rate * speed)

    # ------------------------------------------------------------------ #
    # WAV serialisation (cpp:1165-1228)
    # ------------------------------------------------------------------ #
    def save_as_wav(self) -> bytes:
        # The i16 buffer leaves the device in row chunks whose host
        # copies are issued async back-to-back (copy_to_host_async), so
        # the transfer streams at link rate instead of paying a
        # synchronous dispatch+fetch round trip per call, and the RIFF
        # assembly below overlaps the tail of the transfer.  Byte output
        # identical to the single-fetch form (same quantised values,
        # same header; cpp:1165-1228 semantics) — pinned by
        # tests/test_audio_golden.py and the cross-engine WAV tests.
        pcm_dev = audio_ops.to_int16_device(self._buf)
        rows = int(pcm_dev.shape[0])
        bytes_per_row = 2 * int(pcm_dev.shape[1]) if pcm_dev.ndim > 1 \
            else 2
        # ~2 MB chunks: big enough to amortise per-transfer overhead,
        # small enough that several are in flight over the dev tunnel
        rows_per_chunk = max(1, (2 << 20) // bytes_per_row)
        chunks = [pcm_dev[i:i + rows_per_chunk]
                  for i in range(0, rows, rows_per_chunk)] or [pcm_dev]
        for c in chunks:
            try:
                c.copy_to_host_async()
            except AttributeError:      # non-jax array (numpy fallback)
                break
        n = rows * bytes_per_row
        header = b"RIFF" + struct.pack("<i", 36 + n) + b"WAVE"
        header += b"fmt " + struct.pack(
            "<ihhiihh", 0x10, 1, self._channels, self._sample_rate,
            self._sample_rate * self._channels * 2, self._channels * 2, 16)
        header += b"data" + struct.pack("<i", n)
        out = bytearray(len(header) + n)
        out[:len(header)] = header
        off = len(header)
        for c in chunks:
            part = np.ascontiguousarray(np.asarray(c))
            out[off:off + part.nbytes] = memoryview(part).cast("B")
            off += part.nbytes
        return bytes(out)


class Int16CreatedAudioClip(AudioClip):
    """CreateAudioClipFromInt16Buffer (cpp:1016-1034): /32768."""

    def __init__(self, sample_rate: int, channels: int,
                 data: typing.Iterable[int]):
        arr = np.asarray(data, dtype=np.int16).astype(np.float64) / 32768.0
        num_frames = arr.size // channels
        self._init_from_array(sample_rate, channels,
                              arr.reshape(num_frames, channels))


class PtrCreatedAudioClip(AudioClip):
    """Parity alias for pointer-wrapped clips (pybind:656-659)."""

    def __init__(self, clip: AudioClip):
        self.__dict__.update(clip.__dict__)
        # wrapping runs _update_props in the reference (pybind:658-659)
        self._cached_rate = self._sample_rate
