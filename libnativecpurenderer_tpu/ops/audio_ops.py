"""Device ops for the audio engine.

Mirrors the reference AudioClip math (``libNativeCPURenderer.cpp:998-1283``)
as batched JAX ops: the per-sample C++ loops become vectorised gathers
(resample) and scatter-adds (overlay), which is the TPU-native shape of this
work — the overlay hot loop (cpp:1145-1151) in particular becomes one
``.at[].add`` with out-of-range rows dropped, which is exactly the
reference's truncate-at-target-end semantics (cpp:1146).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, donate_argnums=(0,))
def overlay(target, source, start):
    """Additive overlay of ``source`` (n, C) into ``target`` (N, C) at frame
    ``start``; rows falling outside the target are dropped (cpp:1129-1154)."""
    idx = start + jnp.arange(source.shape[0])
    return target.at[idx].add(source, mode="drop")


@functools.partial(jax.jit, donate_argnums=(0,))
def overlay_many(target, source, starts):
    """Batched overlay of one source at many start frames.

    Used by the mixdown paths (876 overlays in the binding demo,
    pybind:689-691; one per MIDI note in hjm_mixer:82-94) to replace N
    sequential C calls with a single device dispatch.

    Two implementations, chosen by (static) problem size:
    * small: one scatter-add of the expanded (n_events * src_len) rows;
    * large: FFT convolution — many overlays of one clip are exactly
      ``impulse_train (*) clip``, and TPU scatters serialise while FFTs
      fly.  Out-of-range starts (incl. the power-of-two-bucket padding
      sentinel) drop out in both paths, matching the reference's
      truncate-at-target-end semantics (cpp:1146).
    """
    n = source.shape[0]
    n_ev = starts.shape[0]
    if n_ev * n <= (1 << 20):
        idx = (starts[:, None] + jnp.arange(n)[None, :]).reshape(-1)
        src = jnp.broadcast_to(source[None],
                               (n_ev,) + source.shape)
        src = src.reshape(-1, source.shape[1])
        return target.at[idx].add(src, mode="drop")
    # FFT path
    N, C = target.shape
    m = 1
    while m < N + n:
        m *= 2
    dtype = target.dtype
    # Events starting at/after the target's end must vanish entirely
    # (cpp:1146 truncates at the target end; the scatter path drops them).
    # Left in the impulse train they'd land in [N, m) and, when start+n > m,
    # wrap around the circular convolution into the head of the mix — push
    # them to m, which mode="drop" discards.
    starts = jnp.where(starts >= N, m, starts)
    imp = jnp.zeros((m,), dtype).at[starts].add(jnp.asarray(1.0, dtype),
                                                mode="drop")
    src_pad = jnp.zeros((m, C), dtype).at[:n].set(source)
    spec = jnp.fft.rfft(src_pad, axis=0)
    ispec = jnp.fft.rfft(imp)
    mixed = jnp.fft.irfft(ispec[:, None] * spec, n=m, axis=0)[:N]
    return target + mixed.astype(dtype)


@functools.partial(jax.jit, donate_argnums=(0,))
def overlay_many_bucketed(target, source, src_len, starts):
    """Scatter-path overlay_many with the SOURCE length bucketed too:
    ``source`` is zero-padded to a power-of-two row count and ``src_len``
    (traced scalar) masks the pad rows to an out-of-range index that
    ``mode="drop"`` discards — so a mixdown overlaying many
    distinct-length clips (hjm_mixer: one per (instrument, note)) shares
    one compiled program per (len-bucket, event-bucket) instead of
    compiling per clip.  Value-identical to :func:`overlay_many`'s
    scatter path: the dropped pad rows contribute nothing and the kept
    updates are the same rows in the same order."""
    n = source.shape[0]
    offs = jnp.arange(n)
    idx = starts[:, None] + offs[None, :]
    idx = jnp.where(offs[None, :] < src_len, idx, 1 << 30)
    src = jnp.broadcast_to(source[None], (starts.shape[0],) + source.shape)
    return target.at[idx.reshape(-1)].add(
        src.reshape(-1, source.shape[1]), mode="drop")


@functools.partial(jax.jit, donate_argnums=(0,))
def overlay_groups(target, sources, src_lens, starts):
    """Many (source, starts) overlay GROUPS in one dispatch: a fori_loop
    scatter-adds group k's (padded) source at its (padded) start frames.
    Per-dispatch cost matters more than per-row work here: every
    separate overlay call pays a full defensive copy of the (donated)
    target on this backend (~0.18 s for a 2-minute stereo f64 mix), so
    a 212-group mixdown (hjm_mixer, one group per (instrument, note))
    ran ~43 s as sequential calls; the loop keeps the accumulating
    target in place.  sources (K, L, C) zero-padded rows are masked to
    a dropped index by src_lens; starts (K, E) pads use the standard
    >= target-length sentinel.  Value-identical to sequential
    overlay_many calls in the same group order."""
    n = sources.shape[1]
    offs = jnp.arange(n)

    def body(k, tgt):
        idx = starts[k][:, None] + offs[None, :]
        idx = jnp.where(offs[None, :] < src_lens[k], idx, 1 << 30)
        src = jnp.broadcast_to(
            sources[k][None], (starts.shape[1],) + sources.shape[1:])
        return tgt.at[idx.reshape(-1)].add(
            src.reshape(-1, sources.shape[2]), mode="drop")

    return jax.lax.fori_loop(0, sources.shape[0], body, target)


@functools.partial(jax.jit, donate_argnums=(0,))
def gain(buf, g):
    return buf * g


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def resample(buf, new_num: int, new_channels: int, new_rate: int, old_rate):
    """ApplyResampleAudioClip (cpp:1063-1120), including its quirks:

    * clamp bound mixes frames and channels: indices clamp to
      ``[0, numFrames - channels - 1]`` (cpp:1082-1084);
    * the lerp fraction is computed against the *clamped* floor index
      (cpp:1086), so it can exceed 1 near the end;
    * when channel counts differ, all output channels get the channel-mean
      (cpp:1095-1110).
    """
    dtype = buf.dtype
    num_frames, channels = buf.shape
    i = jnp.arange(new_num, dtype=dtype)
    sec_t = i / new_rate
    old_idx = sec_t * old_rate
    lo = jnp.floor(old_idx)
    hi = jnp.ceil(old_idx)
    bound = num_frames - channels  # sic (cpp:1082)
    lo = jnp.clip(lo, 0, bound - 1).astype(jnp.int32)
    hi = jnp.clip(hi, 0, bound - 1).astype(jnp.int32)
    frac = old_idx - lo.astype(dtype)

    if channels == new_channels:
        v_lo = buf[lo]  # (new_num, C)
        v_hi = buf[hi]
        return v_lo + (v_hi - v_lo) * frac[:, None]
    # channel up/down-mix by averaging (cpp:1095-1110)
    s_lo = jnp.sum(buf[lo], axis=1) / channels
    s_hi = jnp.sum(buf[hi], axis=1) / channels
    v = s_lo + (s_hi - s_lo) * frac
    return jnp.broadcast_to(v[:, None], (new_num, new_channels)).astype(dtype)


@functools.partial(jax.jit, static_argnums=(1, 2))
def cut(buf, start: int, length: int):
    """ApplyCutAudioClip (cpp:1265-1279).  The reference leaves the tail
    *uninitialised* when ``end`` exceeds the clip; we zero-fill."""
    n, c = buf.shape
    pad = jnp.zeros((length, c), buf.dtype)
    padded = jnp.concatenate([buf, pad], axis=0)
    return jax.lax.dynamic_slice(padded, (start, 0), (length, c))


def to_int16(buf_np):
    """SaveAudioClipAsWav sample conversion (cpp:1216-1222): clamp to
    [-1, 1], scale by 32767, C-cast truncation toward zero."""
    import numpy as np
    v = np.clip(np.asarray(buf_np, np.float64), -1.0, 1.0) * 32767.0
    return v.astype(np.int16)


@jax.jit
def to_int16_device(buf):
    """Same conversion on device (jnp float->int astype truncates toward
    zero like the C cast); halves the host transfer for WAV export."""
    v = jnp.clip(buf, -1.0, 1.0) * 32767.0
    return v.astype(jnp.int16)


@jax.jit
def to_f32_device(buf):
    """f32 downcast on device before a host fetch — the encoder paths
    (VideoCap.put_audio, hjm_mixer_server) want f32 PCM, and fetching f64
    over the tunnel doubles the transfer for bits the encoder discards."""
    return buf.astype(jnp.float32)
