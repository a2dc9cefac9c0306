"""Texture objects.

API parity with the reference binding's ``Texture`` / ``PtrCreatedTexture``
(``libNativeCPURendererPybind.py:369-440``): constructor from raw bytes
(uint8 or float64, /255 conversion per ``CreateTextureUInt8`` cpp:337-354),
``from_pilimg``, ``resample``.  Texel data lives in the shared device atlas
(see atlas.py); RGB textures are stored with alpha=1 — the reference leaves
the sampled alpha *uninitialised* for 3-channel textures (``DrawTexture``
cpp:746-748 passes an unset stack double), which is undefined behaviour we
replace with the only sensible defined value.
"""

from __future__ import annotations

import typing

import numpy as np

from . import atlas as atlas_mod
from .ops import sampling


class Texture:
    def __init__(self, width: int, height: int, enableAlpha: bool,
                 data: typing.ByteString, is_uint8: bool = True):
        channels = 4 if enableAlpha else 3
        itemsize = 1 if is_uint8 else 8
        if width * height * channels * itemsize != len(data):
            raise ValueError("data size not match")
        if is_uint8:
            arr = np.frombuffer(bytes(data), dtype=np.uint8).astype(np.float64) / 255.0
        else:
            arr = np.frombuffer(bytes(data), dtype=np.float64).copy()
        arr = arr.reshape(height, width, channels)
        self._init_from_array(arr, enableAlpha)

    # set by RenderContext.as_texture_shared: the context whose live
    # framebuffer this texture aliases (cpp:377-384)
    _shared_ctx = None

    def _init_from_array(self, arr: np.ndarray, enableAlpha: bool) -> None:
        h, w = arr.shape[0], arr.shape[1]
        if arr.shape[2] == 3:
            arr = np.concatenate([arr, np.ones((h, w, 1), arr.dtype)], axis=2)
        self.width = int(w)
        self.height = int(h)
        self.enableAlpha = bool(enableAlpha)
        self._store = atlas_mod.get_store()
        self._ox, self._oy = self._store.add(arr)
        self._alt_regions = {}

    # -- internal --------------------------------------------------------
    @classmethod
    def _from_array(cls, arr, enableAlpha: bool) -> "Texture":
        tex = cls.__new__(cls)
        tex._init_from_array(np.asarray(arr) if isinstance(arr, np.ndarray) else arr,
                             enableAlpha)
        return tex

    @classmethod
    def _from_device_array(cls, dev_arr, enableAlpha: bool) -> "Texture":
        tex = cls.__new__(cls)
        h, w = dev_arr.shape[0], dev_arr.shape[1]
        tex.width = int(w)
        tex.height = int(h)
        tex.enableAlpha = bool(enableAlpha)
        tex._store = atlas_mod.get_store()
        tex._ox, tex._oy = tex._store.alloc(w, h)
        tex._store.upload(tex._ox, tex._oy, dev_arr)
        tex._alt_regions = {}
        return tex

    @property
    def atlas_region(self):
        return (self._ox, self._oy, self.width, self.height)

    def region_for(self, store):
        """(ox, oy) of this texture's texels in ``store``.

        Textures land in the default-dtype store at creation; a context
        constructed with a different explicit dtype samples its *own* store
        (context.py), which would otherwise read zeros at this region.  On
        first use under such a context the texels are migrated (device
        copy), then cached per target dtype.
        """
        if store is self._store:
            return self._ox, self._oy
        key = store.dtype.str
        cached = self._alt_regions.get(key)
        if cached is None:
            data = sampling.read_region(
                self._store.device, self._ox, self._oy,
                self.width, self.height, self.width, self.height)
            cached = store.add(data)
            self._alt_regions[key] = cached
        return cached

    def _refresh_shared(self) -> None:
        """Re-snapshot the aliased framebuffer into this texture's atlas
        region(s).

        The reference's shared texture points straight at the context's
        f64 buffer (cpp:377-384), so draws issued after sharing are
        visible the next time the texture is sampled.  Functional arrays
        can't alias, so the context re-uploads its fb here whenever a
        draw USING this texture is recorded — same observable behaviour
        for every sample-after-draw sequence.  (Sole remaining
        divergence: the reference reads texels in flight while a blit
        writes the same buffer, so a self-overlapping blit can see its
        own partial output; here the source is pinned at command start.)
        """
        ctx = self._shared_ctx
        if ctx is None:
            return
        ctx.flush()
        fb = ctx._fb
        self._store.upload(self._ox, self._oy, fb)
        for key, (ox, oy) in self._alt_regions.items():
            atlas_mod.get_store(np.dtype(key)).upload(ox, oy, fb)

    # -- shared-texture region recycling ---------------------------------
    # A per-frame-refreshed shared texture retires one region set per
    # refresh; without reclamation a long render grows the atlas
    # unboundedly (round-3 review).  Retired regions come back through a
    # per-texture pool once
    #   (a) every recorder that sampled them released its guard: the
    #       record buffer was cleared (gen bump — clears happen AFTER
    #       submit in every supported flow) or both the buffer and its
    #       param array died (no live snapshot views — snapshot views
    #       keep the array alive, so a preparer's un-submitted frames
    #       HOLD the guard even after the buffer was swapped), and
    #   (b) every pipeline alive at guard-release time has fenced again
    #       (atlas.dispatch_fence) — all frames pending then, which may
    #       reference the region, have been rendered against an
    #       (immutable) atlas snapshot that still contained it.
    # Ordering contract: a snapshot must be submitted to its pipeline
    # BEFORE the recording buffer is cleared (the pipeline flow does
    # this); clearing first would release the guard while the frame
    # still waits to sample the region.
    # With no live pipeline, regions guarded by no-flush proxies stay
    # retired forever (their frames execute through machinery we cannot
    # observe) — the safe pre-recycling behaviour.

    def _shared_gc_init(self):
        if not hasattr(self, "_retired"):
            # entries: [guards, {store key: (ox, oy)}, stamp, no_flush]
            self._retired = []
            self._region_pool = {}    # store key -> [(ox, oy)]
            self._cur_samplers = {}   # id(cmds) -> guard tuple

    def _note_recording_sampler(self, ctx) -> None:
        """Record that ``ctx`` recorded a draw sampling the CURRENT
        region set (context._tex_specific calls this for EVERY
        shared-texture draw — flushing contexts release their guard at
        the flush-clear; no-flush proxies at submit+clear)."""
        import weakref
        self._shared_gc_init()
        cmds = ctx._cmds
        self._cur_samplers[id(cmds)] = (
            weakref.ref(cmds), weakref.ref(cmds.params), cmds.gen,
            ctx._no_flush_record)

    @staticmethod
    def _guard_released(guard) -> bool:
        cmds_wr, params_wr, gen, _nf = guard
        cmds = cmds_wr()
        if cmds is not None:
            return cmds.gen > gen
        # buffer object gone (e.g. preparer swapped it out): released
        # only when the param array died too — live snapshot views keep
        # it alive, and those frames may not have been rendered yet
        return params_wr() is None

    def _reclaim_retired(self) -> None:
        keep = []
        for entry in self._retired:
            guards, regions, stamp, no_flush = entry
            if stamp is None:
                if all(self._guard_released(g) for g in guards):
                    stamp = atlas_mod.pipeline_stamp()
                    if not stamp and no_flush:
                        # no pipeline to fence against: hold forever
                        stamp = False
                    entry[2] = stamp
                keep.append(entry)
            elif stamp is not False and atlas_mod.stamp_passed(stamp):
                for key, r in regions.items():
                    self._region_pool.setdefault(key, []).append(r)
            else:
                keep.append(entry)
        self._retired = keep

    def _pool_alloc(self, store):
        pool = self._region_pool.get(store.dtype.str)
        if pool:
            return pool.pop()
        return store.alloc(self.width, self.height)

    def _refresh_shared_new_region(self) -> None:
        """Shared-texture refresh variant for recording proxies
        (context._tex_specific): snapshot the owner's framebuffer into a
        NEW atlas region instead of overwriting the current one, so
        display-list commands recorded *before* this refresh keep
        sampling the old texels when the batch finally executes.  The
        superseded regions are retired and recycled once provably
        unreferenced (see the recycling note above).
        """
        ctx = self._shared_ctx
        if ctx is None:
            return
        ctx.flush()
        fb = ctx._fb
        self._shared_gc_init()
        regions = {self._store.dtype.str: (self._ox, self._oy)}
        regions.update(self._alt_regions)
        guards = list(self._cur_samplers.values())
        self._retired.append([guards, regions, None,
                              any(g[3] for g in guards)])
        self._cur_samplers = {}
        self._reclaim_retired()
        self._ox, self._oy = self._pool_alloc(self._store)
        self._store.upload(self._ox, self._oy, fb)
        for key in list(self._alt_regions):
            store = atlas_mod.get_store(np.dtype(key))
            region = self._pool_alloc(store)
            store.upload(region[0], region[1], fb)
            self._alt_regions[key] = region

    def to_numpy(self) -> np.ndarray:
        """Readback of the (h, w, 4) texel data."""
        return np.asarray(sampling.read_region(
            self._store.device, self._ox, self._oy, self.width, self.height,
            self.width, self.height))

    # -- parity API ------------------------------------------------------
    def resample(self, width: int, height: int,
                 filter: str = "nearest") -> "Texture":
        """ResampleTexture (cpp:950-976).  ``filter="bilinear"`` opts into
        the smoother kernel the reference left commented out
        (cpp:575-620); the parity default is nearest."""
        if filter == "bilinear":
            out = sampling.resample_region_bilinear(
                self._store.device, self._ox, self._oy,
                float(self.width), float(self.height),
                int(width), int(height))
        else:
            out = sampling.resample_region(
                self._store.device, self._ox, self._oy,
                float(self.width), float(self.height),
                int(width), int(height))
        return Texture._from_device_array(out, self.enableAlpha)

    @staticmethod
    def from_pilimg(img) -> "Texture":
        from PIL import Image

        if not isinstance(img, Image.Image):
            raise TypeError("img must be a PIL.Image.Image")
        if img.mode not in ("RGB", "RGBA"):
            img = img.convert("RGBA")
        return Texture(img.width, img.height, img.mode == "RGBA", img.tobytes())


class PtrCreatedTexture(Texture):
    """Parity alias — the ctypes binding distinguished pointer-wrapped
    textures (pybind:437-440); in the TPU build all textures are equal."""

    def __init__(self, tex: Texture):
        self.__dict__.update(tex.__dict__)


class HitEffectTexture(Texture):
    """Procedural Milthm hit-effect dissolve texture.

    The reference materialises these per (seed, t) via
    ``CreateMilthmHitEffectTexture`` (cpp:1417-1440) — 16 groups x 30 frames
    of 512x512 RGBA doubles.  Here the draw command evaluates the noise per
    covered screen pixel instead (ops/executor.py ``b_hiteffect``), which is
    both faster and memory-free; only the mask texture occupies the atlas.
    """

    def __init__(self, mask: Texture, seed: float, t: float,
                 r: float, g: float, b: float):
        if not mask.enableAlpha:
            # reference returns nullptr (cpp:1418)
            raise ValueError("hit-effect mask must have an alpha channel")
        self.width = mask.width
        self.height = mask.height
        self.enableAlpha = True
        self._store = mask._store
        self._ox, self._oy = mask._ox, mask._oy  # atlas region = the mask
        self._alt_regions = mask._alt_regions   # share migrations too
        self.seed = float(seed)
        self.t = float(t)
        self.rgb = (float(r), float(g), float(b))

    def materialize(self) -> Texture:
        """Produce the equivalent concrete texture (for resample/readback).

        Matches the reference's column-major store quirk (cpp:1432-1435):
        texel (x, y) of the materialised texture holds noise evaluated at
        (y/width, x/height) times the mask's alpha at (x, y).  Requires a
        square mask, as all reference call sites use (pybind:34-49).
        """
        import jax.numpy as jnp
        from .ops import noise as noise_mod
        if self.width != self.height:
            raise ValueError("hit-effect materialisation requires square mask")
        mask_arr = jnp.asarray(sampling.read_region(
            self._store.device, self._ox, self._oy, self.width, self.height,
            self.width, self.height))
        w = self.width
        import jax
        tx = jax.lax.broadcasted_iota(mask_arr.dtype, (w, w), 1)
        ty = jax.lax.broadcasted_iota(mask_arr.dtype, (w, w), 0)
        na = noise_mod.hit_effect_alpha(ty / w, tx / w, self.seed, self.t)
        a = na * mask_arr[..., 3]
        rgb = jnp.broadcast_to(
            jnp.asarray(self.rgb, mask_arr.dtype), (w, w, 3))
        out = jnp.concatenate([rgb, a[..., None]], axis=-1)
        return Texture._from_device_array(out, True)
