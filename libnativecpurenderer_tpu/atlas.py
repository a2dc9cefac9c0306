"""Shared texture atlas.

The reference stores each texture as a separate heap buffer and passes raw
pointers through the C ABI (``libNativeCPURenderer.cpp:318-384``).  Under XLA
every distinct array shape is a distinct compiled program, so the TPU build
packs all textures into one fixed-width device atlas (shelf packing); draw
commands reference an (ox, oy, w, h) region.  This keeps the display-list
executor's signature — and therefore its compilation — stable no matter how
many textures exist.

Destroy* functions in the reference are intentional no-op leaks
(cpp:33-37,356-360); the atlas likewise never frees regions, which matches
observed reference behaviour and keeps the allocator trivial.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import config


@functools.partial(jax.jit, donate_argnums=(0,))
def _update_region(atlas, patch, oy, ox):
    zero = jnp.asarray(0, oy.dtype)
    return jax.lax.dynamic_update_slice(atlas, patch, (oy, ox, zero))


class TextureStore:
    def __init__(self, dtype, width: int = None, height: int = None) -> None:
        self.dtype = np.dtype(dtype)
        self.width = width or config.ATLAS_WIDTH
        height = height or config.ATLAS_INIT_HEIGHT
        self._dev = jnp.zeros((height, self.width, 4), self.dtype)
        # shelves: list of [y, shelf_height, x_used]
        self._shelves: List[List[int]] = []
        self._y_next = 0

    @property
    def device(self):
        return self._dev

    @property
    def height(self) -> int:
        return self._dev.shape[0]

    def _grow(self, needed_height: int) -> None:
        new_h = max(self.height * 2, needed_height)
        old = self._dev
        self._dev = jnp.zeros((new_h, self.width, 4), self.dtype)
        self._dev = _update_region(self._dev, old, jnp.int32(0), jnp.int32(0))

    def alloc(self, w: int, h: int) -> Tuple[int, int]:
        if w > self.width:
            raise ValueError(
                f"texture width {w} exceeds atlas width {self.width}")
        for shelf in self._shelves:
            if shelf[1] >= h and self.width - shelf[2] >= w:
                ox = shelf[2]
                shelf[2] += w
                return ox, shelf[0]
        # open a new shelf
        y = self._y_next
        if y + h > self.height:
            self._grow(y + h)
        self._shelves.append([y, h, w])
        self._y_next = y + h
        return 0, y

    def upload(self, ox: int, oy: int, data) -> None:
        """data: (h, w, 4) array (numpy or device) in store dtype."""
        patch = jnp.asarray(data, dtype=self.dtype)
        self._dev = _update_region(self._dev, patch, jnp.int32(oy), jnp.int32(ox))

    def add(self, data) -> Tuple[int, int]:
        h, w = data.shape[0], data.shape[1]
        ox, oy = self.alloc(w, h)
        self.upload(ox, oy, data)
        return ox, oy


_stores: Dict[str, TextureStore] = {}


def get_store(dtype=None) -> TextureStore:
    dtype = np.dtype(dtype or config.default_dtype())
    key = dtype.str
    store = _stores.get(key)
    if store is None:
        store = TextureStore(dtype)
        _stores[key] = store
    return store


def reset_stores() -> None:
    """Testing hook: drop all atlas state."""
    _stores.clear()
    _pipelines.clear()


# ---------------------------------------------------------------------- #
# dispatch fences: shared-texture region recycling (texture.py)
#
# A recording proxy samples a shared texture whose owner redraws per
# frame; each refresh snapshots into a NEW region so already-recorded
# commands keep their old texels (the atlas device array is immutable —
# whatever a dispatch reads is captured at that point).  A superseded
# region is safe to REUSE once every command referencing it has been
# rendered.  Each pipeline carries its own fence counter, bumped after
# every flush (all of ITS pending frames rendered); texture.py stamps
# the live pipelines' counters when a retired region's sampler guards
# release and frees the region once EVERY stamped pipeline has fenced
# again (or died) — per-pipeline counters keep interleaved concurrent
# pipelines from stalling each other (a global epoch deadlocked there,
# round-3 review).  Without any live pipeline, regions sampled by
# no-flush recording proxies are never reused — the pre-recycling
# behaviour (a proxy's frames may be executed by machinery we can't
# observe).
# ---------------------------------------------------------------------- #
import weakref                                                 # noqa: E402

_pipelines: "weakref.WeakSet" = weakref.WeakSet()


def register_pipeline(pipe) -> None:
    pipe._fence_count = 0
    _pipelines.add(pipe)


def dispatch_fence(pipe) -> None:
    """Called by a pipeline after it rendered its pending frames."""
    pipe._fence_count += 1


def pipeline_stamp():
    """Snapshot (weakref, fence_count) of every live pipeline."""
    return [(weakref.ref(p), p._fence_count) for p in _pipelines]


def stamp_passed(stamp) -> bool:
    """True once every stamped pipeline has fenced again or died."""
    return all(p() is None or p()._fence_count > c for p, c in stamp)
