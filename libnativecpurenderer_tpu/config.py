"""Global configuration for the TPU renderer.

The reference computes everything in float64 (``libNativeCPURenderer.h:36``).
On TPU the native compute dtype is float32 (f64 is software-emulated); the
presentation boundary is uint8 either way (``cpp:52-57`` quantises x255), so
f32 noise is invisible after quantisation except exactly at integer
boundaries.  Golden-parity tests run on the CPU backend with
``jax_enable_x64`` and ``float64`` contexts, where the math matches the C++
reference bit-for-bit.
"""

from __future__ import annotations

import numpy as np

_default_dtype = np.float32


def set_default_dtype(dtype) -> None:
    global _default_dtype
    _default_dtype = np.dtype(dtype).type


def default_dtype():
    return _default_dtype


# Texture atlas geometry (see atlas.py)
ATLAS_WIDTH = 4096
ATLAS_INIT_HEIGHT = 1024
