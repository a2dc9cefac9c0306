"""libnativecpurenderer_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
capabilities of qaqFei/libNativeCPURenderer.

Public API parity with the reference's ctypes binding
(``/root/reference/src/libNativeCPURendererPybind.py``): the classes below
expose the same names and semantics so the reference's driver apps port
unchanged, while the implementation is record-then-execute display lists
compiled by XLA and run on TPU.
"""

from . import config
from .context import MultiThreadedVideoRenderContextPreparer, RenderContext
from .texture import HitEffectTexture, PtrCreatedTexture, Texture
from .audio import (AudioClip, Int16CreatedAudioClip, PtrCreatedAudioClip)
from .video import VideoCap
from .helpers import Helpers

VERSION = 1  # LIB_NATIVE_CPU_RENDERER_VERSION (libNativeCPURenderer.h:9)


def get_version() -> int:
    """Reference ``GetVersion`` (cpp:1261-1263)."""
    return VERSION


__all__ = [
    "RenderContext",
    "MultiThreadedVideoRenderContextPreparer",
    "Texture",
    "PtrCreatedTexture",
    "HitEffectTexture",
    "AudioClip",
    "Int16CreatedAudioClip",
    "PtrCreatedAudioClip",
    "VideoCap",
    "Helpers",
    "get_version",
    "config",
]
