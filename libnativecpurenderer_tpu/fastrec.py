"""Loader for the native command-recording core (native/fastrec.c).

The reference's recording boundary is native (every draw call crosses
ctypes into C++, libNativeCPURendererPybind.py:51-300); here recording is
host-Python by design (record-then-execute), so its per-call f64 math is
the host-critical cost at 60+ commands/frame.  ``native/build/
_tpufastrec.so`` implements the two hot pieces — the transformed-AABB
corner math and the command-row store — with bit-parity to the Python
fallbacks (same double ops, -ffp-contract=off; see fastrec.c).

``mod`` is None when the extension is missing (fresh checkout before
``make``) or ``TPUR_NO_FASTREC=1``; callers keep the pure-Python path.
"""

from __future__ import annotations

import importlib.util
import os

mod = None
if not os.environ.get("TPUR_NO_FASTREC"):
    _so = os.path.join(os.path.dirname(__file__), "..", "native", "build",
                       "_tpufastrec.so")
    try:
        _spec = importlib.util.spec_from_file_location("_tpufastrec", _so)
        if _spec is not None and _spec.loader is not None:
            _m = importlib.util.module_from_spec(_spec)
            _spec.loader.exec_module(_m)
            # smoke: identity box must round-trip before we trust it
            if _m.aabb((1.0, 0.0, 0.0, 1.0, 0.0, 0.0),
                       1.5, 2.5, 3.0, 4.0, 100.0, 100.0) == (1, 4, 2, 6):
                mod = _m
    except Exception:
        mod = None


def available() -> bool:
    return mod is not None
