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

import os

import numpy as np

# Persistent XLA compilation cache: compiles on this TPU path go through a
# remote-compile tunnel at 0.5-10 min each; the on-disk cache turns warm
# process starts from minutes into seconds (measured 136 s -> 1.2 s).
_cache_dir = os.environ.get("TPURENDER_JAX_CACHE",
                            "/tmp/tpurender_jaxcache")
if _cache_dir:
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never block import on cache plumbing
        pass

_default_dtype = np.float32


def set_default_dtype(dtype) -> None:
    global _default_dtype
    _default_dtype = np.dtype(dtype).type


def default_dtype():
    return _default_dtype


# Texture atlas geometry (see atlas.py)
ATLAS_WIDTH = 4096
ATLAS_INIT_HEIGHT = 1024

# Canvas flush strategy (see ops/patch_exec.py):
#   "auto" — segmented executor: patch-sized commands ride the aliasing
#            DUS loop with region/MXU sampling, oversized ones the full
#            scan (~16x faster at 1080p than "scan")
#   "scan" — the round-1 single-scan executor (A/B reference)
_flush_mode = "auto"


def set_flush_mode(mode: str) -> None:
    global _flush_mode
    if mode not in ("auto", "scan"):
        raise ValueError(f"unknown flush mode {mode!r}")
    _flush_mode = mode


def flush_mode() -> str:
    return _flush_mode


# Tile-resident Pallas kernel for long arithmetic spans inside "auto"
# flushes (ops/canvas_kernel.py); plan_segments folds eligible runs only
# when this is on.  Off switch for A/B tests and debugging.
_canvas_kernel = True


def set_canvas_kernel(enabled: bool) -> None:
    global _canvas_kernel
    _canvas_kernel = bool(enabled)


def canvas_kernel_enabled() -> bool:
    return _canvas_kernel


# Grouped patch compute inside the unrolled flush (exp_r5_canvas3/4):
# the 1.62 ms 60-command flush program is per-op-overhead bound (~6
# small device ops per command).  With grouping, each run of G
# same-sel patch commands evaluates its fb-INDEPENDENT stage (mask /
# rgba / atlas-region sampling) in ONE vmapped fusion set, leaving only
# the sequential dynamic-slice -> blend -> dynamic-update-slice chain
# per command (pure elementwise, eligible for XLA's in-place DUS
# fusion).  Group shapes derive from the already-bucketed run counts,
# so the signature space is unchanged and pad rows stay exact no-ops.
# 0 disables (per-command unrolled path, the round-3/4 behaviour).
# Device A/B (exp_r5_group/group2 2026-08-21): flush program 1.619 ->
# 0.828 ms at g=4 (checksums identical, g=8/16 equal), bench_canvas
# wall 3.51 -> 3.16-3.26 ms/frame, bench_e2e 366.5 -> 374.3 fps, and
# unrolled-flush compiles drop 61 s -> 5-7 s (op count) — g=4 ships.
_canvas_group_g = 4


def set_canvas_group_g(g: int) -> None:
    global _canvas_group_g
    _canvas_group_g = max(0, int(g))


def canvas_group_g() -> int:
    return _canvas_group_g


# Unrolled flush executor (static per-command branch picks — ~5x less
# device time than the fori/switch loop, one compile per distinct flush
# structure; ops/patch_exec.render_flush_unrolled).
_flush_unrolled = True


def set_flush_unrolled(enabled: bool) -> None:
    global _flush_unrolled
    _flush_unrolled = bool(enabled)


def flush_unrolled_enabled() -> bool:
    return _flush_unrolled


# How many times a flush signature must repeat before the unrolled
# executor compiles it (first sightings ride the loop executor, so
# one-off frame structures never pay a compile).  Tests set 1 to
# exercise the unrolled path directly.
_flush_unroll_min_seen = 2


def set_flush_unroll_min_seen(n: int) -> None:
    global _flush_unroll_min_seen
    _flush_unroll_min_seen = max(1, int(n))


def flush_unroll_min_seen() -> int:
    return _flush_unroll_min_seen


# Cap on unrolled-flush compilations per process.  Each compile costs
# seconds on a real host (minutes through the dev tunnel) the FIRST time;
# the persistent XLA cache above makes warm starts cheap, so the cap
# mainly bounds a cold run's one-time compile bill and the resident
# executable memory.  The cap MUST exceed a workload's hot-signature
# working set: the bench chart (4 lines x 24 notes, 48 frames) runs
# ~100 distinct canonicalised signatures, and with cap=24 the LRU
# evicted early-frame signatures every run (idle > _UNROLL_EVICT_IDLE)
# — an evict-recompile storm costing ~10 s per reload through the
# tunnel, ~1200 s per identical run (exp_r5 mil3/mil4 2026-08-21).
# 160 covers busy charts; the LRU still bounds longer-lived servers.
_flush_unroll_compile_cap = 160


def set_flush_unroll_compile_cap(n: int) -> None:
    global _flush_unroll_compile_cap
    _flush_unroll_compile_cap = max(0, int(n))


def flush_unroll_compile_cap() -> int:
    return _flush_unroll_compile_cap


# Batched pipeline frame step: when every frame in a pipeline batch
# collapses to the unrolled flush with ONE shared signature (the common
# case — a scene repeats its command structure frame over frame), render
# the whole batch in a single vmapped device program instead of B
# per-frame dispatches (each dispatch costs ~0.5 ms host through the dev
# tunnel).  Default ON: measured 2.19 vs 5.66 ms/frame (2.6x) on device,
# bit-equal (tools/exp_r3_pipevmap.py, 2026-08-18) — the round-1 "vmap
# at 1080p crashes the TPU worker" fault is unreproducible and the
# vmapped schedule beats the pipelined per-frame queue.  Mixed-signature
# batches fall back to per-frame dispatches automatically.
_pipeline_vmap = True


def set_pipeline_vmap(enabled: bool) -> None:
    global _pipeline_vmap
    _pipeline_vmap = bool(enabled)


def pipeline_vmap() -> bool:
    return _pipeline_vmap
