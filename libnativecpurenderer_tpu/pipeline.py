"""Batched frame pipeline: many frames per device dispatch.

The reference renders strictly frame-at-a-time (milrenderer:865 loop,
hundreds of ctypes calls each); its ``MultiThreadedVideoRenderContextPreparer``
(pybind:302-367) records per-frame command lists but its executor was never
written.  This module is that executor, TPU-style: B recorded frames'
command lists dispatch asynchronously through the segmented flush executor
(patch-bounded + unrolled-signature cache), quantise to u8 on device, and
frames reach the encoder as one host transfer per batch.  A batched
scan-executor path remains for non-"auto" flush modes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import atlas as atlas_mod
from .ops import commands as C
from .ops import executor


@functools.partial(jax.jit, static_argnums=(4, 5))
def _render_one(fb0, kinds, params, atlas, patch: int = 0,
                patch_big: int = 0):
    fb = executor.render_command_list(fb0, kinds, params, atlas, patch,
                                      patch_big)
    return (fb * 255.0).astype(jnp.int32).astype(jnp.uint8)


def _render_batch(fb0, kinds, params, atlas, patch: int = 0,
                  patch_big: int = 0):
    """Render a (B, ...) command batch to (B, H, W, 4) u8.

    Frames are dispatched as individual async jit calls and stacked:
    wrapping the command scan in lax.map/vmap at 1080p reliably crashed
    the TPU worker (Mosaic/XLA loop nesting fault), while per-frame
    dispatches pipeline fine — the batch still amortises the host
    transfer and keeps the dispatch queue full."""
    outs = [_render_one(fb0, kinds[i], params[i], atlas, patch, patch_big)
            for i in range(kinds.shape[0])]
    return jnp.stack(outs)


class BatchedVideoPipeline:
    """Collects recorded frames and flushes them in device batches.

    Use with a recording context (``MultiThreadedVideoRenderContextPreparer``
    or any producer of (kinds, params) snapshots):

        pipe = BatchedVideoPipeline(cap, width, height, batch=16)
        for each frame: record...; pipe.submit(*ctx_cmds.snapshot()); ...
        pipe.finish()
    """

    # (H, W, dtype, B, sig) -> times seen: min-seen gate for the batch
    # vmap path (see _flush_segmented_frames); class-level like the
    # context's unrolled-signature cache
    _batch_sigs: dict = {}

    def __init__(self, cap, width: int, height: int, batch: int = 16,
                 dtype=None, fb0=None):
        from . import config
        self.cap = cap
        self.width = width
        self.height = height
        self.batch = batch
        self._dtype = np.dtype(dtype or config.default_dtype())
        self._store = atlas_mod.get_store(self._dtype)
        self._pending: list = []
        # fb0: shared initial framebuffer for every frame — e.g. a
        # pre-composited static background (milrenderer's bg + dim +
        # gradient layers are constant per frame)
        self._fb0 = (jnp.zeros((height, width, 4), self._dtype)
                     if fb0 is None else jnp.asarray(fb0, self._dtype))
        self._inflight = None  # overlap device batch N with encode N-1
        self._exec_ctx = None  # lazy executor shell for the segmented path
        atlas_mod.register_pipeline(self)  # shared-texture region fences

    def submit(self, kinds: np.ndarray, params: np.ndarray) -> None:
        self._pending.append((kinds.copy(), params.copy()))
        if len(self._pending) >= self.batch:
            self.flush()

    def _flush_segmented_frames(self, pending) -> "jnp.ndarray":
        """Production frame path: run each recorded frame through the
        SEGMENTED flush executor (context._flush_segmented — patch-bounded
        dispatches + the unrolled-signature cache) instead of the batched
        scan executor.  The scan structure pays a full-framebuffer pass
        PER COMMAND (~0.5 ms x 30+ commands at 1080p); the segmented path
        is bounded by command footprints, and frames with repeating
        structure hit one compiled unrolled program.  Dispatches stay
        async — frames pipeline on the device queue and sync only at the
        batch's host fetch, so the batch still amortises the transfer."""
        from . import config
        from .ops import patch_exec

        if self._exec_ctx is None:
            from .context import RenderContext
            self._exec_ctx = RenderContext(self.width, self.height, True,
                                           dtype=self._dtype)
        ctx = self._exec_ctx
        atlas = self._store.device
        # Plan every frame first: frames whose plan collapses to one
        # patch/fullarith group with a warm signature take the fused
        # fast path — the whole frame as ONE device program (fb0 ->
        # unrolled flush -> u8, patch_exec.frame_step_unrolled).
        plans = []
        for k, p in pending:
            segs = patch_exec.plan_segments(k, p, self.width, self.height,
                                            atlas.shape)
            packed = None
            if all(s[0] in ("patch", "fullarith") for s in segs):
                packed = ctx._unroll_pack(segs, k, p)
            plans.append((k, p, segs, packed))
        # Batch fast path (config.pipeline_vmap, default on): every frame
        # fused AND one shared signature -> the whole batch as a single
        # vmapped device program (B dispatches -> 1; 2.19 vs 5.66
        # ms/frame on device, tools/exp_r3_pipevmap.py).  Gated like the
        # unrolled flush itself: the (B, sig) batch program only compiles
        # once the SAME batch structure repeats, so a churning chart's
        # one-off batches never pay a remote batch compile on top of the
        # per-frame programs they fall back to.
        if (config.pipeline_vmap() and len(plans) > 1
                and all(pk is not None for _, _, _, pk in plans)):
            sig0 = plans[0][3][0]
            if all(pk[0] == sig0 for _, _, _, pk in plans):
                key = (self.height, self.width, str(self._dtype),
                       len(plans), sig0)
                cache = BatchedVideoPipeline._batch_sigs
                seen = cache.pop(key, 0)
                cache[key] = seen + 1            # MRU re-insert
                if len(cache) > 256:
                    cache.pop(next(iter(cache)))
                if seen + 1 >= config.flush_unroll_min_seen():
                    rows_b = np.stack([pk[1] for _, _, _, pk in plans])
                    return patch_exec.frame_step_unrolled_batch(
                        self._fb0, jnp.asarray(rows_b), atlas, sig0)
        outs = []
        for k, p, segs, packed in plans:
            if packed is not None:
                sig, rows = packed
                outs.append(patch_exec.frame_step_unrolled(
                    self._fb0, jnp.asarray(rows), atlas, sig))
                continue
            # copy: the flush executors donate their fb argument, and
            # _fb0 must survive for the next frame
            ctx._fb = self._fb0.copy()
            ctx._flush_segmented(k, p, segs=segs)
            outs.append(executor.quantize_u8(ctx._fb))
        return jnp.stack(outs)

    def flush(self) -> None:
        if not self._pending:
            return
        from . import config
        if config.flush_mode() == "auto":
            pending, self._pending = self._pending, []
            u8 = self._flush_segmented_frames(pending)
            atlas_mod.dispatch_fence(self)
            self._drain()
            self._inflight = (u8, len(pending))
            return
        n_frames = len(self._pending)
        max_n = max(k.shape[0] for k, _ in self._pending)
        bucket = C.bucket_for(max_n)
        kinds = np.zeros((self.batch, bucket), np.int32)
        params = np.zeros((self.batch, bucket, C.PARAM_W), self._dtype)
        for i, (k, p) in enumerate(self._pending):
            kinds[i, : k.shape[0]] = k
            params[i, : p.shape[0]] = p
        self._pending.clear()

        # patch bucket from the sampling commands' AABB extents (see
        # ops/executor.py): confine atlas gathers to command footprints
        from .ops.commands import (KIND_HITEFFECT, KIND_SPLIT_TEX,
                                   KIND_TEX, KIND_TEX_FAST)
        samp = np.isin(kinds, (KIND_TEX, KIND_TEX_FAST, KIND_SPLIT_TEX,
                               KIND_HITEFFECT))
        patch, patch_big = 0, 0
        if samp.any() and min(self.width, self.height) >= 128:
            ext = np.maximum(params[..., 7] - params[..., 6],
                             params[..., 9] - params[..., 8])
            ext = float(ext[samp].max())
            if ext <= 128:
                patch = 128
            else:
                for b in (256, 512, 1024):
                    if b > min(self.width, self.height):
                        break
                    if ext <= b:
                        patch, patch_big = 128, b
                        break
        u8 = _render_batch(self._fb0, jnp.asarray(kinds),
                           jnp.asarray(params), self._store.device, patch,
                           patch_big)
        atlas_mod.dispatch_fence(self)
        self._drain()
        # keep the device->host copy async until the next flush
        self._inflight = (u8, n_frames)

    def _drain(self) -> None:
        if self._inflight is None:
            return
        u8, n_frames = self._inflight
        self._inflight = None
        host = np.asarray(u8)
        for i in range(n_frames):
            self.cap.put_frame_u8(host[i])

    def finish(self) -> None:
        self.flush()
        self._drain()


class MeshVideoPipeline:
    """Production 3D mesh->video path: MVPs are submitted per frame,
    rendered in device batches by the champion fused-loop Pallas raster
    (raster3d.render_gouraud_pallas_loop / render_textured_pallas_loop),
    and fed to the encoder in the kernel's TILED per-tile u8 layout —
    the detile + viewport crop runs inside VideoCap's native encode
    worker (media.cpp MediaDetileU8) overlapped with the encode, so the
    device program never pays the detile transpose+reshape chain
    (~0.065 ms/frame at 1080p, exp_r4_champprof3).  Device->host
    transfer is double-buffered like the canvas pipelines.

    The reference has no 3D path (its flagship is the 2D display list);
    this pipeline is the TPU-native video producer for the BASELINE
    mesh workloads.  Gouraud when ``colors`` is given; textured when
    ``uvs`` + ``tex_u8`` are.

        pipe = MeshVideoPipeline(cap, W, H, verts, faces, colors=cols)
        for mvp in mvps: pipe.submit(mvp)
        pipe.finish()
    """

    def __init__(self, cap, width: int, height: int, verts, faces,
                 colors=None, uvs=None, tex_u8=None, batch: int = 16,
                 tiled=None, **render_kw):
        from . import media
        from .ops import raster3d
        assert (colors is None) != (uvs is None), \
            "exactly one of colors / (uvs, tex_u8)"
        self.cap = cap
        self.width = width
        self.height = height
        self.batch = batch
        self._verts = jnp.asarray(verts, jnp.float32)
        self._faces = jnp.asarray(faces, jnp.int32)
        self._colors = None if colors is None else jnp.asarray(
            colors, jnp.float32)
        self._uvs = None if uvs is None else jnp.asarray(uvs, jnp.float32)
        self._tex = None if tex_u8 is None else jnp.asarray(
            tex_u8, jnp.uint8)
        # tiled frames need a detiling consumer: the native encode
        # worker, or any sink exposing put_frame_tiled_u8
        if tiled is None:
            tiled = (media.native_available()
                     or hasattr(cap, "put_frame_tiled_u8"))
        self._tiled = bool(tiled) and hasattr(cap, "put_frame_tiled_u8")
        kw = dict(render_kw)
        kw.setdefault("tile_w", 32)
        kw.setdefault("tile_h", 32)
        self._tile_w = kw["tile_w"]
        self._tile_h = kw["tile_h"]
        self._kw = kw
        self._raster3d = raster3d
        self._pending: list = []
        self._inflight = None
        self._ovf = []            # per-batch overflow flags (device)

    def _render(self, mvps):
        r3 = self._raster3d
        if self._colors is not None:
            return r3.render_gouraud_pallas_loop(
                self._verts, self._faces, self._colors, self.width,
                self.height, mvps, tiled=self._tiled, **self._kw)
        return r3.render_textured_pallas_loop(
            self._verts, self._faces, self._uvs, self._tex, self.width,
            self.height, mvps=mvps, tiled=self._tiled, **self._kw)

    def submit(self, mvp) -> None:
        self._pending.append(np.asarray(mvp, np.float32))
        if len(self._pending) >= self.batch:
            self.flush()

    def flush(self) -> None:
        if not self._pending:
            return
        mvps = jnp.asarray(np.stack(self._pending))
        self._pending.clear()
        frames, ovf = self._render(mvps)
        self._ovf.append(ovf)
        self._drain()
        self._inflight = (frames, int(mvps.shape[0]))

    def _drain(self) -> None:
        if self._inflight is None:
            return
        frames, n = self._inflight
        self._inflight = None
        host = np.asarray(frames)
        for i in range(n):
            if self._tiled:
                self.cap.put_frame_tiled_u8(host[i], self.width,
                                            self.height, self._tile_w,
                                            self._tile_h)
            else:
                self.cap.put_frame_u8(host[i])

    def finish(self) -> None:
        self.flush()
        self._drain()
        if self._ovf and bool(jnp.any(jnp.stack(self._ovf))):
            raise ValueError(
                "mesh raster bin/span overflow — raise capacity/span_x/"
                "span_y (see raster3d.bin_triangles_flat)")


class ShardedMeshVideoPipeline(MeshVideoPipeline):
    """MeshVideoPipeline scaled over a ('data', 'tile') device mesh:
    frame batches shard across EVERY device (video rendering is
    embarrassingly frame-parallel, so full-mesh DP is the scaling
    layout — parallel/sharding.sharded_raster3d_step), geometry
    replicated.  Gouraud rides each device's champion Pallas u8 kernel;
    textured rides the binned path.  Frames come back raster-order
    (the cross-device output sharding reassembles them), so the sink
    needs no tiled support; per-frame overflow flags are carried and
    surfaced at finish() like the single-device pipeline."""

    def __init__(self, cap, width: int, height: int, verts, faces,
                 colors=None, uvs=None, tex_u8=None, batch: int = 16,
                 mesh=None, **render_kw):
        import jax as _jax
        from .parallel import sharding as sh
        super().__init__(cap, width, height, verts, faces, colors=colors,
                         uvs=uvs, tex_u8=tex_u8, batch=batch,
                         tiled=False, **render_kw)
        self._mesh = mesh if mesh is not None else sh.make_mesh()
        self._ndev = self._mesh.devices.size
        if self.batch % self._ndev:
            self.batch = ((self.batch + self._ndev - 1)
                          // self._ndev) * self._ndev
        kw = dict(self._kw)
        kw.pop("interpret", None)
        pallas_kw = {k: kw.pop(k) for k in list(kw)
                     if k not in ("tile_w", "tile_h", "capacity",
                                  "span_x", "span_y")}
        if colors is not None:
            tex_f = None
            uvs_a = None
        else:
            # the sharded textured path samples an f32 texture
            # (render_textured_binned); u8 in [0,1] scale
            tex_f = self._tex.astype(jnp.float32) / 255.0
            uvs_a = self._uvs
        self._step = _jax.jit(sh.sharded_raster3d_step(
            self._mesh, width, height, self._faces,
            vtx_colors=self._colors, uvs=uvs_a, tex=tex_f,
            pallas=colors is not None,
            pallas_kw=pallas_kw or None, with_ovf=True,
            **{k: kw[k] for k in ("tile_w", "tile_h", "capacity",
                                  "span_x", "span_y") if k in kw}))

    def _render(self, mvps):
        n = int(mvps.shape[0])
        pad = (-n) % self._ndev
        if pad:
            mvps = jnp.concatenate([mvps, jnp.broadcast_to(
                mvps[-1:], (pad, 4, 4))])
        frames, ovfs = self._step(mvps, self._verts)
        if frames.dtype != jnp.uint8:
            # textured rides the binned f32 path; quantise with the
            # executor's C-cast truncation semantics (_render_one)
            frames = (frames * 255.0).astype(jnp.int32) \
                .astype(jnp.uint8)
        return frames[:n], jnp.any(ovfs[:n])


class ShardedVideoPipeline(BatchedVideoPipeline):
    """Frame batches rendered on a multi-device ('data', 'tile') mesh:
    each device renders the y-band of the frames in its data shard via
    ``parallel.sharding.sharded_canvas_step``, and the output sharding
    reassembles full u8 frames for the encoder (SURVEY §2.3's TPU-native
    mapping; milrenderer's ``--devices N``).

    The frame batch must divide by the mesh's 'data' extent (the
    constructor rounds ``batch`` up).  Rendering uses the scan executor
    (band rendering; the single-device patch executor's windows don't
    split across bands), so per-frame device time is higher than the
    single-device segmented path — the win is the device count.  Keep
    the per-device frame batch modest (<= 8): the sharded step unrolls
    its local batch at trace time (parallel/sharding.py).
    """

    def __init__(self, cap, width: int, height: int, batch: int = 16,
                 dtype=None, fb0=None, mesh=None):
        from .parallel import sharding as sh
        super().__init__(cap, width, height, batch, dtype, fb0)
        self._mesh = mesh if mesh is not None else sh.make_mesh()
        data_n = self._mesh.shape["data"]
        if self.batch % data_n:
            self.batch = ((self.batch + data_n - 1) // data_n) * data_n
        # the sharded step unrolls its per-device frame batch at trace
        # time (parallel/sharding.py keeps a Python loop so varying mesh
        # axes stay visible); cap it so trace/compile time stays bounded
        if self.batch // data_n > 8:
            self.batch = data_n * 8
        step, self._band_h = sh.sharded_canvas_step(
            self._mesh, width, height, with_fb0=True)
        self._step = jax.jit(step)

    def flush(self) -> None:
        if not self._pending:
            return
        n_frames = len(self._pending)
        max_n = max(k.shape[0] for k, _ in self._pending)
        bucket = C.bucket_for(max_n)
        kinds = np.zeros((self.batch, bucket), np.int32)
        params = np.zeros((self.batch, bucket, C.PARAM_W), self._dtype)
        for i, (k, p) in enumerate(self._pending):
            kinds[i, : k.shape[0]] = k
            params[i, : p.shape[0]] = p
        self._pending.clear()
        u8 = self._step(jnp.asarray(kinds), jnp.asarray(params),
                        self._store.device, self._fb0)
        atlas_mod.dispatch_fence(self)
        self._drain()
        self._inflight = (u8, n_frames)
