"""RenderContext: the Canvas2D-style drawing API, record-then-execute.

API parity with the reference binding's ``RenderContext``
(``libNativeCPURendererPybind.py:51-300``) and the native semantics it wraps
(``libNativeCPURenderer.cpp``).  Where the reference crosses the Python->C
ABI and runs a per-pixel loop on *every* draw call, this class records a
display-list command (host float64 math identical to the C++ doubles) and
executes the whole list in one jitted device dispatch at flush time — the
record/execute split the reference's abandoned
``MultiThreadedVideoRenderContextPreparer`` (pybind:302-367) gestured at.

Flushes happen implicitly on any read (get_buffer / get_color / as_texure /
frame presentation).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import atlas as atlas_mod
from . import config
from .core import transform as xf
from .core.state import RenderState
from .ops import canvas_kernel
from .ops import commands as C
from .ops import executor


def _trunc_clamp(v: float) -> int:
    """int(v) with the +-9e17 infinity clamp of transform.aabb's native
    convention; NaN raises ValueError like int(nan)."""
    if v > 9.0e17:
        v = 9.0e17
    elif v < -9.0e17:
        v = -9.0e17
    return int(v)
from .ops import patch_exec
from .texture import HitEffectTexture, Texture


class RenderContext:
    # True on recording proxies whose command buffer is snapshotted per
    # frame (MultiThreadedVideoRenderContextPreparer): a mid-record
    # flush() would consume queued commands into _fb and silently drop
    # them from the submitted frame, so shared-texture refreshes must
    # not flush these (see _tex_specific).
    _no_flush_record = False

    def __init__(self, width: int, height: int, enable_alpha: bool,
                 dtype=None):
        self.width = int(width)
        self.height = int(height)
        self.enable_alpha = bool(enable_alpha)
        self._dtype = np.dtype(dtype or config.default_dtype())
        self._state = RenderState()
        self._cmds = C.CommandBuffer()
        self._max_sampling_extent = 0.0
        self._store = atlas_mod.get_store(self._dtype)
        self._seq = 0   # draw counter: shared textures skip re-snapshots
        # Reference allocates uninitialised memory (cpp:15); we zero-init.
        self._fb = jnp.zeros((self.height, self.width, 4), self._dtype)

    # ------------------------------------------------------------------ #
    # recording plumbing
    # ------------------------------------------------------------------ #
    def _common(self, box):
        return (xf.inverse(self._state.matrix), box, self._state.color)

    def _full_box(self):
        return (0.0, float(self.width), 0.0, float(self.height))

    def _aabb(self, x, y, w, h):
        return xf.aabb(self._state.matrix, x, y, w, h,
                       float(self.width), float(self.height))

    def _record(self, kind, box, specific):
        self._seq += 1
        self._cmds.append(kind, self._common(box), specific)

    def _record_sampling(self, kind, box, specific):
        """Record a sampling (texture/hit-effect) command, tracking its
        AABB extent so flush can pick a patch bucket (ops/executor.py)."""
        extent = max(box[1] - box[0], box[3] - box[2])
        if extent > self._max_sampling_extent:
            self._max_sampling_extent = extent
        self._record(kind, box, specific)

    # box modes of the fused native record (fastrec.c record_draw)
    _BOX_AABB, _BOX_FAST, _BOX_QUAD, _BOX_FULL = 0, 1, 2, 3

    def _record_draw(self, kind, mode, gx, gy, gw, gh, spec,
                     sampling=False):
        """One fused native call per draw — inverse + command box + row
        store (native/fastrec.c record_draw) instead of the aabb +
        inverse + append chain (three C crossings plus tuple glue on the
        host-critical record path).  The branch below is the bit-parity
        pure-Python oracle when the extension is absent
        (tests/test_fastrec.py fuzzes the two against each other)."""
        self._seq += 1
        st = self._state
        if C._fast is not None:
            ext = self._cmds.append_draw(
                kind, st.matrix, st.color, mode, gx, gy, gw, gh, spec,
                float(self.width), float(self.height))
            if sampling and ext > self._max_sampling_extent:
                self._max_sampling_extent = ext
            return
        if mode == self._BOX_AABB:
            box = self._aabb(gx, gy, gw, gh)
        elif mode == self._BOX_FAST:
            # DrawTexture fast path (cpp:731-752): float(int(x)) box,
            # unclamped.  Infinities clamp at +-9e17 before the cast —
            # the same defined-behaviour convention transform.aabb
            # adopted for the native core (a box that far out is
            # empty/out-of-window either way); NaN raises like int(nan)
            box = (float(_trunc_clamp(gx)), gx + gw,
                   float(_trunc_clamp(gy)), gy + gh)
        elif mode == self._BOX_QUAD:
            # draw_line: transformed-quad AABB superset (corners in
            # spec[0:8]); see draw_line for why this is exact coverage
            m = st.matrix
            cs = [xf.transform_point(m, spec[i], spec[i + 1])
                  for i in range(0, 8, 2)]
            tx = [c[0] for c in cs]
            ty = [c[1] for c in cs]
            box = (max(0.0, min(float(self.width),
                                math.floor(min(tx)))),
                   max(0.0, min(float(self.width), max(tx) + 1.0)),
                   max(0.0, min(float(self.height),
                                math.floor(min(ty)))),
                   max(0.0, min(float(self.height), max(ty) + 1.0)))
        else:                                   # _BOX_FULL
            box = self._full_box()
        if sampling:
            extent = max(box[1] - box[0], box[3] - box[2])
            if extent > self._max_sampling_extent:
                self._max_sampling_extent = extent
        self._cmds.append(kind, (xf.inverse(st.matrix), box, st.color),
                          spec)

    def _patch_buckets(self):
        """(small, big) window classes for the executor — small covers the
        common case (note-sized blits); big only exists when some command
        exceeds it (ops/executor.py)."""
        ext = self._max_sampling_extent
        if ext <= 0 or min(self.width, self.height) < 128:
            return 0, 0
        if ext <= 128:
            return 128, 0
        for b in (256, 512, 1024):
            if b > min(self.width, self.height):
                return 0, 0
            if ext <= b:
                return 128, b
        return 0, 0  # oversized (e.g. background blit): full-frame path

    def flush(self) -> None:
        """Execute all pending draw commands on device."""
        if self._cmds.n == 0:
            return
        kinds, params = self._cmds.snapshot()
        if config.flush_mode() == "auto":
            self._flush_segmented(kinds, params)
        else:
            self._flush_scan(kinds, params)
        self._cmds.clear()
        self._max_sampling_extent = 0.0

    def _flush_scan(self, kinds, params) -> None:
        """Round-1 path: one lax.scan over the whole list (A/B reference;
        also what sharded band rendering uses)."""
        b = C.bucket_for(kinds.shape[0])
        kp = np.zeros(b, np.int32)
        kp[: kinds.shape[0]] = kinds
        pp = np.zeros((b, C.PARAM_W), self._dtype)
        pp[: params.shape[0]] = params
        patch, patch_big = self._patch_buckets()
        self._fb = executor._run(
            self._fb, jnp.asarray(kp), jnp.asarray(pp), self._store.device,
            patch, patch_big)

    def _flush_segmented(self, kinds, params, segs=None) -> None:
        """Production path (ops/patch_exec.py): order-preserving segments.

        Consecutive patch / full-arith segments fold into ONE packed
        upload + ONE render_flush execution (the axon tunnel costs ~1 ms
        per queue item even pipelined, so per-segment dispatch would pay
        2-3 ms of pure transport each).  Full-frame *sampling* commands
        (whole-atlas gathers) dispatch on the round-1 scan in between.
        """
        atlas = self._store.device
        if segs is None:
            segs = patch_exec.plan_segments(kinds, params, self.width,
                                            self.height, atlas.shape)
        group: list = []
        for seg in segs:
            if seg[0] == "fullsamp":
                self._dispatch_group(group, kinds, params, atlas)
                group = []
                _, lo, hi = seg
                b = C.bucket_for(hi - lo)
                kp = np.zeros(b, np.int32)
                kp[: hi - lo] = kinds[lo:hi]
                pp = np.zeros((b, C.PARAM_W), self._dtype)
                pp[: hi - lo] = params[lo:hi]
                self._fb = executor._run(
                    self._fb, jnp.asarray(kp), jnp.asarray(pp), atlas, 0, 0)
            elif seg[0] == "kernel":
                # long arithmetic run: tile-resident Pallas kernel
                # (ops/canvas_kernel.py; plan_segments folds runs only
                # when estimated cheaper than the scan/patch paths)
                self._dispatch_group(group, kinds, params, atlas)
                group = []
                _, lo, hi = seg
                b = canvas_kernel.cmd_bucket(hi - lo)
                kp = np.zeros(b, np.int32)           # pad = NOOP
                kp[: hi - lo] = kinds[lo:hi]
                pp = np.zeros((b, C.PARAM_W), self._dtype)
                pp[: hi - lo] = params[lo:hi]
                self._fb = canvas_kernel.render_span_kernel(
                    self._fb, jnp.asarray(kp), jnp.asarray(pp),
                    self.width, self.height,
                    interpret=jax.default_backend() == "cpu")
            else:
                group.append(seg)
        self._dispatch_group(group, kinds, params, atlas)

    # unrolled-flush signature cache: one compile per distinct
    # (plan, sel-sequence).  A signature must repeat (config
    # flush_unroll_min_seen, default 2) before it compiles — one-off
    # frame structures stay on the dynamic-count loop, so a workload
    # with churning structures (milrenderer note sets) doesn't pay a
    # compile per frame on cold caches — and the cache is bounded as a
    # backstop.
    #
    # CANONICALISATION (round-3): within each patch segment, runs of the
    # same sel are run-length encoded with counts padded up to a bucket
    # (pad rows are all-zero and execute the run's own sel as an exact
    # no-op — see _sel_pad_safe), so a chart frame with 17 notes and one
    # with 19 hit the SAME signature (a padded patch step costs
    # ~0.01 ms; mean padding is ~20% of a run).
    # Signatures are scoped per (fb shape, dtype) so unrelated contexts
    # don't contend, and the seen-counter map is LRU-evicted instead of
    # saturating (round-2 advisor).  The compile cap bounds a cold run's
    # one-time compile bill (config.flush_unroll_compile_cap; the
    # persistent XLA cache makes warm starts cheap).
    _UNROLL_SIG_CAP = 512
    _UNROLL_RUN_BUCKETS = (1, 2, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128)
    _unroll_sigs: "dict" = {}            # LRU: key -> seen count
    # LRU of compiled signatures (round-3 verdict item 8): when a new
    # signature compiles past config.flush_unroll_compile_cap, the
    # least-recently-USED one is evicted and its jitted entries disposed
    # (patch_exec.evict_unrolled) — a long-lived server rendering many
    # differently-shaped charts keeps unrolling instead of permanently
    # regressing to the loop executor once the cap fills.
    _unroll_compiled: "dict" = {}        # LRU: key -> last-used tick
    _unroll_tick = 0                     # dispatch-group counter
    _UNROLL_EVICT_IDLE = 64              # min victim idle (groups)
    # dispatch-group counters (process-wide): how often the unrolled
    # executor actually fired vs fell back to the loop executor —
    # milrenderer reports the ratio (VERDICT r2 item 3 acceptance)
    _unroll_hits = 0
    _unroll_misses = 0

    @staticmethod
    def _run_bucket(n: int) -> int:
        for b in RenderContext._UNROLL_RUN_BUCKETS:
            if n <= b:
                return b
        return n

    @staticmethod
    def _sel_pad_safe(sel: int) -> bool:
        """True if executing this sel on an all-zero param row is an
        EXACT no-op, making the run bucketable.  All AABB-masked kinds
        qualify (zero box -> all-false mask); SET_PIXEL stores pixel
        (0, 0) unconditionally and APPLY_PIXEL's a=0 blend can flip a
        -0.0 framebuffer bit, so pixel kinds stay exact-length."""
        return sel >= C.N_KINDS or sel in (C.KIND_RECT, C.KIND_CIRCLE,
                                           C.KIND_LINE, C.KIND_VGRD)

    def _unroll_pack(self, group, kinds, params):
        """Canonical padded signature + packed param rows for a group of
        patch/fullarith segments, or None when the unrolled path should
        not fire (disabled, signature not yet repeated, or compile cap
        reached).  Owns the signature-cache bookkeeping and hit/miss
        counters shared by flush() and the batched frame pipeline."""
        if not config.flush_unrolled_enabled():
            RenderContext._unroll_misses += 1
            return None
        sig = []
        slices = []          # (lo, hi, pad) param-row pieces
        for seg in group:
            if seg[0] == "patch":
                _, P, R, lo, hi, sels, _wr = seg
                runs = []
                k = 0
                while k < len(sels):
                    j = k
                    while j < len(sels) and sels[j] == sels[k]:
                        j += 1
                    if self._sel_pad_safe(sels[k]):
                        cnt = self._run_bucket(j - k)
                    else:
                        cnt = j - k
                    runs.append((sels[k], cnt))
                    slices.append((lo + k, lo + j, cnt - (j - k)))
                    k = j
                sig.append(("patch", P, R, tuple(runs)))
            else:
                _, lo, hi = seg
                sig.append(("fullarith",
                            tuple(int(k) for k in kinds[lo:hi])))
                slices.append((lo, hi, 0))
        sig = tuple(sig)
        key = (self.height, self.width, self._dtype.str, sig)
        cache = RenderContext._unroll_sigs
        compiled = RenderContext._unroll_compiled
        seen = cache.pop(key, 0)
        cache[key] = seen + 1            # re-insert = move to MRU end
        if len(cache) > RenderContext._UNROLL_SIG_CAP:
            cache.pop(next(iter(cache)))  # evict LRU
        tick = RenderContext._unroll_tick = RenderContext._unroll_tick + 1
        if key in compiled:
            ok = True
        else:
            ok = seen + 1 >= config.flush_unroll_min_seen()
            if ok and len(compiled) >= config.flush_unroll_compile_cap():
                # thrash guard: only evict a victim that has been idle
                # for a while.  A single workload cycling through MORE
                # hot signatures than the cap would otherwise evict-and-
                # recompile every few dispatch groups (each a remote TPU
                # compile) — for that shape of churn the old saturation
                # behaviour (loop-executor fallback) is strictly better.
                # A genuinely new steady workload (next chart in a
                # server) leaves the old chart's signatures idle, so
                # eviction proceeds.
                victim = next(iter(compiled))
                if tick - compiled[victim] <= \
                        RenderContext._UNROLL_EVICT_IDLE:
                    ok = False
        if not ok:
            RenderContext._unroll_misses += 1
            return None
        RenderContext._unroll_hits += 1
        compiled.pop(key, None)          # re-insert = move to MRU end
        compiled[key] = tick
        while len(compiled) > config.flush_unroll_compile_cap():
            old = next(iter(compiled))
            del compiled[old]
            # dispose the evicted signature's jitted entries (key is
            # (h, w, dtype, sig); same-sig entries of other fb shapes
            # just recompile on next use)
            patch_exec.evict_unrolled(old[3])
        total = sum((hi - lo) + pad for lo, hi, pad in slices)
        rows = np.zeros((total, C.PARAM_W), self._dtype)
        at = 0
        for lo, hi, pad in slices:
            rows[at:at + hi - lo] = params[lo:hi]
            at += (hi - lo) + pad    # pad rows stay zero (NOOP)
        return sig, rows

    def _dispatch_group(self, group, kinds, params, atlas) -> None:
        """One packed upload + one flush call for a run of patch/fullarith
        segments.  Uses the unrolled executor (static branch picks, XLA
        overlaps per-command chains — ~5x less device time than the
        fori/switch loop) while the signature cache has room."""
        if not group:
            return
        lo0 = group[0][1] if group[0][0] == "fullarith" else group[0][3]
        hi_last = group[-1][2] if group[-1][0] == "fullarith" \
            else group[-1][4]
        ncmds = hi_last - lo0

        packed_sig = self._unroll_pack(group, kinds, params)
        if packed_sig is not None:
            sig, rows = packed_sig
            self._fb = patch_exec.render_flush_unrolled(
                self._fb, jnp.asarray(rows), atlas, sig)
            return
        nbase = patch_exec.len_bucket(ncmds)
        packed = np.zeros((nbase + len(group), patch_exec.PACKED_W),
                          self._dtype)
        packed[:ncmds, : C.PARAM_W] = params[lo0:hi_last]
        plan = []
        for k, seg in enumerate(group):
            if seg[0] == "patch":
                _, P, R, lo, hi, sels, with_region = seg
                packed[lo - lo0: hi - lo0, C.PARAM_W] = sels
                plan.append(("patch", P, R, with_region))
            else:
                _, lo, hi = seg
                packed[lo - lo0: hi - lo0, C.PARAM_W] = kinds[lo:hi]
                plan.append(("fullarith",))
            packed[nbase + k, 0] = lo - lo0
            packed[nbase + k, 1] = hi - lo
        self._fb = patch_exec.render_flush(
            self._fb, jnp.asarray(packed), atlas, tuple(plan), nbase)

    # ------------------------------------------------------------------ #
    # transform / state (host-side, cpp:277-309, 386-492, 623-641)
    # ------------------------------------------------------------------ #
    def set_transform(self, a, b, c, d, e, f):
        self._state.set_transform(a, b, c, d, e, f)

    def apply_transform(self, a, b, c, d, e, f):
        self._state.apply_transform(a, b, c, d, e, f)

    def scale(self, sx, sy):
        self._state.scale(sx, sy)

    def translate(self, tx, ty):
        self._state.translate(tx, ty)

    def rotate(self, angle):
        self._state.rotate(angle)

    def rotate_degree(self, deg):
        self.rotate(deg * math.pi / 180)

    def save_state(self):
        self._state.save()

    def restore_state(self):
        return self._state.restore()

    def get_transform(self):
        return tuple(self._state.matrix)

    def get_inverse_transform(self):
        return tuple(xf.inverse(self._state.matrix))

    def set_color_transform(self, r, g, b, a):
        self._state.set_color_transform(r, g, b, a)

    def apply_color_transform(self, r, g, b, a):
        self._state.apply_color_transform(r, g, b, a)

    # ------------------------------------------------------------------ #
    # draw calls (recorded)
    # ------------------------------------------------------------------ #
    def set_color(self, r, g, b, a):
        # SetColor: raw store everywhere, no blend/ct (cpp:643-657).
        self._record_draw(C.KIND_SET_COLOR, self._BOX_FULL, 0.0, 0.0, 0.0,
                          0.0, [r, g, b, a])
        # RGB-mode corruption parity: off the r==g==b==a std::fill fast
        # path (cpp:647-650), SetColor loops SetPixel COLUMN-major, and
        # SetPixel writes buffer[index+3] even when enableAlpha is false
        # (cpp:504-510) — pixel (W-1, y)'s alpha lands in pixel (0, y+1)'s
        # R and survives because column 0 was filled first.  Net result:
        # R = a at (0, 1..H-1).  Recorded as a column-box SET_COLOR with
        # the known G/B fill values (the final heap write one past the
        # buffer is UB, not buffer state — not replicated).
        if (not self.enable_alpha and self.width > 1 and self.height > 1
                and not (r == g and g == b and b == a)):
            self._record(C.KIND_SET_COLOR,
                         (0.0, 1.0, 1.0, float(self.height)),
                         [a, g, b, a])

    def fill_color(self, r, g, b, a):
        # FillColor: blended full-screen fill with ct (cpp:682-691).
        self._record_draw(C.KIND_FILL, self._BOX_FULL, 0.0, 0.0, 0.0, 0.0,
                          [r, g, b, a])

    def draw_rect(self, x, y, width, height, r, g, b, a):
        if width <= 0 or height <= 0:  # cpp:853
            return
        self._record_draw(C.KIND_RECT, self._BOX_AABB, x, y, width, height,
                          [x, y, x + width, y + height, r, g, b, a])

    def draw_circle(self, x, y, radius, r, g, b, a):
        if radius <= 0:  # cpp:926
            return
        self._record_draw(C.KIND_CIRCLE, self._BOX_AABB, x - radius,
                          y - radius, 2 * radius, 2 * radius,
                          [x, y, radius, 0.0, r, g, b, a])

    def draw_line(self, x0, y0, x1, y1, width, r, g, b, a):
        # Quad construction per cpp:876-906.
        if width <= 0:
            return
        dx = x1 - x0
        dy = y1 - y0
        ln = math.sqrt(dx * dx + dy * dy)
        if ln == 0:
            return
        ux, uy = dx / ln, dy / ln
        vx, vy = -uy, ux
        hw = width / 2
        pts = [x0 - vx * hw, y0 - vy * hw,
               x0 + vx * hw, y0 + vy * hw,
               x1 + vx * hw, y1 + vy * hw,
               x1 - vx * hw, y1 - vy * hw]
        # The reference scans the whole framebuffer (cpp:908-909) and lets
        # the even-odd polygon test decide coverage.  A pixel is covered
        # iff its inverse-mapped point lies in the quad, i.e. iff the pixel
        # lies in the forward-transformed quad — so the transformed
        # corners' AABB (with a 1 px guard on the open ends) is an *exact*
        # coverage superset, which keeps small lines on the patch executor
        # (box mode _BOX_QUAD: corners ride in spec[0:8]).
        self._record_draw(C.KIND_LINE, self._BOX_QUAD, 0.0, 0.0, 0.0, 0.0,
                          pts + [r, g, b, a])

    def draw_vertical_grd(self, x, y, width, height,
                          top_r, top_g, top_b, top_a,
                          bottom_r, bottom_g, bottom_b, bottom_a):
        if width <= 0 or height <= 0:  # cpp:1291
            return
        self._record_draw(C.KIND_VGRD, self._BOX_AABB, x, y, width, height,
                          [x, y, x + width, y + height, y, height,
                           top_r, top_g, top_b, top_a,
                           bottom_r, bottom_g, bottom_b, bottom_a])

    def draw_vertical_mut_grd(self, x, y, width, height, steps):
        # Multi-stop gradient built from N two-stop calls (pybind:272-280).
        for i, (p, s) in enumerate(steps):
            if i == len(steps) - 1:
                break
            np_, ns = steps[i + 1]
            ty = y + height * p
            theight = height * (np_ - p)
            self.draw_vertical_grd(x, ty, width, theight,
                                   s[0], s[1], s[2], s[3],
                                   ns[0], ns[1], ns[2], ns[3])

    def _tex_specific(self, tex, x, y, width, height):
        # shared textures alias a context's live framebuffer; when the
        # owner has drawn since the last snapshot, first flush THIS
        # context (earlier recorded samples must see the old texels),
        # then re-snapshot (texture._refresh_shared flushes the owner)
        owner = tex._shared_ctx
        if owner is not None and getattr(tex, "_shared_seq", -1) != owner._seq:
            if self._no_flush_record:
                # recording proxy: can't flush this context (queued
                # commands belong to the pending frame snapshot), and
                # even with an EMPTY buffer earlier frames pending in a
                # batching pipeline still reference the current texels.
                # Give the refreshed texels a FRESH atlas region, so
                # every already-recorded sample keeps its old region.
                if owner._no_flush_record and owner._cmds.n > 0:
                    raise ValueError(
                        "shared texture sampled inside a recording proxy "
                        "while its owner (also a recording proxy) has "
                        "pending commands — the owner's framebuffer "
                        "state is undefined until its batch executes")
                tex._refresh_shared_new_region()
            else:
                if owner._no_flush_record and owner._cmds.n > 0:
                    # same hazard from a NORMAL sampler: refreshing would
                    # flush the OWNER proxy, silently consuming its queued
                    # frame commands into its fb (round-3 review)
                    raise ValueError(
                        "shared texture sampled while its owner (a "
                        "recording proxy) has pending commands — the "
                        "owner's framebuffer state is undefined until "
                        "its batch executes")
                self.flush()
                tex._refresh_shared()
            tex._shared_seq = owner._seq
        if owner is not None:
            # this context's recorded command references the CURRENT
            # region set; the next refresh retires those regions under
            # this guard so they are only recycled once the command was
            # rendered (flush-clear for direct contexts, submit+clear
            # for recording proxies — texture.py recycling notes)
            tex._note_recording_sampler(self)
        scale_x = tex.width / width
        scale_y = tex.height / height
        # resolve against THIS context's store: textures created under a
        # different default dtype live in another store and are migrated on
        # first use (texture.region_for)
        ox, oy = tex.region_for(self._store)
        return [x, y, x + width, y + height, scale_x, scale_y,
                float(ox), float(oy), float(tex.width), float(tex.height)]

    def draw_texture(self, tex: Texture, x, y, w, h):
        if w == 0 or h == 0:  # cpp:726
            return
        fast = xf.is_no_transform(self._state.matrix)
        if isinstance(tex, HitEffectTexture):
            spec = self._tex_specific(tex, x, y, w, h)
            spec += [tex.seed, tex.t, *tex.rgb, float(fast)]
            self._record_draw(C.KIND_HITEFFECT,
                              self._BOX_FAST if fast else self._BOX_AABB,
                              x, y, w, h, spec, sampling=True)
            return
        spec = self._tex_specific(tex, x, y, w, h)
        if fast:
            # Fast path (cpp:731-752): loop range [trunc(x), x+w), raw
            # pixel coords, no membership test.
            self._record_draw(C.KIND_TEX_FAST, self._BOX_FAST, x, y, w, h,
                              spec, sampling=True)
        else:
            self._record_draw(C.KIND_TEX, self._BOX_AABB, x, y, w, h,
                              spec, sampling=True)

    def draw_splitted_texture(self, tex: Texture, x, y, width, height,
                              u_start, u_end, v_start, v_end):
        if width == 0 or height == 0:  # cpp:789
            return
        spec = self._tex_specific(tex, x, y, width, height)
        spec += [u_start, u_end, v_start, v_end]
        self._record_draw(C.KIND_SPLIT_TEX, self._BOX_AABB, x, y, width,
                          height, spec, sampling=True)

    def _pixel_box(self, xi: int, yi: int):
        # single-pixel AABB (clamped like SetPixel's bounds check,
        # cpp:498-501) so pixel writes ride the patch executor
        return (float(max(0, min(self.width, xi))),
                float(max(0, min(self.width, xi + 1))),
                float(max(0, min(self.height, yi))),
                float(max(0, min(self.height, yi + 1))))

    def set_pixel(self, x, y, r, g, b, a):
        self._record(C.KIND_SET_PIXEL, self._pixel_box(int(x), int(y)),
                     [float(int(x)), float(int(y)), r, g, b, a])

    def apply_pixel(self, x, y, r, g, b, a):
        self._record(C.KIND_APPLY_PIXEL, self._pixel_box(int(x), int(y)),
                     [float(int(x)), float(int(y)), r, g, b, a])

    # ------------------------------------------------------------------ #
    # readback (device -> host boundary; cpp:52-57, 311-316, 659-680)
    # ------------------------------------------------------------------ #
    @property
    def channels(self) -> int:
        return 4 if self.enable_alpha else 3

    def get_buffer_size(self) -> int:
        return self.width * self.height * self.channels

    def framebuffer(self):
        """Device-resident (H, W, 4) framebuffer (flushes first)."""
        self.flush()
        return self._fb

    def numpy_buffer(self) -> np.ndarray:
        """(H, W, channels) float array on host."""
        self.flush()
        return np.asarray(self._fb[..., : self.channels])

    def get_buffer(self) -> list:
        return list(self.numpy_buffer().reshape(-1))

    def uint8_buffer(self) -> np.ndarray:
        """(H, W, channels) uint8 array (device-quantised, cpp:52-57)."""
        self.flush()
        return np.asarray(executor.quantize_u8(self._fb, self.channels))

    def get_buffer_as_uint8(self) -> bytearray:
        return bytearray(self.uint8_buffer().tobytes())

    def get_color(self, x, y):
        # GetColor clamps then truncates (cpp:659-680).
        self.flush()
        xi = 0 if x < 0 else (self.width - 1 if x >= self.width else int(x))
        yi = 0 if y < 0 else (self.height - 1 if y >= self.height else int(y))
        px = np.asarray(self._fb[yi, xi])
        if self.enable_alpha:
            return (float(px[0]), float(px[1]), float(px[2]), float(px[3]))
        # RGB contexts never write out_a; ctypes zero-init -> 0.0 (pybind:261)
        return (float(px[0]), float(px[1]), float(px[2]), 0.0)

    def resize(self, width: int, height: int):
        # ResizeRenderContext reallocates without preserving or initialising
        # content (cpp:39-45); we zero-init.
        self._cmds.clear()
        self.width = int(width)
        self.height = int(height)
        self._fb = jnp.zeros((self.height, self.width, 4), self._dtype)

    # ------------------------------------------------------------------ #
    # texture interop (cpp:362-384)
    # ------------------------------------------------------------------ #
    def as_texure(self) -> Texture:
        """CreateTextureFromRenderContext (copy).  Name kept for parity with
        the reference binding (pybind:282); ``as_texture`` is an alias."""
        self.flush()
        return Texture._from_device_array(self._fb, self.enable_alpha)

    as_texture = as_texure

    def as_texture_shared(self) -> Texture:
        """CreateTextureFromRenderContextShared (cpp:377-384): the
        returned texture aliases this context's live framebuffer — draws
        issued after sharing are visible through the texture.  Functional
        arrays can't alias, so the texture re-snapshots the fb whenever a
        draw sampling it is recorded (texture._refresh_shared), which
        observes the same states the reference's pointer alias would."""
        self.flush()
        tex = Texture._from_device_array(self._fb, self.enable_alpha)
        tex._shared_ctx = self
        tex._shared_seq = self._seq
        return tex

    def as_pilimg(self):
        from PIL import Image
        mode = "RGBA" if self.enable_alpha else "RGB"
        return Image.frombytes(mode, (self.width, self.height),
                               bytes(self.uint8_buffer().tobytes()))


class MultiThreadedVideoRenderContextPreparer(RenderContext):
    """Parity shim for the reference's unfinished frame-batching proxy
    (pybind:302-367).  In the TPU build the base class already records; this
    subclass only adds the frame boundary marker used by batched apps."""

    _no_flush_record = True

    def __init__(self, v_cap, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.v_cap = v_cap
        self.frames = []

    def end_of_frame(self):
        self.frames.append(self._cmds.snapshot())
        # start a fresh list without executing; batched execution is done by
        # the video pipeline (video.py)
        self._cmds = C.CommandBuffer()

    def renderer(self):  # parity stub (pybind:362-367)
        pass
