"""milrenderer: Milthm chart ZIP -> rendered MP4 with mixed audio.

Behaviour mirror of ``/root/reference/src/milrenderer.py`` (flagship app,
SURVEY.md §3.1) on top of the TPU framework: chart/animation model from
``models/chart.py``, drawing through the display-list RenderContext, audio
through batched AudioClip overlays, encode through the native VideoCap.

Structure differences from the reference (same output): a ``Renderer``
class instead of module-level script state; ``mixbgm`` groups the hit/drag
overlays into two scatter-adds instead of one call per note (:803-815).
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import math
import random
import sys
import typing
import zipfile

import numpy as np

from .. import (AudioClip, Helpers, RenderContext, Texture, VideoCap)
from ..core import transform as xf
from ..fastrec import mod as _fastrec
from ..models import chart as chart_mod
from ..models.chart import AnimationKey

log = logging.getLogger("milrenderer")

MIL_SCRW = 1920
MIL_SCRH = 1080

LINE_CIRCLE_WIDTH = 0.003
NOTE_SCALE = 335 / 185
SPEED_UNIT = 120
HOLD_DISAPPEAR_TIME = 0.2
HOLD_SPWAN_HIT_EFFECT_SEP = 0.1
HIT_EFFECT_DUR = 0.5
HITEFFECT_SIZE = 0.12
HITEFFECT_PREPARE_GROUP_NUM = 16


# ---------------------------------------------------------------------------
# geometry / culling helpers (reference :565-708)
# ---------------------------------------------------------------------------

def rotate_point(x, y, deg, length):
    r = math.radians(deg)
    return (x + math.cos(r) * length, y + math.sin(r) * length)


def fixorp(x):
    return max(0.0, min(x, 1.0))


class CanvasTransform:
    """Pure-python canvas matrix for point queries (reference
    WebCanvas2DTransform :565-635); built on core.transform."""

    def __init__(self, matrix=None):
        self.matrix = tuple(matrix) if matrix is not None else xf.IDENTITY

    def getPoint(self, x, y):
        return xf.transform_point(self.matrix, x, y)

    def getRectPoints(self, x, y, w, h):
        return (self.getPoint(x, y), self.getPoint(x + w, y),
                self.getPoint(x + w, y + h), self.getPoint(x, y + h))

    def getCRectPoints(self, x, y, w, h):
        return self.getRectPoints(x - w / 2, y - h / 2, w, h)


def _seg_boxes_intersect(a, b):
    return not (
        max(a[0][0], a[1][0]) < min(b[0][0], b[1][0])
        or max(b[0][0], b[1][0]) < min(a[0][0], a[1][0])
        or max(a[0][1], a[1][1]) < min(b[0][1], b[1][1])
        or max(b[0][1], b[1][1]) < min(a[0][1], a[1][1]))


def _polygon_lines(p):
    return [(p[i - 1], p[i]) for i in range(len(p))]


def point_in_polygon(polygon, point):
    n = len(polygon)
    j = n - 1
    res = False
    for i in range(n):
        if ((polygon[i][1] > point[1]) != (polygon[j][1] > point[1])) and (
            point[0] < (polygon[j][0] - polygon[i][0])
            * (point[1] - polygon[i][1])
            / (polygon[j][1] - polygon[i][1]) + polygon[i][0]
        ):
            res = not res
        j = i
    return res


def polygons_intersect(p1, p2):
    return (any(_seg_boxes_intersect(a, b)
                for a in _polygon_lines(p1) for b in _polygon_lines(p2))
            or any(point_in_polygon(p1, q) for q in p2)
            or any(point_in_polygon(p2, q) for q in p1))


def polygon_in_screen(w, h, polygon):
    # Exact short-circuits on the polygon AABB (the reference evaluates
    # the full polygon predicate per note per frame, ~35 ms/frame of
    # host python on dense charts):
    #  * AABB strictly inside the screen -> every vertex passes the
    #    even-odd point test against the screen rect -> True;
    #  * AABB strictly outside -> no seg-box pair can overlap, no
    #    vertex is in the rect, and no screen corner can be inside the
    #    polygon (the polygon lies within its AABB) -> False.
    # Boundary-touching cases fall through to the exact predicate, so
    # culling decisions are bit-identical to the reference's.
    xs = [p[0] for p in polygon]
    ys = [p[1] for p in polygon]
    xlo, xhi = min(xs), max(xs)
    ylo, yhi = min(ys), max(ys)
    if xlo > 0 and xhi < w and ylo > 0 and yhi < h:
        return True
    if xhi < 0 or xlo > w or yhi < 0 or ylo > h:
        return False
    return polygons_intersect([(0, 0), (w, 0), (w, h), (0, h)], polygon)


def line_length(x0, y0, x1, y1):
    try:
        return ((x1 - x0) ** 2 + (y1 - y0) ** 2) ** 0.5
    except OverflowError:
        return float("inf")


class HitEffect:
    def __init__(self, note, t):
        self.note = note
        self.t = t
        self.group = random.randint(0, HITEFFECT_PREPARE_GROUP_NUM - 1)


# ---------------------------------------------------------------------------
# chart zip access (reference :121-149)
# ---------------------------------------------------------------------------

class ChartPackage:
    def __init__(self, path: str):
        self.zip = zipfile.ZipFile(path, "r")
        self.names = set(self.zip.namelist())
        meta = self.read_json("/meta.json")
        if not isinstance(meta, dict):
            raise ValueError("/meta.json is not a dict")
        for key in ("chart_file", "audio_file", "image_file"):
            if key not in meta:
                raise ValueError(f"/meta.json missing {key}")
            if not self.has(meta[key]):
                raise ValueError(f"{meta[key]} not found in chart file")
        self.meta = meta

    @staticmethod
    def _norm(path: str) -> str:
        path = path.replace("\\", "/")
        return path[1:] if path.startswith("/") else path

    def has(self, path: str) -> bool:
        return self._norm(path) in self.names

    def read(self, path: str) -> bytes:
        p = self._norm(path)
        if p not in self.names:
            raise ValueError(f"File {path} not found in chart file")
        return self.zip.read(p)

    def read_json(self, path: str):
        return json.loads(self.read(path))


# ---------------------------------------------------------------------------
# renderer
# ---------------------------------------------------------------------------

class Renderer:
    def __init__(self, *, width: int, height: int, fps: int,
                 note_scale: float = 1.0, flow_speed: float = 1.66,
                 res_dir: str = ".", silent: bool = False,
                 batch_frames: int = 8, unrolled_flush: bool = True,
                 devices: int = 1):
        self.w = width
        self.h = height
        self.fps = fps
        self.res_dir = res_dir
        self.silent = silent
        self.flow_speed = flow_speed
        self.batch_frames = batch_frames
        # multi-device scale-out: frames batch-sharded over 'data', each
        # frame's rows band-sharded over 'tile' (parallel/sharding.py;
        # SURVEY SS2.3).  devices=0 means "all available".
        self.devices = devices
        # chart frames churn their command structure as notes appear and
        # expire; since round 3 the flush signatures are run-length
        # bucketed (context._dispatch_group), so a chart's churn maps to
        # a small signature family and the unrolled executor's one-time
        # traces amortise — on by default.  Turn off for one-shot renders
        # of tiny charts where even a few traces dominate.
        self.unrolled_flush = unrolled_flush
        self.line_head_size = 0.0223 * note_scale
        self.line_head_border = self.line_head_size * (18 / 186)
        self.note_size = self.line_head_size
        self.ctx = RenderContext(width, height, enable_alpha=False)
        self.cap = VideoCap(width, height, fps)
        # full-C note loop state (fastrec.notes_frame), built lazily per
        # chart in draw_frame
        self._nf = None

    # -- coordinate mapping (reference :151-161) -------------------------
    def milpos2scrpos(self, x, y):
        return ((x / MIL_SCRW + 0.5) * self.w,
                (1 - (y / MIL_SCRH + 0.5)) * self.h)

    def milpos2scrpos_cen(self, x, y):
        return ((x / MIL_SCRW) * self.w, (y / MIL_SCRH) * self.h * -1)

    def res_path(self, name: str) -> str:
        return f"{self.res_dir}/{name}"

    # -- audio (reference :803-824) --------------------------------------
    def mix_bgm(self, bgm: AudioClip, chart: chart_mod.Chart) -> None:
        hit = AudioClip.from_file(self.res_path("hit.ogg"))
        drag = AudioClip.from_file(self.res_path("drag.ogg"))
        hit.resample_like(bgm)
        drag.resample_like(bgm)
        hit_times = []
        drag_times = []
        for line in chart.lines:
            for note in line.notes:
                if note.isFake:
                    continue
                (hit_times if note.ishit else drag_times).append(note.time)
        if hit_times:
            bgm.overlay_many(hit, hit_times)
        if drag_times:
            bgm.overlay_many(drag, drag_times)

    # -- asset loading (reference :830-861) -------------------------------
    def load_assets(self, pkg: ChartPackage) -> None:
        from PIL import Image

        bg_tex = Texture.from_pilimg(
            Image.open(io.BytesIO(pkg.read(pkg.meta["image_file"]))))
        ratio_bg = bg_tex.width / bg_tex.height
        ratio_scr = self.w / self.h
        if ratio_bg > ratio_scr:
            bg_tex = bg_tex.resample(
                int(self.h / bg_tex.height * bg_tex.width), self.h)
        else:
            bg_tex = bg_tex.resample(
                self.w, int(self.w / bg_tex.width * bg_tex.height))
        self.bg_tex = bg_tex

        names = ["tap", "tap_double", "extap", "extap_double", "hold",
                 "hold_double", "exhold", "exhold_double", "drag",
                 "drag_double", "line_head"]
        self.game_res = {
            n: Texture.from_pilimg(Image.open(self.res_path(f"{n}.png")))
            for n in names
        }
        self.game_res["meta"] = json.load(
            open(self.res_path("meta.json"), encoding="utf-8"))
        self.game_res["perfect_circ"] = Texture.from_pilimg(
            Image.open(self.res_path("perfect_circ.png"))).resample(512, 512)
        # the native note path bypasses _tex_specific's shared-texture
        # refresh logic, so it is only valid while every note texture is
        # a plain (non-aliasing) texture — true for file-loaded assets
        self._notes_native_ok = all(
            getattr(t, "_shared_ctx", None) is None
            for t in self.game_res.values() if isinstance(t, Texture))

        n_frames = int(self.fps * HIT_EFFECT_DUR)
        self.hit_effect_texs = [
            Helpers.create_milthm_hit_effect_textures(
                self.game_res["perfect_circ"], n_frames)
            for _ in range(HITEFFECT_PREPARE_GROUP_NUM)
        ]

    # -- one frame (reference :865-1038) ----------------------------------
    def draw_static(self, chart: chart_mod.Chart) -> None:
        """The per-frame-constant layers: clear, background texture, dim
        fill, bottom gradient (reference :866-878).  These are identical
        every frame, so the renderer composites them once and reuses the
        result as each frame's initial framebuffer."""
        ctx, w, h = self.ctx, self.w, self.h
        ctx.set_color(0, 0, 0, 0)
        ctx.draw_texture(self.bg_tex, w / 2 - self.bg_tex.width / 2,
                         h / 2 - self.bg_tex.height / 2,
                         self.bg_tex.width, self.bg_tex.height)
        ctx.fill_color(0, 0, 0, chart.meta.background_dim)
        ctx.draw_vertical_mut_grd(0, h * 0.6, w, h * 0.4, [
            (0.0, (0, 0, 0, 0.0)),
            (0.25, (0, 0, 0, 0.3)),
            (0.5, (0, 0, 0, 0.6)),
            (0.75, (0, 0, 0, 0.9)),
            (1.0, (0, 0, 0, 1.0)),
        ])

    def draw_frame(self, chart: chart_mod.Chart, t: float,
                   hit_effects: list, include_static: bool = True) -> None:
        chart.update(t)
        nf = self._nf
        if nf is not None and nf["chart"] is not chart:
            nf = self._nf = None
        if (nf is None and _fastrec is not None
                and hasattr(_fastrec, "notes_frame")
                and getattr(self, "_notes_native_ok", False)
                and getattr(chart, "_arena", None) is not None):
            nf = self._nf_build(chart)
        if nf is not None:
            # per-frame refresh: texel regions can move on atlas recycle
            nf["frame"] += 1
            store = self.ctx._store
            texes = nf["texes"]
            for k, nm in enumerate(nf["texnames"]):
                tex = self.game_res[nm]
                ox, oy = tex.region_for(store)
                texes[k, 0] = ox
                texes[k, 1] = oy
                texes[k, 2] = tex.width
                texes[k, 3] = tex.height
        if include_static:
            self.draw_static(chart)
        for line in chart.lines:
            self._draw_line(line, t, hit_effects)
        if nf is not None:
            # the Python loop stores each drawn note's transform (read by
            # its hit effect, and part of the note's visible state); the
            # C loop stamps note_m/mstamp instead — box the drawn notes'
            # rows back as plain-float tuples (.tolist())
            note_m, notes_l = nf["note_m"], nf["notes"]
            for nid in np.nonzero(nf["mstamp"] == nf["frame"])[0].tolist():
                notes_l[nid].transform = tuple(note_m[nid].tolist())
        self._draw_hit_effects(t, hit_effects)

    def _nf_build(self, chart):
        """Flatten per-note static chart state for fastrec.notes_frame
        (the full-C note-group loop).  Built once per (renderer, chart);
        animated values ride chart._arena.values_flat."""
        arena = chart._arena
        coll_index = arena.coll_index
        notes = [n for ln in chart.lines for n in ln.notes]
        n_total = len(notes)
        stat = np.zeros((n_total, 7), np.float64)
        istat = np.zeros((n_total, 5), np.int32)
        clicked = np.zeros(n_total, np.uint8)
        meta = self.game_res["meta"]
        width_px = (self.w + self.h) * self.note_size
        texnames = sorted({n.texname for n in notes}) or ["tap"]
        tex_idx = {nm: i for i, nm in enumerate(texnames)}
        for i, n in enumerate(notes):
            n._nid = i
            tex = self.game_res[n.texname]
            if not n.ishold:
                height_px = width_px / tex.width * tex.height
                u0 = u1 = 0.0
            else:
                atlas = meta["holdDoubleAtlas" if n.morebets
                             else "holdAtlas"]
                u0 = atlas[0] / tex.width
                u1 = 1.0 - atlas[1] / tex.width
                height_px = 0.0
            stat[i] = (n.time, n.endTime, n.floorPosition,
                       n.endFloorPosition, u0, u1, height_px)
            ag = n.acollection.anim_groups
            istat[i] = (tex_idx[n.texname],
                        coll_index[id(n.acollection)],
                        1 if n.ishold else 0,
                        1 if ag[chart_mod.AnimationKey.PositionX] else 0,
                        1 if ag[chart_mod.AnimationKey.PositionY] else 0)
            clicked[i] = 1 if n.clicked else 0
        groups = {}
        for ln in chart.lines:
            for grp in (ln.effect_notes, ln.plain_notes):
                ids = np.asarray([n._nid for n in grp] or [], np.int32)
                groups[id(grp)] = [ids, len(grp)]
        nf = dict(chart=chart, notes=notes, stat=stat, istat=istat,
                  clicked=clicked,
                  note_m=np.zeros((n_total, 6), np.float64),
                  mstamp=np.full(max(n_total, 1), -1, np.int32),
                  newly=np.zeros(max(n_total, 1), np.int32),
                  texnames=texnames, groups=groups,
                  texes=np.zeros((len(texnames), 4), np.float64),
                  vflat=arena.values_flat, width_px=width_px, frame=0)
        self._nf = nf
        return nf

    def _draw_line(self, line, t, hit_effects):
        ctx, w, h = self.ctx, self.w, self.h
        ac = line.acollection
        g = ac.get_value
        line_pos = self.milpos2scrpos(g(AnimationKey.PositionX),
                                      g(AnimationKey.PositionY))
        line_transp = g(AnimationKey.Transparency)
        line_size = g(AnimationKey.Size)
        line_rot = g(AnimationKey.Rotation)
        line_fsp = g(AnimationKey.FlowSpeed)
        line_rel = self.milpos2scrpos_cen(g(AnimationKey.RelativeX),
                                          g(AnimationKey.RelativeY))
        head_transp = g(AnimationKey.LineHeadTransparency)
        body_transp = g(AnimationKey.LineBodyTransparency)
        line_color = tuple(v / 255 for v in g(AnimationKey.Color))
        line_visa = g(AnimationKey.VisibleArea)
        line_fp = g(AnimationKey.Speed)
        cen = (line_pos[0] + line_rel[0], line_pos[1] + line_rel[1])

        head_px = (w + h) * self.line_head_size * line_size
        border_px = (w + h) * self.line_head_border * line_size

        if line_size > 0.0:
            ctx.save_state()
            ctx.apply_color_transform(*line_color)
            ctx.apply_color_transform(1, 1, 1, line_transp * head_transp)
            ctx.draw_texture(self.game_res["line_head"],
                             cen[0] - head_px / 2, cen[1] - head_px / 2,
                             head_px, head_px)
            ctx.restore_state()

            ctx.save_state()
            ctx.apply_color_transform(*line_color)
            ctx.apply_color_transform(1, 1, 1, line_transp * body_transp)
            p1 = rotate_point(*cen, line_rot + 180,
                              max(head_px / 2 - 1.0, 0.0))
            p2 = rotate_point(*p1, line_rot + 180, h * 2.5)
            ctx.draw_line(*p1, *p2, border_px * 0.75, 1, 1, 1, 0.8)
            ctx.restore_state()

        if not line.notes:
            return

        ctx.save_state()
        ctx.translate(*cen)
        ctx.rotate_degree(line_rot - 90)
        ctx.scale(line_size, line_size)
        for group, can_break in ((line.effect_notes, False),
                                 (line.plain_notes, True)):
            self._draw_note_group(group, can_break, t, line_fsp, line_fp,
                                  line_visa, hit_effects)
        ctx.restore_state()

    def _draw_note_group(self, notes, can_break, t, line_fsp, line_fp,
                         line_visa, hit_effects):
        nf = self._nf
        if nf is not None and id(notes) in nf["groups"]:
            return self._draw_note_group_c(
                notes, can_break, t, line_fsp, line_fp, line_visa,
                hit_effects)
        if _fastrec is not None and getattr(self, "_notes_native_ok", False):
            return self._draw_note_group_native(
                notes, can_break, t, line_fsp, line_fp, line_visa,
                hit_effects)
        return self._draw_note_group_py(
            notes, can_break, t, line_fsp, line_fp, line_visa,
            hit_effects)

    def _draw_note_group_c(self, notes, can_break, t, line_fsp, line_fp,
                           line_visa, hit_effects):
        """Full-C note-group loop: fastrec.notes_frame runs the entire
        per-note body (click/removal/cull/value reads/compose/record) in
        one call; Python only boxes the rare events back (new hit
        effects, removals).  Bit-parity with _draw_note_group_py is
        fuzz-enforced (tests/test_fastrec.py)."""
        nf = self._nf
        gstate = nf["groups"][id(notes)]
        ids, count = gstate
        if count == 0:
            return
        ctx, h = self.ctx, self.h
        cmds = ctx._cmds
        while cmds.n + 3 * count > cmds.kinds.shape[0]:
            cmds._grow()
        fp_base = SPEED_UNIT / MIL_SCRH * h * self.flow_speed
        visa_px = line_visa / MIL_SCRH * h
        new_count, nrec, brk, extent, n_new = _fastrec.notes_frame(
            cmds.kinds, cmds.params, cmds.n, ids, count,
            nf["stat"], nf["istat"], nf["clicked"], nf["vflat"],
            nf["texes"], nf["note_m"], nf["mstamp"], nf["newly"],
            ctx._state.matrix, ctx._state.color,
            t, line_fsp, line_fp, visa_px, fp_base, nf["width_px"],
            float(self.w), float(h), 1 if can_break else 0, nf["frame"])
        cmds.n += nrec
        ctx._seq += nrec
        if extent > ctx._max_sampling_extent:
            ctx._max_sampling_extent = extent
        if n_new:
            notes_l = nf["notes"]
            for nid in nf["newly"][:n_new].tolist():
                note = notes_l[nid]
                note.clicked = True
                hit_effects.append(HitEffect(note, note.time))
        if new_count != count:
            # keep the Python list in sync (removal events are rare)
            gstate[1] = new_count
            notes_l = nf["notes"]
            del notes[:]
            notes.extend(notes_l[i] for i in ids[:new_count].tolist())

    def _draw_note_group_native(self, notes, can_break, t, line_fsp,
                                line_fp, line_visa, hit_effects):
        """Native per-note hot path: chart logic (animations, hold state,
        hit effects, removal) stays in Python; the compose + screen-cull +
        receding-break + record chain runs in one C call per note
        (native/fastrec.c note_blit, bit-parity with
        _draw_note_group_py — tests/test_fastrec.py)."""
        ctx, w, h = self.ctx, self.w, self.h
        fp_base = SPEED_UNIT / MIL_SCRH * h * self.flow_speed
        visa_px = line_visa / MIL_SCRH * h
        width_px = (w + h) * self.note_size
        base_m = ctx._state.matrix
        base_ct = ctx._state.color
        cmds = ctx._cmds
        store = ctx._store
        wf, hf = float(w), float(h)
        game_res = self.game_res
        note_blit = _fastrec.note_blit
        removed = []
        for note in notes:
            clicked = note.time <= t
            if clicked and not note.clicked:
                note.clicked = True
                hit_effects.append(HitEffect(note, note.time))

            if note.ishold and note.endTime + HOLD_DISAPPEAR_TIME < t:
                removed.append(note)
                continue
            if not note.ishold and clicked:
                removed.append(note)
                continue

            g = note.acollection.get_value
            note_fsp = line_fsp * g(AnimationKey.FlowSpeed)
            fp_mult = fp_base * note_fsp
            raw_fp = note.floorPosition - line_fp
            curr_fp = raw_fp * fp_mult
            if curr_fp > visa_px:
                continue

            rel = self.milpos2scrpos_cen(g(AnimationKey.RelativeX),
                                         g(AnimationKey.RelativeY))
            pos = (0.0, -curr_fp)
            if note.ishold and clicked:
                pos = (0.0, 0.0)
            anim_groups = note.acollection.anim_groups
            if anim_groups[AnimationKey.PositionX]:
                pos = (g(AnimationKey.PositionX) / MIL_SCRW * w, pos[1])
            if anim_groups[AnimationKey.PositionY]:
                pos = (pos[0], g(AnimationKey.PositionY) / MIL_SCRH * h)
            size = g(AnimationKey.Size) * NOTE_SCALE
            tex = game_res[note.texname]

            transp = g(AnimationKey.Transparency)
            rot = -90 - g(AnimationKey.Rotation)
            if note.ishold:
                transp *= 1.0 - fixorp((t - note.endTime)
                                       / HOLD_DISAPPEAR_TIME)
            col = g(AnimationKey.Color)

            if not note.ishold:
                height_px = width_px / tex.width * tex.height
                ishold = 0
                hold_len = u0 = u1 = 0.0
                need = 1
            else:
                atlas = game_res["meta"][
                    "holdAtlas" if not note.morebets else "holdDoubleAtlas"]
                hold_len = max(
                    0.0,
                    (note.endFloorPosition
                     - (line_fp if clicked else note.floorPosition))
                    * fp_mult)
                u0 = atlas[0] / tex.width
                u1 = 1.0 - atlas[1] / tex.width
                height_px = 0.0
                ishold = 1
                need = 3
            if cmds.n + need > cmds.kinds.shape[0]:
                cmds._grow()
            ox, oy = tex.region_for(store)
            nrec, brk, extent, m = note_blit(
                cmds.kinds, cmds.params, cmds.n, base_m,
                pos[0] + rel[0], pos[1] + rel[1], rot, size, base_ct,
                col[0] / 255, col[1] / 255, col[2] / 255, col[3] / 255,
                transp, wf, hf,
                1 if can_break else 0,
                1.0 if fp_mult > 0 else -1.0,
                1 if fp_mult == 0.0 else 0,
                ishold, width_px, height_px, hold_len, u0, u1,
                float(ox), float(oy), float(tex.width), float(tex.height))
            if brk:
                break
            cmds.n += nrec
            ctx._seq += nrec
            if extent > ctx._max_sampling_extent:
                ctx._max_sampling_extent = extent
            note.transform = m
        for n in removed:
            notes.remove(n)

    def _draw_note_group_py(self, notes, can_break, t, line_fsp, line_fp,
                            line_visa, hit_effects):
        ctx, w, h = self.ctx, self.w, self.h
        # loop invariants, hoisted with the SAME left-to-right FP op
        # order as the per-note expressions they replace (bit-parity)
        fp_base = SPEED_UNIT / MIL_SCRH * h * self.flow_speed
        visa_px = line_visa / MIL_SCRH * h
        width_px = (w + h) * self.note_size
        removed = []
        for note in notes:
            clicked = note.time <= t
            if clicked and not note.clicked:
                note.clicked = True
                hit_effects.append(HitEffect(note, note.time))

            if note.ishold and note.endTime + HOLD_DISAPPEAR_TIME < t:
                removed.append(note)
                continue
            if not note.ishold and clicked:
                removed.append(note)
                continue

            g = note.acollection.get_value
            note_fsp = line_fsp * g(AnimationKey.FlowSpeed)
            fp_mult = fp_base * note_fsp
            raw_fp = note.floorPosition - line_fp
            curr_fp = raw_fp * fp_mult

            # visibility cull (reference milrenderer:929) — everything
            # between here and the original cull site is pure (animation
            # get_value is a forward-scan cache; milpos2scrpos is
            # stateless), so culled notes skip the position/size math
            if curr_fp > visa_px:
                continue

            rel = self.milpos2scrpos_cen(g(AnimationKey.RelativeX),
                                         g(AnimationKey.RelativeY))
            pos = (0.0, -curr_fp)
            if note.ishold and clicked:
                pos = (0.0, 0.0)
            anim_groups = note.acollection.anim_groups
            if anim_groups[AnimationKey.PositionX]:
                pos = (g(AnimationKey.PositionX) / MIL_SCRW * w, pos[1])
            if anim_groups[AnimationKey.PositionY]:
                pos = (pos[0], g(AnimationKey.PositionY) / MIL_SCRH * h)
            pos = (pos[0] + rel[0], pos[1] + rel[1])
            size = g(AnimationKey.Size) * NOTE_SCALE
            tex = self.game_res[note.texname]

            transp = g(AnimationKey.Transparency)
            rot = -90 - g(AnimationKey.Rotation)
            if note.ishold:
                transp *= 1.0 - fixorp((t - note.endTime)
                                       / HOLD_DISAPPEAR_TIME)

            ctx.save_state()
            col = g(AnimationKey.Color)
            ctx.apply_color_transform(col[0] / 255, col[1] / 255,
                                      col[2] / 255, col[3] / 255)
            ctx.apply_color_transform(1, 1, 1, transp)
            ctx.translate(*pos)
            ctx.rotate_degree(rot)
            ctx.scale(size, size)

            wtf = CanvasTransform(ctx.get_transform())

            if not note.ishold:
                height_px = width_px / tex.width * tex.height
                poly = wtf.getCRectPoints(0, 0, height_px, width_px)
            else:
                atlas = self.game_res["meta"][
                    "holdAtlas" if not note.morebets else "holdDoubleAtlas"]
                head_h = tail_h = width_px / 2
                hold_len = max(
                    0.0,
                    (note.endFloorPosition
                     - (line_fp if clicked else note.floorPosition))
                    * fp_mult)
                poly = wtf.getCRectPoints(hold_len / 2, 0,
                                          hold_len + head_h + tail_h,
                                          width_px)

            if not polygon_in_screen(w, h, poly):
                if can_break and (
                    (line_length(w / 2, h / 2,
                                 *wtf.getPoint(0, 1 if fp_mult > 0 else -1))
                     - line_length(w / 2, h / 2, *wtf.getPoint(0, 0)) > 0.0)
                    or fp_mult == 0.0
                ):
                    ctx.restore_state()
                    break

            if not note.ishold:
                ctx.draw_texture(tex, -height_px / 2, -width_px / 2,
                                 height_px, width_px)
            else:
                u0 = atlas[0] / tex.width
                u1 = 1.0 - atlas[1] / tex.width
                ctx.draw_splitted_texture(tex, -head_h, -width_px / 2,
                                          head_h + 1, width_px,
                                          0, u0, 0.0, 1.0)
                ctx.draw_splitted_texture(tex, 0, -width_px / 2,
                                          hold_len + 1, width_px,
                                          u0, u1, 0.0, 1.0)
                ctx.draw_splitted_texture(tex, hold_len, -width_px / 2,
                                          tail_h + 1, width_px,
                                          u1, 1.0, 0.0, 1.0)

            note.transform = ctx.get_transform()
            ctx.restore_state()
        for n in removed:
            notes.remove(n)

    def _draw_hit_effects(self, t, hit_effects):
        ctx, w, h = self.ctx, self.w, self.h
        hit_effects.sort(key=lambda e: e.t)
        expired = []
        for he in hit_effects:
            if he.t + HIT_EFFECT_DUR < t:
                expired.append(he)
                continue
            ctx.save_state()
            ctx.set_transform(*he.note.transform)
            p = 1.0 - (he.t + HIT_EFFECT_DUR - t) / HIT_EFFECT_DUR
            size = (w + h) * HITEFFECT_SIZE * (1.0 - (1.0 - p) ** 3)
            group = self.hit_effect_texs[he.group]
            tex = group[int(p * (len(group) - 1))]
            ctx.draw_texture(tex, -size / 2, -size / 2, size, size)
            ctx.restore_state()
        for he in expired:
            hit_effects.remove(he)

    # -- full run (reference :817-1040) ------------------------------------
    def run(self, chart_path: str, output: str,
            progress: bool = True, start_frame: int = 0,
            end_frame: typing.Optional[int] = None) -> None:
        """Render the chart to ``output``.

        ``start_frame``/``end_frame`` render a sub-range (frame-range
        resume — the render is a pure function of t, so restarting mid-way
        just replays the animation cursors; the reference always runs
        start-to-finish, SURVEY §5).  Audio is trimmed to the range.
        """
        from ..utils.profiling import PhaseTimer
        from .. import config as _config
        timer = self.timer = PhaseTimer()
        _prev_unrolled = _config.flush_unrolled_enabled()
        _config.set_flush_unrolled(self.unrolled_flush)
        try:
            return self._run_inner(chart_path, output, progress,
                                   start_frame, end_frame, timer)
        finally:
            _config.set_flush_unrolled(_prev_unrolled)

    def _run_inner(self, chart_path, output, progress, start_frame,
                   end_frame, timer):
        pkg = ChartPackage(chart_path)

        log.info("loading audio file")
        import tempfile
        import os
        with timer.phase("load_audio"):
            audio_bytes = pkg.read(pkg.meta["audio_file"])
            suffix = os.path.splitext(pkg.meta["audio_file"])[1] or ".ogg"
            with tempfile.NamedTemporaryFile(suffix=suffix,
                                             delete=False) as f:
                f.write(audio_bytes)
                tmp_audio = f.name
            try:
                bgm = AudioClip.from_file(tmp_audio)
            finally:
                os.unlink(tmp_audio)

        log.info("loading chart file")
        with timer.phase("load_chart"):
            chart = chart_mod.Chart(pkg.read_json(pkg.meta["chart_file"]))

        log.info("mixing bgm")
        with timer.phase("mix_bgm"):
            self.mix_bgm(bgm, chart)

        num_frames = int(bgm.duration * self.fps) + 1
        if end_frame is not None:
            num_frames = min(num_frames, end_frame)
        if start_frame or end_frame is not None:
            bgm.cut(start_frame / self.fps, num_frames / self.fps,
                    time_unit="second")

        log.info("initializing video cap")
        self.cap.initialize(output, hasAudio=not self.silent, a_clip=bgm)

        log.info("loading assets")
        with timer.phase("load_assets"):
            self.load_assets(pkg)

        log.info("rendering frames %d..%d", start_frame, num_frames)
        import jax.numpy as jnp

        # composite the constant layers once; every frame starts from this
        # snapshot instead of re-sampling the full-screen background
        self.draw_static(chart)
        static_fb = self.ctx.framebuffer()

        hit_effects: list = []
        frame_range = range(start_frame, num_frames)
        if progress:
            import tqdm
            frame_range = tqdm.trange(start_frame, num_frames,
                                      desc="Rendering")
        n_dev = self.devices
        if n_dev == 0:
            import jax
            n_dev = len(jax.devices())
        if n_dev > 1:
            # multi-device path: y-band x frame-batch sharding over a
            # ('data', 'tile') mesh; falls back cleanly when one device
            import jax
            from ..parallel.sharding import make_mesh
            from ..pipeline import ShardedVideoPipeline
            mesh = make_mesh(jax.devices()[:n_dev])
            pipe = ShardedVideoPipeline(
                self.cap, self.w, self.h,
                max(self.batch_frames, mesh.shape["data"]),
                fb0=static_fb, mesh=mesh)
            for i in frame_range:
                with timer.phase("record"):
                    self.draw_frame(chart, i / self.fps, hit_effects,
                                    include_static=False)
                    k, p = self.ctx._cmds.snapshot()
                with timer.phase("dispatch"):
                    pipe.submit(k, p)
                self.ctx._cmds.clear()
            with timer.phase("dispatch"):
                pipe.finish()
        elif self.batch_frames > 1:
            # record-only frames, executed vmapped in device batches (the
            # path the reference's mode=1 preparer never finished)
            from ..pipeline import BatchedVideoPipeline
            pipe = BatchedVideoPipeline(self.cap, self.w, self.h,
                                        self.batch_frames, fb0=static_fb)
            for i in frame_range:
                with timer.phase("record"):
                    self.draw_frame(chart, i / self.fps, hit_effects,
                                    include_static=False)
                    k, p = self.ctx._cmds.snapshot()
                with timer.phase("dispatch"):
                    pipe.submit(k, p)
                self.ctx._cmds.clear()
            with timer.phase("dispatch"):
                pipe.finish()
        else:
            for i in frame_range:
                # executor flushes donate the framebuffer, so each frame
                # starts from a fresh device copy of the snapshot (a
                # device op — counted as dispatch, not host record)
                with timer.phase("dispatch"):
                    self.ctx._fb = jnp.copy(static_fb)
                with timer.phase("record"):
                    self.draw_frame(chart, i / self.fps, hit_effects,
                                    include_static=False)
                with timer.phase("dispatch"):
                    self.cap.put_renderer_context_frame(self.ctx)
        with timer.phase("encode_release"):
            self.cap.release()
        timer.report(log)
        hits, misses = (RenderContext._unroll_hits,
                        RenderContext._unroll_misses)
        if hits + misses:
            log.info("unrolled flush: %d/%d dispatch groups (%.0f%%)",
                     hits, hits + misses, 100.0 * hits / (hits + misses))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="milrenderer")
    p.add_argument("-r", "--res", type=str, required=True)
    p.add_argument("-i", "--input", type=str, required=True)
    p.add_argument("-o", "--output", type=str, required=True)
    p.add_argument("-f", "--fps", type=int, default=60)
    p.add_argument("-s-w", "--width", type=int, default=1920)
    p.add_argument("-s-h", "--height", type=int, default=1080)
    p.add_argument("-ns", "--note-scale", type=float, default=1.0)
    p.add_argument("-fs", "--flow-speed", type=float, default=1.66)
    p.add_argument("-d", "--debug", action="store_true")
    p.add_argument("-sl", "--silent", action="store_true")
    # default 8: the fused pipeline frame step (fb0 -> unrolled flush ->
    # u8 in ONE device program) beat the per-frame eager chain 4.48 vs
    # 5.46 ms/frame on device (tools/exp_fused_frame.py, 2026-08-18);
    # the batched path is bit-tested equal to sequential
    p.add_argument("-bf", "--batch-frames", type=int, default=8,
                   help="frames per device dispatch (TPU batching)")
    p.add_argument("--devices", type=int, default=1,
                   help="devices to shard over (0 = all available; >1 "
                        "renders frame batches on a (data, tile) mesh)")
    p.add_argument("--start-frame", type=int, default=0,
                   help="resume from this frame")
    p.add_argument("--end-frame", type=int, default=None,
                   help="stop before this frame")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.debug else logging.INFO,
        format="[%(asctime)s] %(levelname)s %(funcName)s: %(message)s",
        datefmt="%H:%M:%S")
    log.info("output video size: %dx%d", args.width, args.height)
    log.info("output video fps: %d", args.fps)
    log.info("output video file: %s", args.output)
    r = Renderer(width=args.width, height=args.height, fps=args.fps,
                 note_scale=args.note_scale, flow_speed=args.flow_speed,
                 res_dir=args.res, silent=args.silent,
                 batch_frames=args.batch_frames, devices=args.devices)
    try:
        r.run(args.input, args.output, start_frame=args.start_frame,
              end_frame=args.end_frame)
    except (ValueError, zipfile.BadZipFile) as e:
        print(f"Error: {e}")
        sys.exit(1)


if __name__ == "__main__":
    main()
