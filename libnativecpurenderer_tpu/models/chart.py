"""Milthm chart format v2: parsing, animation system, timing.

Behaviour mirror of the chart model in ``/root/reference/src/milrenderer.py``
(:166-186 beat->second BPM map, :210-249 enums, :71-111 easing table,
:299-350 ease/animation, :353-495 animation collection with monotonic
cursors and integrated Speed floor-position, :710-780 line/chart).  The
implementation is independent (explicit chart-scoped timing instead of the
reference's global ``tosec`` rebinding at :746-748) but evaluates to the
same values.
"""

from __future__ import annotations

import math
import typing

import numpy as np

try:
    from ..fastrec import mod as _fast
    if _fast is not None and not hasattr(_fast, "notes_frame"):
        _fast = None        # stale build without the evaluator
except ImportError:         # standalone import of models.chart
    _fast = None


# ---------------------------------------------------------------------------
# easing table: 3 modes (in/out/inout) x 11 kinds (reference :71-111)
# ---------------------------------------------------------------------------

def _in_sine(t):
    return 1 - math.cos(t * math.pi / 2)


def _out_sine(t):
    return math.sin(t * math.pi / 2)


def _io_sine(t):
    return -(math.cos(math.pi * t) - 1) / 2


def _in_expo(t):
    return 0.0 if t == 0 else 2 ** (10 * t - 10)


def _out_expo(t):
    return 1.0 if t == 1 else 1 - 2 ** (-10 * t)


def _io_expo(t):
    if t == 0:
        return 0.0
    if t == 1:
        return 1.0
    return (2 ** (20 * t - 10) if t < 0.5 else 2 - 2 ** (-20 * t + 10)) / 2


def _in_circ(t):
    return 1 - (1 - t ** 2) ** 0.5


def _out_circ(t):
    return (1 - (t - 1) ** 2) ** 0.5


def _io_circ(t):
    if t < 0.5:
        return (1 - (1 - (2 * t) ** 2) ** 0.5) / 2
    return ((1 - (-2 * t + 2) ** 2) ** 0.5 + 1) / 2


_B1, _B2 = 1.70158, 1.70158 * 1.525  # back constants (c1, c2=2.5949095)


def _in_back(t):
    return (_B1 + 1) * t ** 3 - _B1 * t ** 2


def _out_back(t):
    return 1 + (_B1 + 1) * (t - 1) ** 3 + _B1 * (t - 1) ** 2


def _io_back(t):
    if t < 0.5:
        return ((2 * t) ** 2 * ((_B2 + 1) * 2 * t - _B2)) / 2
    return ((2 * t - 2) ** 2 * ((_B2 + 1) * (t * 2 - 2) + _B2) + 2) / 2


def _in_elastic(t):
    if t == 0:
        return 0.0
    if t == 1:
        return 1.0
    return -(2 ** (10 * t - 10)) * math.sin((t * 10 - 10.75)
                                            * (2 * math.pi / 3))


def _out_elastic(t):
    if t == 0:
        return 0.0
    if t == 1:
        return 1.0
    return 2 ** (-10 * t) * math.sin((t * 10 - 0.75) * (2 * math.pi / 3)) + 1


def _io_elastic(t):
    # NOTE: the reference's io-elastic lambda (:108) has `1 if t == 0` as a
    # dead second branch (its condition repeats t == 0), so it is never
    # taken; the live math below matches the live branches.
    if t == 0:
        return 0.0
    if t < 0.5:
        return -(2 ** (20 * t - 10)
                 * math.sin((20 * t - 11.125) * (2 * math.pi / 4.5))) / 2
    return (2 ** (-20 * t + 10)
            * math.sin((20 * t - 11.125) * (2 * math.pi / 4.5))) / 2 + 1


def _bounce(t):
    n1, d1 = 7.5625, 2.75
    if t < 1 / d1:
        return n1 * t * t
    if t < 2 / d1:
        return n1 * (t - 1.5 / d1) * (t - 1.5 / d1) + 0.75
    if t < 2.5 / d1:
        return n1 * (t - 2.25 / d1) * (t - 2.25 / d1) + 0.9375
    return n1 * (t - 2.625 / d1) * (t - 2.625 / d1) + 0.984375


def _in_bounce(t):
    return 1 - _bounce(1 - t)


def _io_bounce(t):
    if t < 0.5:
        return (1 - _bounce(1 - 2 * t)) / 2
    return (1 + _bounce(2 * t - 1)) / 2


def _linear(t):
    return t


EASINGS = [
    [_linear, _in_sine, lambda t: t ** 2, lambda t: t ** 3,
     lambda t: t ** 4, lambda t: t ** 5, _in_expo, _in_circ, _in_back,
     _in_elastic, _in_bounce],
    [_linear, _out_sine, lambda t: 1 - (1 - t) * (1 - t),
     lambda t: 1 - (1 - t) ** 3, lambda t: 1 - (1 - t) ** 4,
     lambda t: 1 - (1 - t) ** 5, _out_expo, _out_circ, _out_back,
     _out_elastic, _bounce],
    [_linear, _io_sine,
     lambda t: 2 * t ** 2 if t < 0.5 else 1 - (-2 * t + 2) ** 2 / 2,
     lambda t: 4 * t ** 3 if t < 0.5 else 1 - (-2 * t + 2) ** 3 / 2,
     lambda t: 8 * t ** 4 if t < 0.5 else 1 - (-2 * t + 2) ** 4 / 2,
     lambda t: 16 * t ** 5 if t < 0.5 else 1 - (-2 * t + 2) ** 5 / 2,
     _io_expo, _io_circ, _io_back, _io_elastic, _io_bounce],
]


# reverse map: easing function object -> (mode, kind) code for the native
# evaluator (fastrec.anim_eval).  _linear appears in every mode at kind 0;
# any of its codes evaluates identically.
_EASE_CODE: dict = {}
for _m, _row in enumerate(EASINGS):
    for _k, _fn in enumerate(_row):
        _EASE_CODE.setdefault(id(_fn), (_m, _k))


# ---------------------------------------------------------------------------
# enums (reference :210-249)
# ---------------------------------------------------------------------------

class AnimationKey:
    Unknown = -1
    PositionX = 0
    PositionY = 1
    Transparency = 2
    Size = 3
    Rotation = 4
    FlowSpeed = 5
    RelativeX = 6
    RelativeY = 7
    LineBodyTransparency = 8
    LineHeadTransparency = 9
    StoryBoardWidth = 10
    StoryBoardHeight = 11
    Speed = 12
    WholeTransparency = 13
    StoryBoardLeftBottomX = 14
    StoryBoardLeftBottomY = 15
    StoryBoardRightBottomX = 16
    StoryBoardRightBottomY = 17
    StoryBoardLeftTopX = 18
    StoryBoardLeftTopY = 19
    StoryBoardRightTopX = 20
    StoryBoardRightTopY = 21
    Color = 22
    VisibleArea = 23


class BearerType:
    Unknown = -1
    Line = 0
    Note = 1
    StoryBoard = 2


class NoteType:
    Hit = 0
    Drag = 1


MAX_ANIMKEY = AnimationKey.VisibleArea

# per-bearer default value tables (reference :416-495)
_DEFAULTS = {
    BearerType.Line: [
        0.0, -350.0, 1.0, 1.0, 90.0, 1.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0,
        1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
        (255, 255, 255, 255), float("inf"),
    ],
    BearerType.Note: [
        0.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0,
        1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
        (255, 255, 255, 255), 0.0,
    ],
    BearerType.StoryBoard: [
        0.0, 0.0, 0.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0,
        1.0, 1.0, -0.5, 0.5, 0.5, 0.5, -0.5, -0.5, 0.5, -0.5,
        (255, 255, 255, 255), float("inf"),
    ],
}


# ---------------------------------------------------------------------------
# timing (reference :163-186)
# ---------------------------------------------------------------------------

def beatval(beat: list) -> float:
    return beat[0] + beat[1] / beat[2]


def num2rgba(v) -> tuple:
    v = int(v)
    return ((v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)


class Timing:
    """Piecewise-BPM beat->second conversion (reference tosec :166-186)."""

    def __init__(self, offset: float, bpms: list):
        self.offset = offset
        self.bpms = bpms  # sorted BPMEvent list

    def tosec(self, beat: list) -> float:
        t = beatval(beat)
        sec = self.offset
        bpms = self.bpms
        if len(bpms) == 1:
            return sec + 60 / bpms[0].bpm * t
        for i, e in enumerate(bpms):
            if i != len(bpms) - 1:
                seg = bpms[i + 1].time - e.time
                if t >= seg:
                    sec += seg * (60 / e.bpm)
                    t -= seg
                else:
                    sec += t * (60 / e.bpm)
                    break
            else:
                sec += t * (60 / e.bpm)
        return sec


# ---------------------------------------------------------------------------
# model classes
# ---------------------------------------------------------------------------

class ChartMeta:
    def __init__(self, data: dict):
        self.background_dim = data["background_dim"]
        self.name = data["name"]
        self.background_artist = data["background_artist"]
        self.music_artist = data["music_artist"]
        self.charter = data["charter"]
        self.difficulty_name = data["difficulty_name"]
        self.difficulty = data["difficulty"]
        self.offset = data["offset"]


class BPMEvent:
    def __init__(self, data: dict):
        self.time = beatval(data["time"])
        self.bpm = data["bpm"]


class Ease:
    def __init__(self, data: dict):
        self.type = data["type"]
        self.press = data["press"]
        self.isValueExp = data["isValueExp"]
        self.cusValueExp = data["cusValueExp"]
        self.clipLeft = data["clipLeft"]
        self.clipRight = data["clipRight"]
        if not self.isValueExp:
            try:
                self.doease = EASINGS[self.type][self.press]
            except IndexError:
                self.doease = EASINGS[0][0]
        else:
            self.doease = _linear  # value expressions degrade to identity

    def interplate(self, p, start, end, etype):
        p = self.doease(p)
        if etype != AnimationKey.Color:
            return start + (end - start) * p
        s = num2rgba(start)
        e = num2rgba(end)
        return (s[0] + (e[0] - s[0]) * p,
                s[1] + (e[1] - s[1]) * p,
                s[2] + (e[2] - s[2]) * p,
                s[3] + (e[3] - s[3]) * p)


class Animation:
    def __init__(self, data: dict, timing: Timing):
        self.startTime = timing.tosec(data["startTime"])
        self.endTime = timing.tosec(data["endTime"])
        self.type = data["type"]
        self.start = data["start"]
        self.end = data["end"]
        self.index = data["index"]
        self.bearer_type = data["bearer_type"]
        self.bearer = data["bearer"]
        self.ease = Ease(data["ease"])
        self.floorPosition = 0.0

    def interplate(self, t: float):
        if self.startTime == self.endTime:
            p = 1.0
        else:
            p = (t - self.startTime) / (self.endTime - self.startTime)
        p = max(0.0, min(1.0, p))
        return self.ease.interplate(p, self.start, self.end, self.type)


class AnimationCollection:
    """Per-key sorted event lists with a monotonic cursor; Speed key
    integrates floor position with the trapezoid rule (reference :353-407)."""

    def __init__(self, anims: list, defaults: list):
        self.values = list(defaults)
        self.defaults = list(defaults)
        self.indexs = [0] * (MAX_ANIMKEY + 1)
        self.anim_groups: list = [[] for _ in range(MAX_ANIMKEY + 1)]
        self._t = 0.0
        for a in anims:
            self.anim_groups[a.type].append(a)
        for es in self.anim_groups:
            es.sort(key=lambda e: e.startTime)

        fp = 0.0
        for e in self.anim_groups[AnimationKey.Speed]:
            e.floorPosition = fp
            fp += (e.endTime - e.startTime) * (e.start + e.end) / 2

        self.is_effect_opt = any(
            self.anim_groups[k] for k in (
                AnimationKey.PositionX, AnimationKey.PositionY,
                AnimationKey.Size, AnimationKey.Rotation,
                AnimationKey.FlowSpeed, AnimationKey.RelativeX,
                AnimationKey.RelativeY, AnimationKey.Speed))
        # most bearers animate 0-2 keys; update() walks only those
        # (notes' update is per-frame host-critical in milrenderer)
        self._active = tuple(i for i in range(MAX_ANIMKEY + 1)
                             if self.anim_groups[i])
        self._speed_empty = not self.anim_groups[AnimationKey.Speed]

    def update(self, t: float, *, only: typing.Optional[int] = None):
        if t < self._t:
            self.indexs = [0] * (MAX_ANIMKEY + 1)
        self._t = t
        # empty-Speed default: integrated position is t * default speed
        # (written exactly when Speed has no events and isn't filtered
        # out, matching the full-loop branch this replaces)
        if self._speed_empty and (only is None
                                  or only == AnimationKey.Speed):
            self.values[AnimationKey.Speed] = \
                t * self.defaults[AnimationKey.Speed]
        for i in self._active:
            if only is not None and i != only:
                continue
            es = self.anim_groups[i]
            while (self.indexs[i] < len(es) - 1
                   and es[self.indexs[i] + 1].startTime <= t):
                self.indexs[i] += 1
            e = es[self.indexs[i]]
            self.values[i] = e.interplate(t)
            if i == AnimationKey.Speed:
                if t < e.startTime:
                    self.values[i] = t * e.start
                elif e.startTime < t < e.endTime:
                    self.values[i] = (e.floorPosition
                                      + (t - e.startTime)
                                      * (self.values[i] + e.start) / 2)
                else:
                    self.values[i] = (e.floorPosition
                                      + (e.endTime - e.startTime)
                                      * (e.start + e.end) / 2
                                      + (t - e.endTime) * e.end)

    def get_value(self, key: int):
        return self.values[key]

    @staticmethod
    def filtered(anims: list, bearer_type: int,
                 bearer: typing.Optional[int] = None) -> "AnimationCollection":
        sel = [a for a in anims
               if a.bearer_type == bearer_type
               and (bearer is None or a.bearer == bearer)]
        return AnimationCollection(sel, _DEFAULTS[bearer_type])


class _AnimArena:
    """Flattened event tables for every AnimationCollection of a chart,
    evaluated per frame by ONE native call (fastrec.anim_eval) instead of
    a Python loop over collections (the dominant host record cost at
    draw_frame time — VERDICT r3 item 5).  Only the actually-updated
    values are boxed back into each collection's ``values`` list, so
    ``get_value`` stays a plain list read.  Bit-parity with the Python
    ``AnimationCollection.update`` path is fuzz-enforced
    (tests/test_chart.py)."""

    def __init__(self, colls: list):
        self.colls = colls
        nc = len(colls)
        nk = MAX_ANIMKEY + 1
        ev_start: list = []
        ev_end: list = []
        v_start: list = []
        v_end: list = []
        ev_ease: list = []
        ev_floor: list = []
        grp_off = np.zeros(nc * nk, np.int32)
        grp_cnt = np.zeros(nc * nk, np.int32)
        act_keys: list = []
        act_off = np.zeros(nc + 1, np.int32)
        sp_empty = np.zeros(nc, np.uint8)
        def_speed = np.zeros(nc, np.float64)
        for ci, c in enumerate(colls):
            sp_empty[ci] = c._speed_empty
            def_speed[ci] = c.defaults[AnimationKey.Speed]
            for key in c._active:
                grp_off[ci * nk + key] = len(ev_start)
                es = c.anim_groups[key]
                grp_cnt[ci * nk + key] = len(es)
                for a in es:
                    ev_start.append(a.startTime)
                    ev_end.append(a.endTime)
                    v_start.append(float(a.start))
                    v_end.append(float(a.end))
                    m, k = _EASE_CODE.get(id(a.ease.doease), (0, 0))
                    ev_ease.append(m * 16 + k)
                    ev_floor.append(a.floorPosition)
                act_keys.append(key)
            act_off[ci + 1] = len(act_keys)
        # one pad event keeps the buffers non-empty for the C side
        if not ev_start:
            ev_start = ev_end = v_start = v_end = ev_floor = [0.0]
            ev_ease = [0]
        self.ev_start = np.asarray(ev_start, np.float64)
        self.ev_end = np.asarray(ev_end, np.float64)
        self.v_start = np.asarray(v_start, np.float64)
        self.v_end = np.asarray(v_end, np.float64)
        self.ev_ease = np.asarray(ev_ease, np.int32)
        self.ev_floor = np.asarray(ev_floor, np.float64)
        self.grp_off = grp_off
        self.grp_cnt = grp_cnt
        self.act_off = act_off
        self.act_keys = np.asarray(act_keys or [0], np.uint8)
        self.cursors = np.zeros(nc * nk, np.int32)
        self.last_t = np.full(nc, -np.inf)
        self.sp_empty = sp_empty
        self.def_speed = def_speed
        self.values_lists = [c.values for c in colls]
        # flat mirror of the boxed values, consumed natively by
        # fastrec.notes_frame: scalar keys at their AnimationKey index,
        # Color expanded to rgba at 24..27.  Seeded from the current
        # (default) values so never-animated keys read correctly.
        vflat = np.zeros((nc, 28), np.float64)
        for ci, c in enumerate(colls):
            for key, v in enumerate(c.values):
                if key == AnimationKey.Color:
                    vflat[ci, 24:28] = v
                else:
                    vflat[ci, key] = v
        self.values_flat = vflat
        self.coll_index = {id(c): i for i, c in enumerate(colls)}

    def eval(self, t: float) -> None:
        _fast.anim_eval(self.ev_start, self.ev_end, self.v_start,
                        self.v_end, self.ev_ease, self.ev_floor,
                        self.grp_off, self.grp_cnt, self.act_off,
                        self.act_keys, self.cursors, self.last_t,
                        self.sp_empty, self.def_speed,
                        self.values_lists, self.values_flat, t)


class Note:
    def __init__(self, data: dict, master_anims: list, timing: Timing):
        self.time = timing.tosec(data["time"])
        self.type = data["type"]
        self.isFake = data["isFake"]
        self.isAlwaysPerfect = data["isAlwaysPerfect"]
        self.endTime = timing.tosec(data["endTime"])
        self.index = data["index"]
        self.acollection = AnimationCollection.filtered(
            master_anims, BearerType.Note, self.index)
        self.ishit = self.type == NoteType.Hit
        self.ishold = self.ishit and self.endTime > self.time
        self.master: typing.Optional[Line] = None
        self.floorPosition = 0.0
        self.endFloorPosition = 0.0
        self.morebets = False
        self.clicked = False
        self.holdLastSpwanHitEffectTime = self.time
        self.transform = (0.0,) * 6
        self.texname = ""

    def init(self):
        assert self.master is not None, "master is not set"
        mc = self.master.acollection
        mc.update(self.time, only=AnimationKey.Speed)
        self.floorPosition = mc.get_value(AnimationKey.Speed)
        mc.update(self.endTime, only=AnimationKey.Speed)
        self.endFloorPosition = mc.get_value(AnimationKey.Speed)
        self.texname = (("ex" if self.isAlwaysPerfect else "")
                        + (("hold" if self.ishold else "tap")
                           if self.ishit else "drag")
                        + ("_double" if self.morebets else ""))

    def update(self, t: float):
        self.acollection.update(t)


class Line:
    def __init__(self, data: dict, timing: Timing):
        self.animations = [Animation(a, timing) for a in data["animations"]]
        self.notes = [Note(n, self.animations, timing)
                      for n in data["notes"]]
        self.index = data["index"]
        self.notes.sort(key=lambda n: n.time)
        self.acollection = AnimationCollection.filtered(
            self.animations, BearerType.Line)
        # split like the reference's note_groups (:718-724): notes with
        # effect animations can't early-break on screen-order culling
        self.effect_notes = [n for n in self.notes
                             if n.acollection.is_effect_opt]
        self.plain_notes = [n for n in self.notes
                            if not n.acollection.is_effect_opt]

    def init(self):
        for n in self.notes:
            n.master = self
            n.init()

    def update(self, t: float):
        self.acollection.update(t)
        for n in self.notes:
            n.update(t)


class Chart:
    def __init__(self, data: dict):
        if data["fmt"] != 2:
            raise ValueError(f"Unsupported chart format: {data['fmt']}")
        self.meta = ChartMeta(data["meta"])
        self.bpms = sorted((BPMEvent(b) for b in data["bpms"]),
                           key=lambda e: e.time)
        self.timing = Timing(self.meta.offset, self.bpms)
        self.lines = sorted((Line(ln, self.timing) for ln in data["lines"]),
                            key=lambda ln: ln.index)
        self._arena: typing.Optional[_AnimArena] = None
        self._init()

    def _init(self):
        # morebets: >1 non-fake notes at the same exact time (:755-776)
        counts: dict = {}
        for ln in self.lines:
            for n in ln.notes:
                if n.isFake:
                    continue
                counts[n.time] = counts.get(n.time, 0) + 1
        for ln in self.lines:
            for n in ln.notes:
                if not n.isFake and counts.get(n.time, 0) > 1:
                    n.morebets = True
            ln.init()

    # class-level switch so tests can force the Python path
    use_native_anim = True

    def update(self, t: float):
        if self.use_native_anim and _fast is not None:
            if self._arena is None:
                colls = [ln.acollection for ln in self.lines]
                colls += [n.acollection for ln in self.lines
                          for n in ln.notes]
                self._arena = _AnimArena(colls)
            self._arena.eval(float(t))
            return
        for ln in self.lines:
            ln.update(t)


# MilChart/MilLine/MilNote aliases for drivers written against the
# reference's class names
MilChart = Chart
MilLine = Line
MilNote = Note
MilAnimation = Animation
MilEase = Ease
MilAnimationCollectionGroup = AnimationCollection
EnumAnimationKey = AnimationKey
EnumAnimationBearerType = BearerType
EnumNoteType = NoteType
