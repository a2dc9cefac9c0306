"""Native recording core (native/fastrec.c) vs the pure-Python path."""

import math

import numpy as np
import pytest

import libnativecpurenderer_tpu as R
from libnativecpurenderer_tpu import fastrec
from libnativecpurenderer_tpu.core import transform as xf
from libnativecpurenderer_tpu.ops import commands as C

pytestmark = pytest.mark.skipif(not fastrec.available(),
                                reason="native fastrec not built")


def _py_aabb(m, x, y, w, h, mw, mh):
    saved = xf._fast
    xf._fast = None
    try:
        return xf.aabb(m, x, y, w, h, mw, mh)
    finally:
        xf._fast = saved


def test_aabb_parity_fuzz():
    rng = np.random.default_rng(7)
    for trial in range(3000):
        kind = trial % 5
        if kind == 0:
            m = tuple(float(v) for v in rng.uniform(-3, 3, 6))
        elif kind == 1:           # pure translation
            m = (1.0, 0.0, 0.0, 1.0, float(rng.integers(-50, 50)),
                 float(rng.integers(-50, 50)))
        elif kind == 2:           # integer matrices incl. det == 0
            m = tuple(float(v) for v in rng.integers(-4, 5, 6))
        elif kind == 3:           # huge values (inverse 1e9 quirk scale)
            m = tuple(float(v) * 1e9 for v in rng.uniform(-1, 1, 6))
        else:                     # rotation: knife-edge trig products
            a = float(rng.uniform(0, 2 * math.pi))
            m = (math.cos(a), math.sin(a), -math.sin(a), math.cos(a),
                 float(rng.integers(0, 100)), float(rng.integers(0, 100)))
        x = float(rng.uniform(-100, 2000))
        y = float(rng.uniform(-100, 1200))
        w = float(rng.uniform(0, 500))
        h = float(rng.uniform(0, 500))
        assert tuple(fastrec.mod.aabb(m, x, y, w, h, 1920.0, 1080.0)) \
            == tuple(_py_aabb(m, x, y, w, h, 1920.0, 1080.0))


def test_aabb_nan_raises_like_python():
    m = (float("nan"), 0.0, 0.0, 1.0, 0.0, 0.0)
    with pytest.raises(ValueError):
        fastrec.mod.aabb(m, 0.0, 0.0, 10.0, 10.0, 100.0, 100.0)


def test_aabb_inf_parity():
    """Overflowed transforms (inf corners) clamp identically on the
    native and pure-Python paths — int(inf) used to raise only on the
    Python side (round-3 review)."""
    cases = [
        ((1e300, 0.0, 0.0, 1e300, 0.0, 0.0), 0.0, 0.0, 1e10, 1e10),
        ((float("inf"), 0.0, 0.0, 1.0, 0.0, 0.0), 1.0, 1.0, 5.0, 5.0),
        ((1.0, 0.0, 0.0, 1.0, float("-inf"), 0.0), 0.0, 0.0, 5.0, 5.0),
        ((-1e200, 0.0, 0.0, 1e200, 1e200, -1e200), 1e120, 1e120,
         1e120, 1e120),
    ]
    for m, x, y, w, h in cases:
        assert tuple(fastrec.mod.aabb(m, x, y, w, h, 1920.0, 1080.0)) \
            == tuple(_py_aabb(m, x, y, w, h, 1920.0, 1080.0)), m


def test_inverse_parity():
    rng = np.random.default_rng(8)
    for trial in range(1000):
        if trial % 2:
            m = tuple(float(v) for v in rng.uniform(-3, 3, 6))
        else:                     # integer, hits det == 0 -> 1e9 quirk
            m = tuple(float(v) for v in rng.integers(-2, 3, 6))
        xf._INV_CACHE.clear()
        assert fastrec.mod.inverse(m) == xf.inverse(m)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_record_row_parity(dtype):
    rng = np.random.default_rng(9)
    bufs = []
    for use_fast in (True, False):
        saved = C._fast
        C._fast = fastrec.mod if use_fast else None
        try:
            buf = C.CommandBuffer()
            buf.params = buf.params.astype(dtype)
            for t in range(300):   # forces growth past 256
                inv = tuple(float(v) for v in rng.uniform(-2, 2, 6))
                box = tuple(int(v) for v in rng.integers(0, 500, 4))
                ct = tuple(float(v) for v in rng.uniform(0, 1, 4))
                spec = list(rng.uniform(-1, 1, rng.integers(0, 19)))
                buf.append(int(rng.integers(0, 12)), (inv, box, ct), spec)
        finally:
            C._fast = saved
        bufs.append(buf.snapshot())
        rng = np.random.default_rng(9)   # same stream for both passes
    (k1, p1), (k2, p2) = bufs
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_array_equal(np.asarray(p1, np.float64),
                                  np.asarray(p2, np.float64))


def test_routes_for_size_parity():
    """Native footprint-route math == the numpy for_size, including the
    NaN propagation of zero-extent split textures (0/0 divides)."""
    from libnativecpurenderer_tpu.ops import patch_exec as pe

    rng = np.random.default_rng(1)
    W, H = 1920, 1080
    r_choices = [128, 256, 512]
    sizes = [128, 256, 512]
    for trial in range(60):
        n = int(rng.integers(1, 80))
        kinds = rng.choice(
            [C.KIND_RECT, C.KIND_TEX, C.KIND_TEX_FAST, C.KIND_SPLIT_TEX,
             C.KIND_HITEFFECT, C.KIND_FILL], n).astype(np.int32)
        p = rng.uniform(-2, 2, (n, C.PARAM_W))
        p[:, 6] = rng.uniform(-100, 2000, n)
        p[:, 8] = rng.uniform(-100, 1200, n)
        p[:, 22] = rng.choice([0.0, 1.0, 16.0, 128.0, 512.0], n)
        p[:, 23] = rng.choice([0.0, 1.0, 16.0, 128.0, 512.0], n)
        p[:, 18] = rng.uniform(-2, 2, n)
        p[:, 19] = rng.uniform(-2, 2, n)
        p[:, 29] = rng.choice([0.0, 1.0], n)
        z = rng.random(n) < 0.4
        p[z, 1] = 0.0
        p[z, 2] = 0.0
        for P in (128, 256):
            rt_n, rn_n = pe._routes_table(kinds, p, W, H, r_choices,
                                          sizes)(P)
            saved = pe._fast
            pe._fast = None
            try:
                with np.errstate(invalid="ignore"):
                    rt_p, rn_p = pe._routes_table(kinds, p, W, H,
                                                  r_choices, sizes)(P)
            finally:
                pe._fast = saved
            for i in np.nonzero(np.isin(kinds,
                                        pe._SAMPLING_KINDS_T))[0]:
                assert int(rt_n[i]) == int(rt_p[i])
                assert int(rn_n[i]) == int(rn_p[i])


def _mil_chart(tmp_path, n_lines=3, notes_per_line=24, dur=6.0):
    """Denser synthetic Milthm chart: holds, rotation sweeps, large
    position sweeps (off-screen spans exercise the receding-note break),
    one zero-size window (Size -> 0)."""
    import json
    import zipfile

    from PIL import Image
    from tests.conftest import _write_wav

    res = tmp_path / "res"
    res.mkdir()
    rng = np.random.default_rng(3)
    for name in ["tap", "tap_double", "extap", "extap_double", "hold",
                 "hold_double", "exhold", "exhold_double", "drag",
                 "drag_double", "line_head", "perfect_circ"]:
        arr = rng.integers(0, 255, (16, 16, 4), np.uint8)
        arr[..., 3] = 255
        Image.fromarray(arr, "RGBA").save(str(res / f"{name}.png"))
    (res / "meta.json").write_text(json.dumps(
        {"holdAtlas": [4, 4], "holdDoubleAtlas": [4, 4]}))
    sfx = np.full((441, 2), 0.1)
    _write_wav(str(res / "hit.ogg"), sfx)
    _write_wav(str(res / "drag.ogg"), sfx * 0.5)
    bgm = np.zeros((int(44100 * dur), 2))
    _write_wav(str(tmp_path / "audio.ogg"), bgm)
    Image.fromarray(rng.integers(0, 255, (18, 32, 3), np.uint8),
                    "RGB").save(str(tmp_path / "bg.png"))

    def ease():
        return {"type": 0, "press": 0, "isValueExp": False,
                "cusValueExp": "", "clipLeft": 0.0, "clipRight": 1.0}

    def anim(key, start, end, st, et):
        return {"startTime": st, "endTime": et, "type": key,
                "start": start, "end": end, "index": 0,
                "bearer_type": 0, "bearer": 0, "ease": ease()}

    total_beats = int(dur * 2) - 1
    lines = []
    for li in range(n_lines):
        notes = []
        for ni in range(notes_per_line):
            beat = 1 + (ni * total_beats) // notes_per_line
            tm = [beat, (li * 5 + ni * 3) % 8, 8]
            kind = (li + ni) % 3
            end = [beat + 1, tm[1], 8] if kind == 2 else tm
            notes.append({"time": tm, "type": 0 if kind == 0 else kind,
                          "isFake": False, "isAlwaysPerfect": False,
                          "endTime": end, "index": li * 100 + ni})
        anims = [
            anim(12, 0.8 + 0.3 * li, 1.2, [0, 0, 1], [total_beats, 0, 1]),
            anim(4, 40.0 * li, 360.0, [0, 0, 1], [total_beats, 0, 1]),
            anim(2, -300.0 + 200 * li, 300.0, [0, 0, 1],
                 [total_beats, 0, 1]),
        ]
        if li == 1:   # Size collapses to 0 mid-chart: zero-size draws
            anims.append(anim(8, 1.0, 0.0, [0, 0, 1], [total_beats, 0, 1]))
        lines.append({"index": li, "animations": anims, "notes": notes})
    chart = {
        "fmt": 2,
        "meta": {"background_dim": 0.6, "name": "p",
                 "background_artist": "", "music_artist": "",
                 "charter": "", "difficulty_name": "EZ", "difficulty": 1,
                 "offset": 0.0},
        "bpms": [{"time": [0, 0, 1], "bpm": 120}],
        "lines": lines,
    }
    zpath = tmp_path / "chart.zip"
    with zipfile.ZipFile(str(zpath), "w") as z:
        z.writestr("meta.json", json.dumps({
            "chart_file": "chart.json", "audio_file": "audio.ogg",
            "image_file": "bg.png"}))
        z.writestr("chart.json", json.dumps(chart))
        z.write(str(tmp_path / "audio.ogg"), "audio.ogg")
        z.write(str(tmp_path / "bg.png"), "bg.png")
    return str(zpath), str(res)


def _record_frames(zpath, r, frames, native, monkeypatch):
    """One path's frame records.  The Renderer is shared between the two
    paths so both sample identical atlas regions; only the chart (note
    state) is rebuilt per pass."""
    from libnativecpurenderer_tpu.apps import milrenderer as mil
    from libnativecpurenderer_tpu.models import chart as chart_mod

    import random

    with monkeypatch.context() as mp:
        if not native:
            mp.setattr(mil, "_fastrec", None)
        random.seed(1234)     # HitEffect.group draws from the global RNG
        pkg = mil.ChartPackage(zpath)
        chart = chart_mod.Chart(pkg.read_json(pkg.meta["chart_file"]))
        r.ctx._max_sampling_extent = 0.0
        out = []
        effects = []
        seq0 = r.ctx._seq
        for i in range(frames):
            r.draw_frame(chart, i / 20.0, effects, include_static=False)
            k, p = r.ctx._cmds.snapshot()
            out.append((k.copy(), p.copy(),
                        r.ctx._max_sampling_extent, r.ctx._seq - seq0))
            r.ctx._cmds.clear()
        transforms = [tuple(n.transform)
                      for line in chart.lines for n in line.notes]
        remaining = [(len(line.effect_notes), len(line.plain_notes))
                     for line in chart.lines]
        return out, transforms, remaining, [e.t for e in effects]


@pytest.mark.parametrize("dense", [False, True])
def test_note_blit_parity_full_frames(tmp_path, chart_package,
                                      monkeypatch, dense):
    """milrenderer frames record byte-identical command buffers (and the
    same note/effect side effects) through the native note_blit path and
    the pure-Python note loop."""
    from libnativecpurenderer_tpu.apps import milrenderer as mil

    if dense:
        sub = tmp_path / "dense"
        sub.mkdir()
        zpath, res = _mil_chart(sub)
        frames = 100
    else:
        zpath, res = chart_package
        frames = 24
    assert mil._fastrec is not None
    r = mil.Renderer(width=96, height=54, fps=20, res_dir=res,
                     silent=True)
    r.load_assets(mil.ChartPackage(zpath))
    a = _record_frames(zpath, r, frames, True, monkeypatch)
    b = _record_frames(zpath, r, frames, False, monkeypatch)
    for i, ((k1, p1, e1, s1), (k2, p2, e2, s2)) in enumerate(
            zip(a[0], b[0])):
        np.testing.assert_array_equal(k1, k2, err_msg=f"frame {i} kinds")
        np.testing.assert_array_equal(p1, p2, err_msg=f"frame {i} params")
        assert e1 == e2, f"frame {i} sampling extent"
        assert s1 == s2, f"frame {i} seq"
    assert a[1] == b[1], "note transforms diverge"
    assert a[2] == b[2], "note removal diverges"
    assert a[3] == b[3], "hit effects diverge"


class _FakeAC:
    """Minimal AnimationCollection stand-in for note-level fuzzing."""

    def __init__(self, values, groups):
        self._v = values
        self.anim_groups = groups

    def get_value(self, key):
        return self._v[key]


class _FakeNote:
    def __init__(self, **kw):
        self.clicked = False
        self.transform = (0.0,) * 6
        self.__dict__.update(kw)


def test_note_blit_adversarial_fuzz(tmp_path, chart_package, monkeypatch):
    """Unit-level fuzz of the native note path vs the Python oracle over
    extreme scalars: huge/zero/negative sizes and rotations, off-screen
    and overflowing positions, degenerate (det==0) line transforms,
    holds with clamped/huge lengths — byte-identical buffers and
    identical break/removal/transform side effects required."""
    from libnativecpurenderer_tpu.apps import milrenderer as mil
    from libnativecpurenderer_tpu.models.chart import AnimationKey as AK

    zpath, res = chart_package
    r = mil.Renderer(width=96, height=54, fps=20, res_dir=res,
                     silent=True)
    r.load_assets(mil.ChartPackage(zpath))
    rng = np.random.default_rng(17)
    texnames = ["tap", "drag", "extap"]
    holdnames = ["hold", "exhold"]

    def build_notes(trial_rng):
        notes = []
        for k in range(8):
            ishold = bool(trial_rng.random() < 0.4)
            t0 = float(trial_rng.uniform(-2, 4))
            vals = {
                AK.FlowSpeed: float(trial_rng.choice(
                    [0.0, 1.0, -1.0, 1e6, 1e-9,
                     trial_rng.uniform(-3, 3)])),
                AK.RelativeX: float(trial_rng.choice(
                    [0.0, 0.5, -4.0, 4.0, 1e155,
                     trial_rng.uniform(-2, 2)])),
                AK.RelativeY: float(trial_rng.uniform(-2, 2)),
                AK.PositionX: float(trial_rng.uniform(-2000, 2000)),
                AK.PositionY: float(trial_rng.uniform(-2000, 2000)),
                AK.Size: float(trial_rng.choice(
                    [0.0, -1.0, 1e3, trial_rng.uniform(0, 3)])),
                AK.Transparency: float(trial_rng.uniform(-1, 2)),
                AK.Rotation: float(trial_rng.choice(
                    [0.0, 90.0, 45.0, 1e7, trial_rng.uniform(-720, 720)])),
                AK.Color: [float(v) for v in
                           trial_rng.uniform(0, 255, 4)],
            }
            groups = {AK.PositionX: ([1] if trial_rng.random() < 0.3
                                     else []),
                      AK.PositionY: ([1] if trial_rng.random() < 0.3
                                     else [])}
            notes.append(dict(
                time=t0, ishold=ishold,
                endTime=t0 + float(trial_rng.uniform(0, 2)),
                floorPosition=float(trial_rng.uniform(-5, 5)),
                endFloorPosition=float(trial_rng.uniform(-5, 5)),
                texname=(trial_rng.choice(holdnames) if ishold
                         else trial_rng.choice(texnames)),
                morebets=bool(trial_rng.random() < 0.5),
                values=vals, groups=groups))
        return notes

    for trial in range(120):
        seed = int(rng.integers(1 << 30))
        spec = build_notes(np.random.default_rng(seed))
        line_m = {
            0: (1.0, 0.0, 0.0, 1.0, 48.0, 27.0),
            1: (0.0, 2.0, -2.0, 0.0, 10.0, 400.0),    # rotated, scaled
            2: (1.0, 1.0, 1.0, 1.0, 0.0, 0.0),        # det == 0
            3: (1e-8, 0.0, 0.0, 1e-8, 48.0, 27.0),    # collapse
        }[trial % 4]
        t = float(np.random.default_rng(seed + 1).uniform(0, 3))
        can_break = bool(trial % 2)
        line_fsp = float(np.random.default_rng(seed + 2).choice(
            [0.0, 1.0, -2.0, 0.7]))
        line_fp = float(np.random.default_rng(seed + 3).uniform(-2, 2))
        line_visa = 10.0

        results = []
        for native in (True, False):
            with monkeypatch.context() as mp:
                if not native:
                    mp.setattr(mil, "_fastrec", None)
                notes = [
                    _FakeNote(time=s["time"], ishold=s["ishold"],
                              endTime=s["endTime"],
                              floorPosition=s["floorPosition"],
                              endFloorPosition=s["endFloorPosition"],
                              texname=s["texname"], morebets=s["morebets"],
                              acollection=_FakeAC(s["values"], s["groups"]))
                    for s in spec]
                effects = []
                r.ctx._cmds.clear()
                r.ctx._max_sampling_extent = 0.0
                r.ctx.save_state()
                r.ctx._state.set_transform(*line_m)
                try:
                    r._draw_note_group(notes, can_break, t, line_fsp,
                                       line_fp, line_visa, effects)
                    err = None
                except ValueError as e:
                    err = str(e)
                finally:
                    r.ctx.restore_state()
                k, p = r.ctx._cmds.snapshot()
                results.append((k.copy(), p.copy(), err,
                                [tuple(n.transform) for n in notes],
                                [n.clicked for n in notes], len(notes),
                                r.ctx._max_sampling_extent,
                                [e.note.time for e in effects]))
        (k1, p1, e1, t1, c1, n1, x1, h1), \
            (k2, p2, e2, t2, c2, n2, x2, h2) = results
        msg = f"trial {trial} seed {seed}"
        np.testing.assert_array_equal(k1, k2, err_msg=msg)
        np.testing.assert_array_equal(p1, p2, err_msg=msg)
        assert e1 == e2, f"{msg}: errors {e1!r} vs {e2!r}"
        assert t1 == t2, f"{msg}: transforms"
        assert c1 == c2 and n1 == n2 and h1 == h2, f"{msg}: side effects"
        assert x1 == x2, f"{msg}: extent"


def test_recorded_scene_matches_python_path(monkeypatch):
    """A full draw-call scene records byte-identical buffers either way."""
    def scene(ctx):
        ctx.set_color(0, 0, 0, 1)
        ctx.save_state()
        ctx.translate(11.5, 7.25)
        ctx.rotate(0.3)
        ctx.draw_rect(2, 3, 20, 10, 0.9, 0.5, 0.2, 0.8)
        ctx.draw_circle(30, 20, 8, 0.2, 0.6, 1.0, 0.5)
        ctx.draw_line(1, 1, 50, 40, 3.0, 1, 1, 1, 1)
        ctx.restore_state()
        ctx.draw_vertical_grd(5, 5, 40, 30, 1, 0, 0, 1, 0, 0, 1, 1)
        ctx.set_pixel(3, 4, 0.1, 0.2, 0.3, 0.4)

    snaps = []
    for use_fast in (fastrec.mod, None):
        monkeypatch.setattr(C, "_fast", use_fast)
        monkeypatch.setattr(xf, "_fast", use_fast)
        ctx = R.RenderContext(64, 48, True)
        scene(ctx)
        k, p = ctx._cmds.snapshot()
        snaps.append((k.copy(), p.copy()))
    np.testing.assert_array_equal(snaps[0][0], snaps[1][0])
    np.testing.assert_array_equal(snaps[0][1], snaps[1][1])


def test_record_draw_parity_fuzz():
    """Fused native per-draw record (record_draw: inverse + box mode +
    row store in one call) is bit-identical to the pure-Python oracle
    path across every box mode, degenerate matrices (det==0, huge
    translations), and both buffer dtypes."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    # ONE texture for both passes: the atlas store is process-global, so
    # a per-pass texture would land at a different region offset and the
    # recorded (ox, oy) spec slots would differ for non-record reasons
    tex = R.Texture._from_array(
        np.random.default_rng(5).random((8, 8, 4)), True)

    def scene(ctx, rng):
        for t in range(40):
            mode = int(rng.integers(0, 8))
            if mode == 0:
                ctx.set_transform(1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
            elif mode == 1:
                ctx.rotate(float(rng.uniform(-3, 3)))
            elif mode == 2:
                # det == 0 (inv_det=1e9 quirk rides through both paths)
                ctx.set_transform(2.0, 4.0, 1.0, 2.0,
                                  float(rng.uniform(-9, 9)), 0.0)
            elif mode == 3:
                ctx.set_transform(*[float(v)
                                    for v in rng.uniform(-2, 2, 6)])
            ctx.set_color(*[float(v) for v in rng.uniform(0, 1, 4)])
            k = int(rng.integers(0, 7))
            args = [float(v) for v in rng.uniform(-40, 260, 4)]
            if k == 0:
                ctx.fill_color(0.1, 0.2, 0.3, 0.4)
            elif k == 1:
                ctx.draw_rect(args[0], args[1], abs(args[2]) + 1,
                              abs(args[3]) + 1, 0.9, 0.4, 0.2, 0.8)
            elif k == 2:
                ctx.draw_circle(args[0], args[1], abs(args[2]) + 1,
                                0.2, 0.6, 1.0, 0.5)
            elif k == 3:
                ctx.draw_line(args[0], args[1], args[2], args[3],
                              abs(args[0]) % 7 + 0.5, 0.9, 0.9, 1.0, 0.8)
            elif k == 4:
                ctx.draw_vertical_grd(args[0], args[1], abs(args[2]) + 1,
                                      abs(args[3]) + 1, 0, 0, 0, 0,
                                      1, 1, 1, 0.8)
            elif k == 5:
                ctx.draw_texture(tex, args[0], args[1],
                                 abs(args[2]) + 1, abs(args[3]) + 1)
            else:
                ctx.draw_splitted_texture(tex, args[0], args[1],
                                          abs(args[2]) + 1,
                                          abs(args[3]) + 1,
                                          0.1, 0.9, 0.0, 1.0)

    snaps = []
    exts = []
    for use_fast in (True, False):
        saved = C._fast
        C._fast = fastrec.mod if use_fast else None
        try:
            ctx = R.RenderContext(200, 150, True)
            scene(ctx, np.random.default_rng(31))
            k, p = ctx._cmds.snapshot()
            snaps.append((k.copy(), p.copy()))
            exts.append(ctx._max_sampling_extent)
        finally:
            C._fast = saved
    (k1, p1), (k2, p2) = snaps
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_array_equal(p1, p2)
    assert exts[0] == exts[1]
