"""Bit-parity fuzz: native animation evaluator vs the Python cursors.

fastrec.anim_eval (native/fastrec.c) replaces the per-collection
AnimationCollection.update Python loop per frame; every easing, the
Speed floor-position integral, the Color channel lerp, the empty-Speed
default and the backward-seek cursor reset must produce bit-identical
values (the C is compiled -ffp-contract=off and transcribed op-for-op
from models/chart.py)."""

import copy
import json
import math
import random

import numpy as np
import pytest

from libnativecpurenderer_tpu.fastrec import mod as _fast
from libnativecpurenderer_tpu.models import chart as cm

pytestmark = pytest.mark.skipif(
    _fast is None or not hasattr(_fast, "anim_eval"),
    reason="native fastrec.anim_eval not built")


def _ease(t=0, p=0, exp=False):
    return {"type": t, "press": p, "isValueExp": exp,
            "cusValueExp": "", "clipLeft": 0.0, "clipRight": 1.0}


def _anim(key, start, end, st, et, bearer_type, bearer, ease):
    return {"startTime": [st, 0, 1], "endTime": [et, 0, 1], "type": key,
            "start": start, "end": end, "index": 0,
            "bearer_type": bearer_type, "bearer": bearer, "ease": ease}


def _rand_chart(rng: random.Random, nlines=2, notes_per_line=6):
    lines = []
    for li in range(nlines):
        anims = []
        # line-bearer animations over assorted keys incl. Speed and Color
        for key in (0, 1, 3, 4, 12, 22, 23, 5):
            n_ev = rng.randrange(0, 4)
            t0 = 0.0
            for _ in range(n_ev):
                dur = rng.uniform(0.0, 1.5)   # zero-length events too
                ease = _ease(rng.randrange(-1, 4), rng.randrange(-1, 12),
                             rng.random() < 0.1)
                if key == 22:
                    s = rng.randrange(0, 1 << 32)
                    e = rng.randrange(0, 1 << 32)
                else:
                    s = rng.uniform(-400, 400)
                    e = rng.uniform(-400, 400)
                anims.append(_anim(key, s, e, t0, t0 + dur, 0, 0, ease))
                t0 += dur + rng.uniform(0.0, 0.5)
        notes = []
        for ni in range(notes_per_line):
            # note-bearer animations on a random subset
            for key in rng.sample((2, 3, 4, 5, 6, 7, 22), 3):
                if rng.random() < 0.5:
                    continue
                ease = _ease(rng.randrange(0, 3), rng.randrange(0, 11))
                if key == 22:
                    s, e = (rng.randrange(0, 1 << 32) for _ in range(2))
                else:
                    s, e = (rng.uniform(-5, 5) for _ in range(2))
                anims.append(_anim(key, s, e, rng.uniform(0, 2),
                                   rng.uniform(2, 4), 1, ni, ease))
            t = rng.uniform(0, 4)
            notes.append({"time": [t, 0, 1], "type": rng.randrange(0, 2),
                          "isFake": False, "isAlwaysPerfect": False,
                          "endTime": [t + rng.uniform(0, 1), 0, 1],
                          "index": ni})
        lines.append({"index": li, "animations": anims, "notes": notes})
    return {
        "fmt": 2,
        "meta": {"background_dim": 0.5, "name": "f", "background_artist": "",
                 "music_artist": "", "charter": "", "difficulty_name": "EZ",
                 "difficulty": 1, "offset": 0.0},
        "bpms": [{"time": [0, 0, 1], "bpm": 60}],
        "lines": lines,
    }


def _all_values(chart):
    out = []
    for ln in chart.lines:
        out.append(list(ln.acollection.values))
        for n in ln.notes:
            out.append(list(n.acollection.values))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_anim_eval_bit_parity(seed):
    rng = random.Random(seed)
    data = _rand_chart(rng)
    c_native = cm.Chart(json.loads(json.dumps(data)))
    c_python = cm.Chart(json.loads(json.dumps(data)))
    assert cm._fast is not None

    # forward sweep, repeats, a backward seek (cursor reset), far future
    times = sorted(rng.uniform(0, 5) for _ in range(40))
    times = times + [times[7]] + [times[-1] + 10.0] + [0.0] + times[:10]
    for t in times:
        c_native.use_native_anim = True
        c_native.update(t)
        c_python.use_native_anim = False
        c_python.update(t)
        a = _all_values(c_native)
        b = _all_values(c_python)
        for ca, cb in zip(a, b):
            for ka, kb in zip(ca, cb):
                if isinstance(ka, tuple):
                    assert all(x == y or (x != x and y != y)
                               for x, y in zip(ka, kb)), (t, ka, kb)
                else:
                    assert ka == kb or (ka != ka and kb != kb), (t, ka, kb)


def test_anim_eval_all_easings_exact():
    # one event per (mode, kind) pair, probed at many p values
    anims = []
    for m in range(3):
        for k in range(11):
            anims.append(_anim(3, -2.5, 7.5, 0, 1, 0, 0, _ease(m, k)))
    # spread them over disjoint unit windows so the cursor lands on each
    for i, a in enumerate(anims):
        a["startTime"] = [float(2 * i), 0, 1]
        a["endTime"] = [2 * i + 1.0, 0, 1]
    data = {
        "fmt": 2,
        "meta": {"background_dim": 0.5, "name": "e", "background_artist": "",
                 "music_artist": "", "charter": "", "difficulty_name": "EZ",
                 "difficulty": 1, "offset": 0.0},
        "bpms": [{"time": [0, 0, 1], "bpm": 60}],
        "lines": [{"index": 0, "animations": anims, "notes": []}],
    }
    cn = cm.Chart(copy.deepcopy(data))
    cp = cm.Chart(copy.deepcopy(data))
    ts = [i * 2 + f for i in range(33)
          for f in (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.999, 1.0)]
    for t in ts:
        cn.use_native_anim = True
        cn.update(t)
        cp.use_native_anim = False
        cp.update(t)
        va = cn.lines[0].acollection.values[3]
        vb = cp.lines[0].acollection.values[3]
        assert va == vb or (math.isnan(va) and math.isnan(vb)), (t, va, vb)


def test_anim_eval_speed_integral_exact():
    anims = [
        _anim(12, 1.5, 3.0, 1, 2, 0, 0, _ease(2, 4)),
        _anim(12, 3.0, 0.5, 3, 5, 0, 0, _ease(1, 7)),
    ]
    data = {
        "fmt": 2,
        "meta": {"background_dim": 0.5, "name": "s", "background_artist": "",
                 "music_artist": "", "charter": "", "difficulty_name": "EZ",
                 "difficulty": 1, "offset": 0.0},
        "bpms": [{"time": [0, 0, 1], "bpm": 60}],
        "lines": [{"index": 0, "animations": anims, "notes": []}],
    }
    cn = cm.Chart(copy.deepcopy(data))
    cp = cm.Chart(copy.deepcopy(data))
    for t in np.linspace(0.0, 6.0, 121):
        cn.use_native_anim = True
        cn.update(float(t))
        cp.use_native_anim = False
        cp.update(float(t))
        assert (cn.lines[0].acollection.values[12]
                == cp.lines[0].acollection.values[12]), t
