/* Fast command-recording core (CPython extension).
 *
 * The Python record path (context.py draw_* -> core/transform.aabb ->
 * CommandBuffer.append) is the host-critical half of every frame: ~13 us
 * per draw call of pure-Python f64 math and numpy row stores.  This module
 * is the native counterpart of the reference's recording boundary (its
 * binding crosses into C++ per draw call, libNativeCPURendererPybind.py:51-
 * 300 / libNativeCPURenderer.cpp:693-718) — the same double math, compiled.
 *
 * Bit-parity contract: compiled with -ffp-contract=off so every operation
 * rounds to double exactly like the CPython float ops it replaces
 * (core/transform.py aabb / inverse); min/max comparison order matches the
 * Python builtins (second operand wins only when strictly smaller), which
 * pins NaN propagation.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdint.h>
#include <string.h>

static inline double mn(double u, double v) { return v < u ? v : u; }
static inline double mx(double u, double v) { return v > u ? v : u; }

/* clamp before the (long long) cast: Python's int() is exact for any
 * finite double, C casts overflow UB — but any |v| > 1e18 clamps to the
 * [0, max] window afterwards anyway, so the pre-clamp is unobservable. */
static inline long long trunc_ll(double v) {
    if (v > 9.0e17) v = 9.0e17;
    if (v < -9.0e17) v = -9.0e17;
    return (long long)v;
}

static int parse6(PyObject *seq, double *out) {
    PyObject *fast = PySequence_Fast(seq, "expected a 6-sequence");
    if (!fast) return -1;
    if (PySequence_Fast_GET_SIZE(fast) != 6) {
        Py_DECREF(fast);
        PyErr_SetString(PyExc_ValueError, "matrix must have 6 entries");
        return -1;
    }
    for (int i = 0; i < 6; i++) {
        out[i] = PyFloat_AsDouble(PySequence_Fast_GET_ITEM(fast, i));
        if (out[i] == -1.0 && PyErr_Occurred()) { Py_DECREF(fast); return -1; }
    }
    Py_DECREF(fast);
    return 0;
}

/* aabb(m6, x, y, w, h, mw, mh) -> (l, r, t, b) ints
 * Mirrors core/transform.aabb (reference GetBoarder, cpp:693-718). */
static PyObject *fastrec_aabb(PyObject *self, PyObject *args) {
    PyObject *mseq;
    double x, y, w, h, mwf, mhf;
    if (!PyArg_ParseTuple(args, "Odddddd", &mseq, &x, &y, &w, &h, &mwf, &mhf))
        return NULL;
    double m[6];
    if (parse6(mseq, m) < 0) return NULL;
    double a = m[0], b = m[1], c = m[2], d = m[3], e = m[4], f = m[5];
    double xw = x + w, yh = y + h;
    double ltx = a * x + c * y + e,  lty = b * x + d * y + f;
    double rtx = a * xw + c * y + e, rty = b * xw + d * y + f;
    double lbx = a * x + c * yh + e, lby = b * x + d * yh + f;
    double rbx = a * xw + c * yh + e, rby = b * xw + d * yh + f;

    double lf = mn(mn(ltx, rtx), mn(lbx, rbx));
    double rf = mx(mx(ltx, rtx), mx(lbx, rbx));
    double tf = mn(mn(lty, rty), mn(lby, rby));
    double bf = mx(mx(lty, rty), mx(lby, rby));
    if (lf != lf || rf != rf || tf != tf || bf != bf) {
        /* match Python's int(nan) on the fallback path */
        PyErr_SetString(PyExc_ValueError,
                        "cannot convert float NaN to integer");
        return NULL;
    }
    long long left = trunc_ll(lf);
    long long right = trunc_ll(rf);
    long long top = trunc_ll(tf);
    long long bottom = trunc_ll(bf);
    long long mw = (long long)mwf, mh = (long long)mhf;

    if (left < 0) left = 0; else if (left > mw) left = mw;
    if (right < 0) right = 0; else if (right > mw) right = mw;
    if (top < 0) top = 0; else if (top > mh) top = mh;
    if (bottom < 0) bottom = 0; else if (bottom > mh) bottom = mh;
    return Py_BuildValue("(LLLL)", left, right, top, bottom);
}

/* inverse(m6) -> 6-tuple.  Mirrors core/transform.inverse (reference
 * GetInverseTransform, cpp:472-492, incl. the det==0 -> inv_det=1e9 quirk). */
static PyObject *fastrec_inverse(PyObject *self, PyObject *args) {
    PyObject *mseq;
    if (!PyArg_ParseTuple(args, "O", &mseq)) return NULL;
    double m[6];
    if (parse6(mseq, m) < 0) return NULL;
    double a = m[0], b = m[1], c = m[2], d = m[3], e = m[4], f = m[5];
    double det = a * d - b * c;
    double inv_det = det != 0.0 ? 1.0 / det : 1e9;
    return Py_BuildValue("(dddddd)",
                         d * inv_det, -b * inv_det, -c * inv_det,
                         a * inv_det,
                         (c * f - d * e) * inv_det,
                         (b * e - a * f) * inv_det);
}

/* record(kinds, params, i, kind, inv6, box4, ct4, specific) -> None
 *
 * Writes kinds[i] = kind and params[i] = inv6 + box4 + ct4 + specific
 * (zero-padded) straight through the buffer protocol — the numpy
 * fancy-assignment this replaces costs ~5 us per command.
 * params may be float32 or float64 (row-contiguous 2D); float32 rows get
 * the same C-cast narrowing numpy applies. */
static PyObject *fastrec_record(PyObject *self, PyObject *args) {
    PyObject *kinds_o, *params_o, *inv_o, *box_o, *ct_o, *spec_o;
    Py_ssize_t i;
    long kind;
    if (!PyArg_ParseTuple(args, "OOnlOOOO", &kinds_o, &params_o, &i, &kind,
                          &inv_o, &box_o, &ct_o, &spec_o))
        return NULL;

    Py_buffer kb, pb;
    if (PyObject_GetBuffer(kinds_o, &kb, PyBUF_WRITABLE | PyBUF_FORMAT) < 0)
        return NULL;
    if (PyObject_GetBuffer(params_o, &pb,
                           PyBUF_WRITABLE | PyBUF_FORMAT | PyBUF_STRIDES) < 0) {
        PyBuffer_Release(&kb);
        return NULL;
    }
    int ok = 0;
    double row[64];
    Py_ssize_t nrow = 0;

    if (pb.ndim != 2 || pb.strides[1] != pb.itemsize) {
        PyErr_SetString(PyExc_ValueError, "params must be 2D row-contiguous");
        goto done;
    }
    Py_ssize_t width = pb.shape[1];
    if (width > 64) {
        PyErr_SetString(PyExc_ValueError, "param row too wide");
        goto done;
    }
    if (i < 0 || i >= pb.shape[0] || i >= kb.len / (Py_ssize_t)sizeof(int32_t)) {
        PyErr_SetString(PyExc_IndexError, "row index out of range");
        goto done;
    }

    /* gather inv6 + box4 + ct4 + specific into row[] */
    {
        PyObject *parts[3] = {inv_o, box_o, ct_o};
        Py_ssize_t need[3] = {6, 4, 4};
        for (int p = 0; p < 3; p++) {
            PyObject *fast = PySequence_Fast(parts[p], "expected sequence");
            if (!fast) goto done;
            if (PySequence_Fast_GET_SIZE(fast) != need[p]) {
                Py_DECREF(fast);
                PyErr_SetString(PyExc_ValueError, "bad common length");
                goto done;
            }
            for (Py_ssize_t k = 0; k < need[p]; k++) {
                row[nrow] = PyFloat_AsDouble(
                    PySequence_Fast_GET_ITEM(fast, k));
                if (row[nrow] == -1.0 && PyErr_Occurred()) {
                    Py_DECREF(fast);
                    goto done;
                }
                nrow++;
            }
            Py_DECREF(fast);
        }
        if (spec_o != Py_None) {
            PyObject *fast = PySequence_Fast(spec_o, "expected sequence");
            if (!fast) goto done;
            Py_ssize_t ns = PySequence_Fast_GET_SIZE(fast);
            if (nrow + ns > width) {
                Py_DECREF(fast);
                PyErr_SetString(PyExc_ValueError, "specific overflows row");
                goto done;
            }
            for (Py_ssize_t k = 0; k < ns; k++) {
                row[nrow] = PyFloat_AsDouble(
                    PySequence_Fast_GET_ITEM(fast, k));
                if (row[nrow] == -1.0 && PyErr_Occurred()) {
                    Py_DECREF(fast);
                    goto done;
                }
                nrow++;
            }
            Py_DECREF(fast);
        }
    }

    ((int32_t *)kb.buf)[i] = (int32_t)kind;
    {
        char *base = (char *)pb.buf + i * pb.strides[0];
        if (pb.itemsize == 8) {
            double *dst = (double *)base;
            for (Py_ssize_t k = 0; k < nrow; k++) dst[k] = row[k];
            for (Py_ssize_t k = nrow; k < width; k++) dst[k] = 0.0;
        } else if (pb.itemsize == 4) {
            float *dst = (float *)base;
            for (Py_ssize_t k = 0; k < nrow; k++) dst[k] = (float)row[k];
            for (Py_ssize_t k = nrow; k < width; k++) dst[k] = 0.0f;
        } else {
            PyErr_SetString(PyExc_ValueError, "params must be f32/f64");
            goto done;
        }
    }
    ok = 1;
done:
    PyBuffer_Release(&kb);
    PyBuffer_Release(&pb);
    if (!ok) return NULL;
    Py_RETURN_NONE;
}

/* numpy's float64 -> int64 astype on x86 is cvttsd2si: NaN and
 * out-of-range values become INT64_MIN.  Replicate explicitly so the
 * result is defined (and identical) regardless of C UB rules. */
static inline int64_t np_ll(double v) {
    if (v != v || v >= 9.223372036854775808e18 ||
        v <= -9.223372036854775809e18)
        return INT64_MIN;
    return (int64_t)v;
}

static inline int64_t clip_ll(int64_t v, int64_t lo, int64_t hi) {
    if (v < lo) return lo;
    if (v > hi) return hi;
    return v;
}

/* routes_for_size(params, fast, sep, split, sampling, P, W, H, margin,
 *                 rchoices, route_mxu, route_region, route_full)
 *     -> (routes list, rneeds list)
 *
 * Native port of ops/patch_exec._routes_table.for_size: per sampling
 * command, the exact f64 corner math of the (P, P) patch window's UV
 * footprint and the resulting window-size route.  Same IEEE ops in the
 * same order (-ffp-contract=off); inf/NaN propagate like numpy with
 * errstate-ignored divides.  Non-sampling rows return (route_full, 0)
 * — the planner only reads sampling indices. */
static PyObject *fastrec_routes(PyObject *self, PyObject *args) {
    PyObject *params_o, *fast_o, *sep_o, *split_o, *samp_o, *rch_o;
    Py_ssize_t P, W, H;
    long margin, route_mxu, route_region, route_full;
    if (!PyArg_ParseTuple(args, "OOOOOnnnlOlll", &params_o, &fast_o,
                          &sep_o, &split_o, &samp_o, &P, &W, &H, &margin,
                          &rch_o, &route_mxu, &route_region, &route_full))
        return NULL;
    Py_buffer pb, fb, sb, tb, mb;
    if (PyObject_GetBuffer(params_o, &pb, PyBUF_STRIDES | PyBUF_FORMAT) < 0)
        return NULL;
    if (PyObject_GetBuffer(fast_o, &fb, PyBUF_SIMPLE) < 0) {
        PyBuffer_Release(&pb); return NULL;
    }
    if (PyObject_GetBuffer(sep_o, &sb, PyBUF_SIMPLE) < 0) {
        PyBuffer_Release(&pb); PyBuffer_Release(&fb); return NULL;
    }
    if (PyObject_GetBuffer(split_o, &tb, PyBUF_SIMPLE) < 0) {
        PyBuffer_Release(&pb); PyBuffer_Release(&fb); PyBuffer_Release(&sb);
        return NULL;
    }
    if (PyObject_GetBuffer(samp_o, &mb, PyBUF_SIMPLE) < 0) {
        PyBuffer_Release(&pb); PyBuffer_Release(&fb); PyBuffer_Release(&sb);
        PyBuffer_Release(&tb); return NULL;
    }
    PyObject *routes_l = NULL, *rneeds_l = NULL, *result = NULL;
    long long rch[8];
    Py_ssize_t nrch = 0;
    {
        PyObject *fastseq = PySequence_Fast(rch_o, "rchoices");
        if (!fastseq) goto done;
        nrch = PySequence_Fast_GET_SIZE(fastseq);
        if (nrch > 8) { Py_DECREF(fastseq);
            PyErr_SetString(PyExc_ValueError, "too many r choices");
            goto done; }
        for (Py_ssize_t k = 0; k < nrch; k++)
            rch[k] = PyLong_AsLongLong(PySequence_Fast_GET_ITEM(fastseq, k));
        Py_DECREF(fastseq);
    }
    if (pb.ndim != 2 || pb.itemsize != 8 || pb.strides[1] != 8) {
        PyErr_SetString(PyExc_ValueError, "params must be f64 2D "
                        "row-contiguous");
        goto done;
    }
    {
        Py_ssize_t N = pb.shape[0];
        if (fb.len < N || sb.len < N || tb.len < N || mb.len < N) {
            PyErr_SetString(PyExc_ValueError, "flag arrays too short");
            goto done;
        }
        routes_l = PyList_New(N);
        rneeds_l = PyList_New(N);
        if (!routes_l || !rneeds_l) goto done;
        const unsigned char *fa = (const unsigned char *)fb.buf;
        const unsigned char *se = (const unsigned char *)sb.buf;
        const unsigned char *sp = (const unsigned char *)tb.buf;
        const unsigned char *sm = (const unsigned char *)mb.buf;
        for (Py_ssize_t c = 0; c < N; c++) {
            long route = route_full;
            long long rneed = 0;
            if (sm[c]) {
                const double *p =
                    (const double *)((const char *)pb.buf
                                     + c * pb.strides[0]);
                double px0 = (double)clip_ll(np_ll(p[6]), 0,
                                             (long long)(W - P));
                double py0 = (double)clip_ll(np_ll(p[8]), 0,
                                             (long long)(H - P));
                double tw = p[22], th = p[23];
                double cx[4] = {px0, px0 + (P - 1.0), px0,
                                px0 + (P - 1.0)};
                double cy[4] = {py0, py0, py0 + (P - 1.0),
                                py0 + (P - 1.0)};
                int64_t umin = INT64_MAX, umax = INT64_MIN;
                int64_t vmin = INT64_MAX, vmax = INT64_MIN;
                double uhi = tw - 2.0 > 0.0 ? tw - 2.0 : 0.0;
                double vhi = th - 2.0 > 0.0 ? th - 2.0 : 0.0;
                for (int k = 0; k < 4; k++) {
                    double ix, iy;
                    if (fa[c]) { ix = cx[k]; iy = cy[k]; }
                    else {
                        ix = p[0] * cx[k] + p[2] * cy[k] + p[4];
                        iy = p[1] * cx[k] + p[3] * cy[k] + p[5];
                    }
                    double u = (ix - p[14]) * p[18];
                    double v = (iy - p[15]) * p[19];
                    if (sp[c]) {
                        u = (p[24] + (p[25] - p[24]) * u / tw) * tw;
                        v = (p[26] + (p[27] - p[26]) * v / th) * th;
                    }
                    /* np.clip order: min(max(v, lo), hi) with NaN
                     * propagating — mirror via explicit comparisons */
                    u = u < 0.0 ? 0.0 : u;
                    u = u > uhi ? uhi : u;
                    v = v < 0.0 ? 0.0 : v;
                    v = v > vhi ? vhi : v;
                    int64_t ui = np_ll(u), vi = np_ll(v);
                    if (ui < umin) umin = ui;
                    if (ui > umax) umax = ui;
                    if (vi < vmin) vmin = vi;
                    if (vi > vmax) vmax = vi;
                }
                /* unsigned arithmetic: INT64_MIN sentinels from NaN
                 * casts must wrap like numpy int64, not C-UB */
                int64_t du = (int64_t)((uint64_t)umax - (uint64_t)umin);
                int64_t dv = (int64_t)((uint64_t)vmax - (uint64_t)vmin);
                int64_t need =
                    (int64_t)((uint64_t)(du > dv ? du : dv) + 1u);
                double capf = tw - 1.0 > th - 1.0 ? tw - 1.0 : th - 1.0;
                int64_t cap = (int64_t)((uint64_t)np_ll(capf) + 1u);
                if (cap < 1) cap = 1;
                need = (int64_t)((uint64_t)need + (uint64_t)margin);
                if (need > cap) need = cap;
                for (Py_ssize_t k = 0; k < nrch; k++) {
                    if (need <= rch[k]) {
                        route = se[c] ? route_mxu : route_region;
                        rneed = rch[k];
                        break;
                    }
                }
            }
            PyList_SET_ITEM(routes_l, c, PyLong_FromLong(route));
            PyList_SET_ITEM(rneeds_l, c, PyLong_FromLongLong(rneed));
        }
    }
    result = PyTuple_Pack(2, routes_l, rneeds_l);
done:
    Py_XDECREF(routes_l);
    Py_XDECREF(rneeds_l);
    PyBuffer_Release(&pb);
    PyBuffer_Release(&fb);
    PyBuffer_Release(&sb);
    PyBuffer_Release(&tb);
    PyBuffer_Release(&mb);
    return result;
}

static PyMethodDef methods[] = {
    {"aabb", fastrec_aabb, METH_VARARGS,
     "aabb(m6, x, y, w, h, mw, mh) -> (l, r, t, b)"},
    {"inverse", fastrec_inverse, METH_VARARGS, "inverse(m6) -> m6"},
    {"record", fastrec_record, METH_VARARGS,
     "record(kinds, params, i, kind, inv6, box4, ct4, specific)"},
    {"routes_for_size", fastrec_routes, METH_VARARGS,
     "routes_for_size(params, fast, sep, split, sampling, P, W, H, "
     "margin, rchoices, mxu, region, full) -> (routes, rneeds)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_tpufastrec",
    "Native command-recording core", -1, methods,
};

PyMODINIT_FUNC PyInit__tpufastrec(void) {
    return PyModule_Create(&moduledef);
}
