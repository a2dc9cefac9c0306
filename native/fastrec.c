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

#include <math.h>
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

/* ---------------------------------------------------------------------
 * note_blit: the whole per-note hot path of milrenderer's note loop
 * (apps/milrenderer.py _draw_note_group) in one call — compose the
 * note transform, run the screen cull + receding-note break test, and
 * record the tap blit (1 row) or hold split-blits (3 rows) directly
 * into the CommandBuffer arrays.  Pure host math; bit-parity with the
 * Python path it replaces (same double ops in the same order,
 * -ffp-contract=off; sin/cos/sqrt from the same libm CPython uses).
 * Reference semantics anchor: milrenderer.py:880-1010 note loop.
 * ------------------------------------------------------------------- */

/* core/transform.compose: right-multiply, exact op order (cpp:398-411) */
static inline void compose6(const double *o, double a, double b, double c,
                            double d, double e, double f, double *out) {
    out[0] = o[0] * a + o[2] * b;
    out[1] = o[1] * a + o[3] * b;
    out[2] = o[0] * c + o[2] * d;
    out[3] = o[1] * c + o[3] * d;
    out[4] = o[0] * e + o[2] * f + o[4];
    out[5] = o[1] * e + o[3] * f + o[5];
}

static inline void tpoint(const double *m, double x, double y,
                          double *ox, double *oy) {
    *ox = m[0] * x + m[2] * y + m[4];
    *oy = m[1] * x + m[3] * y + m[5];
}

/* core/transform.aabb corner math; returns -1 on NaN (caller raises
 * like Python's int(nan)) */
static int aabb_core(const double *m, double x, double y, double w,
                     double h, double mw, double mh, double *out4) {
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
    if (lf != lf || rf != rf || tf != tf || bf != bf) return -1;
    long long left = trunc_ll(lf), right = trunc_ll(rf);
    long long top = trunc_ll(tf), bottom = trunc_ll(bf);
    long long mwi = (long long)mw, mhi = (long long)mh;
    if (left < 0) left = 0; else if (left > mwi) left = mwi;
    if (right < 0) right = 0; else if (right > mwi) right = mwi;
    if (top < 0) top = 0; else if (top > mhi) top = mhi;
    if (bottom < 0) bottom = 0; else if (bottom > mhi) bottom = mhi;
    out4[0] = (double)left; out4[1] = (double)right;
    out4[2] = (double)top;  out4[3] = (double)bottom;
    return 0;
}

/* milrenderer.point_in_polygon: even-odd, exact expression order */
static int pip(const double *px, const double *py, int n, double qx,
               double qy) {
    int res = 0, j = n - 1;
    for (int i = 0; i < n; i++) {
        if (((py[i] > qy) != (py[j] > qy)) &&
            (qx < (px[j] - px[i]) * (qy - py[i]) / (py[j] - py[i])
                  + px[i]))
            res = !res;
        j = i;
    }
    return res;
}

static inline int seg_boxes(double a0x, double a0y, double a1x, double a1y,
                            double b0x, double b0y, double b1x, double b1y) {
    return !(mx(a0x, a1x) < mn(b0x, b1x) || mx(b0x, b1x) < mn(a0x, a1x) ||
             mx(a0y, a1y) < mn(b0y, b1y) || mx(b0y, b1y) < mn(a0y, a1y));
}

/* milrenderer.polygon_in_screen incl. the exact AABB short-circuits */
static int poly_in_screen(double w, double h, const double *px,
                          const double *py) {
    double xlo = mn(mn(mn(px[0], px[1]), px[2]), px[3]);
    double xhi = mx(mx(mx(px[0], px[1]), px[2]), px[3]);
    double ylo = mn(mn(mn(py[0], py[1]), py[2]), py[3]);
    double yhi = mx(mx(mx(py[0], py[1]), py[2]), py[3]);
    if (xlo > 0.0 && xhi < w && ylo > 0.0 && yhi < h) return 1;
    if (xhi < 0.0 || xlo > w || yhi < 0.0 || ylo > h) return 0;
    {
        double sx[4] = {0.0, w, w, 0.0};
        double sy[4] = {0.0, 0.0, h, h};
        /* polygon lines are (p[i-1], p[i]) for i in 0..3 */
        for (int i = 0; i < 4; i++) {
            int i0 = (i + 3) & 3;
            for (int k = 0; k < 4; k++) {
                int k0 = (k + 3) & 3;
                if (seg_boxes(sx[i0], sy[i0], sx[i], sy[i],
                              px[k0], py[k0], px[k], py[k]))
                    return 1;
            }
        }
        for (int k = 0; k < 4; k++)
            if (pip(sx, sy, 4, px[k], py[k])) return 1;
        for (int k = 0; k < 4; k++)
            if (pip(px, py, 4, sx[k], sy[k])) return 1;
    }
    return 0;
}

/* milrenderer.line_length: overflow -> inf matches the Python
 * OverflowError->inf fallback; sqrt == correctly-rounded x**0.5 for
 * the non-negative sums this sees */
static inline double line_len(double x0, double y0, double x1, double y1) {
    double dx = x1 - x0, dy = y1 - y0;
    return sqrt(dx * dx + dy * dy);
}

static inline void emit_row(int32_t *kinds, char *pbase,
                            Py_ssize_t stride, Py_ssize_t width,
                            Py_ssize_t i, long kind, const double *inv,
                            const double *box, const double *ct,
                            const double *spec, int nspec) {
    double *dst = (double *)(pbase + i * stride);
    kinds[i] = (int32_t)kind;
    for (int k = 0; k < 6; k++) dst[k] = inv[k];
    for (int k = 0; k < 4; k++) dst[6 + k] = box[k];
    for (int k = 0; k < 4; k++) dst[10 + k] = ct[k];
    for (int k = 0; k < nspec; k++) dst[14 + k] = spec[k];
    for (Py_ssize_t k = 14 + nspec; k < width; k++) dst[k] = 0.0;
}

#define KIND_TEX_C 7
#define KIND_TEX_FAST_C 8
#define KIND_SPLIT_TEX_C 9

/* Shared core of note_blit/notes_frame: compose, cull, break test, row
 * emission.  Returns 0 on success (-1 = NaN box -> ValueError set).
 * Caller guarantees row capacity for up to 3 rows at n. */
static int note_core(int32_t *kd, char *pbase, Py_ssize_t stride,
                     Py_ssize_t widthp, Py_ssize_t n,
                     const double *base, double tx, double ty, double deg,
                     double size, const double *ctb, double cr, double cg,
                     double cb2, double ca, double transp, double W,
                     double H, int can_break, double dir_y, int fp_zero,
                     int ishold, double width_px, double height_px,
                     double hold_len, double u0, double u1, double ox,
                     double oy, double tw, double th,
                     long *nrec_out, long *brk_out, double *extent_out,
                     double *m_out) {
    /* transform: translate -> rotate_degree -> scale, via the shared
     * compose so zero/one products round exactly like the Python path */
    double m1[6], m2[6], m[6];
    compose6(base, 1.0, 0.0, 0.0, 1.0, tx, ty, m1);
    {
        double ang = deg * M_PI / 180.0;
        double s = sin(ang), c = cos(ang);
        compose6(m1, c, s, -s, c, 0.0, 0.0, m2);
    }
    compose6(m2, size, 0.0, 0.0, size, 0.0, 0.0, m);
    for (int k = 0; k < 6; k++) m_out[k] = m[k];

    /* color: apply(col/255) then apply(1,1,1,transp) */
    double ct[4] = {ctb[0] * cr * 1.0, ctb[1] * cg * 1.0,
                    ctb[2] * cb2 * 1.0, ctb[3] * ca * transp};

    /* cull polygon: getCRectPoints order (lt, rt, rb, lb) */
    double cxq = ishold ? hold_len / 2.0 : 0.0;
    double pw = ishold
        ? hold_len + width_px / 2.0 + width_px / 2.0
        : height_px;
    double ph = width_px;
    double qx0 = cxq - pw / 2.0, qy0 = 0.0 - ph / 2.0;
    double px[4], py[4];
    tpoint(m, qx0, qy0, &px[0], &py[0]);
    tpoint(m, qx0 + pw, qy0, &px[1], &py[1]);
    tpoint(m, qx0 + pw, qy0 + ph, &px[2], &py[2]);
    tpoint(m, qx0, qy0 + ph, &px[3], &py[3]);

    *nrec_out = 0;
    *brk_out = 0;
    *extent_out = 0.0;
    if (!poly_in_screen(W, H, px, py) && can_break) {
        if (fp_zero) { *brk_out = 1; return 0; }
        double ax, ay, bx, by;
        tpoint(m, 0.0, dir_y, &ax, &ay);
        tpoint(m, 0.0, 0.0, &bx, &by);
        if (line_len(W / 2.0, H / 2.0, ax, ay)
                - line_len(W / 2.0, H / 2.0, bx, by) > 0.0) {
            *brk_out = 1;
            return 0;
        }
    }

    /* inverse (core/transform.inverse incl. det==0 -> 1e9 quirk) */
    double inv[6];
    {
        double a = m[0], b = m[1], c = m[2], d = m[3], e = m[4], f = m[5];
        double det = a * d - b * c;
        double inv_det = det != 0.0 ? 1.0 / det : 1e9;
        inv[0] = d * inv_det; inv[1] = -b * inv_det;
        inv[2] = -c * inv_det; inv[3] = a * inv_det;
        inv[4] = (c * f - d * e) * inv_det;
        inv[5] = (b * e - a * f) * inv_det;
    }
    /* IsNoTransform sum test, exact left-to-right order */
    int fastpath =
        (m[0] - 1.0 + m[1] + m[2] + m[3] - 1.0 + m[4] + m[5]) < 1e-5;

    long nrec = 0;
    double extent = 0.0;
    if (!ishold) {
        /* draw_texture(tex, -h/2, -w/2, height_px, width_px) */
        double x = -height_px / 2.0, y = -width_px / 2.0;
        double w = height_px, h = width_px;
        if (w != 0.0 && h != 0.0) {
            double box[4], spec[10];
            long kind;
            if (fastpath) {
                if (x != x || y != y) return -2;
                box[0] = trunc(x); box[1] = x + w;
                box[2] = trunc(y); box[3] = y + h;
                kind = KIND_TEX_FAST_C;
            } else {
                if (aabb_core(m, x, y, w, h, W, H, box) < 0) return -2;
                kind = KIND_TEX_C;
            }
            spec[0] = x; spec[1] = y; spec[2] = x + w; spec[3] = y + h;
            spec[4] = tw / w; spec[5] = th / h;
            spec[6] = ox; spec[7] = oy; spec[8] = tw; spec[9] = th;
            emit_row(kd, pbase, stride, widthp, n, kind, inv, box, ct,
                     spec, 10);
            extent = mx(box[1] - box[0], box[3] - box[2]);
            nrec = 1;
        }
    } else {
        /* three split blits: head, body, tail (same transform) */
        double head = width_px / 2.0;
        double xs[3] = {-head, 0.0, hold_len};
        double ws[3] = {head + 1.0, hold_len + 1.0, head + 1.0};
        double us[3] = {0.0, u0, u1};
        double ue[3] = {u0, u1, 1.0};
        double y = -width_px / 2.0, h = width_px;
        for (int k = 0; k < 3; k++) {
            if (ws[k] == 0.0 || h == 0.0) continue;
            double box[4], spec[14];
            if (aabb_core(m, xs[k], y, ws[k], h, W, H, box) < 0)
                return -2;
            spec[0] = xs[k]; spec[1] = y;
            spec[2] = xs[k] + ws[k]; spec[3] = y + h;
            spec[4] = tw / ws[k]; spec[5] = th / h;
            spec[6] = ox; spec[7] = oy; spec[8] = tw; spec[9] = th;
            spec[10] = us[k]; spec[11] = ue[k];
            spec[12] = 0.0; spec[13] = 1.0;
            emit_row(kd, pbase, stride, widthp, n + nrec,
                     KIND_SPLIT_TEX_C, inv, box, ct, spec, 14);
            {
                double e2 = mx(box[1] - box[0], box[3] - box[2]);
                if (e2 > extent) extent = e2;
            }
            nrec++;
        }
    }
    *nrec_out = nrec;
    *extent_out = extent;
    return 0;
}

/* note_blit(kinds, params, n, m6base, tx, ty, deg, size, ct4,
 *           cr, cg, cb, ca, transp, W, H,
 *           can_break, dir_y, fp_zero, ishold,
 *           width_px, height_px, hold_len, u0, u1, ox, oy, tw, th)
 * -> (nrec, brk, extent, (m6...))
 */
static PyObject *fastrec_note_blit(PyObject *self, PyObject *args) {
    PyObject *kinds_o, *params_o, *m_o, *ct_o;
    Py_ssize_t n;
    double tx, ty, deg, size, cr, cg, cb, ca, transp, W, H, dir_y;
    int can_break, fp_zero, ishold;
    double width_px, height_px, hold_len, u0, u1, ox, oy, tw, th;
    if (!PyArg_ParseTuple(args, "OOnOddddOdddddddidiiddddddddd",
                          &kinds_o, &params_o, &n, &m_o,
                          &tx, &ty, &deg, &size, &ct_o,
                          &cr, &cg, &cb, &ca, &transp, &W, &H,
                          &can_break, &dir_y, &fp_zero, &ishold,
                          &width_px, &height_px, &hold_len, &u0, &u1,
                          &ox, &oy, &tw, &th))
        return NULL;
    double base[6], ctb[6];
    if (parse6(m_o, base) < 0) return NULL;
    {   /* ct4 */
        PyObject *fast = PySequence_Fast(ct_o, "ct must be a 4-sequence");
        if (!fast) return NULL;
        if (PySequence_Fast_GET_SIZE(fast) != 4) {
            Py_DECREF(fast);
            PyErr_SetString(PyExc_ValueError, "ct must have 4 entries");
            return NULL;
        }
        for (int i = 0; i < 4; i++) {
            ctb[i] = PyFloat_AsDouble(PySequence_Fast_GET_ITEM(fast, i));
            if (ctb[i] == -1.0 && PyErr_Occurred()) {
                Py_DECREF(fast);
                return NULL;
            }
        }
        Py_DECREF(fast);
    }

    Py_buffer kb, pb;
    if (PyObject_GetBuffer(kinds_o, &kb, PyBUF_WRITABLE | PyBUF_FORMAT) < 0)
        return NULL;
    if (PyObject_GetBuffer(params_o, &pb,
                           PyBUF_WRITABLE | PyBUF_FORMAT | PyBUF_STRIDES)
            < 0) {
        PyBuffer_Release(&kb);
        return NULL;
    }
    PyObject *result = NULL;
    if (pb.ndim != 2 || pb.strides[1] != 8 || pb.itemsize != 8) {
        PyErr_SetString(PyExc_ValueError, "params must be f64 2D "
                        "row-contiguous");
        goto done;
    }
    {
        Py_ssize_t widthp = pb.shape[1];
        Py_ssize_t maxrows = ishold ? 3 : 1;
        if (widthp < 28) {
            PyErr_SetString(PyExc_ValueError, "param row too narrow");
            goto done;
        }
        if (n < 0 || n + maxrows > pb.shape[0] ||
            n + maxrows > kb.len / (Py_ssize_t)sizeof(int32_t)) {
            PyErr_SetString(PyExc_IndexError, "row range out of bounds");
            goto done;
        }
        long nrec, brk;
        double extent, m[6];
        if (note_core((int32_t *)kb.buf, (char *)pb.buf, pb.strides[0],
                      widthp, n, base, tx, ty, deg, size, ctb,
                      cr, cg, cb, ca, transp, W, H, can_break, dir_y,
                      fp_zero, ishold, width_px, height_px, hold_len,
                      u0, u1, ox, oy, tw, th,
                      &nrec, &brk, &extent, m) < 0) {
            PyErr_SetString(PyExc_ValueError,
                            "cannot convert float NaN to integer");
            goto done;
        }
        result = Py_BuildValue("(lld(dddddd))", nrec, brk, extent,
                               m[0], m[1], m[2], m[3], m[4], m[5]);
    }
done:
    PyBuffer_Release(&kb);
    PyBuffer_Release(&pb);
    return result;
}

/* ------------------------------------------------------------------ *
 * notes_frame: the ENTIRE per-note group loop of milrenderer
 * (_draw_note_group_py, reference milrenderer.py:880-1010) in one call
 * per (line, group).  Chart state lives in flat arrays built once at
 * run start (stat/istat/clicked, indexed by global note id); animated
 * values come from the anim_eval flat table (vflat, one 28-slot row per
 * collection: scalar keys at their AnimationKey index, Color expanded
 * to rgba at 24..27).  The loop replicates the Python body exactly:
 * click detection (newly-clicked ids reported back so Python can build
 * HitEffects — RNG order preserved), removal (in-place id compaction,
 * order preserved = list.remove), visibility cull, position/rotation/
 * size/color/transparency math in the same double op order, hold-length
 * clamp, then note_core for compose + screen cull + receding break +
 * record.  Milthm format constants are hardcoded to the same doubles
 * the Python module computes (milrenderer.py:35-45): MIL_SCRW/H
 * 1920/1080, NOTE_SCALE 335/185, HOLD_DISAPPEAR_TIME 0.2.
 *
 * notes_frame(kinds, params, n, ids, count, stat, istat, clicked,
 *             vflat, texes, note_m, mstamp, newly, m6, ct4,
 *             t, line_fsp, line_fp, visa_px, fp_base, width_px, W, H,
 *             can_break, frame_no)
 *   -> (new_count, nrec, brk, extent, n_newly)
 *
 * stat  f64 [N,7]: time, endTime, floorPosition, endFloorPosition,
 *                  u0, u1, height_px
 * istat i32 [N,5]: tex_idx, coll_idx, ishold, has_posx, has_posy
 * texes f64 [NT,4]: ox, oy, tw, th        (refreshed per frame)
 * note_m f64 [N,6] + mstamp i32 [N]: last composed transform per note
 *                  (stamped with frame_no; feeds HitEffect transforms)
 * ------------------------------------------------------------------ */
static PyObject *fastrec_notes_frame(PyObject *self, PyObject *args) {
    PyObject *kinds_o, *params_o, *ids_o, *stat_o, *istat_o, *clicked_o;
    PyObject *vflat_o, *texes_o, *note_m_o, *mstamp_o, *newly_o;
    PyObject *m_o, *ct_o;
    Py_ssize_t n, count;
    double t, line_fsp, line_fp, visa_px, fp_base, width_px, W, H;
    int can_break, frame_no;
    if (!PyArg_ParseTuple(args, "OOnOnOOOOOOOOOOddddddddii",
                          &kinds_o, &params_o, &n, &ids_o, &count,
                          &stat_o, &istat_o, &clicked_o, &vflat_o,
                          &texes_o, &note_m_o, &mstamp_o, &newly_o,
                          &m_o, &ct_o, &t, &line_fsp, &line_fp, &visa_px,
                          &fp_base, &width_px, &W, &H, &can_break,
                          &frame_no))
        return NULL;
    double base[6], base_ct[4];
    if (parse6(m_o, base) < 0) return NULL;
    {
        PyObject *fast = PySequence_Fast(ct_o, "ct must be a 4-sequence");
        if (!fast) return NULL;
        if (PySequence_Fast_GET_SIZE(fast) != 4) {
            Py_DECREF(fast);
            PyErr_SetString(PyExc_ValueError, "ct must have 4 entries");
            return NULL;
        }
        for (int i = 0; i < 4; i++) {
            base_ct[i] = PyFloat_AsDouble(PySequence_Fast_GET_ITEM(fast, i));
            if (base_ct[i] == -1.0 && PyErr_Occurred()) {
                Py_DECREF(fast);
                return NULL;
            }
        }
        Py_DECREF(fast);
    }
    /* buffers: 0 kinds(w) 1 params(w,strided) 2 ids(w) 3 stat 4 istat
     * 5 clicked(w) 6 vflat 7 texes 8 note_m(w) 9 mstamp(w) 10 newly(w) */
    PyObject *objs[11] = {kinds_o, params_o, ids_o, stat_o, istat_o,
                          clicked_o, vflat_o, texes_o, note_m_o,
                          mstamp_o, newly_o};
    Py_buffer b[11];
    for (int i = 0; i < 11; i++) {
        int fl = (i == 3 || i == 4 || i == 6 || i == 7)
                     ? PyBUF_SIMPLE
                     : PyBUF_WRITABLE;
        if (i == 1) fl |= PyBUF_FORMAT | PyBUF_STRIDES;
        if (PyObject_GetBuffer(objs[i], &b[i], fl) < 0) {
            for (int j = 0; j < i; j++) PyBuffer_Release(&b[j]);
            return NULL;
        }
    }
    PyObject *result = NULL;
    if (b[1].ndim != 2 || b[1].strides[1] != 8 || b[1].itemsize != 8) {
        PyErr_SetString(PyExc_ValueError,
                        "params must be f64 2D row-contiguous");
        goto done;
    }
    {
        int32_t *kd = (int32_t *)b[0].buf;
        char *pbase = (char *)b[1].buf;
        Py_ssize_t stride = b[1].strides[0];
        Py_ssize_t widthp = b[1].shape[1];
        Py_ssize_t prows = b[1].shape[0];
        Py_ssize_t krows = b[0].len / (Py_ssize_t)sizeof(int32_t);
        int32_t *ids = (int32_t *)b[2].buf;
        const double *stat = (const double *)b[3].buf;
        const int32_t *istat = (const int32_t *)b[4].buf;
        uint8_t *clicked_a = (uint8_t *)b[5].buf;
        const double *vflat = (const double *)b[6].buf;
        const double *texes = (const double *)b[7].buf;
        double *note_m = (double *)b[8].buf;
        int32_t *mstamp = (int32_t *)b[9].buf;
        int32_t *newly = (int32_t *)b[10].buf;
        Py_ssize_t nnotes = b[3].len / (Py_ssize_t)(7 * sizeof(double));
        Py_ssize_t ncoll = b[6].len / (Py_ssize_t)(28 * sizeof(double));
        Py_ssize_t ntex = b[7].len / (Py_ssize_t)(4 * sizeof(double));
        if (widthp < 28) {
            PyErr_SetString(PyExc_ValueError, "param row too narrow");
            goto done;
        }
        if (count < 0 ||
            count > b[2].len / (Py_ssize_t)sizeof(int32_t) ||
            count > b[10].len / (Py_ssize_t)sizeof(int32_t)) {
            PyErr_SetString(PyExc_IndexError, "ids/newly out of bounds");
            goto done;
        }
        long nrec_total = 0, brk = 0, n_new = 0;
        double extent_max = 0.0;
        Py_ssize_t wr = 0, i = 0;
        int err = 0;
        for (; i < count; i++) {
            int32_t nid = ids[i];
            if (nid < 0 || nid >= nnotes) {
                PyErr_SetString(PyExc_IndexError, "note id out of range");
                err = 1;
                break;
            }
            const double *st = stat + (Py_ssize_t)nid * 7;
            const int32_t *is = istat + (Py_ssize_t)nid * 5;
            int ishold = is[2];
            int clicked = st[0] <= t;
            if (clicked && !clicked_a[nid]) {
                clicked_a[nid] = 1;
                newly[n_new++] = nid;
            }
            if (ishold && st[1] + 0.2 < t) continue;      /* removed */
            if (!ishold && clicked) continue;             /* removed */
            if (is[1] < 0 || is[1] >= ncoll ||
                is[0] < 0 || is[0] >= ntex) {
                PyErr_SetString(PyExc_IndexError, "coll/tex id range");
                err = 1;
                break;
            }
            const double *vf = vflat + (Py_ssize_t)is[1] * 28;
            double note_fsp = line_fsp * vf[5];           /* FlowSpeed */
            double fp_mult = fp_base * note_fsp;
            double raw_fp = st[2] - line_fp;
            double curr_fp = raw_fp * fp_mult;
            if (curr_fp > visa_px) { ids[wr++] = nid; continue; }
            double relx = (vf[6] / 1920.0) * W;           /* RelativeX */
            double rely = (vf[7] / 1080.0) * H * -1.0;    /* RelativeY */
            double posx = 0.0, posy = -curr_fp;
            if (ishold && clicked) { posx = 0.0; posy = 0.0; }
            if (is[3]) posx = vf[0] / 1920.0 * W;         /* PositionX */
            if (is[4]) posy = vf[1] / 1080.0 * H;         /* PositionY */
            double size = vf[3] * (335.0 / 185.0);        /* NOTE_SCALE */
            double transp = vf[2];
            double rot = -90.0 - vf[4];
            if (ishold) {
                /* transp *= 1 - fixorp((t - endTime) / 0.2) */
                double p = (t - st[1]) / 0.2;
                double pmn = (1.0 < p) ? 1.0 : p;   /* min(x, 1.0) */
                double pcl = (pmn > 0.0) ? pmn : 0.0;
                transp *= 1.0 - pcl;
            }
            double hold_len = 0.0;
            if (ishold) {
                double hl = (st[3] - (clicked ? line_fp : st[2]))
                            * fp_mult;
                hold_len = (hl > 0.0) ? hl : 0.0;   /* max(0.0, hl) */
            }
            Py_ssize_t need = ishold ? 3 : 1;
            Py_ssize_t at = n + nrec_total;
            if (at < 0 || at + need > prows || at + need > krows) {
                PyErr_SetString(PyExc_IndexError,
                                "command buffer capacity exceeded");
                err = 1;
                break;
            }
            const double *tx4 = texes + (Py_ssize_t)is[0] * 4;
            long nrec, brk1;
            double extent, m[6];
            if (note_core(kd, pbase, stride, widthp, at, base,
                          posx + relx, posy + rely, rot, size, base_ct,
                          vf[24] / 255.0, vf[25] / 255.0, vf[26] / 255.0,
                          vf[27] / 255.0, transp, W, H, can_break,
                          fp_mult > 0 ? 1.0 : -1.0,
                          fp_mult == 0.0 ? 1 : 0, ishold, width_px,
                          st[6], hold_len, st[4], st[5],
                          tx4[0], tx4[1], tx4[2], tx4[3],
                          &nrec, &brk1, &extent, m) < 0) {
                PyErr_SetString(PyExc_ValueError,
                                "cannot convert float NaN to integer");
                err = 1;
                break;
            }
            if (brk1) { brk = 1; break; }
            nrec_total += nrec;
            if (extent > extent_max) extent_max = extent;
            double *mrow = note_m + (Py_ssize_t)nid * 6;
            for (int k = 0; k < 6; k++) mrow[k] = m[k];
            mstamp[nid] = frame_no;
            ids[wr++] = nid;
        }
        if (err) goto done;
        if (brk && i < count) {
            /* the breaking note and everything after it stay alive */
            memmove(ids + wr, ids + i, (count - i) * sizeof(int32_t));
            wr += count - i;
        }
        result = Py_BuildValue("(nlldl)", wr, nrec_total, brk,
                               extent_max, n_new);
    }
done:
    for (int i = 0; i < 11; i++) PyBuffer_Release(&b[i]);
    return result;
}

/* record_draw(kinds, params, i, kind, m6, ct4, mode, gx, gy, gw, gh,
 *             spec, mw, mh) -> extent (float)
 *
 * Fused per-draw record: inverse transform + command box + row store in
 * ONE call (the Python path pays aabb + inverse + append, three calls
 * plus tuple glue, per draw — context.py _record_draw's fallback is the
 * bit-parity oracle).  Box modes:
 *   0  aabb(m, gx, gy, gw, gh) clamped to [0,mw]x[0,mh]
 *      (rect/circle/vgrd/tex/splitted; reference GetBoarder cpp:693-718)
 *   1  (trunc(gx), gx+gw, trunc(gy), gy+gh) UNclamped — DrawTexture's
 *      no-transform fast path (float(int(x)) semantics, cpp:731-752)
 *   2  transformed-quad AABB superset (draw_line): corners spec[0..7]
 *      mapped through m, floor(min)/max+1, clamped to [0,mw]x[0,mh]
 *      in the double domain (context.py draw_line)
 *   3  full box (0, mw, 0, mh) (fill_color)
 * Row layout matches record(): inv6 + box4 + ct4 + spec, zero-padded.
 * Returns max(r-l, b-t) so the caller can track _max_sampling_extent.
 * NaN box math raises ValueError exactly like the Python int()/floor()
 * it replaces. */
static PyObject *fastrec_record_draw(PyObject *self, PyObject *args) {
    PyObject *kinds_o, *params_o, *m_o, *ct_o, *spec_o;
    Py_ssize_t i;
    long kind;
    int mode;
    double gx, gy, gw, gh, mw, mh;
    if (!PyArg_ParseTuple(args, "OOnlOOiddddOdd", &kinds_o, &params_o, &i,
                          &kind, &m_o, &ct_o, &mode, &gx, &gy, &gw, &gh,
                          &spec_o, &mw, &mh))
        return NULL;
    double m[6];
    if (parse6(m_o, m) < 0) return NULL;

    double row[64];
    Py_ssize_t nrow = 0;

    /* inverse (core/transform.inverse; det==0 -> inv_det=1e9 quirk) */
    {
        double a = m[0], b = m[1], c = m[2], d = m[3], e = m[4], f = m[5];
        double det = a * d - b * c;
        double inv_det = det != 0.0 ? 1.0 / det : 1e9;
        row[0] = d * inv_det;
        row[1] = -b * inv_det;
        row[2] = -c * inv_det;
        row[3] = a * inv_det;
        row[4] = (c * f - d * e) * inv_det;
        row[5] = (b * e - a * f) * inv_det;
        nrow = 6;
    }

    /* box */
    double bl, br, bt, bb;
    if (mode == 0) {
        double a = m[0], b = m[1], c = m[2], d = m[3], e = m[4], f = m[5];
        double xw = gx + gw, yh = gy + gh;
        double ltx = a * gx + c * gy + e,  lty = b * gx + d * gy + f;
        double rtx = a * xw + c * gy + e,  rty = b * xw + d * gy + f;
        double lbx = a * gx + c * yh + e,  lby = b * gx + d * yh + f;
        double rbx = a * xw + c * yh + e,  rby = b * xw + d * yh + f;
        double lf = mn(mn(ltx, rtx), mn(lbx, rbx));
        double rf = mx(mx(ltx, rtx), mx(lbx, rbx));
        double tf = mn(mn(lty, rty), mn(lby, rby));
        double bf = mx(mx(lty, rty), mx(lby, rby));
        if (lf != lf || rf != rf || tf != tf || bf != bf) {
            PyErr_SetString(PyExc_ValueError,
                            "cannot convert float NaN to integer");
            return NULL;
        }
        long long left = trunc_ll(lf), right = trunc_ll(rf);
        long long top = trunc_ll(tf), bottom = trunc_ll(bf);
        long long mwi = (long long)mw, mhi = (long long)mh;
        if (left < 0) left = 0; else if (left > mwi) left = mwi;
        if (right < 0) right = 0; else if (right > mwi) right = mwi;
        if (top < 0) top = 0; else if (top > mhi) top = mhi;
        if (bottom < 0) bottom = 0; else if (bottom > mhi) bottom = mhi;
        bl = (double)left; br = (double)right;
        bt = (double)top;  bb = (double)bottom;
    } else if (mode == 1) {
        if (gx != gx || gy != gy) {
            PyErr_SetString(PyExc_ValueError,
                            "cannot convert float NaN to integer");
            return NULL;
        }
        bl = (double)trunc_ll(gx); br = gx + gw;
        bt = (double)trunc_ll(gy); bb = gy + gh;
    } else if (mode == 2) {
        PyObject *fast = PySequence_Fast(spec_o, "expected sequence");
        if (!fast) return NULL;
        if (PySequence_Fast_GET_SIZE(fast) < 8) {
            Py_DECREF(fast);
            PyErr_SetString(PyExc_ValueError, "line spec needs 8 corners");
            return NULL;
        }
        double a = m[0], b = m[1], c = m[2], d = m[3], e = m[4], f = m[5];
        double txl = 0, txh = 0, tyl = 0, tyh = 0;
        for (int k = 0; k < 4; k++) {
            double px = PyFloat_AsDouble(
                PySequence_Fast_GET_ITEM(fast, 2 * k));
            double py = PyFloat_AsDouble(
                PySequence_Fast_GET_ITEM(fast, 2 * k + 1));
            if (PyErr_Occurred()) { Py_DECREF(fast); return NULL; }
            double cx = a * px + c * py + e;
            double cy = b * px + d * py + f;
            if (k == 0) { txl = txh = cx; tyl = tyh = cy; }
            else {
                txl = mn(txl, cx); txh = mx(txh, cx);
                tyl = mn(tyl, cy); tyh = mx(tyh, cy);
            }
        }
        Py_DECREF(fast);
        if (txl != txl || tyl != tyl) {   /* math.floor(nan) raises */
            PyErr_SetString(PyExc_ValueError,
                            "cannot convert float NaN to integer");
            return NULL;
        }
        bl = mx(0.0, mn(mw, floor(txl)));
        br = mx(0.0, mn(mw, txh + 1.0));
        bt = mx(0.0, mn(mh, floor(tyl)));
        bb = mx(0.0, mn(mh, tyh + 1.0));
    } else {                               /* mode 3: full box */
        bl = 0.0; br = mw; bt = 0.0; bb = mh;
    }
    row[6] = bl; row[7] = br; row[8] = bt; row[9] = bb;
    nrow = 10;

    /* ct4 + spec */
    {
        PyObject *fast = PySequence_Fast(ct_o, "expected sequence");
        if (!fast) return NULL;
        if (PySequence_Fast_GET_SIZE(fast) != 4) {
            Py_DECREF(fast);
            PyErr_SetString(PyExc_ValueError, "bad color length");
            return NULL;
        }
        for (int k = 0; k < 4; k++) {
            row[nrow] = PyFloat_AsDouble(PySequence_Fast_GET_ITEM(fast, k));
            if (row[nrow] == -1.0 && PyErr_Occurred()) {
                Py_DECREF(fast);
                return NULL;
            }
            nrow++;
        }
        Py_DECREF(fast);
    }

    Py_buffer kb, pb;
    if (PyObject_GetBuffer(kinds_o, &kb, PyBUF_WRITABLE | PyBUF_FORMAT) < 0)
        return NULL;
    if (PyObject_GetBuffer(params_o, &pb,
                           PyBUF_WRITABLE | PyBUF_FORMAT | PyBUF_STRIDES) < 0) {
        PyBuffer_Release(&kb);
        return NULL;
    }
    int ok = 0;
    if (pb.ndim != 2 || pb.strides[1] != pb.itemsize) {
        PyErr_SetString(PyExc_ValueError, "params must be 2D row-contiguous");
        goto done;
    }
    Py_ssize_t width = pb.shape[1];
    if (i < 0 || i >= pb.shape[0] ||
        i >= kb.len / (Py_ssize_t)sizeof(int32_t)) {
        PyErr_SetString(PyExc_IndexError, "row index out of range");
        goto done;
    }
    if (spec_o != Py_None) {
        PyObject *fast = PySequence_Fast(spec_o, "expected sequence");
        if (!fast) goto done;
        Py_ssize_t ns = PySequence_Fast_GET_SIZE(fast);
        if (nrow + ns > width || nrow + ns > 64) {
            Py_DECREF(fast);
            PyErr_SetString(PyExc_ValueError, "specific overflows row");
            goto done;
        }
        for (Py_ssize_t k = 0; k < ns; k++) {
            row[nrow] = PyFloat_AsDouble(PySequence_Fast_GET_ITEM(fast, k));
            if (row[nrow] == -1.0 && PyErr_Occurred()) {
                Py_DECREF(fast);
                goto done;
            }
            nrow++;
        }
        Py_DECREF(fast);
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
    double ew = br - bl, eh = bb - bt;
    return PyFloat_FromDouble(ew > eh ? ew : eh);
}

/* ------------------------------------------------------------------ *
 * anim_eval: per-frame animation-cursor evaluation for ALL collections
 * of a chart in one call (models/chart.py AnimationCollection.update,
 * reference milrenderer.py:353-407).  The Python loop costs ~2-6 us per
 * note per frame and dominates draw_frame's host record budget; here
 * the flattened event tables (built once at first Chart.update) are
 * walked in C and only the ACTUALLY UPDATED values are boxed back into
 * each collection's Python ``values`` list, so get_value stays a plain
 * list read.
 *
 * Bit-parity contract (same as the rest of this module): compiled with
 * -ffp-contract=off; every easing transcribed from chart.py with the
 * exact operation order and CPython semantics (x ** k -> pow(x, k);
 * (1-t)*(1-t) stays a multiply; min/max second-operand-wins-on-strict
 * comparison).  Fuzzed against the Python path in tests/test_chart.py.
 * ------------------------------------------------------------------ */

static const double B1C = 1.70158;
static const double B2C = 1.70158 * 1.525;

static double bounce_c(double t) {
    double n1 = 7.5625, d1 = 2.75;
    if (t < 1.0 / d1) return n1 * t * t;
    if (t < 2.0 / d1) return n1 * (t - 1.5 / d1) * (t - 1.5 / d1) + 0.75;
    if (t < 2.5 / d1)
        return n1 * (t - 2.25 / d1) * (t - 2.25 / d1) + 0.9375;
    return n1 * (t - 2.625 / d1) * (t - 2.625 / d1) + 0.984375;
}

static double ease_c(int mode, int kind, double t) {
    switch (mode * 16 + kind) {
    /* EASINGS[0]: in */
    case 0x00: return t;
    case 0x01: return 1.0 - cos(t * M_PI / 2.0);
    case 0x02: return pow(t, 2.0);
    case 0x03: return pow(t, 3.0);
    case 0x04: return pow(t, 4.0);
    case 0x05: return pow(t, 5.0);
    case 0x06: return t == 0.0 ? 0.0 : pow(2.0, 10.0 * t - 10.0);
    case 0x07: return 1.0 - pow(1.0 - pow(t, 2.0), 0.5);
    case 0x08: return (B1C + 1.0) * pow(t, 3.0) - B1C * pow(t, 2.0);
    case 0x09:
        if (t == 0.0) return 0.0;
        if (t == 1.0) return 1.0;
        return -pow(2.0, 10.0 * t - 10.0)
               * sin((t * 10.0 - 10.75) * (2.0 * M_PI / 3.0));
    case 0x0a: return 1.0 - bounce_c(1.0 - t);
    /* EASINGS[1]: out */
    case 0x10: return t;
    case 0x11: return sin(t * M_PI / 2.0);
    case 0x12: return 1.0 - (1.0 - t) * (1.0 - t);
    case 0x13: return 1.0 - pow(1.0 - t, 3.0);
    case 0x14: return 1.0 - pow(1.0 - t, 4.0);
    case 0x15: return 1.0 - pow(1.0 - t, 5.0);
    case 0x16: return t == 1.0 ? 1.0 : 1.0 - pow(2.0, -10.0 * t);
    case 0x17: return pow(1.0 - pow(t - 1.0, 2.0), 0.5);
    case 0x18:
        return 1.0 + (B1C + 1.0) * pow(t - 1.0, 3.0)
               + B1C * pow(t - 1.0, 2.0);
    case 0x19:
        if (t == 0.0) return 0.0;
        if (t == 1.0) return 1.0;
        return pow(2.0, -10.0 * t)
               * sin((t * 10.0 - 0.75) * (2.0 * M_PI / 3.0)) + 1.0;
    case 0x1a: return bounce_c(t);
    /* EASINGS[2]: inout */
    case 0x20: return t;
    case 0x21: return -(cos(M_PI * t) - 1.0) / 2.0;
    case 0x22:
        return t < 0.5 ? 2.0 * pow(t, 2.0)
                       : 1.0 - pow(-2.0 * t + 2.0, 2.0) / 2.0;
    case 0x23:
        return t < 0.5 ? 4.0 * pow(t, 3.0)
                       : 1.0 - pow(-2.0 * t + 2.0, 3.0) / 2.0;
    case 0x24:
        return t < 0.5 ? 8.0 * pow(t, 4.0)
                       : 1.0 - pow(-2.0 * t + 2.0, 4.0) / 2.0;
    case 0x25:
        return t < 0.5 ? 16.0 * pow(t, 5.0)
                       : 1.0 - pow(-2.0 * t + 2.0, 5.0) / 2.0;
    case 0x26:
        if (t == 0.0) return 0.0;
        if (t == 1.0) return 1.0;
        return (t < 0.5 ? pow(2.0, 20.0 * t - 10.0)
                        : 2.0 - pow(2.0, -20.0 * t + 10.0)) / 2.0;
    case 0x27:
        if (t < 0.5)
            return (1.0 - pow(1.0 - pow(2.0 * t, 2.0), 0.5)) / 2.0;
        return (pow(1.0 - pow(-2.0 * t + 2.0, 2.0), 0.5) + 1.0) / 2.0;
    case 0x28:
        if (t < 0.5)
            return (pow(2.0 * t, 2.0) * ((B2C + 1.0) * 2.0 * t - B2C))
                   / 2.0;
        return (pow(2.0 * t - 2.0, 2.0)
                * ((B2C + 1.0) * (t * 2.0 - 2.0) + B2C) + 2.0) / 2.0;
    case 0x29:
        if (t == 0.0) return 0.0;
        if (t < 0.5)
            return -(pow(2.0, 20.0 * t - 10.0)
                     * sin((20.0 * t - 11.125) * (2.0 * M_PI / 4.5)))
                   / 2.0;
        return pow(2.0, -20.0 * t + 10.0)
               * sin((20.0 * t - 11.125) * (2.0 * M_PI / 4.5)) / 2.0 + 1.0;
    case 0x2a:
        if (t < 0.5) return (1.0 - bounce_c(1.0 - 2.0 * t)) / 2.0;
        return (1.0 + bounce_c(2.0 * t - 1.0)) / 2.0;
    default: return t;
    }
}

#define ANIM_NKEYS 24
#define ANIM_SPEED 12
#define ANIM_COLOR 22

/* anim_eval(ev_start, ev_end, v_start, v_end, ev_ease, ev_floor,
 *           grp_off, grp_cnt, act_off, act_keys, cursors, last_t,
 *           sp_empty, def_speed, values_lists, t)
 *
 * ev_* : f64/i32 flat event arrays (all (coll,key) groups concatenated)
 * grp_off/grp_cnt : (NC*24,) i32 per-(coll,key) slice of ev_*
 * act_off : (NC+1,) i32; act_keys : (sum,) u8 active keys per coll
 * cursors : (NC*24,) i32 monotonic cursor state (C-owned)
 * last_t : (NC,) f64; sp_empty : (NC,) u8; def_speed : (NC,) f64
 * values_lists : Python list of each collection's ``values`` list
 */
static PyObject *fastrec_anim_eval(PyObject *self, PyObject *args) {
    PyObject *o[14];
    PyObject *vals_o, *vflat_o;
    double t;
    if (!PyArg_ParseTuple(args, "OOOOOOOOOOOOOOOOd",
                          &o[0], &o[1], &o[2], &o[3], &o[4], &o[5],
                          &o[6], &o[7], &o[8], &o[9], &o[10], &o[11],
                          &o[12], &o[13], &vals_o, &vflat_o, &t))
        return NULL;
    Py_buffer vfb;
    if (PyObject_GetBuffer(vflat_o, &vfb, PyBUF_WRITABLE) < 0)
        return NULL;
    Py_buffer pb[14];
    int flags[14];
    for (int i = 0; i < 14; i++) {
        /* cursors (10) and last_t (11) are written */
        flags[i] = (i == 10 || i == 11) ? PyBUF_WRITABLE : PyBUF_SIMPLE;
        if (PyObject_GetBuffer(o[i], &pb[i], flags[i]) < 0) {
            for (int j = 0; j < i; j++) PyBuffer_Release(&pb[j]);
            PyBuffer_Release(&vfb);
            return NULL;
        }
    }
    double *vflat = (double *)vfb.buf;
    const double *ev_start = (const double *)pb[0].buf;
    const double *ev_end = (const double *)pb[1].buf;
    const double *v_start = (const double *)pb[2].buf;
    const double *v_end = (const double *)pb[3].buf;
    const int32_t *ev_ease = (const int32_t *)pb[4].buf;
    const double *ev_floor = (const double *)pb[5].buf;
    const int32_t *grp_off = (const int32_t *)pb[6].buf;
    const int32_t *grp_cnt = (const int32_t *)pb[7].buf;
    const int32_t *act_off = (const int32_t *)pb[8].buf;
    const uint8_t *act_keys = (const uint8_t *)pb[9].buf;
    int32_t *cursors = (int32_t *)pb[10].buf;
    double *last_t = (double *)pb[11].buf;
    const uint8_t *sp_empty = (const uint8_t *)pb[12].buf;
    const double *def_speed = (const double *)pb[13].buf;
    Py_ssize_t nc = pb[11].len / (Py_ssize_t)sizeof(double);

    int ok = 1;
    if (!PyList_Check(vals_o) || PyList_GET_SIZE(vals_o) != nc) {
        PyErr_SetString(PyExc_ValueError, "values_lists length mismatch");
        ok = 0;
    }
    /* flat mirror: [NC,28] f64 — scalar keys at their index, Color rgba
     * expanded at 24..27 (consumed natively by notes_frame) */
    if (ok && vfb.len < nc * 28 * (Py_ssize_t)sizeof(double)) {
        PyErr_SetString(PyExc_ValueError, "values_flat too small");
        ok = 0;
    }
    for (Py_ssize_t c = 0; ok && c < nc; c++) {
        PyObject *vals = PyList_GET_ITEM(vals_o, c);
        if (t < last_t[c])
            memset(cursors + c * ANIM_NKEYS, 0,
                   ANIM_NKEYS * sizeof(int32_t));
        last_t[c] = t;
        if (sp_empty[c]) {
            double sv = t * def_speed[c];
            vflat[c * 28 + ANIM_SPEED] = sv;
            PyObject *f = PyFloat_FromDouble(sv);
            if (!f || PyList_SetItem(vals, ANIM_SPEED, f) < 0) {
                ok = 0;
                break;
            }
        }
        for (int32_t a = act_off[c]; ok && a < act_off[c + 1]; a++) {
            int key = act_keys[a];
            Py_ssize_t g = c * ANIM_NKEYS + key;
            int32_t off = grp_off[g], cnt = grp_cnt[g];
            int32_t cur = cursors[g];
            while (cur < cnt - 1 && ev_start[off + cur + 1] <= t) cur++;
            cursors[g] = cur;
            Py_ssize_t e = off + cur;
            double st = ev_start[e], et = ev_end[e];
            double p = (st == et) ? 1.0 : (t - st) / (et - st);
            /* max(0.0, min(1.0, p)) with Python's first-wins-on-tie/NaN */
            double pm = (p < 1.0) ? p : 1.0;
            p = (pm > 0.0) ? pm : 0.0;
            int code = ev_ease[e];
            p = ease_c(code >> 4, code & 15, p);
            if (key == ANIM_COLOR) {
                long long s = (long long)v_start[e];
                long long en = (long long)v_end[e];
                double ch[4];
                for (int k = 0; k < 4; k++) {
                    int sh = 24 - 8 * k;
                    double s0 = (double)((s >> sh) & 0xFF);
                    double e0 = (double)((en >> sh) & 0xFF);
                    ch[k] = s0 + (e0 - s0) * p;
                    vflat[c * 28 + 24 + k] = ch[k];
                }
                PyObject *tup = Py_BuildValue("(dddd)", ch[0], ch[1],
                                              ch[2], ch[3]);
                if (!tup || PyList_SetItem(vals, ANIM_COLOR, tup) < 0) {
                    ok = 0;
                    break;
                }
                continue;
            }
            double v = v_start[e] + (v_end[e] - v_start[e]) * p;
            if (key == ANIM_SPEED) {
                /* integrated floor position (chart.py update :383-394) */
                if (t < st)
                    v = t * v_start[e];
                else if (st < t && t < et)
                    v = ev_floor[e] + (t - st) * (v + v_start[e]) / 2.0;
                else
                    v = ev_floor[e]
                        + (et - st) * (v_start[e] + v_end[e]) / 2.0
                        + (t - et) * v_end[e];
            }
            vflat[c * 28 + key] = v;
            PyObject *f = PyFloat_FromDouble(v);
            if (!f || PyList_SetItem(vals, key, f) < 0) {
                ok = 0;
                break;
            }
        }
    }
    for (int i = 0; i < 14; i++) PyBuffer_Release(&pb[i]);
    PyBuffer_Release(&vfb);
    if (!ok) return NULL;
    Py_RETURN_NONE;
}

static PyMethodDef methods[] = {
    {"aabb", fastrec_aabb, METH_VARARGS,
     "aabb(m6, x, y, w, h, mw, mh) -> (l, r, t, b)"},
    {"inverse", fastrec_inverse, METH_VARARGS, "inverse(m6) -> m6"},
    {"record", fastrec_record, METH_VARARGS,
     "record(kinds, params, i, kind, inv6, box4, ct4, specific)"},
    {"record_draw", fastrec_record_draw, METH_VARARGS,
     "record_draw(kinds, params, i, kind, m6, ct4, mode, gx, gy, gw, gh, "
     "spec, mw, mh) -> extent"},
    {"note_blit", fastrec_note_blit, METH_VARARGS,
     "note_blit(kinds, params, n, m6, tx, ty, deg, size, ct4, cr, cg, "
     "cb, ca, transp, W, H, can_break, dir_y, fp_zero, ishold, "
     "width_px, height_px, hold_len, u0, u1, ox, oy, tw, th) -> "
     "(nrec, brk, extent, m6)"},
    {"anim_eval", fastrec_anim_eval, METH_VARARGS,
     "anim_eval(ev_start, ev_end, v_start, v_end, ev_ease, ev_floor, "
     "grp_off, grp_cnt, act_off, act_keys, cursors, last_t, sp_empty, "
     "def_speed, values_lists, values_flat, t)"},
    {"notes_frame", fastrec_notes_frame, METH_VARARGS,
     "notes_frame(kinds, params, n, ids, count, stat, istat, clicked, "
     "vflat, texes, note_m, mstamp, newly, m6, ct4, t, line_fsp, "
     "line_fp, visa_px, fp_base, width_px, W, H, can_break, frame_no) "
     "-> (new_count, nrec, brk, extent, n_newly)"},
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
