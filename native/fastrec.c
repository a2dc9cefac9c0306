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

static PyMethodDef methods[] = {
    {"aabb", fastrec_aabb, METH_VARARGS,
     "aabb(m6, x, y, w, h, mw, mh) -> (l, r, t, b)"},
    {"inverse", fastrec_inverse, METH_VARARGS, "inverse(m6) -> m6"},
    {"record", fastrec_record, METH_VARARGS,
     "record(kinds, params, i, kind, inv6, box4, ct4, specific)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_tpufastrec",
    "Native command-recording core", -1, methods,
};

PyMODINIT_FUNC PyInit__tpufastrec(void) {
    return PyModule_Create(&moduledef);
}
