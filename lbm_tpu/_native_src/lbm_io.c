/*
 * lbm_tpu._native — C runtime for the host-side I/O hot paths.
 *
 * The reference's driver, loaders and writers are native C
 * (d2q9-bgk.c:505-654, 698-752); this module is their equivalent around
 * the JAX compute core. The dominant cost is write_values: final_state.dat
 * is nx*ny lines of seven %.12E/%d fields (16.7M lines at 16384x1024),
 * which pure Python formats ~10x slower.
 *
 * Python binding is the raw CPython C API (no pybind11 dependency);
 * arrays cross the boundary via the buffer protocol.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdio.h>
#include <string.h>
#include <stdint.h>

/* Fetch a C-contiguous buffer of the expected format, or set an error.
 * The format string IS checked (requesting PyBUF_FORMAT and validating
 * only itemsize would let an int32 array where float32 is expected
 * print reinterpreted garbage — review finding). */
static int
get_buffer(PyObject *obj, Py_buffer *view, const char *format, const char *name)
{
    if (PyObject_GetBuffer(obj, view, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) < 0) {
        return -1;
    }
    if (view->format == NULL || strcmp(view->format, format) != 0) {
        PyErr_Format(PyExc_TypeError, "%s: expected dtype format '%s', got '%s'",
                     name, format, view->format ? view->format : "?");
        PyBuffer_Release(view);
        return -1;
    }
    return 0;
}

/*
 * write_final_state(path, u_x, u_y, u, pressure, obstacles)
 *
 * u_* and pressure: float32 (ny, nx) C-contiguous; obstacles: int32
 * (ny, nx). Emits the reference's exact line format
 * "ii jj %.12E %.12E %.12E %.12E obstacle" (d2q9-bgk.c:739).
 */
static PyObject *
write_final_state(PyObject *self, PyObject *args)
{
    const char *path;
    PyObject *o_ux, *o_uy, *o_u, *o_p, *o_obs;
    if (!PyArg_ParseTuple(args, "sOOOOO", &path, &o_ux, &o_uy, &o_u, &o_p, &o_obs))
        return NULL;

    Py_buffer ux, uy, u, p, obs;
    if (get_buffer(o_ux, &ux, "f", "u_x") < 0) return NULL;
    if (get_buffer(o_uy, &uy, "f", "u_y") < 0) { PyBuffer_Release(&ux); return NULL; }
    if (get_buffer(o_u, &u, "f", "u") < 0) {
        PyBuffer_Release(&ux); PyBuffer_Release(&uy); return NULL;
    }
    if (get_buffer(o_p, &p, "f", "pressure") < 0) {
        PyBuffer_Release(&ux); PyBuffer_Release(&uy); PyBuffer_Release(&u);
        return NULL;
    }
    if (get_buffer(o_obs, &obs, "i", "obstacles") < 0) {
        PyBuffer_Release(&ux); PyBuffer_Release(&uy); PyBuffer_Release(&u);
        PyBuffer_Release(&p);
        return NULL;
    }

    PyObject *result = NULL;
    if (ux.ndim != 2 || uy.ndim != 2 || u.ndim != 2 || p.ndim != 2 || obs.ndim != 2) {
        PyErr_SetString(PyExc_ValueError, "arrays must be 2-D (ny, nx)");
        goto done;
    }
    Py_ssize_t ny = ux.shape[0], nx = ux.shape[1];
    {
        const Py_buffer *views[4] = {&uy, &u, &p, &obs};
        for (int k = 0; k < 4; k++) {
            if (views[k]->shape[0] != ny || views[k]->shape[1] != nx) {
                PyErr_Format(PyExc_ValueError,
                             "all arrays must share u_x's shape (%zd, %zd)",
                             ny, nx);
                goto done;
            }
        }
    }

    FILE *fp = fopen(path, "w");
    if (fp == NULL) {
        PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
        goto done;
    }
    /* Large stdio buffer: one flush per ~4 MiB. */
    setvbuf(fp, NULL, _IOFBF, 1 << 22);

    const float *fux = (const float *)ux.buf;
    const float *fuy = (const float *)uy.buf;
    const float *fu = (const float *)u.buf;
    const float *fp_ = (const float *)p.buf;
    const int32_t *iobs = (const int32_t *)obs.buf;

    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t jj = 0; jj < ny; jj++) {
        const Py_ssize_t row = jj * nx;
        for (Py_ssize_t ii = 0; ii < nx; ii++) {
            const Py_ssize_t c = row + ii;
            /* Values promote float->double exactly like the reference's
             * printf of float expressions. */
            fprintf(fp, "%d %d %.12E %.12E %.12E %.12E %d\n",
                    (int)ii, (int)jj,
                    (double)fux[c], (double)fuy[c], (double)fu[c],
                    (double)fp_[c], (int)iobs[c]);
        }
    }
    Py_END_ALLOW_THREADS

    /* A mid-file flush failure (ENOSPC, EIO) leaves ferror set while
     * fclose can still succeed — check both or a truncated
     * final_state.dat reports success (review finding). */
    if (ferror(fp)) {
        fclose(fp);
        PyErr_Format(PyExc_OSError, "write error on %s", path);
        goto done;
    }
    if (fclose(fp) != 0) {
        PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
        goto done;
    }
    result = Py_None;
    Py_INCREF(result);
done:
    PyBuffer_Release(&ux); PyBuffer_Release(&uy); PyBuffer_Release(&u);
    PyBuffer_Release(&p); PyBuffer_Release(&obs);
    return result;
}

/* write_av_vels(path, av): av float32 (n,), lines "tt:\t%.12E". */
static PyObject *
write_av_vels(PyObject *self, PyObject *args)
{
    const char *path;
    PyObject *o_av;
    if (!PyArg_ParseTuple(args, "sO", &path, &o_av))
        return NULL;
    Py_buffer av;
    if (get_buffer(o_av, &av, "f", "av_vels") < 0) return NULL;

    PyObject *result = NULL;
    FILE *fp = fopen(path, "w");
    if (fp == NULL) {
        PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
        goto done;
    }
    setvbuf(fp, NULL, _IOFBF, 1 << 20);
    const float *v = (const float *)av.buf;
    Py_ssize_t n = av.len / 4;
    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t tt = 0; tt < n; tt++) {
        fprintf(fp, "%zd:\t%.12E\n", tt, (double)v[tt]);
    }
    Py_END_ALLOW_THREADS
    if (ferror(fp)) {
        fclose(fp);
        PyErr_Format(PyExc_OSError, "write error on %s", path);
        goto done;
    }
    if (fclose(fp) != 0) {
        PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
        goto done;
    }
    result = Py_None;
    Py_INCREF(result);
done:
    PyBuffer_Release(&av);
    return result;
}

/*
 * read_obstacles(path, nx, ny, mask_buffer) -> num_lines
 *
 * Parses "x y 1" triplets into a caller-provided uint8 (ny, nx) buffer
 * with the reference's validation (d2q9-bgk.c:628-633). Returns the line
 * count (the reference's num_obstacles, which counts duplicates).
 */
static PyObject *
read_obstacles(PyObject *self, PyObject *args)
{
    const char *path;
    int nx, ny;
    PyObject *o_mask;
    if (!PyArg_ParseTuple(args, "siiO", &path, &nx, &ny, &o_mask))
        return NULL;
    Py_buffer mask;
    if (PyObject_GetBuffer(o_mask, &mask,
                           PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE | PyBUF_ND) < 0)
        return NULL;
    /* Validate the actual (ny, nx) shape, not just the byte count — a
     * swapped nx/ny call would otherwise scatter into a transposed
     * layout silently (review finding). */
    if (mask.ndim != 2 || mask.itemsize != 1
            || mask.shape[0] != ny || mask.shape[1] != nx) {
        PyErr_Format(PyExc_ValueError,
                     "mask buffer must be a (ny=%d, nx=%d) uint8 array",
                     ny, nx);
        PyBuffer_Release(&mask);
        return NULL;
    }

    FILE *fp = fopen(path, "r");
    if (fp == NULL) {
        PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
        PyBuffer_Release(&mask);
        return NULL;
    }
    uint8_t *m = (uint8_t *)mask.buf;
    long count = 0;
    const char *err = NULL;
    int xx, yy, blocked;
    int r;
    Py_BEGIN_ALLOW_THREADS
    while ((r = fscanf(fp, "%d %d %d", &xx, &yy, &blocked)) != EOF) {
        if (r != 3) { err = "expected 3 values per line in obstacle file"; break; }
        if (xx < 0 || xx > nx - 1) { err = "obstacle x-coord out of range"; break; }
        if (yy < 0 || yy > ny - 1) { err = "obstacle y-coord out of range"; break; }
        if (blocked != 1) { err = "obstacle blocked value should be 1"; break; }
        m[(Py_ssize_t)yy * nx + xx] = 1;
        count++;
    }
    Py_END_ALLOW_THREADS
    /* fscanf returns EOF for a read ERROR too; without this check a
     * partially-read file is accepted as complete (review finding). */
    int read_failed = ferror(fp);
    fclose(fp);
    PyBuffer_Release(&mask);
    if (err != NULL) {
        PyErr_SetString(PyExc_ValueError, err);
        return NULL;
    }
    if (read_failed) {
        PyErr_Format(PyExc_OSError, "read error on %s", path);
        return NULL;
    }
    return PyLong_FromLong(count);
}

static PyMethodDef methods[] = {
    {"write_final_state", write_final_state, METH_VARARGS,
     "write final_state.dat in the reference byte format"},
    {"write_av_vels", write_av_vels, METH_VARARGS,
     "write av_vels.dat in the reference byte format"},
    {"read_obstacles", read_obstacles, METH_VARARGS,
     "parse an obstacle .dat file into a (ny, nx) uint8 mask"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_native",
    "Native I/O runtime for lbm_tpu", -1, methods,
};

PyMODINIT_FUNC
PyInit__native(void)
{
    return PyModule_Create(&moduledef);
}
