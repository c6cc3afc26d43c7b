// CPU baseline for the overlap-verification benchmark: the reference
// EdgeCalculator's per-position scoring math (src/EdgeCalculator.cpp:26-139
// — phred->prob via pow() per position, per-position probability, log
// accumulation, geometric-mean score) in a tight OpenMP parallel-for over
// tasks, mirroring the reference's chunk parallelism
// (src/EdgeCalculator.cpp:395-423). This is what bench.py's vs_baseline
// compares the TPU kernel against; it is deliberately *faster* than the
// real reference path (no string copies / vector push_backs), making the
// reported speedup conservative.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cmath>
#include <cstdint>

extern "C" {

// codes: (rows, W) int8 (0..3 bases, 4 N, 5 pad); quals: (rows, W) uint8
// lens: per-row int32; tasks: row_a/row_b/pos int32 arrays of length n
// out_score/out_mism: double arrays of length n
static void score_tasks(const int8_t* codes, const uint8_t* quals,
                        const int32_t* lens, int64_t width,
                        const int32_t* row_a, const int32_t* row_b,
                        const int32_t* pos, int64_t n, double mismatch_thresh,
                        double* out_score, double* out_mism) {
#pragma omp parallel for schedule(static)
    for (int64_t t = 0; t < n; t++) {
        const int8_t* a = codes + (int64_t)row_a[t] * width;
        const int8_t* b = codes + (int64_t)row_b[t] * width;
        const uint8_t* qa = quals + (int64_t)row_a[t] * width;
        const uint8_t* qb = quals + (int64_t)row_b[t] * width;
        int32_t la = lens[row_a[t]];
        int32_t lb = lens[row_b[t]];
        int32_t p0 = pos[t];
        out_score[t] = 0.0;
        out_mism[t] = 1.0;
        if (p0 >= la) continue;
        int32_t L = la - p0 < lb ? la - p0 : lb;
        double total = 0.0;
        int64_t counted = 0;
        int64_t mism = 0;
        bool rejected = false;
        for (int32_t i = 0; i < L; i++) {
            int8_t n1 = a[p0 + i];
            int8_t n2 = b[i];
            if (n1 >= 4 || n2 >= 4) continue;  // N or pad: skipped
            double p1 = pow(10.0, -qa[p0 + i] / 10.0);
            double p2 = pow(10.0, -qb[i] / 10.0);
            double p;
            if (n1 == n2) {
                p = (1 - p1) * (1 - p2) + (p1 * p2) / 3.0;
            } else {
                p = p1 * (1 - p2) / 3.0 + p2 * (1 - p1) / 3.0 + (2 / 9.0) * p1 * p2;
                mism++;
            }
            if (p < mismatch_thresh) {
                rejected = true;
                break;
            }
            total += log(p);
            counted++;
        }
        if (rejected || counted == 0) continue;
        out_mism[t] = (double)mism / (double)counted;
        out_score[t] = exp(total / (double)counted);
    }
}

}  // extern "C"

static PyObject* py_score_tasks(PyObject*, PyObject* args) {
    PyObject *codes_o, *quals_o, *lens_o, *ra_o, *rb_o, *pos_o;
    long long width, n;
    double thresh;
    if (!PyArg_ParseTuple(args, "OOOLOOOLd", &codes_o, &quals_o, &lens_o, &width,
                          &ra_o, &rb_o, &pos_o, &n, &thresh))
        return nullptr;
    Py_buffer codes, quals, lens, ra, rb, pos;
    if (PyObject_GetBuffer(codes_o, &codes, PyBUF_CONTIG_RO) < 0) return nullptr;
    if (PyObject_GetBuffer(quals_o, &quals, PyBUF_CONTIG_RO) < 0) return nullptr;
    if (PyObject_GetBuffer(lens_o, &lens, PyBUF_CONTIG_RO) < 0) return nullptr;
    if (PyObject_GetBuffer(ra_o, &ra, PyBUF_CONTIG_RO) < 0) return nullptr;
    if (PyObject_GetBuffer(rb_o, &rb, PyBUF_CONTIG_RO) < 0) return nullptr;
    if (PyObject_GetBuffer(pos_o, &pos, PyBUF_CONTIG_RO) < 0) return nullptr;

    PyObject* score_bytes = PyBytes_FromStringAndSize(nullptr, n * sizeof(double));
    PyObject* mism_bytes = PyBytes_FromStringAndSize(nullptr, n * sizeof(double));
    Py_BEGIN_ALLOW_THREADS
    score_tasks((const int8_t*)codes.buf, (const uint8_t*)quals.buf,
                (const int32_t*)lens.buf, width, (const int32_t*)ra.buf,
                (const int32_t*)rb.buf, (const int32_t*)pos.buf, n, thresh,
                (double*)PyBytes_AS_STRING(score_bytes),
                (double*)PyBytes_AS_STRING(mism_bytes));
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&codes);
    PyBuffer_Release(&quals);
    PyBuffer_Release(&lens);
    PyBuffer_Release(&ra);
    PyBuffer_Release(&rb);
    PyBuffer_Release(&pos);
    PyObject* result = PyTuple_Pack(2, score_bytes, mism_bytes);
    Py_XDECREF(score_bytes);
    Py_XDECREF(mism_bytes);
    return result;
}

static PyMethodDef methods[] = {
    {"score_tasks", py_score_tasks, METH_VARARGS, "baseline OpenMP task scoring"},
    {nullptr, nullptr, 0, nullptr},
};

static PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_baseline_score",
    "OpenMP CPU baseline of the overlap-verification kernel", -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

PyMODINIT_FUNC PyInit__baseline_score(void) { return PyModule_Create(&module); }
