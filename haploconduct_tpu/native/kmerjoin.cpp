// Native candidate-join kernels for the host k-mer overlap engine
// (ops/kmer.py). The sort-join over seed hits is coverage-quadratic — at
// deep coverage the numpy expansion materializes ~10 flat int64 passes over
// tens of millions of rows and a giant np.unique. Here each OpenMP thread
// expands its query range into a local buffer of packed candidate keys, the
// buffers are merged, parallel-sorted, and uniqued: one pass over the hits,
// one sort. (Reference's equivalent stage is rust-overlaps' FM-index
// search, savage.py:664; candidate *semantics* are unchanged — the output
// is byte-equal to the numpy join's np.unique result.)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#include <parallel/algorithm>
#define SORT_KEYS(b, e) __gnu_parallel::sort((b), (e))
#else
#define SORT_KEYS(b, e) std::sort((b), (e))
#endif

extern "C" {

// Expand searchsorted group ranges into packed unique candidate keys.
// Key layout must match ops/kmer.py _pack_keys: 19b idA | 19b idB |
// 24b shift+2^23 | 1b rev.
// q_sid/q_pos: per query k-mer; left/count: its hash group in the sorted
// forward table (count already zeroed for over-max_group groups).
static int64_t join_unique(const int64_t* q_sid, const int64_t* q_pos,
                           const int64_t* left, const int64_t* count,
                           int64_t nq, const int64_t* t_sid,
                           const int64_t* t_pos, int64_t rev,
                           std::vector<int64_t>& out) {
    int nthreads = 1;
#if defined(_OPENMP)
    nthreads = omp_get_max_threads();
#endif
    std::vector<std::vector<int64_t>> local(nthreads);
#pragma omp parallel
    {
        int tid = 0;
#if defined(_OPENMP)
        tid = omp_get_thread_num();
#endif
        std::vector<int64_t>& buf = local[tid];
#pragma omp for schedule(dynamic, 4096)
        for (int64_t q = 0; q < nq; q++) {
            int64_t qa = q_sid[q];
            int64_t qp = q_pos[q];
            int64_t lo = left[q], n = count[q];
            for (int64_t j = 0; j < n; j++) {
                int64_t tb = t_sid[lo + j];
                if (tb == qa) continue;
                int64_t shift = qp - t_pos[lo + j];
                buf.push_back((((qa << 19) | tb) << 25) |
                              ((shift + (int64_t(1) << 23)) << 1) | rev);
            }
        }
    }
    size_t total = 0;
    for (auto& b : local) total += b.size();
    out.resize(total);
    size_t off = 0;
    for (auto& b : local) {
        std::copy(b.begin(), b.end(), out.begin() + off);
        off += b.size();
        b.clear();
        b.shrink_to_fit();
    }
    SORT_KEYS(out.begin(), out.end());
    out.erase(std::unique(out.begin(), out.end()), out.end());
    return (int64_t)out.size();
}

// Per-candidate gapless diagonal mismatch counting (ops/kmer.py
// _verify_candidates): codes is the (2n, w) fwd+revcomp matrix, row_first
// is shifted by pos against row_second. Early-exits once the mismatch
// count provably exceeds ceil(error_rate * L) >= the final allowance.
static void diag_mismatch(const int8_t* codes, const int64_t* lens,
                          int64_t width, const int64_t* row_first,
                          const int64_t* row_second, const int64_t* pos,
                          int64_t n, double error_rate, int64_t* out_counted,
                          int64_t* out_mism) {
#pragma omp parallel for schedule(dynamic, 1024)
    for (int64_t t = 0; t < n; t++) {
        const int8_t* a = codes + row_first[t] * width;
        const int8_t* b = codes + row_second[t] * width;
        int64_t p0 = pos[t];
        int64_t la = lens[row_first[t]], lb = lens[row_second[t]];
        int64_t L = la - p0 < lb ? la - p0 : lb;
        if (L < 0) L = 0;
        int64_t max_allowed = (int64_t)ceil(error_rate * (double)L);
        int64_t counted = 0, mism = 0;
        for (int64_t i = 0; i < L; i++) {
            int8_t c1 = a[p0 + i], c2 = b[i];
            if (c1 >= 4 || c2 >= 4) continue;  // N / pad skipped
            counted++;
            if (c1 != c2 && ++mism > max_allowed) break;
        }
        out_counted[t] = counted;
        out_mism[t] = mism;
    }
}

}  // extern "C"

static PyObject* py_join_unique(PyObject*, PyObject* args) {
    PyObject *qs_o, *qp_o, *l_o, *c_o, *ts_o, *tp_o;
    long long nq, rev;
    if (!PyArg_ParseTuple(args, "OOOOLOOL", &qs_o, &qp_o, &l_o, &c_o, &nq,
                          &ts_o, &tp_o, &rev))
        return nullptr;
    Py_buffer bufs[6];
    PyObject* objs[6] = {qs_o, qp_o, l_o, c_o, ts_o, tp_o};
    for (int i = 0; i < 6; i++) {
        if (PyObject_GetBuffer(objs[i], &bufs[i], PyBUF_CONTIG_RO) < 0) {
            for (int j = 0; j < i; j++) PyBuffer_Release(&bufs[j]);
            return nullptr;
        }
    }
    std::vector<int64_t> out;
    int64_t n_out = 0;
    Py_BEGIN_ALLOW_THREADS
    n_out = join_unique((const int64_t*)bufs[0].buf,
                        (const int64_t*)bufs[1].buf,
                        (const int64_t*)bufs[2].buf,
                        (const int64_t*)bufs[3].buf, nq,
                        (const int64_t*)bufs[4].buf,
                        (const int64_t*)bufs[5].buf, rev, out);
    Py_END_ALLOW_THREADS
    for (int i = 0; i < 6; i++) PyBuffer_Release(&bufs[i]);
    PyObject* keys_b = PyBytes_FromStringAndSize((const char*)out.data(),
                                                 n_out * sizeof(int64_t));
    return keys_b;
}

static PyObject* py_diag_mismatch(PyObject*, PyObject* args) {
    PyObject *codes_o, *lens_o, *rf_o, *rs_o, *pos_o;
    long long width, n;
    double error_rate;
    if (!PyArg_ParseTuple(args, "OOLOOOLd", &codes_o, &lens_o, &width, &rf_o,
                          &rs_o, &pos_o, &n, &error_rate))
        return nullptr;
    Py_buffer bufs[5];
    PyObject* objs[5] = {codes_o, lens_o, rf_o, rs_o, pos_o};
    for (int i = 0; i < 5; i++) {
        if (PyObject_GetBuffer(objs[i], &bufs[i], PyBUF_CONTIG_RO) < 0) {
            for (int j = 0; j < i; j++) PyBuffer_Release(&bufs[j]);
            return nullptr;
        }
    }
    PyObject* counted_b =
        PyBytes_FromStringAndSize(nullptr, n * sizeof(int64_t));
    PyObject* mism_b = PyBytes_FromStringAndSize(nullptr, n * sizeof(int64_t));
    if (!counted_b || !mism_b) {
        for (int i = 0; i < 5; i++) PyBuffer_Release(&bufs[i]);
        Py_XDECREF(counted_b);
        Py_XDECREF(mism_b);
        return nullptr;  // exception already set by the failed allocation
    }
    Py_BEGIN_ALLOW_THREADS
    diag_mismatch((const int8_t*)bufs[0].buf, (const int64_t*)bufs[1].buf,
                  width, (const int64_t*)bufs[2].buf,
                  (const int64_t*)bufs[3].buf, (const int64_t*)bufs[4].buf, n,
                  error_rate, (int64_t*)PyBytes_AS_STRING(counted_b),
                  (int64_t*)PyBytes_AS_STRING(mism_b));
    Py_END_ALLOW_THREADS
    for (int i = 0; i < 5; i++) PyBuffer_Release(&bufs[i]);
    PyObject* result = PyTuple_Pack(2, counted_b, mism_b);
    Py_XDECREF(counted_b);
    Py_XDECREF(mism_b);
    return result;
}

static PyMethodDef methods[] = {
    {"join_unique", py_join_unique, METH_VARARGS,
     "expand seed-hash groups into unique packed candidate keys"},
    {"diag_mismatch", py_diag_mismatch, METH_VARARGS,
     "gapless diagonal mismatch counts with early reject"},
    {nullptr, nullptr, 0, nullptr},
};

static PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_kmerjoin",
    "OpenMP k-mer candidate join + diagonal verification", -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

PyMODINIT_FUNC PyInit__kmerjoin(void) { return PyModule_Create(&module); }
