// Native graph-packing runtime for krylov_robustness_tpu.
//
// Host-side data-preparation kernels that sit between dataset IO and the
// TPU compute path: CSR -> padded-ELL packing, CSR -> banded-ELL tables
// (the layout consumed by the Pallas SpMM kernel), and COO symmetrization
// with duplicate folding. These are the counterparts of the work MATLAB's
// compiled sparse built-ins do before/around `A*w` in the reference
// (SURVEY.md L1 substrate); in this framework they are the C++ portion of
// the runtime, exposed to Python via ctypes (see graphpack.py).
//
// All functions are plain-C ABI, operate on caller-allocated buffers, and
// are single-pass over nnz.

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// CSR (indptr, indices, data) -> padded ELL (cols[n_pad*K], vals[n_pad*K]).
// cols/vals must be zero-initialized by the caller. Returns K actually used
// (== max degree), or -1 if max degree exceeds K.
int64_t pack_ell(const int64_t* indptr, const int32_t* indices,
                 const double* data, int64_t n, int64_t n_pad, int64_t K,
                 int32_t* cols, double* vals) {
    int64_t maxdeg = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t lo = indptr[i], hi = indptr[i + 1];
        const int64_t deg = hi - lo;
        if (deg > K) return -1;
        maxdeg = std::max(maxdeg, deg);
        int32_t* crow = cols + i * K;
        double* vrow = vals + i * K;
        for (int64_t e = lo; e < hi; ++e) {
            crow[e - lo] = indices[e];
            vrow[e - lo] = data[e];
        }
    }
    return maxdeg;
}

// CSR -> banded-ELL tables in the transposed (slot-major, node-in-lanes)
// layout of the Pallas kernel:
//   rel[k*n_lanes + r] = col % 128
//   win[k*n_lanes + r] = col/128 - r/128 + Wv
//   val[k*n_lanes + r] = value
// rel must be pre-filled with lane%128, win with Wv, val with 0 by the
// caller (padding semantics). Also emits per-entry (slot, row) positions for
// O(1) value updates. Returns 0, or -1 if any window id falls outside
// [0, num_windows).
int64_t pack_banded(const int64_t* indptr, const int32_t* indices,
                    const double* data, int64_t n, int64_t n_lanes,
                    int64_t K, int64_t Wv, int64_t num_windows,
                    int32_t* rel, int32_t* win, double* val,
                    int64_t* entry_slot, int64_t* entry_row) {
    int64_t e_out = 0;
    for (int64_t r = 0; r < n; ++r) {
        const int64_t lo = indptr[r], hi = indptr[r + 1];
        for (int64_t e = lo; e < hi; ++e) {
            const int64_t k = e - lo;
            const int64_t c = indices[e];
            const int64_t w = c / 128 - r / 128 + Wv;
            if (w < 0 || w >= num_windows) return -1;
            rel[k * n_lanes + r] = (int32_t)(c % 128);
            win[k * n_lanes + r] = (int32_t)w;
            val[k * n_lanes + r] = data[e];
            entry_slot[e_out] = k;
            entry_row[e_out] = r;
            ++e_out;
        }
    }
    return 0;
}

// Symmetrize + binarize + strip diagonal a COO edge list:
// emits the union of (r,c) and (c,r) with r != c, value 1.0, deduplicated.
// in: rows/cols of length nnz; out buffers of length >= 2*nnz.
// Returns number of output entries (sorted row-major), or -1 on overflow.
int64_t symmetrize_binarize(const int32_t* rows, const int32_t* cols,
                            int64_t nnz, int64_t n,
                            int32_t* out_rows, int32_t* out_cols,
                            int64_t cap) {
    if (2 * nnz > cap) return -1;
    // collect both directions
    int64_t m = 0;
    for (int64_t e = 0; e < nnz; ++e) {
        const int32_t r = rows[e], c = cols[e];
        if (r == c) continue;
        out_rows[m] = r; out_cols[m] = c; ++m;
        out_rows[m] = c; out_cols[m] = r; ++m;
    }
    // sort by (row, col) and dedup
    // index sort over a temporary key array
    struct RC { int32_t r, c; };
    RC* tmp = new RC[m];
    for (int64_t e = 0; e < m; ++e) tmp[e] = RC{out_rows[e], out_cols[e]};
    std::sort(tmp, tmp + m, [](const RC& a, const RC& b) {
        return a.r != b.r ? a.r < b.r : a.c < b.c;
    });
    int64_t w = 0;
    for (int64_t e = 0; e < m; ++e) {
        if (w == 0 || tmp[e].r != tmp[w - 1].r || tmp[e].c != tmp[w - 1].c) {
            tmp[w++] = tmp[e];
        }
    }
    for (int64_t e = 0; e < w; ++e) {
        out_rows[e] = tmp[e].r;
        out_cols[e] = tmp[e].c;
    }
    delete[] tmp;
    return w;
}

}  // extern "C"
