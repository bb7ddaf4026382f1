// Single-pass CSR -> (dense counts, packed expressed subsets, library sizes).
//
// The native hot loop of the input pipeline: one traversal of the nonzeros
// fills the dense count block, the left-packed gene/count subset buffers, and
// the per-cell library sizes. Compiled on demand by _fastpack_build.py and
// called through ctypes (no pybind11 in this image); semantics match
// scldm_tpu/data/fastpath.py's numpy path, which remains the fallback.

#include <cstdint>

extern "C" {

void fastpack_expressed(
    const float* data,         // (nnz,)
    const int64_t* indices,    // (nnz,) column ids
    const int64_t* indptr,     // (n+1,) local row offsets
    const int64_t* gene_row,   // (g,) encoded gene-token ids
    float* counts,             // (n, g) zero-initialized
    int32_t* genes_sub,        // (n, seq_len) zero-initialized (mask idx 0)
    float* counts_sub,         // (n, seq_len) zero-initialized
    float* library,            // (n,)
    int64_t n,
    int64_t g,
    int64_t seq_len)
{
    for (int64_t i = 0; i < n; ++i) {
        const int64_t lo = indptr[i];
        const int64_t hi = indptr[i + 1];
        float* counts_row = counts + i * g;
        int32_t* gsub_row = genes_sub + i * seq_len;
        float* csub_row = counts_sub + i * seq_len;
        float lib = 0.0f;
        for (int64_t k = lo; k < hi; ++k) {
            const int64_t col = indices[k];
            const float v = data[k];
            counts_row[col] = v;
            const int64_t pos = k - lo;
            gsub_row[pos] = static_cast<int32_t>(gene_row[col]);
            csub_row[pos] = v;
            lib += v;
        }
        library[i] = lib;
    }
}

}  // extern "C"
