"""Vectorized CSR -> tokenized-batch fast path.

Builds the full "expressed" batch contract (dense counts, gene ids,
left-packed expressed subsets, library sizes) straight from a CSR block in a
handful of flat numpy scatters — no per-row Python, no full-matrix cumsum
passes. Semantics identical to tokenize_cells(sample_genes="expressed")
(reference datamodule.py:708-731) for CSR files with sorted column indices
(the anndata on-disk norm); verified against the reference-path implementation
in tests/test_fastpath.py.

An optional C fast path (scldm_tpu/data/_fastpack.cpp, built on demand) does
the scatter+pack in one pass over the nonzeros.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from scldm_tpu.constants import ModelEnum

GENES = ModelEnum.GENES.value
COUNTS = ModelEnum.COUNTS.value
GENES_SUBSET = ModelEnum.GENES_SUBSET.value
COUNTS_SUBSET = ModelEnum.COUNTS_SUBSET.value
LIBRARY_SIZE = ModelEnum.LIBRARY_SIZE.value


def expressed_batch_from_csr(
    data: np.ndarray,  # (nnz,) float32
    indices: np.ndarray,  # (nnz,) column indices
    indptr: np.ndarray,  # (N+1,) local row offsets
    gene_row: np.ndarray,  # (G,) encoded gene-token ids for the file's var_names
    genes_seq_len: int,
    build_dense: bool = True,
) -> Dict[str, np.ndarray]:
    """build_dense=False skips the host-side dense matrix entirely (lean
    transfer mode: the train step densifies on device)."""
    n = len(indptr) - 1
    g = len(gene_row)
    nnz_per_row = np.diff(indptr)
    if (nnz_per_row > genes_seq_len).any():
        raise ValueError("genes_seq_len is smaller than number of expressed genes")

    native = _native() if build_dense else None
    if native is not None:
        counts, genes_sub, counts_sub, library = native(
            data, indices.astype(np.int64), indptr.astype(np.int64),
            gene_row, int(g), int(genes_seq_len),
        )
    else:
        row_rep = np.repeat(np.arange(n, dtype=np.int64), nnz_per_row)
        counts = None
        if build_dense:
            counts = np.zeros((n, g), np.float32)
            counts.ravel()[row_rep * g + indices] = data

        positions = np.arange(len(data), dtype=np.int64) - np.repeat(
            indptr[:-1], nnz_per_row
        )
        genes_sub = np.zeros((n, genes_seq_len), np.int32)  # mask token idx 0
        counts_sub = np.zeros((n, genes_seq_len), np.float32)
        flat = row_rep * genes_seq_len + positions
        genes_sub.ravel()[flat] = gene_row[indices]
        counts_sub.ravel()[flat] = data
        library = np.bincount(row_rep, weights=data, minlength=n).astype(np.float32)

    # int64 to match tokenize_cells' "expressed" output exactly: a dataset
    # mixing CSR and dense shards must emit ONE dtype per key, or every
    # switch silently re-traces the jitted step (and multi-host runs reading
    # differently-encoded files would trace different collective programs)
    out = {
        GENES_SUBSET: genes_sub.astype(np.int64, copy=False),
        COUNTS_SUBSET: counts_sub,
        LIBRARY_SIZE: library.reshape(n, 1),
    }
    if build_dense:
        out[GENES] = np.broadcast_to(gene_row, (n, g))
        out[COUNTS] = counts
    return out


# ---------------------------------------------------------------------------
# optional C++ single-pass kernel
# ---------------------------------------------------------------------------
_NATIVE = None
_NATIVE_TRIED = False


def _native():
    """ctypes handle to the compiled single-pass packer (None -> numpy path)."""
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    try:
        from scldm_tpu.data._fastpack_build import load

        fn = load()

        def call(data, indices, indptr, gene_row, g, seq_len):
            n = len(indptr) - 1
            counts = np.zeros((n, g), np.float32)
            genes_sub = np.zeros((n, seq_len), np.int32)
            counts_sub = np.zeros((n, seq_len), np.float32)
            library = np.zeros(n, np.float32)
            fn(
                data, indices, indptr,
                np.ascontiguousarray(gene_row, np.int64),
                counts, genes_sub, counts_sub, library,
                n, g, seq_len,
            )
            return counts, genes_sub, counts_sub, library

        _NATIVE = call
    except Exception:
        _NATIVE = None
    return _NATIVE
