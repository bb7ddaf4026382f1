"""Count-injection transforms for the input embedding.

Parity with the stateless members of the reference PROJ_FUNC registry
(src/scldm/layers.py:28-88). The learned projections ("proj", "projconcat",
"softbin") are Flax modules in scldm_tpu.nn.layers; the registry here maps the
stateless names to pure functions of (gene_embeddings, counts).

All transforms take ``genes`` of shape (..., S, E) and ``counts`` of shape
(..., S, 1) and return (..., S, E).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log1p_transform(genes: jax.Array, counts: jax.Array) -> jax.Array:
    """genes * log1p(counts)  (reference layers.py:28-31)."""
    return genes * jnp.log1p(counts)


def log1p_zero_transform(genes: jax.Array, counts: jax.Array) -> jax.Array:
    """log1p with zeros encoded as -1 (reference layers.py:28-31, zero_encoding)."""
    return genes * jnp.where(counts == 0, -1.0, jnp.log1p(counts))


def anscombe_transform(genes: jax.Array, counts: jax.Array) -> jax.Array:
    """genes * asinh(sqrt(counts + 1))  (reference layers.py:34-37)."""
    return genes * jnp.arcsinh(jnp.sqrt(counts + 1.0))


def sqrt_transform(genes: jax.Array, counts: jax.Array) -> jax.Array:
    """genes * sqrt(counts + 1)  (reference layers.py:40-42)."""
    return genes * jnp.sqrt(counts + 1.0)


COUNT_TRANSFORMS = {
    "log1p": log1p_transform,
    "log1pzero": log1p_zero_transform,
    "anscombe": anscombe_transform,
    "sqrt": sqrt_transform,
}

#: agg_func names that require learned parameters (handled by nn.layers).
LEARNED_TRANSFORMS = ("proj", "projconcat", "softbin")


def widen_lean(batch: dict) -> dict:
    """Re-widen the uint16 wire format on device (data/datamodule._make_lean):
    gene-token ids -> int32, counts / library size -> float32. No-op for
    batches already carrying wide dtypes."""
    out = dict(batch)
    for key in ("genes_subset", "genes"):
        v = out.get(key)
        if v is not None and v.dtype not in (jnp.int32, jnp.int64):
            out[key] = v.astype(jnp.int32)
    for key in ("counts_subset", "counts", "library_size"):
        v = out.get(key)
        if v is not None and v.dtype != jnp.float32:
            out[key] = v.astype(jnp.float32)
    return out


def densify_expressed(
    genes_subset: jax.Array,  # (B, S) gene-token ids, 0 = <MASK> padding
    counts_subset: jax.Array,  # (B, S)
    n_genes: int,
    batch_chunk: int = 128,
) -> jax.Array:
    """Reconstruct the dense (B, n_genes) count matrix on device.

    The "expressed" tokenization captures every nonzero (tokenize.py), so the
    dense matrix is exactly recoverable by scattering — which means the host
    never needs to transfer the (mostly-zero) dense counts at all (~10x less
    host->device traffic at single-cell sparsity).

    The scatter dispatches over <=128-row slices above that batch: XLA's
    monolithic 2-D scatter goes superlinear at B>128 while per-chunk scatters
    keep the B=128 rate (measured, benchmarks/bench_gather.py densify_*:
    16.9 -> 13.9 ms at B=256, 32.9 -> 26.3 ms at B=512, dentate shapes).
    """
    b, s = genes_subset.shape

    def _scatter(genes, cnts):
        cols = jnp.clip(genes.astype(jnp.int32) - 1, 0, n_genes - 1)
        vals = jnp.where(genes > 0, cnts, 0.0)
        rows = jnp.broadcast_to(
            jnp.arange(genes.shape[0], dtype=jnp.int32)[:, None], genes.shape
        )
        dense = jnp.zeros((genes.shape[0], n_genes), cnts.dtype)
        return dense.at[rows, cols].add(vals)

    if b <= batch_chunk:
        return _scatter(genes_subset, counts_subset)
    return jnp.concatenate(
        [
            _scatter(genes_subset[lo : lo + batch_chunk],
                     counts_subset[lo : lo + batch_chunk])
            for lo in range(0, b, batch_chunk)
        ],
        axis=0,
    )


def full_gene_row(batch: int, n_genes: int) -> jax.Array:
    """(B, n_genes) gene-token ids 1..n_genes — the constant decoder queries."""
    return jnp.broadcast_to(jnp.arange(1, n_genes + 1, dtype=jnp.int32), (batch, n_genes))


def canonical_gene_ids(n_genes: int) -> jax.Array:
    """(n_genes,) gene-token ids 1..n_genes — the batch-shared decoder queries.

    1-D genes signal the batch-free decoder path: the gene-embedding gather,
    query LayerNorm, and q-projection run once per step instead of per batch
    element, and their backward is a dense reduction instead of a scatter-add
    over B×G indices.
    """
    return jnp.arange(1, n_genes + 1, dtype=jnp.int32)


def log1p_cpm(counts: jax.Array, library_size: jax.Array | None = None) -> jax.Array:
    """log1p(counts / library * 10_000) — the scaling used throughout the
    reference validation metrics (models.py:240,321-322,899-900).

    An all-zero row (possible for NB-sampled counts or after gene subsetting)
    has library 0; guard the division so it maps to zeros, not NaN."""
    if library_size is None:
        library_size = counts.sum(axis=-1, keepdims=True)
    return jnp.log1p(counts / jnp.maximum(library_size, 1e-8) * 10_000.0)
