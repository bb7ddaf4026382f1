"""Per-batch numpy tokenization of count matrices into gene-token sequences.

Parity with reference src/scldm/datamodule.py:652-805 (tokenize_cells): every
sampling strategy, shape contract, and error path. Runs on host (numpy) inside
the input pipeline; the fixed `genes_seq_len` of the "expressed" strategy is
exactly what gives XLA static shapes downstream.

Output dict keys (ModelEnum values):
- genes / counts: full-length gene-id matrix and counts (decoder + loss inputs)
- genes_subset / counts_subset: fixed-length packed expressed tokens (encoder
  inputs) for strategies that produce them
- library_size: per-cell total counts (before any subsetting)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from scldm_tpu.constants import ModelEnum

GENES = ModelEnum.GENES.value
COUNTS = ModelEnum.COUNTS.value
GENES_SUBSET = ModelEnum.GENES_SUBSET.value
COUNTS_SUBSET = ModelEnum.COUNTS_SUBSET.value
LIBRARY_SIZE = ModelEnum.LIBRARY_SIZE.value


def tokenize_cells(
    cell: np.ndarray,
    var_names: Sequence[str],
    encoder,
    genes_seq_len: int,
    sample_genes: str,
    gene_tokens_key: str = GENES,
    counts_key: str = COUNTS,
    seed: Optional[int] = None,
) -> dict:
    counts = cell
    gene_idx = np.tile(encoder.encode_genes(var_names), (len(counts), 1))
    library_size = counts.sum(1, keepdims=True)

    rng = np.random.default_rng(seed=seed)
    N, G = counts.shape

    if sample_genes == "weighted":
        # inverse-mean-scaled sampling without replacement (ref :695-706)
        means = getattr(encoder, "gene_means", None)
        if means is None:
            raise ValueError("encoder.metadata_genes must be set for weighted sampling")
        scaled = (counts + 1) / means
        scaled = scaled / scaled.sum(1, keepdims=True)
        sampled_idx = np.stack(
            [rng.choice(G, size=genes_seq_len, replace=False, p=p) for p in scaled]
        )
        return {
            gene_tokens_key: np.take_along_axis(gene_idx, sampled_idx, axis=1),
            counts_key: np.take_along_axis(counts, sampled_idx, axis=1),
            LIBRARY_SIZE: library_size,
        }

    if sample_genes == "expressed":
        # pack nonzero genes left-aligned into a fixed-length buffer (ref :708-731)
        mask_idx = encoder.mask_token_idx
        expressed = counts > 0
        num_expressed = expressed.sum(axis=1)
        if (num_expressed > genes_seq_len).any():
            raise ValueError("genes_seq_len is smaller than number of expressed genes")

        pos_order = expressed.cumsum(axis=1) - 1
        genes_out = np.full((N, genes_seq_len), mask_idx, dtype=gene_idx.dtype)
        counts_out = np.zeros((N, genes_seq_len), dtype=counts.dtype)
        ii, jj = np.where(expressed)
        pp = pos_order[expressed]
        genes_out[ii, pp] = gene_idx[ii, jj]
        counts_out[ii, pp] = counts[ii, jj]
        return {
            gene_tokens_key: gene_idx,
            counts_key: counts,
            GENES_SUBSET: genes_out,
            COUNTS_SUBSET: counts_out,
            LIBRARY_SIZE: library_size,
        }

    if sample_genes == "expressed_zero":
        # expressed-last stable sort of a random permutation, truncated (ref :733-753)
        expressed = counts > 0
        permuted = np.stack([rng.permutation(G) for _ in range(N)])
        sh_gene = np.take_along_axis(gene_idx, permuted, axis=1)
        sh_counts = np.take_along_axis(counts, permuted, axis=1)
        sh_expr = np.take_along_axis(expressed, permuted, axis=1)
        order = np.argsort(sh_expr.astype(int), axis=1, kind="stable")
        final_gene = np.take_along_axis(sh_gene, order, axis=1)
        final_counts = np.take_along_axis(sh_counts, order, axis=1)
        return {
            gene_tokens_key: gene_idx,
            counts_key: counts,
            GENES_SUBSET: final_gene[:, :genes_seq_len],
            COUNTS_SUBSET: final_counts[:, :genes_seq_len],
            LIBRARY_SIZE: library_size,
        }

    if sample_genes == "random_expressed":
        # sample up to seq_len expressed genes, mask-pad the rest (ref :755-787)
        mask_idx = encoder.mask_token_idx
        nonzero = counts > 0
        sampled_idx = np.stack(
            [
                np.pad(
                    rng.choice(
                        np.nonzero(nonzero[i])[0],
                        size=min(genes_seq_len, nonzero[i].sum()),
                        replace=False,
                    ),
                    (0, max(0, genes_seq_len - nonzero[i].sum())),
                    constant_values=-1,
                )
                for i in range(N)
            ]
        )
        padded = sampled_idx == -1
        safe = np.where(padded, 0, sampled_idx)
        genes_out = np.take_along_axis(gene_idx, safe, axis=1)
        counts_out = np.take_along_axis(counts, safe, axis=1)
        genes_out[padded] = mask_idx
        counts_out[padded] = 0
        return {
            gene_tokens_key: genes_out,
            counts_key: counts_out,
            LIBRARY_SIZE: library_size,
        }

    if sample_genes == "random":
        sampled_idx = np.stack([rng.choice(G, size=genes_seq_len, replace=False) for _ in range(N)])
        return {
            gene_tokens_key: np.take_along_axis(gene_idx, sampled_idx, axis=1),
            counts_key: np.take_along_axis(counts, sampled_idx, axis=1),
            LIBRARY_SIZE: library_size,
        }

    if sample_genes == "none":
        return {
            gene_tokens_key: gene_idx,
            counts_key: counts,
            LIBRARY_SIZE: library_size,
        }

    raise ValueError(f"Invalid sample_genes value: {sample_genes}")
