"""Host-side tokenization of count matrices into gene-token sequences.

Behavioral parity with reference src/scldm/datamodule.py:652-805
(tokenize_cells): same strategy names, output-shape contracts, and error
paths — but implemented as a registry of fully vectorized strategies with no
per-row Python loops. Sampling without replacement is done with key-sorting
tricks instead of sequential draws:

- uniform subsets / permutations: argsort of an iid uniform key matrix;
- weighted sampling (``weighted``): the exponential-race construction
  (keys Exp(1)/p_i; the k smallest keys are a without-replacement sample
  ordered exactly like sequential draws from p);
- ``random_expressed``: uniform keys on expressed genes, +inf elsewhere, so
  one argsort yields the sample AND the padding positions;
- ``expressed`` packing: one flat scatter over the nonzeros (same scheme as
  the CSR fast path in data/fastpath.py, here from a dense block).

The fixed ``genes_seq_len`` output is what gives XLA static shapes downstream.

Output dict keys (ModelEnum values):
- genes / counts: full-length gene-id matrix and counts (decoder + loss)
- genes_subset / counts_subset: fixed-length packed expressed tokens
  (encoder inputs) for strategies that produce them
- library_size: per-cell total counts (before any subsetting)
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import numpy as np

from scldm_tpu.constants import ModelEnum

GENES = ModelEnum.GENES.value
COUNTS = ModelEnum.COUNTS.value
GENES_SUBSET = ModelEnum.GENES_SUBSET.value
COUNTS_SUBSET = ModelEnum.COUNTS_SUBSET.value
LIBRARY_SIZE = ModelEnum.LIBRARY_SIZE.value

# each strategy: (ctx) -> output dict; registered at definition site
_STRATEGIES: Dict[str, Callable] = {}


def _strategy(name: str):
    def register(fn):
        _STRATEGIES[name] = fn
        return fn

    return register


class _Ctx:
    """Shared per-call state so strategies stay small pure-ish functions."""

    __slots__ = ("counts", "gene_row", "seq_len", "rng", "encoder", "gk", "ck")

    def __init__(self, counts, gene_row, seq_len, rng, encoder, gk, ck):
        self.counts = counts
        self.gene_row = gene_row  # (G,) encoded token ids for var_names
        self.seq_len = seq_len
        self.rng = rng
        self.encoder = encoder
        self.gk = gk  # output key for gene tokens
        self.ck = ck  # output key for counts

    @property
    def shape(self):
        return self.counts.shape

    def gene_matrix(self) -> np.ndarray:
        """(N, G) token-id view — broadcast, never materialized per row."""
        n = self.counts.shape[0]
        return np.broadcast_to(self.gene_row, (n, len(self.gene_row)))

    def library(self) -> np.ndarray:
        return self.counts.sum(1, keepdims=True)

    def gather(self, idx: np.ndarray):
        """Select (gene_tokens, counts) at per-row column indices idx."""
        rows = np.arange(idx.shape[0])[:, None]
        return self.gene_row[idx], self.counts[rows, idx]


def _uniform_keys(ctx: _Ctx) -> np.ndarray:
    n, g = ctx.shape
    return ctx.rng.random((n, g))


@_strategy("none")
def _none(ctx: _Ctx) -> dict:
    return {ctx.gk: ctx.gene_matrix(), ctx.ck: ctx.counts, LIBRARY_SIZE: ctx.library()}


@_strategy("random")
def _random(ctx: _Ctx) -> dict:
    # a uniform without-replacement subset in uniform order == the first
    # seq_len columns of a random permutation == argsort of iid uniform keys
    idx = np.argsort(_uniform_keys(ctx), axis=1)[:, : ctx.seq_len]
    genes, counts = ctx.gather(idx)
    return {ctx.gk: genes, ctx.ck: counts, LIBRARY_SIZE: ctx.library()}


@_strategy("weighted")
def _weighted(ctx: _Ctx) -> dict:
    means = getattr(ctx.encoder, "gene_means", None)
    if means is None:
        raise ValueError("encoder.metadata_genes must be set for weighted sampling")
    # gene_means is stored in VOCABULARY order while ctx.counts columns follow
    # the file's var order — align through the encoded gene row (token id =
    # vocab index + 1). The reference divides unaligned
    # (datamodule.py:695-700), which is only correct when the file order
    # matches the metadata; this is the order-independent generalization
    # (identical result when they match). Unknown genes (mask id 0) get inf
    # mean -> sampled last; zero means guard the division.
    means = np.asarray(means, np.float64)
    aligned = np.where(
        ctx.gene_row > 0,
        np.maximum(means[np.clip(ctx.gene_row - 1, 0, len(means) - 1)], 1e-12),
        np.inf,
    )
    # inverse-mean scaling (reference datamodule.py:695-700), then the
    # exponential race: gene i "rings" at Exp(1)/p_i; taking ring order gives
    # a without-replacement sample distributed like sequential draws from p
    p = (ctx.counts + 1) / aligned
    keys = ctx.rng.exponential(size=ctx.shape) / p  # p need not be normalized
    idx = np.argsort(keys, axis=1)[:, : ctx.seq_len]
    genes, counts = ctx.gather(idx)
    return {ctx.gk: genes, ctx.ck: counts, LIBRARY_SIZE: ctx.library()}


@_strategy("expressed")
def _expressed(ctx: _Ctx) -> dict:
    # left-pack nonzero genes into a fixed buffer via one flat scatter
    # (dense-input analog of fastpath.expressed_batch_from_csr)
    n, _ = ctx.shape
    mask_idx = ctx.encoder.mask_token_idx
    rows, cols = np.nonzero(ctx.counts)
    nnz = np.bincount(rows, minlength=n)
    if nnz.max(initial=0) > ctx.seq_len:
        raise ValueError("genes_seq_len is smaller than number of expressed genes")
    # slot of each nonzero within its row = global rank − row start
    starts = np.concatenate(([0], np.cumsum(nnz)[:-1]))
    slots = np.arange(len(rows)) - starts[rows]

    genes_sub = np.full((n, ctx.seq_len), mask_idx, dtype=ctx.gene_row.dtype)
    counts_sub = np.zeros((n, ctx.seq_len), dtype=ctx.counts.dtype)
    flat = rows * ctx.seq_len + slots
    genes_sub.ravel()[flat] = ctx.gene_row[cols]
    counts_sub.ravel()[flat] = ctx.counts[rows, cols]
    return {
        ctx.gk: ctx.gene_matrix(),
        ctx.ck: ctx.counts,
        GENES_SUBSET: genes_sub,
        COUNTS_SUBSET: counts_sub,
        LIBRARY_SIZE: ctx.library(),
    }


@_strategy("expressed_zero")
def _expressed_zero(ctx: _Ctx) -> dict:
    # reference (datamodule.py:733-753): random permutation, then a stable
    # sort by expressed ascending, truncated — i.e. order by the composite
    # key (expressed, uniform). One argsort of expressed + U(0,1) is the
    # same distribution: non-expressed genes first, uniform order per group.
    expressed = ctx.counts > 0
    order = np.argsort(expressed + _uniform_keys(ctx), axis=1)[:, : ctx.seq_len]
    genes, counts = ctx.gather(order)
    return {
        ctx.gk: ctx.gene_matrix(),
        ctx.ck: ctx.counts,
        GENES_SUBSET: genes,
        COUNTS_SUBSET: counts,
        LIBRARY_SIZE: ctx.library(),
    }


@_strategy("random_expressed")
def _random_expressed(ctx: _Ctx) -> dict:
    # up to seq_len expressed genes per row, uniform order, mask-padded:
    # uniform keys on expressed genes, +inf elsewhere — a single argsort
    # yields both the sample and (via per-row nnz) the padding boundary
    mask_idx = ctx.encoder.mask_token_idx
    expressed = ctx.counts > 0
    keys = np.where(expressed, _uniform_keys(ctx), np.inf)
    idx = np.argsort(keys, axis=1)[:, : ctx.seq_len]
    genes, counts = ctx.gather(idx)
    pad = np.arange(ctx.seq_len) >= expressed.sum(1, keepdims=True)
    genes[pad] = mask_idx
    counts[pad] = 0
    return {ctx.gk: genes, ctx.ck: counts, LIBRARY_SIZE: ctx.library()}


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
    strategy = _STRATEGIES.get(sample_genes)
    if strategy is None:
        raise ValueError(f"Invalid sample_genes value: {sample_genes}")
    ctx = _Ctx(
        counts=cell,
        gene_row=encoder.encode_genes(var_names),
        seq_len=genes_seq_len,
        rng=np.random.default_rng(seed=seed),
        encoder=encoder,
        gk=gene_tokens_key,
        ck=counts_key,
    )
    return strategy(ctx)
