"""CSR fast-path equivalence: vectorized/native packer == reference-path
tokenize_cells(expressed), plus datamodule integration."""

import json

import numpy as np
import pytest
from scipy import sparse

from scldm_tpu.data.datamodule import DataModule
from scldm_tpu.data.encoder import VocabularyEncoder
from scldm_tpu.data.fastpath import _native, expressed_batch_from_csr
from scldm_tpu.data.h5ad import H5ADFile, write_h5ad
from scldm_tpu.data.tokenize import tokenize_cells


def _csr(rng, n=32, g=50, density=0.2):
    X = sparse.random(
        n, g, density=density, format="csr", random_state=np.random.RandomState(0),
        dtype=np.float32, data_rvs=lambda k: rng.poisson(3.0, k).astype(np.float32) + 1,
    )
    X.sort_indices()
    return X


class _Enc:
    mask_token_idx = 0
    gene_means = None

    def encode_genes(self, tokens):
        return np.arange(1, len(tokens) + 1, dtype=np.int64)


@pytest.fixture
def csr_setup(rng):
    X = _csr(rng)
    enc = _Enc()
    gene_row = enc.encode_genes([f"g{i}" for i in range(X.shape[1])])
    return X, enc, gene_row


def test_fastpath_matches_tokenize(csr_setup):
    X, enc, gene_row = csr_setup
    var = [f"g{i}" for i in range(X.shape[1])]
    want = tokenize_cells(X.toarray(), var, enc, genes_seq_len=30, sample_genes="expressed")
    got = expressed_batch_from_csr(
        X.data, X.indices.astype(np.int64), X.indptr.astype(np.int64), gene_row, 30
    )
    for k in ("genes", "counts", "genes_subset", "counts_subset"):
        np.testing.assert_array_equal(np.asarray(got[k]), want[k], err_msg=k)
    np.testing.assert_allclose(got["library_size"], want["library_size"])


def test_fastpath_overflow_raises(csr_setup):
    X, enc, gene_row = csr_setup
    with pytest.raises(ValueError, match="genes_seq_len is smaller"):
        expressed_batch_from_csr(
            X.data, X.indices.astype(np.int64), X.indptr.astype(np.int64), gene_row, 2
        )


def test_native_packer_matches_numpy(csr_setup):
    """When the C++ kernel builds, it must agree with the numpy path."""
    X, enc, gene_row = csr_setup
    native = _native()
    if native is None:
        pytest.skip("native toolchain unavailable")
    counts, genes_sub, counts_sub, library = native(
        X.data, X.indices.astype(np.int64), X.indptr.astype(np.int64),
        gene_row, X.shape[1], 30,
    )
    np.testing.assert_array_equal(counts, X.toarray())
    want = expressed_batch_from_csr(
        X.data, X.indices.astype(np.int64), X.indptr.astype(np.int64), gene_row, 30
    )
    np.testing.assert_array_equal(genes_sub, want["genes_subset"])
    np.testing.assert_array_equal(counts_sub, want["counts_subset"])
    np.testing.assert_allclose(library.reshape(-1, 1), want["library_size"])


def test_datamodule_csr_fastpath_matches_dense(tmp_path, rng):
    """Batches from a CSR file (fast path) equal batches from the same data
    stored dense (tokenize path)."""
    n, g = 48, 40
    X = _csr(rng, n, g)
    clusters = rng.choice(["a", "b"], size=n)
    write_h5ad(tmp_path / "sparse.h5ad", X, obs={"clusters": clusters},
               var_names=[f"g{i}" for i in range(g)])
    write_h5ad(tmp_path / "dense.h5ad", X.toarray(), obs={"clusters": clusters},
               var_names=[f"g{i}" for i in range(g)], sparse_threshold=1.1)
    payload = {"genes": [f"g{i}" for i in range(g)], "labels": {"clusters": ["a", "b"]}}
    (tmp_path / "meta.json").write_text(json.dumps(payload))
    enc = VocabularyEncoder(class_vocab_sizes={"clusters": 2},
                            metadata_json=str(tmp_path / "meta.json"))

    def batches(name):
        dm = DataModule(
            vocabulary_encoder=enc, train_adata_path=str(tmp_path / name),
            batch_size=16, genes_seq_len=g, sample_genes="expressed",
            prefetch=0, val_as_test=True, shuffle=False,
        )
        dm.setup()
        return list(dm.train_batches(0))

    # confirm storage modes differ as intended
    assert H5ADFile(tmp_path / "sparse.h5ad").is_csr()
    assert not H5ADFile(tmp_path / "dense.h5ad").is_csr()

    for bs, bd in zip(batches("sparse.h5ad"), batches("dense.h5ad")):
        for k in bs:
            np.testing.assert_allclose(np.asarray(bs[k]), np.asarray(bd[k]), err_msg=k)


def test_lean_uint16_wire_format_roundtrips(tmp_path, rng):
    """Lean training batches travel as uint16 (halved host->device traffic);
    widen_lean + densify_expressed recover the exact dense counts."""
    import jax.numpy as jnp

    from scldm_tpu.ops.transforms import densify_expressed, widen_lean

    n, g = 32, 40
    X = _csr(rng, n, g)
    write_h5ad(tmp_path / "sparse.h5ad", X, obs={"clusters": rng.choice(["a", "b"], n)},
               var_names=[f"g{i}" for i in range(g)])
    payload = {"genes": [f"g{i}" for i in range(g)], "labels": {"clusters": ["a", "b"]}}
    (tmp_path / "meta.json").write_text(json.dumps(payload))
    enc = VocabularyEncoder(class_vocab_sizes={"clusters": 2}, n_genes=g,
                            metadata_json=str(tmp_path / "meta.json"))
    dm = DataModule(
        vocabulary_encoder=enc, train_adata_path=str(tmp_path / "sparse.h5ad"),
        batch_size=16, genes_seq_len=g, sample_genes="expressed",
        prefetch=0, val_as_test=True, shuffle=False, dense_transfer=False,
    )
    dm.setup()
    lean = next(iter(dm.train_batches(0)))
    assert lean["genes_subset"].dtype == np.uint16
    assert lean["counts_subset"].dtype == np.uint16
    assert "counts" not in lean

    wide = widen_lean({k: jnp.asarray(v) for k, v in lean.items()})
    assert wide["genes_subset"].dtype == jnp.int32
    assert wide["counts_subset"].dtype == jnp.float32
    dense = densify_expressed(wide["genes_subset"], wide["counts_subset"], g)
    np.testing.assert_allclose(
        np.asarray(dense), X.toarray()[: dense.shape[0]], err_msg="dense roundtrip"
    )
