"""Data pipeline tests: h5ad I/O, vocabulary encoder, tokenizer strategies,
datamodule iteration (mirrors reference tests/test_tokenize.py +
test_encoder_metadata.py coverage, extended with the h5ad/file layers the
reference delegated to anndata/cellarium)."""

import json

import numpy as np
import pytest
from scipy import sparse

from scldm_tpu.data.datamodule import DataModule, train_val_split_list
from scldm_tpu.data.encoder import VocabularyEncoder
from scldm_tpu.data.h5ad import H5ADFile, write_h5ad
from scldm_tpu.data.tokenize import tokenize_cells


class MockEncoder:
    """Same fake the reference uses (tests/test_tokenize.py:11-23)."""

    mask_token_idx = 0
    gene_means = None

    def encode_genes(self, tokens):
        return np.arange(1, len(tokens) + 1, dtype=np.int64)


@pytest.fixture
def counts(rng):
    c = rng.poisson(1.0, size=(8, 30)).astype(np.float32)
    c[0] = 0.0  # a fully-zero cell
    return c


VAR = [f"gene_{i}" for i in range(30)]


# ---------------------------------------------------------------------------
# tokenize_cells
# ---------------------------------------------------------------------------
class TestTokenize:
    def test_expressed_shapes_and_invariants(self, counts):
        enc = MockEncoder()
        out = tokenize_cells(counts, VAR, enc, genes_seq_len=30, sample_genes="expressed")
        assert out["genes"].shape == (8, 30)
        assert out["counts"].shape == (8, 30)
        assert out["genes_subset"].shape == (8, 30)
        assert out["counts_subset"].shape == (8, 30)
        np.testing.assert_allclose(out["library_size"][:, 0], counts.sum(1))
        # packing: nonzero counts preserved, left-aligned, mask-padded
        for i in range(8):
            nz = counts[i][counts[i] > 0]
            np.testing.assert_allclose(out["counts_subset"][i, : len(nz)], nz)
            assert (out["counts_subset"][i, len(nz):] == 0).all()
            assert (out["genes_subset"][i, len(nz):] == 0).all()  # mask idx 0
        # per-token subset library equals full library
        np.testing.assert_allclose(out["counts_subset"].sum(1), counts.sum(1))

    def test_expressed_overflow_errors(self, counts):
        counts[1] = 1.0  # 30 expressed genes
        with pytest.raises(ValueError, match="genes_seq_len is smaller"):
            tokenize_cells(counts, VAR, MockEncoder(), genes_seq_len=5, sample_genes="expressed")

    def test_expressed_zero_counts_preserved(self, counts):
        out = tokenize_cells(
            counts, VAR, MockEncoder(), genes_seq_len=10, sample_genes="expressed_zero"
        )
        assert out["genes_subset"].shape == (8, 10)
        # expressed-last stable ordering: prefix is zeros when there are more
        # zeros than seq_len (reference :733-753 semantics)
        assert out["counts_subset"].dtype == counts.dtype

    def test_random_shapes(self, counts):
        out = tokenize_cells(counts, VAR, MockEncoder(), genes_seq_len=12, sample_genes="random")
        assert out["genes"].shape == (8, 12)
        assert out["counts"].shape == (8, 12)
        assert "genes_subset" not in out

    def test_random_expressed(self, counts):
        out = tokenize_cells(
            counts, VAR, MockEncoder(), genes_seq_len=12, sample_genes="random_expressed"
        )
        assert out["genes"].shape == (8, 12)
        # zero cell -> fully padded row
        assert (out["genes"][0] == 0).all()
        assert (out["counts"][0] == 0).all()

    def test_none_passthrough(self, counts):
        out = tokenize_cells(counts, VAR, MockEncoder(), genes_seq_len=5, sample_genes="none")
        np.testing.assert_allclose(out["counts"], counts)

    def test_weighted_requires_means(self, counts):
        with pytest.raises(ValueError, match="metadata_genes"):
            tokenize_cells(counts, VAR, MockEncoder(), genes_seq_len=5, sample_genes="weighted")

    def test_weighted_with_means(self, counts):
        enc = MockEncoder()
        enc.gene_means = np.ones(30)
        out = tokenize_cells(counts, VAR, enc, genes_seq_len=12, sample_genes="weighted")
        assert out["counts"].shape == (8, 12)

    def test_invalid_strategy(self, counts):
        with pytest.raises(ValueError, match="Invalid sample_genes"):
            tokenize_cells(counts, VAR, MockEncoder(), genes_seq_len=5, sample_genes="bogus")

    def test_weighted_first_draw_matches_probabilities(self):
        """The exponential-race construction must draw gene i first with
        probability p_i (reference rng.choice(..., p) sequential semantics,
        datamodule.py:695-706). One cell, strongly skewed weights."""
        enc = MockEncoder()
        enc.gene_means = np.ones(4)
        counts = np.array([[9.0, 0.0, 0.0, 0.0]])  # p = (10, 1, 1, 1)/13
        hits = np.zeros(4)
        for seed in range(2000):
            out = tokenize_cells(
                counts, [f"g{i}" for i in range(4)], enc,
                genes_seq_len=2, sample_genes="weighted", seed=seed,
            )
            hits[out["genes"][0, 0] - 1] += 1  # MockEncoder ids are 1..G
        freq = hits / hits.sum()
        expected = np.array([10, 1, 1, 1]) / 13
        assert np.abs(freq - expected).max() < 0.04

    def test_expressed_zero_prefers_nonexpressed(self):
        """Reference stable-sorts expressed genes LAST before truncation
        (datamodule.py:741-745) — with enough zeros, the subset is all-zero."""
        counts = np.zeros((2, 30), np.float32)
        counts[:, :3] = 5.0
        out = tokenize_cells(
            counts, VAR, MockEncoder(), genes_seq_len=20, sample_genes="expressed_zero", seed=0
        )
        assert (out["counts_subset"] == 0).all()

    def test_random_expressed_padding_boundary(self):
        """Rows with fewer expressed genes than seq_len mask-pad the tail."""
        counts = np.zeros((1, 30), np.float32)
        counts[0, [2, 7, 11]] = 4.0
        out = tokenize_cells(
            counts, VAR, MockEncoder(), genes_seq_len=12, sample_genes="random_expressed", seed=1
        )
        assert (out["counts"][0, :3] > 0).all()
        assert (out["counts"][0, 3:] == 0).all()
        assert (out["genes"][0, 3:] == MockEncoder().mask_token_idx).all()

    @pytest.mark.parametrize("n", [1, 3, 8])
    def test_batch_size_sweep(self, counts, n):
        out = tokenize_cells(
            counts[:n], VAR, MockEncoder(), genes_seq_len=30, sample_genes="expressed"
        )
        assert out["counts"].shape[0] == n


# ---------------------------------------------------------------------------
# h5ad roundtrip
# ---------------------------------------------------------------------------
class TestH5AD:
    def _roundtrip(self, tmp_path, X, **kw):
        path = tmp_path / "t.h5ad"
        write_h5ad(path, X, **kw)
        return H5ADFile(path)

    def test_dense_roundtrip(self, tmp_path, rng):
        X = rng.random((10, 6)).astype(np.float32)  # dense (few zeros)
        f = self._roundtrip(tmp_path, X, var_names=[f"g{i}" for i in range(6)])
        assert f.n_obs == 10 and f.n_vars == 6
        np.testing.assert_allclose(f.rows(np.arange(10)), X, rtol=1e-6)
        np.testing.assert_allclose(f.rows(np.array([7, 2, 2])), X[[7, 2, 2]], rtol=1e-6)
        assert list(f.var_names) == [f"g{i}" for i in range(6)]

    def test_sparse_roundtrip(self, tmp_path, rng):
        X = rng.poisson(0.3, size=(20, 15)).astype(np.float32)
        f = self._roundtrip(tmp_path, X)
        np.testing.assert_allclose(f.rows(slice(0, 20)), X)
        np.testing.assert_allclose(f.rows(np.array([5, 1])), X[[5, 1]])

    def test_csr_input(self, tmp_path, rng):
        X = sparse.random(12, 9, density=0.3, format="csr", random_state=0, dtype=np.float32)
        f = self._roundtrip(tmp_path, X)
        np.testing.assert_allclose(f.rows(slice(0, 12)), X.toarray(), rtol=1e-6)

    def test_obs_categorical(self, tmp_path, rng):
        X = rng.poisson(1.0, size=(6, 4)).astype(np.float32)
        obs = {"cluster": np.array(["a", "b", "a", "c", "b", "a"])}
        f = self._roundtrip(tmp_path, X, obs=obs)
        np.testing.assert_array_equal(f.obs_column("cluster"), obs["cluster"])
        assert f.obs_categories("cluster") == ["a", "b", "c"]
        np.testing.assert_array_equal(
            f.obs_column("cluster", np.array([3, 0])), ["c", "a"]
        )

    def test_obsm_layers(self, tmp_path, rng):
        X = rng.poisson(1.0, size=(5, 4)).astype(np.float32)
        z = rng.random((5, 3)).astype(np.float32)
        path = tmp_path / "t.h5ad"
        write_h5ad(path, X, obsm={"z": z}, layers={"X_counts": X * 2})
        f = H5ADFile(path)
        np.testing.assert_allclose(f.rows(slice(0, 5), "layers", "X_counts"), X * 2)


# ---------------------------------------------------------------------------
# VocabularyEncoder
# ---------------------------------------------------------------------------
class TestEncoder:
    def _metadata_json(self, tmp_path):
        payload = {
            "genes": [f"g{i}" for i in range(10)],
            "labels": {"clusters": ["c0", "c1", "c2"]},
        }
        p = tmp_path / "meta.json"
        p.write_text(json.dumps(payload))
        return p

    def test_roundtrip_from_metadata(self, tmp_path):
        enc = VocabularyEncoder(
            class_vocab_sizes={"clusters": 3}, metadata_json=str(self._metadata_json(tmp_path))
        )
        assert enc.n_genes == 10
        idx = enc.encode_genes(["g0", "g3", "nope"])
        np.testing.assert_array_equal(idx, [1, 4, 0])  # unknown -> mask 0
        np.testing.assert_array_equal(enc.decode_genes([1, 4]), ["g0", "g3"])
        np.testing.assert_array_equal(enc.encode_metadata(["c1", "c0"], "clusters"), [1, 0])
        np.testing.assert_array_equal(enc.decode_metadata([2], "clusters"), ["c2"])

    def test_from_h5ad(self, tmp_path, rng):
        X = rng.poisson(1.0, size=(6, 4)).astype(np.float32)
        write_h5ad(
            tmp_path / "d.h5ad",
            X,
            obs={"ct": np.array(["x", "y", "x", "y", "x", "y"])},
            var_names=["a", "b", "c", "d"],
        )
        enc = VocabularyEncoder(
            adata_path=str(tmp_path / "d.h5ad"), class_vocab_sizes={"ct": 2}
        )
        assert enc.n_genes == 4
        assert enc.labels["ct"] == ["x", "y"]

    def test_size_factor_stats_json(self, tmp_path):
        mu = {"clusters": {"c0": 8.1, "c1": 8.5, "c2": 9.0}}
        sd = {"clusters": {"c0": 0.3, "c1": 0.4, "c2": 0.2}}
        (tmp_path / "mu.json").write_text(json.dumps(mu))
        (tmp_path / "sd.json").write_text(json.dumps(sd))
        enc = VocabularyEncoder(
            class_vocab_sizes={"clusters": 3},
            metadata_json=str(self._metadata_json(tmp_path)),
            mu_size_factor=str(tmp_path / "mu.json"),
            sd_size_factor=str(tmp_path / "sd.json"),
        )
        assert enc.mu_size_factor["clusters"][0] == 8.1  # keyed by class idx
        assert enc.sd_size_factor["clusters"][2] == 0.2

    def test_joint_size_factor_stats(self, tmp_path):
        payload = {
            "genes": ["g0", "g1"],
            "labels": {"cell_type": ["t0", "t1"], "cytokine": ["k0", "k1"]},
        }
        (tmp_path / "meta.json").write_text(json.dumps(payload))
        mu = {"cell_type_cytokine": {"t0_k0": 8.0, "t1_k1": 9.0}}
        (tmp_path / "mu.json").write_text(json.dumps(mu))
        enc = VocabularyEncoder(
            class_vocab_sizes={"cell_type": 2, "cytokine": 2},
            metadata_json=str(tmp_path / "meta.json"),
            condition_strategy="joint",
            mu_size_factor=str(tmp_path / "mu.json"),
        )
        assert enc.joint_key == "cell_type_cytokine"
        assert enc.joint_idx_2_classes["0_0"] == "t0_k0"
        assert enc.joint_idx_2_classes["1_1"] == "t1_k1"


# ---------------------------------------------------------------------------
# DataModule
# ---------------------------------------------------------------------------
def _write_dataset(tmp_path, rng, n=64, g=20, name="train.h5ad"):
    X = rng.poisson(1.0, size=(n, g)).astype(np.float32)
    X[X > 0] += 1  # ensure no count==0 ambiguity
    clusters = rng.choice(["c0", "c1", "c2"], size=n)
    write_h5ad(
        tmp_path / name, X, obs={"clusters": clusters}, var_names=[f"g{i}" for i in range(g)]
    )
    payload = {"genes": [f"g{i}" for i in range(g)], "labels": {"clusters": ["c0", "c1", "c2"]}}
    (tmp_path / "meta.json").write_text(json.dumps(payload))
    return X


class TestDataModule:
    def _dm(self, tmp_path, **kw):
        enc = VocabularyEncoder(
            class_vocab_sizes={"clusters": 3}, metadata_json=str(tmp_path / "meta.json")
        )
        defaults = dict(
            vocabulary_encoder=enc,
            train_adata_path=str(tmp_path / "train.h5ad"),
            batch_size=16,
            test_batch_size=16,
            genes_seq_len=20,
            sample_genes="expressed",
            prefetch=0,
        )
        defaults.update(kw)
        dm = DataModule(**defaults)
        dm.setup()
        return dm

    def test_batch_contract(self, tmp_path, rng):
        _write_dataset(tmp_path, rng)
        dm = self._dm(tmp_path)
        batch = next(iter(dm.train_batches(0)))
        assert batch["counts"].shape == (16, 20)
        assert batch["genes"].shape == (16, 20)
        assert batch["genes_subset"].shape == (16, 20)
        assert batch["library_size"].shape == (16, 1)
        assert batch["clusters"].shape == (16,)
        assert batch["clusters"].dtype == np.int64
        assert set(np.unique(batch["clusters"])) <= {0, 1, 2}

    def test_train_val_split(self, tmp_path, rng):
        _write_dataset(tmp_path, rng, n=100)
        dm = self._dm(tmp_path, test_batch_size=8)
        n_train = sum(b["counts"].shape[0] for b in dm.train_batches(0))
        n_val = sum(b["counts"].shape[0] for b in dm.val_batches())
        assert n_train == 80  # 90 train cells -> 5 full batches of 16
        assert n_val == 8  # 10 val cells -> 1 full batch of 8

    def test_epoch_reshuffle_deterministic(self, tmp_path, rng):
        _write_dataset(tmp_path, rng, n=96)
        dm = self._dm(tmp_path)
        a1 = [b["library_size"].sum() for b in dm.train_batches(0)]
        a2 = [b["library_size"].sum() for b in dm.train_batches(0)]
        b1 = [b["library_size"].sum() for b in dm.train_batches(1)]
        assert a1 == a2  # same epoch -> same order
        assert set(np.round(a1, 3)) == set(np.round(b1, 3))  # same batches...
        # (with contiguous-block batching the batch contents are stable; only
        #  the order changes across epochs)

    def test_skip_fast_forward_bit_identical(self, tmp_path, rng):
        """train_batches(epoch, skip=k) == full epoch stream[k:] exactly —
        the mid-epoch-resume contract (per-spec seeding, index-slice skip)."""
        _write_dataset(tmp_path, rng, n=96)
        dm = self._dm(tmp_path)
        full = list(dm.train_batches(2))
        tail = list(dm.train_batches(2, skip=3))
        assert len(tail) == len(full) - 3
        for a, b in zip(full[3:], tail):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])
        # skip everything -> empty stream; skip=0 -> identity
        assert list(dm.train_batches(2, skip=len(full))) == []

    def test_host_partitioning_disjoint_and_complete(self, tmp_path, rng):
        _write_dataset(tmp_path, rng, n=128)
        sums = []
        for h in range(4):
            dm = self._dm(tmp_path, num_hosts=4, host_index=h, val_as_test=True)
            sums.extend(round(float(b["library_size"].sum()), 3) for b in dm.train_batches(0))
        dm_all = self._dm(tmp_path, val_as_test=True)
        all_sums = [round(float(b["library_size"].sum()), 3) for b in dm_all.train_batches(0)]
        assert sorted(sums) == sorted(all_sums)

    def test_sharded_directory(self, tmp_path, rng):
        shard_dir = tmp_path / "shards"
        shard_dir.mkdir()
        for i in range(12):
            _write_dataset(shard_dir, rng, n=32, name=f"adata_{i}.h5ad")
        (shard_dir / "metadata.json").write_text(
            json.dumps({"n_cells": 384, "shard_size": 32, "last_shard_size": 32})
        )
        (tmp_path / "meta.json").write_text((shard_dir / "meta.json").read_text())
        dm = self._dm(tmp_path, train_adata_path=str(shard_dir), batch_size=32)
        # n_cells is the TRAIN-split size (11 of 12 shards), NOT the metadata
        # total: compute_max_steps(n_cells) must match what the train stream
        # can actually deliver per epoch — the HLCA atlas rehearsal (round 5)
        # caught the metadata-total shortcut overshooting max_steps by a full
        # val split of steps, so the LR decay never completed
        assert dm.n_cells == 352
        n_train_batches = len(list(dm.train_batches(0)))
        n_val_batches = len(list(dm.val_batches()))
        assert n_train_batches == 11  # 12 shards, 1 val shard
        assert n_val_batches == 2  # 1 shard of 32 at test_batch_size 16
        assert dm.n_cells == 32 * n_train_batches

    def test_prefetch_thread_matches_sync(self, tmp_path, rng):
        _write_dataset(tmp_path, rng, n=64)
        dm_sync = self._dm(tmp_path, prefetch=0)
        dm_pre = self._dm(tmp_path, prefetch=2)
        s = [b["counts"].sum() for b in dm_sync.train_batches(0)]
        p = [b["counts"].sum() for b in dm_pre.train_batches(0)]
        np.testing.assert_allclose(s, p)

    def test_worker_pool_bit_identical_to_sync(self, tmp_path, rng):
        """workers>1 assembles batches concurrently but must reproduce the
        workers=1 stream exactly: same order, same bytes (per-spec seeding,
        order-preserving future window)."""
        _write_dataset(tmp_path, rng, n=96)
        dm_sync = self._dm(tmp_path, prefetch=0)
        dm_pool = self._dm(tmp_path, prefetch=2, workers=4)
        for epoch in (0, 1):
            sync_batches = list(dm_sync.train_batches(epoch))
            pool_batches = list(dm_pool.train_batches(epoch))
            assert len(sync_batches) == len(pool_batches)
            for a, b in zip(sync_batches, pool_batches):
                assert set(a) == set(b)
                for k in a:
                    np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def test_worker_pool_random_strategy_stays_deterministic(self, tmp_path, rng):
        """The seeded "random" tokenizer strategy must give the same draw no
        matter which thread materializes the batch."""
        _write_dataset(tmp_path, rng, n=64)
        dm_sync = self._dm(tmp_path, prefetch=0, sample_genes="random", genes_seq_len=10)
        dm_pool = self._dm(tmp_path, prefetch=2, workers=3, sample_genes="random",
                           genes_seq_len=10)
        for a, b in zip(dm_sync.train_batches(0), dm_pool.train_batches(0)):
            np.testing.assert_array_equal(a["genes"], b["genes"])
            np.testing.assert_array_equal(a["counts"], b["counts"])

    def test_worker_pool_propagates_errors(self, tmp_path, rng):
        _write_dataset(tmp_path, rng, n=64)
        dm = self._dm(tmp_path, prefetch=2, workers=3)
        dm.genes_seq_len = -1  # poison: tokenizer must raise inside a worker
        with pytest.raises(Exception):
            list(dm.train_batches(0))


def test_train_val_split_list_semantics():
    files = [f"f{i}" for i in range(20)]
    tr, va = train_val_split_list(files, seed=0)
    assert len(set(tr) & set(va)) == 0
    assert len(tr) + len(va) == 20
    assert all(i >= 10 for i in range(10, 20) if i in tr)  # 2nd half always train
    assert all(v < 10 for v in va)  # val only from first half


def test_adata_inference_gene_filtering(tmp_path, rng):
    """External inference AnnData with extra unknown genes gets filtered to the
    vocabulary (reference datamodule.py:116-128)."""
    # vocab covers g0..g19; external file has g0..g19 plus 10 unknown genes
    payload = {"genes": [f"g{i}" for i in range(20)], "labels": {"clusters": ["a", "b"]}}
    (tmp_path / "meta.json").write_text(json.dumps(payload))
    enc = VocabularyEncoder(class_vocab_sizes={"clusters": 2},
                            metadata_json=str(tmp_path / "meta.json"))

    ext_vars = [f"g{i}" for i in range(20)] + [f"unknown_{i}" for i in range(10)]
    X = rng.poisson(2.0, size=(16, 30)).astype(np.float32) + 1
    write_h5ad(tmp_path / "ext.h5ad", X, var_names=ext_vars,
               obs={"clusters": rng.choice(["a", "b"], 16)})

    dm = DataModule(
        vocabulary_encoder=enc, train_adata_path=None, allow_missing_train=True,
        batch_size=8, test_batch_size=8, genes_seq_len=20,
        sample_genes="expressed", prefetch=0,
    )
    dm.adata_inference = str(tmp_path / "ext.h5ad")
    dm.setup("predict")
    batch = next(iter(dm.predict_batches()))
    assert batch["counts"].shape == (8, 20)  # unknown columns dropped
    assert batch["genes"].shape == (8, 20)
    assert (batch["genes"] >= 1).all() and (batch["genes"] <= 20).all()
    # library size computed over the KEPT genes only
    np.testing.assert_allclose(batch["library_size"][:, 0], batch["counts"].sum(1))


def test_adata_inference_condition_columns(tmp_path, rng):
    """External-AnnData predict batches: a PRESENT condition column rides
    along encoded; a present column with categories outside the training
    vocabulary fails loudly; an ABSENT column is tolerated (unconditional).
    Guards the failure mode where a blanket KeyError handler silently
    degraded conditional generation to unconditional."""
    payload = {"genes": [f"g{i}" for i in range(20)], "labels": {"clusters": ["a", "b"]}}
    (tmp_path / "meta.json").write_text(json.dumps(payload))
    enc = VocabularyEncoder(class_vocab_sizes={"clusters": 2},
                            metadata_json=str(tmp_path / "meta.json"))

    def make_dm(fname):
        dm = DataModule(
            vocabulary_encoder=enc, train_adata_path=None, allow_missing_train=True,
            batch_size=8, test_batch_size=8, genes_seq_len=20,
            sample_genes="expressed", prefetch=0,
        )
        dm.adata_inference = str(tmp_path / fname)
        dm.setup("predict")
        return dm

    X = rng.poisson(2.0, size=(16, 20)).astype(np.float32) + 1
    gvars = [f"g{i}" for i in range(20)]

    # known categories: column is encoded into the batch
    write_h5ad(tmp_path / "known.h5ad", X, var_names=gvars,
               obs={"clusters": rng.choice(["a", "b"], 16)})
    batch = next(iter(make_dm("known.h5ad").predict_batches()))
    assert "clusters" in batch and set(np.unique(batch["clusters"])) <= {0, 1}

    # unknown category: loud, named error — not silent unconditional
    write_h5ad(tmp_path / "unknown.h5ad", X, var_names=gvars,
               obs={"clusters": np.array(["a", "MYSTERY"] * 8)})
    with pytest.raises(KeyError, match="MYSTERY"):
        next(iter(make_dm("unknown.h5ad").predict_batches()))

    # column absent entirely: tolerated (generation falls back to null tokens)
    write_h5ad(tmp_path / "nocol.h5ad", X, var_names=gvars, obs={})
    batch = next(iter(make_dm("nocol.h5ad").predict_batches()))
    assert "clusters" not in batch


def test_random_strategy_seeds_deterministic_and_distinct(tmp_path, rng):
    """ROADMAP hygiene: the `random*` tokenizer strategies must be (a)
    deterministic within an epoch, (b) re-sampled across epochs, and (c)
    automatically distinct across hosts (per-spec-index seeding composes with
    the disjoint h::H spec partition — datamodule._iter_specs)."""
    _write_dataset(tmp_path, rng, n=64, g=20)
    enc = VocabularyEncoder(
        class_vocab_sizes={"clusters": 3}, metadata_json=str(tmp_path / "meta.json")
    )

    def dm(**kw):
        d = DataModule(
            vocabulary_encoder=enc, train_adata_path=str(tmp_path / "train.h5ad"),
            batch_size=16, genes_seq_len=8, sample_genes="random", prefetch=0,
            val_fraction=0.0, shuffle=False, **kw,
        )
        d.setup()
        return d

    # (a) same epoch twice -> bitwise-identical gene samples
    a = [b["genes"] for b in dm().train_batches(0)]
    b = [b["genes"] for b in dm().train_batches(0)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

    # (b) a different epoch re-samples (the subset differs somewhere)
    c = [b["genes"] for b in dm().train_batches(1)]
    assert any((x != y).any() for x, y in zip(a, c))

    # (c) two hosts draw from disjoint spec indices -> different seeds; their
    # batches never collide even for identical underlying rows
    h0 = [b["genes"] for b in dm(num_hosts=2, host_index=0).train_batches(0)]
    h1 = [b["genes"] for b in dm(num_hosts=2, host_index=1).train_batches(0)]
    assert len(h0) + len(h1) == len(a)
    flat0 = {x.tobytes() for x in h0}
    flat1 = {x.tobytes() for x in h1}
    assert not (flat0 & flat1)


def test_sort_h5ad_files_non_numeric_suffix(tmp_path):
    """Files without an _<int> suffix must sort (lexicographically, after the
    numbered shards) instead of crashing setup with a ValueError."""
    from scldm_tpu.data.datamodule import sort_h5ad_files

    for name in ("adata_2.h5ad", "adata_10.h5ad", "pbmc_train.h5ad", "zz.h5ad"):
        (tmp_path / name).write_bytes(b"")
    got = [p.split("/")[-1] for p in sort_h5ad_files(tmp_path)]
    assert got == ["adata_2.h5ad", "adata_10.h5ad", "pbmc_train.h5ad", "zz.h5ad"]


def test_host_partition_is_even(tmp_path, rng):
    """Every host must yield the SAME batch count per epoch: each step is a
    global collective, so a ragged [host::num_hosts] split would deadlock the
    cluster when one host dispatches an extra step at epoch end."""
    _write_dataset(tmp_path, rng, n=96)  # 90 train cells at bs 16 -> 5 specs
    counts = []
    for h in range(4):
        enc = VocabularyEncoder(
            class_vocab_sizes={"clusters": 3}, metadata_json=str(tmp_path / "meta.json")
        )
        dm = DataModule(
            vocabulary_encoder=enc, train_adata_path=str(tmp_path / "train.h5ad"),
            batch_size=16, test_batch_size=16, genes_seq_len=20,
            sample_genes="expressed", prefetch=0, num_hosts=4, host_index=h,
        )
        dm.setup()
        counts.append(len(list(dm.train_batches(0))))
        assert counts[-1] == dm.steps_per_epoch
    assert len(set(counts)) == 1  # 5 specs over 4 hosts -> 1 each, 1 dropped


def test_prefetch_abandoned_iterator_does_not_wedge_producer(tmp_path, rng):
    """`next(iter(train_batches(0)))` (the example-batch idiom in every CLI)
    abandons the generator with the queue full; the producer's bounded-wait
    put must exit instead of blocking forever holding batch memory."""
    import threading
    import time as _time

    _write_dataset(tmp_path, rng, n=96)
    enc = VocabularyEncoder(
        class_vocab_sizes={"clusters": 3}, metadata_json=str(tmp_path / "meta.json")
    )
    dm = DataModule(
        vocabulary_encoder=enc, train_adata_path=str(tmp_path / "train.h5ad"),
        batch_size=16, test_batch_size=16, genes_seq_len=20,
        sample_genes="expressed", prefetch=1,
    )
    dm.setup()
    before = {t.ident for t in threading.enumerate()}
    for _ in range(3):
        it = dm.train_batches(0)
        next(iter(it))
        it.close()  # deterministic GeneratorExit (CPython refcount would too)
    deadline = _time.time() + 10
    while _time.time() < deadline:
        leaked = [
            t for t in threading.enumerate()
            if t.ident not in before and t.is_alive()
        ]
        if not leaked:
            break
        _time.sleep(0.2)
    assert not leaked, f"producer threads still alive: {leaked}"


def test_fastpath_genes_subset_dtype_matches_tokenizer(tmp_path, rng):
    """CSR fast path and tokenize_cells must emit identical dtypes for the
    same key — a mixed CSR/dense dataset would otherwise re-trace the train
    step on every storage-mode switch."""
    from scldm_tpu.data.fastpath import expressed_batch_from_csr

    gene_row = np.arange(1, 21, dtype=np.int64)
    indptr = np.array([0, 2, 3], np.int64)
    out = expressed_batch_from_csr(
        np.array([1.0, 2.0, 3.0], np.float32),
        np.array([0, 5, 7], np.int64), indptr, gene_row, 8,
    )
    assert out["genes_subset"].dtype == np.int64
