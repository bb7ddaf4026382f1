"""Minimal AnnData-on-HDF5 (.h5ad) reader/writer built directly on h5py.

The reference stack reads AnnData through anndata + cellarium-ml
(datamodule.py:16-27); neither is available here, and the training loop only
needs row-sliced count matrices, obs label columns, and var names — so this
module implements exactly the on-disk AnnData encoding subset required:

- X / layers[key]: dense 2-D datasets or CSR groups (data/indices/indptr with
  attrs encoding-type="csr_matrix", shape)
- obs/var: dataframe groups (attrs _index, column-order) with plain datasets
  or categorical groups (categories + codes)
- obsm: group of 2-D arrays

The writer emits anndata-compatible encoding-type/encoding-version attrs so
files written here open cleanly in the reference toolchain.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Sequence

import h5py
import numpy as np
from scipy import sparse


def _decode(arr: np.ndarray) -> np.ndarray:
    """bytes -> str for HDF5 string datasets."""
    if arr.dtype.kind in ("S", "O"):
        return np.asarray([x.decode() if isinstance(x, bytes) else str(x) for x in arr])
    return arr


class H5ADFile:
    """Lazy, row-sliceable view over one .h5ad file."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self._f = h5py.File(self.path, "r")
        self._indptr_cache: Dict[str, np.ndarray] = {}

    # -- basic shape ---------------------------------------------------------
    def _matrix_node(self, attr: str = "X", key: Optional[str] = None):
        node = self._f[attr]
        if key is not None:
            node = node[key]
        return node

    def shape(self, attr: str = "X", key: Optional[str] = None) -> tuple[int, int]:
        node = self._matrix_node(attr, key)
        if isinstance(node, h5py.Dataset):
            return tuple(node.shape)
        return tuple(int(s) for s in node.attrs["shape"])

    @property
    def n_obs(self) -> int:
        return self.shape()[0]

    @property
    def n_vars(self) -> int:
        return self.shape()[1]

    # -- var / obs -------------------------------------------------------------
    def _index_col(self, df: str) -> str:
        attrs = self._f[df].attrs
        idx = attrs.get("_index", "index")
        return idx.decode() if isinstance(idx, bytes) else idx

    @property
    def var_names(self) -> np.ndarray:
        g = self._f["var"]
        return _decode(np.asarray(g[self._index_col("var")][:]))

    @property
    def obs_names(self) -> np.ndarray:
        g = self._f["obs"]
        return _decode(np.asarray(g[self._index_col("obs")][:]))

    def obs_columns(self) -> list[str]:
        g = self._f["obs"]
        order = g.attrs.get("column-order", None)
        if order is not None:
            return [c.decode() if isinstance(c, bytes) else c for c in order]
        return [k for k in g.keys() if k != self._index_col("obs")]

    def obs_column(self, name: str, rows: Optional[np.ndarray] = None) -> np.ndarray:
        """Decoded obs column (categoricals -> category strings)."""
        node = self._f["obs"][name]
        if isinstance(node, h5py.Group):  # categorical encoding
            categories = _decode(np.asarray(node["categories"][:]))
            codes = np.asarray(node["codes"][:])
            if rows is not None:
                codes = codes[rows]
            out = np.where(codes >= 0, categories[np.clip(codes, 0, None)], None)
            return out
        data = np.asarray(node[:] if rows is None else node[:][rows])
        return _decode(data)

    def obs_codes(self, name: str) -> Optional[tuple[np.ndarray, list[str]]]:
        """(codes, categories) for a categorical obs column — lets callers map
        categories once and slice integer codes per batch (None if not
        categorical)."""
        node = self._f["obs"][name]
        if isinstance(node, h5py.Group):
            return np.asarray(node["codes"][:]), list(_decode(np.asarray(node["categories"][:])))
        return None

    def obs_categories(self, name: str) -> Optional[list[str]]:
        """Category list for a categorical obs column (None if not categorical)."""
        node = self._f["obs"][name]
        if isinstance(node, h5py.Group):
            return list(_decode(np.asarray(node["categories"][:])))
        return None

    # -- matrix row slicing -----------------------------------------------------
    def is_csr(self, attr: str = "X", key: Optional[str] = None) -> bool:
        node = self._matrix_node(attr, key)
        if isinstance(node, h5py.Dataset):
            return False
        enc = node.attrs.get("encoding-type", b"")
        enc = enc.decode() if isinstance(enc, bytes) else enc
        if enc == "csc_matrix":
            # a SQUARE csc matrix would satisfy the indptr-length heuristic
            # below — trust the declared encoding first
            return False
        n_obs = self.shape(attr, key)[0]
        return enc == "csr_matrix" or (
            "indptr" in node and len(node["indptr"]) == n_obs + 1
        )

    def csr_block(
        self, lo: int, hi: int, attr: str = "X", key: Optional[str] = None
    ):
        """Contiguous row block of a CSR matrix as (data, indices, indptr_local)
        — ONE bulk HDF5 read per array instead of per-row reads (the input-
        pipeline hot path; reference delegated this to anndata's backed mode)."""
        node = self._matrix_node(attr, key)
        cache_key = f"{attr}/{key}"
        if cache_key not in self._indptr_cache:
            self._indptr_cache[cache_key] = np.asarray(node["indptr"][:])
        indptr = self._indptr_cache[cache_key]
        start, stop = int(indptr[lo]), int(indptr[hi])
        data = np.asarray(node["data"][start:stop], np.float32)
        indices = np.asarray(node["indices"][start:stop])
        local_indptr = (indptr[lo : hi + 1] - start).astype(np.int64)
        return data, indices, local_indptr

    def rows(
        self,
        row_idx: np.ndarray | slice,
        attr: str = "X",
        key: Optional[str] = None,
        dtype=np.float32,
    ) -> np.ndarray:
        """Dense (len(rows), n_vars) block for the given row indices."""
        node = self._matrix_node(attr, key)
        n_obs, n_vars = self.shape(attr, key)
        if isinstance(row_idx, slice):
            row_idx = np.arange(*row_idx.indices(n_obs))
        row_idx = np.asarray(row_idx)

        if isinstance(node, h5py.Dataset):  # dense
            # h5py fancy indexing needs sorted unique; gather then invert
            order = np.argsort(row_idx, kind="stable")
            sorted_idx = row_idx[order]
            uniq, inv = np.unique(sorted_idx, return_inverse=True)
            block = node[uniq.tolist()]
            out = np.empty((len(row_idx), n_vars), dtype)
            out[order] = block[inv]
            return out

        enc = node.attrs.get("encoding-type", b"")
        enc = enc.decode() if isinstance(enc, bytes) else enc
        if enc == "csr_matrix" or ("indptr" in node and len(node["indptr"]) == n_obs + 1):
            cache_key = f"{attr}/{key}"
            if cache_key not in self._indptr_cache:
                self._indptr_cache[cache_key] = np.asarray(node["indptr"][:])
            indptr = self._indptr_cache[cache_key]
            data_ds, indices_ds = node["data"], node["indices"]
            out = np.zeros((len(row_idx), n_vars), dtype)
            # coalesce contiguous runs to minimize HDF5 reads
            for i, r in enumerate(row_idx):
                lo, hi = int(indptr[r]), int(indptr[r + 1])
                if hi > lo:
                    out[i, indices_ds[lo:hi]] = data_ds[lo:hi]
            return out
        if enc == "csc_matrix":
            # row slicing a CSC file is pathological; materialize once
            if not hasattr(self, "_csc_dense"):
                mat = sparse.csc_matrix(
                    (node["data"][:], node["indices"][:], node["indptr"][:]),
                    shape=(n_obs, n_vars),
                )
                self._csc_dense = mat.tocsr()
            return np.asarray(self._csc_dense[row_idx].todense(), dtype)
        raise ValueError(f"Unsupported matrix encoding: {enc}")

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


_STR = h5py.string_dtype(encoding="utf-8")


def _str_array(values) -> np.ndarray:
    return np.asarray([str(v) for v in values], dtype=_STR)


def _write_df(group: h5py.Group, index: np.ndarray, columns: Dict[str, np.ndarray]):
    group.attrs["encoding-type"] = "dataframe"
    group.attrs["encoding-version"] = "0.2.0"
    group.attrs["_index"] = "_index"
    group.attrs["column-order"] = _str_array(list(columns.keys()))
    group.create_dataset("_index", data=_str_array(index))
    group["_index"].attrs["encoding-type"] = "string-array"
    group["_index"].attrs["encoding-version"] = "0.2.0"
    for name, values in columns.items():
        values = np.asarray(values)
        if values.dtype.kind in ("U", "S", "O"):
            cats, codes = np.unique(values.astype(str), return_inverse=True)
            sub = group.create_group(name)
            sub.attrs["encoding-type"] = "categorical"
            sub.attrs["encoding-version"] = "0.2.0"
            sub.attrs["ordered"] = False
            sub.create_dataset("categories", data=_str_array(cats))
            sub["categories"].attrs["encoding-type"] = "string-array"
            sub["categories"].attrs["encoding-version"] = "0.2.0"
            sub.create_dataset("codes", data=codes.astype(np.int32))
            sub["codes"].attrs["encoding-type"] = "array"
            sub["codes"].attrs["encoding-version"] = "0.2.0"
        else:
            group.create_dataset(name, data=values)
            group[name].attrs["encoding-type"] = "array"
            group[name].attrs["encoding-version"] = "0.2.0"


def write_h5ad(
    path: str | Path,
    X: np.ndarray | sparse.spmatrix,
    obs: Optional[Dict[str, np.ndarray]] = None,
    var_names: Optional[Sequence[str]] = None,
    obs_names: Optional[Sequence[str]] = None,
    obsm: Optional[Dict[str, np.ndarray]] = None,
    layers: Optional[Dict[str, np.ndarray | sparse.spmatrix]] = None,
    sparse_threshold: float = 0.5,
) -> None:
    """Write an anndata-compatible .h5ad. Dense X with >50% zeros stores as CSR."""
    n_obs, n_vars = X.shape
    obs = obs or {}
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    def _write_matrix(f, name, M):
        if not sparse.issparse(M) and np.mean(np.asarray(M) == 0) > sparse_threshold:
            M = sparse.csr_matrix(M)
        if sparse.issparse(M):
            M = M.tocsr()
            g = f.create_group(name)
            g.attrs["encoding-type"] = "csr_matrix"
            g.attrs["encoding-version"] = "0.1.0"
            g.attrs["shape"] = np.asarray(M.shape, np.int64)
            g.create_dataset("data", data=M.data.astype(np.float32))
            g.create_dataset("indices", data=M.indices.astype(np.int32))
            g.create_dataset("indptr", data=M.indptr.astype(np.int64))
        else:
            d = f.create_dataset(name, data=np.asarray(M, np.float32))
            d.attrs["encoding-type"] = "array"
            d.attrs["encoding-version"] = "0.2.0"

    with h5py.File(path, "w") as f:
        f.attrs["encoding-type"] = "anndata"
        f.attrs["encoding-version"] = "0.1.0"
        _write_matrix(f, "X", X)
        if obs_names is None:
            obs_names = np.asarray([str(i) for i in range(n_obs)], dtype=object)
        if var_names is None:
            var_names = np.asarray([f"g{i}" for i in range(n_vars)], dtype=object)
        _write_df(f.create_group("obs"), np.asarray(obs_names, object), obs)
        _write_df(f.create_group("var"), np.asarray(var_names, object), {})
        if obsm:
            g = f.create_group("obsm")
            g.attrs["encoding-type"] = "dict"
            g.attrs["encoding-version"] = "0.1.0"
            for k, v in obsm.items():
                g.create_dataset(k, data=np.asarray(v, np.float32))
                g[k].attrs["encoding-type"] = "array"
                g[k].attrs["encoding-version"] = "0.2.0"
        if layers:
            g = f.create_group("layers")
            g.attrs["encoding-type"] = "dict"
            g.attrs["encoding-version"] = "0.1.0"
            for k, v in layers.items():
                _write_matrix(g, k, v)


def read_shard_metadata(dir_path: str | Path) -> Optional[dict]:
    """metadata.json of a sharded-h5ad directory ({n_cells, shard_size,
    last_shard_size}; reference datamodule.py:86-91,310-330)."""
    p = Path(dir_path) / "metadata.json"
    if p.exists():
        return json.loads(p.read_text())
    return None
