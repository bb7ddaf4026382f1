"""Prediction-output processing -> AnnData files on disk.

Parity with reference src/scldm/_utils.py:186-333 (process_generation_output /
create_anndata_from_inference_output / process_inference_output), writing
through scldm_tpu.data.h5ad instead of the anndata package.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from scldm_tpu.constants import NON_CONDITION_KEYS, ModelEnum
from scldm_tpu.data.h5ad import write_h5ad

COUNTS = ModelEnum.COUNTS.value


def process_generation_output(
    batches: List[Dict[str, np.ndarray]],
    vocab_encoder,
    out_path: str | Path,
    dataset: str = "generated",
    index: int = 0,
) -> Path:
    """Stack predict batches (uncond/cond halves) into one h5ad
    (_utils.py:186-241). Each batch carries counts_generated_unconditional /
    _conditional plus z_generated_* and the condition label columns."""
    uncond = np.concatenate([b[f"{COUNTS}_generated_unconditional"] for b in batches])
    cond = np.concatenate([b[f"{COUNTS}_generated_conditional"] for b in batches])
    X = np.concatenate([uncond, cond])
    n_half = len(uncond)

    obs: Dict[str, np.ndarray] = {
        "generation_type": np.asarray(
            ["unconditional"] * n_half + ["conditional"] * n_half
        )
    }
    label_keys = [
        k
        for k in batches[0]
        if k not in NON_CONDITION_KEYS and not k.startswith(("z_generated", f"{COUNTS}_generated"))
    ]
    for k in label_keys:
        idx = np.concatenate([np.asarray(b[k]) for b in batches])
        decoded = vocab_encoder.decode_metadata(idx, k)
        obs[k] = np.concatenate([decoded, decoded])

    obsm = {}
    if "z_generated_unconditional" in batches[0]:
        z_u = np.concatenate([b["z_generated_unconditional"] for b in batches])
        z_c = np.concatenate([b["z_generated_conditional"] for b in batches])
        obsm["z"] = np.concatenate([z_u, z_c]).reshape(len(X), -1)

    var_names = [vocab_encoder._gene_idx2token[i] for i in vocab_encoder.gene_tokens_idx]
    path = Path(out_path) / f"{dataset}_generated_{index}.h5ad"
    write_h5ad(path, X, obs=obs, var_names=var_names, obsm=obsm)
    return path


def create_anndata_from_inference_output(
    outputs: Dict[str, np.ndarray],
    vocab_encoder,
    out_path: str | Path,
    dataset: str = "inference",
    index: int = 0,
) -> Path:
    """Reconstructed counts + latent z -> h5ad (_utils.py:244-287)."""
    X = np.asarray(outputs["reconstructed_counts"])
    obs: Dict[str, np.ndarray] = {}
    for k, v in outputs.items():
        v = np.asarray(v)
        if k in ("reconstructed_counts", "z", "z_mean_flat") or k in NON_CONDITION_KEYS:
            continue
        if v.ndim == 1 and len(v) == len(X):
            if k in getattr(vocab_encoder, "classes2idx", {}):
                obs[k] = vocab_encoder.decode_metadata(v.astype(int), k)
            else:
                obs[k] = v
    obsm = {}
    if "z" in outputs:
        obsm["z"] = np.asarray(outputs["z"]).reshape(len(X), -1)
    var_names = [vocab_encoder._gene_idx2token[i] for i in vocab_encoder.gene_tokens_idx]
    path = Path(out_path) / f"{dataset}_inference_{index}.h5ad"
    write_h5ad(path, X, obs=obs, var_names=var_names, obsm=obsm)
    return path
