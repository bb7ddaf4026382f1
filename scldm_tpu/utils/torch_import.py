"""Torch-checkpoint interop: load the reference's released PyTorch `.ckpt`
weights into our flax param pytrees (and export back).

The reference releases Lightning checkpoints per dataset
(download_artifacts.py:44-217); their `state_dict` keys follow the module
structure in reference nnets.py/layers.py/vae.py. This maps those names onto
our parameter tree so published weights can be evaluated directly on TPU for
metric-parity checks (SURVEY.md §7 "Checkpoint interop").

Conventions:
- torch Linear weight (out,in) <-> flax Dense kernel (in,out): transpose
- torch Embedding weight <-> flax Embed embedding: identical
- torch LayerNorm weight/bias <-> flax scale/bias
- `vae_model.` / `diffusion_model.` Lightning prefixes are stripped
  (reference _utils.py:336-370); `ema_model.ema_model.` selects EMA weights
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _torch_key(parts: Tuple[str, ...]) -> Tuple[str, str]:
    """Map a flax param path -> (torch key, transform) where transform is
    'T' (transpose), 'I' (identity)."""
    parts = list(parts)
    leaf = parts[-1]

    # leaf translation
    if leaf == "kernel":
        torch_leaf, tf = "weight", "T"
    elif leaf == "embedding":
        torch_leaf, tf = "weight", "I"
    elif leaf == "scale":
        torch_leaf, tf = "weight", "I"
    elif leaf in ("bias", "inducing_points", "pos_embed"):
        torch_leaf, tf = leaf, "I"
    else:
        torch_leaf, tf = leaf, "I"

    path = parts[:-1]
    # drop the LayerNormFP32 inner wrapper
    path = [p for p in path if not p.startswith("LayerNorm")]

    out: list[str] = []
    for i, p in enumerate(path):
        parent = path[i - 1] if i > 0 else (parts[0] if path else "")
        if p.startswith("block_"):
            idx = p.split("_")[1]
            if out and out[0] == "encoder":
                out.append(f"encoder_layers.{idx}")
            elif out and out[0] == "decoder":
                out.append(f"decoder_layers.{idx}")
            else:  # DiT
                out.append(f"blocks.{idx}")
        elif p == "latent_proj":
            if out and out[0] == "encoder":
                out.append("encoder_latent_input.0")
            else:
                out.append("decoder_latent_input.1")
        elif p == "adaln_modulation":
            out.append("adaln_modulation.1")
        elif p == "adaln_modulation_q":
            out.append("adaln_modulation_q.1")
        elif p == "mlp_0" and out and out[-1] == "t_embedder":
            out.append("mlp.0")
        elif p == "mlp_2" and out and out[-1] == "t_embedder":
            out.append("mlp.2")
        elif p.startswith("class_embedding_"):
            out.append(f"class_embeddings.{p[len('class_embedding_'):]}")
        elif p == "ln" and path[0] == "decoder_head":
            out.append("ln")
        else:
            out.append(p)

    # leaf-level special case: inducing_points/pos_embed live directly on module
    if leaf == "inducing_points":
        return ".".join(out) + ".inducing_points", "I"
    if leaf == "pos_embed" and out and out[0] == "encoder":
        return ".".join(out) + ".pos_embed", "I"
    return ".".join(out + [torch_leaf]), tf


def export_torch_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Flax params ({'params': tree} or tree) -> reference-named state dict."""
    import flax

    tree = params.get("params", params) if isinstance(params, dict) else params
    flat = flax.traverse_util.flatten_dict(tree)
    out = {}
    for path, value in flat.items():
        key, tf = _torch_key(tuple(path))
        arr = np.asarray(value)
        out[key] = arr.T if tf == "T" else arr
    return out


def import_torch_state_dict(
    state_dict: Dict, params_template: Dict, strict: bool = True
) -> Dict:
    """Reference torch state dict -> our param tree (shapes from template).

    Accepts raw numpy/torch tensors; strips `vae_model.`/`diffusion_model.`
    Lightning prefixes and the legacy `scg_vae`->`scldm` renames are a no-op at
    this level (key structure is identical after the prefix strip).
    """
    import flax

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    # strip module prefixes
    cleaned = {}
    for k, v in state_dict.items():
        for prefix in ("vae_model.", "diffusion_model.", "ema_model.ema_model."):
            if k.startswith(prefix):
                k = k[len(prefix) :]
                break
        cleaned[k] = v

    has_params_key = isinstance(params_template, dict) and "params" in params_template
    tree = params_template["params"] if has_params_key else params_template
    flat = flax.traverse_util.flatten_dict(tree)
    new_flat = {}
    missing = []
    for path, value in flat.items():
        key, tf = _torch_key(tuple(path))
        if key not in cleaned:
            missing.append(key)
            new_flat[path] = value
            continue
        arr = to_np(cleaned[key])
        if tf == "T":
            arr = arr.T
        if arr.shape != value.shape:
            # allow (1,M,E) vs (M,E) buffer-style mismatches
            if arr.squeeze().shape == np.asarray(value).squeeze().shape:
                arr = arr.reshape(value.shape)
            else:
                raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {value.shape}")
        new_flat[path] = arr.astype(np.asarray(value).dtype)
    if strict and missing:
        raise KeyError(f"missing torch keys: {missing[:10]}{'...' if len(missing) > 10 else ''}")
    new_tree = flax.traverse_util.unflatten_dict(new_flat)
    return {"params": new_tree} if has_params_key else new_tree


class _Opaque:
    """Placeholder for classes the checkpoint pickled from modules we don't
    ship (omegaconf configs, Lightning internals, legacy `scg_vae` names —
    reference _utils.py:149-183 solves the same problem with a remapping
    unpickler). Only `state_dict` tensors matter; everything else is allowed
    to deserialize into an inert shell."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        self.__dict__["_opaque_state"] = state

    def __call__(self, *args, **kwargs):  # classmethod-style reconstructors
        return _Opaque()


class _TolerantPickleModule:
    """pickle-module shim for `torch.load(pickle_module=...)`: resolves what it
    can, substitutes `_Opaque` for missing modules/attributes."""

    import pickle as _pickle

    class Unpickler(_pickle.Unpickler):
        def find_class(self, module, name):
            import pickle

            try:
                return pickle.Unpickler.find_class(self, module, name)
            except (ModuleNotFoundError, AttributeError, ImportError):
                return _Opaque

    @staticmethod
    def load(f, **kwargs):
        return _TolerantPickleModule.Unpickler(f).load()


#: state-dict key prefix per checkpoint component (Lightning module attribute
#: names, reference models.py: `vae_model`, `diffusion_model`, and the
#: ema-pytorch wrapper `ema_model.ema_model`)
COMPONENT_PREFIXES = {
    "vae": "vae_model.",
    "dit": "diffusion_model.",
    "dit_ema": "ema_model.ema_model.",
}


def load_reference_checkpoint(
    ckpt_path: str,
    params_template: Dict,
    strict: bool = True,
    component: str = "auto",
):
    """Load a released Lightning `.ckpt` (requires torch) into our param tree.

    component: which sub-model's weights to extract —
      - "vae" / "dit" / "dit_ema": keep only keys under that module's prefix
        (reference _utils.py:363-366 does the same `vae_model.` strip). An LDM
        checkpoint contains all three families; selecting explicitly avoids
        the auto mode's last-prefix-wins ambiguity between raw and EMA DiT
        weights.
      - "auto": strip any known prefix from every key (fine for single-model
        VAE checkpoints).
    """
    import torch

    try:
        payload = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    except (ModuleNotFoundError, AttributeError, ImportError):
        # legacy checkpoints pickle configs referencing renamed/absent modules
        payload = torch.load(
            ckpt_path, map_location="cpu", weights_only=False,
            pickle_module=_TolerantPickleModule,
        )
    state_dict = payload.get("state_dict", payload)
    if component != "auto":
        prefix = COMPONENT_PREFIXES[component]
        # ema-pytorch's bookkeeping buffers ("ema_model.initted",
        # "ema_model.step") sit one level ABOVE the "ema_model.ema_model."
        # weight prefix, so the startswith filter already excludes them
        state_dict = {
            k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)
        }
    return import_torch_state_dict(state_dict, params_template, strict=strict)
