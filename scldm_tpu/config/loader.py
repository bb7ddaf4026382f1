"""Minimal Hydra-compatible config loader.

Reimplements the subset of Hydra/OmegaConf the reference leans on
(experiments/configs/**, SURVEY.md §5 "Config / flag system") without the
dependency:

- YAML config tree with a `defaults:` list composing group files
  (`- model: vae_base` merges configs/model/vae_base.yaml under `model`);
- `${a.b.c}` interpolation (nested, including interpolated key segments like
  `${datamodule.dataset_params.${datamodule.dataset}.n_genes}`);
- `${eval:'expr'}` arithmetic resolver (reference train.py:95);
- dotted command-line overrides `a.b.c=value` with YAML-typed values.

Values resolve lazily at `resolve()` so overrides apply before interpolation.
"""

from __future__ import annotations

import copy
import re
from pathlib import Path
from typing import Any, Dict, List

import yaml

_INTERP = re.compile(r"\$\{([^${}]+)\}")


def _deep_merge(base: Dict, update: Dict) -> Dict:
    out = dict(base)
    for k, v in update.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config(path: str | Path, config_root: str | Path | None = None) -> Dict:
    """Load a YAML config file, composing its `defaults:` list."""
    path = Path(path)
    root = Path(config_root) if config_root else path.parent
    raw = yaml.safe_load(path.read_text()) or {}

    merged: Dict = {}
    for entry in raw.pop("defaults", []) or []:
        if entry == "_self_":
            merged = _deep_merge(merged, raw)
            raw = {}
            continue
        if isinstance(entry, dict):
            ((group, name),) = entry.items()
            if name is None:
                continue
            sub = load_config(root / group / f"{name}.yaml", root)
            merged = _deep_merge(merged, {group: sub})
        else:
            # bare include: merge file at top level (hydra `- vae_base`)
            sub = load_config(path.parent / f"{entry}.yaml", root)
            merged = _deep_merge(merged, sub)
    return _deep_merge(merged, raw)


def merge_overrides(cfg: Dict, overrides: List[str]) -> Dict:
    """Apply `a.b.c=value` overrides (values parsed as YAML)."""
    cfg = copy.deepcopy(cfg)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov}")
        key, _, val = ov.partition("=")
        node = cfg
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(val)
    return cfg


def _lookup(root: Dict, dotted: str) -> Any:
    node: Any = root
    for part in dotted.split("."):
        if isinstance(node, dict):
            node = node[part]
        elif isinstance(node, list):
            node = node[int(part)]
        else:
            raise KeyError(dotted)
    return node


def _resolve_value(value: Any, root: Dict, depth: int = 0) -> Any:
    if depth > 20:
        raise RecursionError("interpolation depth exceeded (cycle?)")
    if isinstance(value, str):
        # innermost-first substitution; re-check for a full-string match every
        # round so `${a.${b}.c}` collapses to a typed (non-string) value
        while True:
            m = _INTERP.fullmatch(value.strip())
            if m:
                return _resolve_expr(m.group(1), root, depth)
            m = _INTERP.search(value)
            if not m:
                return value
            sub = _resolve_expr(m.group(1), root, depth)
            value = value[: m.start()] + str(sub) + value[m.end() :]
    if isinstance(value, dict):
        return {k: _resolve_value(v, root, depth) for k, v in value.items()}
    if isinstance(value, list):
        return [_resolve_value(v, root, depth) for v in value]
    return value


def _resolve_expr(expr: str, root: Dict, depth: int) -> Any:
    if expr.startswith("eval:"):
        body = expr[len("eval:") :].strip().strip("'\"")
        body = _resolve_value(body, root, depth + 1)
        return eval(body, {"__builtins__": {}}, {})  # arithmetic only
    if expr == "repo_root:":
        # the directory that ships configs/ + metadata/ (reference uses
        # ${hydra:runtime.cwd}, paths/base.yaml:3 — cwd-fragile; this resolver
        # finds the vendored metadata regardless of where the CLI is launched)
        return str(Path(__file__).resolve().parents[2])
    target = _lookup(root, expr)
    return _resolve_value(target, root, depth + 1)


def resolve(cfg: Dict) -> Dict:
    """Resolve every interpolation in the tree (raises on unresolvable keys)."""
    # iterate until fixed point to handle nested key interpolations
    return _resolve_value(copy.deepcopy(cfg), cfg)
