"""Analytic FLOPs estimation for the model cores.

The reference config references a `scldm.flops.get_flops` that does not exist
in its source tree (vae_base.yaml:95-104 — dangling `_target_`; SURVEY.md §5).
This implements it for real, plus an exact XLA-measured count via
`jax.jit(...).lower(...).compile().cost_analysis()`.
"""

from __future__ import annotations

from typing import Optional


def _mlp_hidden(n_embed: int, multiple_of: int = 4) -> int:
    h = int(2 * (n_embed * 4) / 3)
    return multiple_of * ((h + multiple_of - 1) // multiple_of)


def block_flops(tokens: int, n_embed: int, multiple_of: int = 4) -> int:
    """Forward FLOPs of one self-attention Block over `tokens` tokens."""
    h = _mlp_hidden(n_embed, multiple_of)
    qkv = 2 * tokens * n_embed * 3 * n_embed
    attn = 2 * 2 * tokens * tokens * n_embed  # scores + weighted sum
    proj = 2 * tokens * n_embed * n_embed
    mlp = 2 * tokens * n_embed * h * 3  # w1, w2, c_proj
    return qkv + attn + proj + mlp


def cross_block_flops(
    kv_tokens: int, q_tokens: int, n_embed: int, multiple_of: int = 4
) -> int:
    """Forward FLOPs of one MCAB (CrossAttentionBlock)."""
    h = _mlp_hidden(n_embed, multiple_of)
    kv = 2 * kv_tokens * n_embed * 2 * n_embed
    q = 2 * q_tokens * n_embed * n_embed
    attn = 2 * 2 * q_tokens * kv_tokens * n_embed
    proj = 2 * q_tokens * n_embed * n_embed
    mlp = 2 * q_tokens * n_embed * h * 3
    return kv + q + attn + proj + mlp


def vae_forward_flops(
    *,
    n_genes: int,
    genes_seq_len: int,
    n_embed: int = 32,
    n_embed_latent: int = 16,
    n_layer: int = 8,
    n_inducing_points: int = 16,
    multiple_of: int = 4,
) -> int:
    """Per-cell forward FLOPs of the TransformerVAE (both MCABs, 2x n_layer
    latent-token blocks, latent projections, NB head)."""
    total = 0
    total += cross_block_flops(genes_seq_len, n_inducing_points, n_embed, multiple_of)
    total += 2 * n_layer * block_flops(n_inducing_points, n_embed, multiple_of)
    total += 2 * 2 * n_inducing_points * n_embed * n_embed_latent  # latent proj both ways
    total += cross_block_flops(n_inducing_points, n_genes, n_embed, multiple_of)
    total += 2 * n_genes * n_embed  # NB head Linear(E->1)
    return total


def dit_forward_flops(
    *, seq_len: int = 16, n_embed: int = 256, n_embed_input: int = 16,
    n_layer: int = 8, multiple_of: int = 4,
) -> int:
    """Per-sample forward FLOPs of the DiT (blocks + adaLN modulation heads)."""
    total = 2 * seq_len * n_embed_input * n_embed  # input proj
    per_block = block_flops(seq_len, n_embed, multiple_of) + 2 * n_embed * 6 * n_embed
    total += n_layer * per_block
    total += 2 * n_embed * 2 * n_embed + 2 * seq_len * n_embed * n_embed_input
    return total


def get_flops(
    *,
    seq_len: int,
    d_model: int,
    n_layers: int,
    vocab_size: Optional[int] = None,
    num_heads: Optional[int] = None,
    key_size: Optional[int] = None,
    ffw_size: Optional[int] = None,
    swiglu: bool = True,
    backward: bool = True,
) -> int:
    """Generic transformer FLOPs (the signature the reference config expects).

    Counts matmul FLOPs of n_layers blocks over seq_len tokens of width
    d_model; backward multiplies by 3 (the usual 2x-backward rule).
    """
    per = block_flops(seq_len, d_model)
    total = n_layers * per
    if vocab_size:
        total += 2 * seq_len * d_model * vocab_size
    return total * (3 if backward else 1)


def measured_flops(fn, *args) -> Optional[float]:
    """Exact compiled-program FLOPs from XLA cost analysis (None if opaque)."""
    import jax

    try:
        compiled = jax.jit(fn).lower(*args).compile()
        return compiled.cost_analysis().get("flops")
    except Exception:
        return None
