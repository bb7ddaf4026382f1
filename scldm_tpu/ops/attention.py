"""Scaled-dot-product attention ops.

The reference uses torch FlexAttention with no masks/score-mods (layers.py:153,
260 — SCORE_MOD registry only has "noop"), i.e. plain full attention. Here:

- `sdpa`: XLA einsum attention with fp32 softmax accumulation. For the model
  sizes in play (16 latent tokens, gene-token cross-attention that is a tall
  skinny matmul) XLA fuses this into MXU-friendly programs.
- For long self-attention token axes on TPU, `sdpa` dispatches to the Pallas
  flash-attention kernel (scldm_tpu.ops.flash_attention) above a length
  threshold, avoiding the O(S^2) HBM round-trip of materialized scores.

Layout convention: (batch, seq, heads, head_dim) throughout.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# Token-axis length above which the Pallas kernel wins on TPU (scores no
# longer fit comfortably in VMEM and XLA materializes them in HBM). Measured
# crossover, v5e round 4 (benchmarks/bench_flash_crossover.py, B=2 H=4 D=64,
# M=S self-attention, dispatch-amortized timing): flash wins at EVERY swept
# length — 1.36x at S=2048, 1.28x at 4096, 1.46x at 8192, 1.63x at 16384 —
# and is the only path at S=32768, where XLA's f32 scores want 17 GB HBM.
# (Round 3's "kernel loses 37.4 vs 35.7 ms" was single-dispatch timing: the
# tunneled host's dispatch RTT swamped the ~8 ms kernel.) The S=1024 dispatch
# floor itself was measured round 5: flash 4.41 vs XLA 4.65 ms (1.05x) —
# a narrow but real win, so the threshold stays supported end to end.
_FLASH_MIN_SEQ = 1024


def _use_flash(q: jax.Array, k: jax.Array) -> bool:
    if jax.default_backend() != "tpu":
        return False
    # flash path requires head_dim and kv length friendly to (8,128) tiling
    return k.shape[1] >= _FLASH_MIN_SEQ and q.shape[1] >= _FLASH_MIN_SEQ


def sdpa_xla(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Reference attention: softmax(q k^T / sqrt(d)) v, fp32 softmax.

    Shapes: q (B, M, H, D), k/v (B, S, H, D) -> (B, M, H, D).
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    scores = jnp.einsum("bmhd,bshd->bhms", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * scale, axis=-1)
    out = jnp.einsum("bhms,bshd->bmhd", probs.astype(v.dtype), v)
    return out


# Flash many-query/few-KV cross-attention (ops/fused_cross.py) dispatch gates:
# a wide (E >= 256) model unpooling a long query axis into few latent tokens —
# the census decoder shape, where XLA materializes (B, H, G, M) scores+probs
# in HBM. Default OFF: standalone the kernel wins (29.1 vs 31.1 ms f+b at
# census shapes) but the full census train step measured a LOSS (121.4 vs
# 118.0 ms/step) — inside the step XLA fuses the attention chain with its
# producer/consumer (LN epilogues, the out-proj) and the isolated kernel
# forfeits those fusions. SCLDM_FLASH_CROSS=1 opts in (see ROADMAP).
_FLASH_CROSS_ENABLED = os.environ.get("SCLDM_FLASH_CROSS", "0") == "1"
_FLASH_CROSS_MIN_Q = 4096
_FLASH_CROSS_MAX_KV = 128
_FLASH_CROSS_MIN_E = 256


def _use_flash_cross(q: jax.Array, k: jax.Array) -> bool:
    M_, H, hd = q.shape
    return (
        _FLASH_CROSS_ENABLED
        and jax.default_backend() == "tpu"
        and M_ >= _FLASH_CROSS_MIN_Q
        and k.shape[1] <= _FLASH_CROSS_MAX_KV
        and H * hd >= _FLASH_CROSS_MIN_E
        and hd % 8 == 0
    )


def sdpa_shared_q(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Attention with a batch-shared query set.

    q (M, H, D), k/v (B, S, H, D) -> (B, M, H, D). Used by the decoder's
    unpooling cross-attention when the queries are the canonical full-gene
    embedding row — identical for every batch element, so projecting/normalizing
    them per batch element would be pure waste (and its backward a scatter).

    At census decoder shapes (many queries, few KV, wide E) dispatches to the
    Pallas flash kernel whose scores/probs never touch HBM; the head
    split/flatten at the boundary is layout-free (heads are E-contiguous).
    """
    if _use_flash_cross(q, k):
        from scldm_tpu.ops.fused_cross import flash_cross_attention

        M_, H, hd = q.shape
        B, S = k.shape[0], k.shape[1]
        y = flash_cross_attention(
            q.reshape(M_, H * hd), k.reshape(B, S, H * hd), v.reshape(B, S, H * hd), H
        )
        return y.reshape(B, M_, H, hd)
    return sdpa_shared_q_xla(q, k, v)


def sdpa_shared_q_xla(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """The plain-XLA formulation of `sdpa_shared_q` — also the one callers
    under GSPMD sharding use directly (a Pallas kernel would not partition;
    the einsum chain shards on the query axis with zero collectives since
    every query row only reads the replicated latent kv)."""
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    scores = jnp.einsum("mhd,bshd->bhms", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * scale, axis=-1)
    return jnp.einsum("bhms,bshd->bmhd", probs.astype(v.dtype), v)


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Dispatching attention: Pallas flash kernel for long TPU sequences,
    plain XLA attention otherwise."""
    if _use_flash(q, k):
        from scldm_tpu.ops.flash_attention import flash_attention

        try:
            return flash_attention(q, k, v)
        except Exception:  # pragma: no cover - conservative fallback
            return sdpa_xla(q, k, v)
    return sdpa_xla(q, k, v)
