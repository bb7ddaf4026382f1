"""Transformer building blocks, TPU-first.

Functional parity with reference src/scldm/layers.py (SelfAttention,
CrossAttention, SwiGLU MLP, pre-LN Block with optional adaLN, the MCAB
CrossAttentionBlock, DiT support layers), re-designed for XLA:

- attention is a swappable functional op (`scldm_tpu.ops.attention.sdpa`):
  plain fused einsum attention for short token axes (the latent/DiT path) and a
  Pallas flash-attention kernel for long gene-token axes;
- all shapes static; all dropout/rng explicit;
- matmuls run in configurable `compute_dtype` (bfloat16 on TPU by default at
  bench time) with fp32 layernorm/softmax accumulation.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scldm_tpu.ops.attention import sdpa, sdpa_shared_q
from scldm_tpu.ops.transforms import COUNT_TRANSFORMS


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """Adaptive layernorm modulation (reference layers.py:91-94)."""
    return x * (1.0 + scale) + shift


class LayerNormFP32(nn.Module):
    """LayerNorm computed in fp32 (cast back to input dtype).

    `use_scale/use_bias=False` mirrors torch `elementwise_affine=False`.
    """

    epsilon: float = 1e-8
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        y = nn.LayerNorm(
            epsilon=self.epsilon,
            use_scale=self.use_scale,
            use_bias=self.use_bias,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(dtype)


def _dense(features: int, use_bias: bool, dtype, name: str | None = None, kernel_init=None):
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kernel_init or nn.initializers.xavier_uniform(),
        bias_init=nn.initializers.zeros,
        name=name,
    )


# ---------------------------------------------------------------------------
# Input embedding (reference layers.py:97-118)
# ---------------------------------------------------------------------------
class Projection(nn.Module):
    """Learned count projection added to gene embeddings (layers.py:45-52)."""

    n_embed: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, genes: jax.Array, counts: jax.Array) -> jax.Array:
        return genes + _dense(self.n_embed, True, self.dtype, name="count_embedding")(counts)


class ProjectionConcat(nn.Module):
    """Concat [gene_emb, log1p(counts)] then mix (layers.py:55-63)."""

    n_embed: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, genes: jax.Array, counts: jax.Array) -> jax.Array:
        log_counts = jnp.broadcast_to(jnp.log1p(counts), genes.shape)
        return _dense(self.n_embed, True, self.dtype, name="mix")(
            jnp.concatenate([genes, log_counts], axis=-1)
        )


class SoftBinProjection(nn.Module):
    """Soft-binned count embedding (layers.py:66-77)."""

    n_embed: int
    n_bins: int = 10
    hidden_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, genes: jax.Array, counts: jax.Array) -> jax.Array:
        h = _dense(self.hidden_dim, True, self.dtype, name="mlp_count_0")(counts)
        bin_logits = _dense(self.n_bins, True, self.dtype, name="mlp_count_1")(nn.silu(h))
        bin_weights = jax.nn.softmax(bin_logits, axis=-1)
        bin_embeddings = self.param(
            "bin_embeddings", nn.initializers.normal(1.0), (self.n_bins, self.n_embed), jnp.float32
        )
        count_embedding = jnp.einsum(
            "...k,kd->...d", bin_weights, bin_embeddings.astype(self.dtype)
        )
        return genes + count_embedding


class InputTransformerVAE(nn.Module):
    """Gene-embedding table + count-injection (reference layers.py:97-118).

    Embedding row 0 is the <MASK> token (n_genes + 1 rows total).
    """

    n_genes: int
    n_embed: int
    agg_func: str = "log1p"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.gene_embedding = nn.Embed(
            self.n_genes + 1,
            self.n_embed,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            embedding_init=nn.initializers.normal(1.0),
            name="gene_embedding",
        )
        if self.agg_func == "proj":
            self.projection = Projection(self.n_embed, dtype=self.dtype)
        elif self.agg_func == "projconcat":
            self.projection = ProjectionConcat(self.n_embed, dtype=self.dtype)
        elif self.agg_func == "softbin":
            self.projection = SoftBinProjection(self.n_embed, dtype=self.dtype)
        elif self.agg_func in COUNT_TRANSFORMS:
            self.projection = COUNT_TRANSFORMS[self.agg_func]
        else:
            raise ValueError(f"Unknown agg_func: {self.agg_func}")

    def __call__(self, counts: jax.Array, genes: jax.Array) -> jax.Array:
        genes_emb = self.gene_embedding(genes)
        out = self.projection(genes_emb, counts[..., None].astype(genes_emb.dtype))
        if os.environ.get("SCLDM_EMBED_BARRIER"):
            # trace-time probe (round 5): pin the fusion boundary after the
            # count-injected embedding. profile_vae shows the embed segment
            # alone goes superlinear at B>128 (1.14 -> 7.47 ms for 2x rows at
            # dentate shapes) while the isolated gather is sublinear
            # (bench_gather) — i.e. the cost is an XLA fusion/layout choice
            # in the larger program, which this barrier isolates.
            out = jax.lax.optimization_barrier(out)
        return out

    def embed_genes(self, genes: jax.Array) -> jax.Array:
        """Gene-embedding lookup only (used by the decoder when shared)."""
        return self.gene_embedding(genes)


# ---------------------------------------------------------------------------
# Attention modules (reference layers.py:121-264)
# ---------------------------------------------------------------------------
class SelfAttention(nn.Module):
    """Fused-qkv multi-head self-attention (reference layers.py:121-158)."""

    n_embed: int
    n_head: int
    dropout: float = 0.0
    bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        B, S, D = x.shape
        qkv = _dense(3 * self.n_embed, self.bias, self.dtype, name="c_attn")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = D // self.n_head
        q = q.reshape(B, S, self.n_head, hd)
        k = k.reshape(B, S, self.n_head, hd)
        v = v.reshape(B, S, self.n_head, hd)
        y = sdpa(q, k, v)  # (B, S, H, hd)
        y = y.reshape(B, S, D)
        y = _dense(self.n_embed, self.bias, self.dtype, name="c_proj")(y)
        if self.dropout > 0.0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y


class CrossAttention(nn.Module):
    """Cross-attention: kv from x, q projected separately (layers.py:229-264)."""

    n_embed: int
    n_head: int
    dropout: float = 0.0
    bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, q: jax.Array, deterministic: bool = True) -> jax.Array:
        B, S, _ = x.shape
        M, Dout = q.shape[-2], q.shape[-1]
        kv = _dense(2 * self.n_embed, self.bias, self.dtype, name="c_attn")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        q = _dense(self.n_embed, self.bias, self.dtype, name="c_attn_q")(q)
        hd = Dout // self.n_head
        k = k.reshape(B, S, self.n_head, hd)
        v = v.reshape(B, S, self.n_head, hd)
        if q.ndim == 2:
            # batch-shared queries: project once, attend per batch element
            y = sdpa_shared_q(q.reshape(M, self.n_head, hd), k, v)
        else:
            y = sdpa(q.reshape(B, M, self.n_head, hd), k, v)
        y = y.reshape(B, M, Dout)
        y = _dense(self.n_embed, self.bias, self.dtype, name="c_proj")(y)
        if self.dropout > 0.0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y


class MLP(nn.Module):
    """SwiGLU MLP with hidden = multiple_of-rounded 2/3·4·E (layers.py:161-174)."""

    n_embed: int
    multiple_of: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = int(2 * (self.n_embed * 4) / 3)
        hidden = self.multiple_of * ((hidden + self.multiple_of - 1) // self.multiple_of)
        w1 = _dense(hidden, False, self.dtype, name="w1")(x)
        w2 = _dense(hidden, False, self.dtype, name="w2")(x)
        return _dense(self.n_embed, False, self.dtype, name="c_proj")(nn.silu(w1) * w2)


class Block(nn.Module):
    """Pre-LN transformer block with optional adaLN-zero (layers.py:177-226)."""

    n_embed: int
    n_head: int
    dropout: float = 0.0
    bias: bool = False
    multiple_of: int = 4
    layernorm_eps: float = 1e-8
    use_adaln: bool = False
    elementwise_affine: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        condition: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        ln = lambda name: LayerNormFP32(
            epsilon=self.layernorm_eps,
            use_scale=self.elementwise_affine,
            use_bias=self.elementwise_affine,
            name=name,
        )
        attn = SelfAttention(
            self.n_embed, self.n_head, self.dropout, self.bias, dtype=self.dtype, name="attn"
        )
        mlp = MLP(self.n_embed, self.multiple_of, dtype=self.dtype, name="mlp")

        if self.use_adaln:
            # adaLN-zero: 6E modulation from the condition, zero-init (nnets.py:480-484)
            mod = _dense(
                6 * self.n_embed,
                True,
                self.dtype,
                name="adaln_modulation",
                kernel_init=nn.initializers.zeros,
            )(nn.silu(condition))
            (shift_attn, scale_attn, gate_attn, shift_mlp, scale_mlp, gate_mlp) = jnp.split(
                mod, 6, axis=-1
            )
            # reference quirk (layers.py:146-153): modulate() is called with
            # swapped arguments — the chunk NAMED shift multiplies and the one
            # named scale shifts. Preserved for checkpoint-import parity
            # (pinned by tests/test_torch_parity_ldm.py).
            h = modulate(ln("ln_1")(x), scale_attn, shift_attn)
            x = x + gate_attn * attn(h, deterministic=deterministic)
            h = modulate(ln("ln_2")(x), scale_mlp, shift_mlp)
            x = x + gate_mlp * mlp(h)
        else:
            x = x + attn(ln("ln_1")(x), deterministic=deterministic)
            x = x + mlp(ln("ln_2")(x))
        return x


class CrossAttentionBlock(nn.Module):
    """The MCAB (reference layers.py:267-333).

    With `n_inducing_points > 0` a learned query set pools the token axis
    (permutation-invariant pooling); with 0, caller-provided queries unpool
    (permutation-equivariant). Residual connects to the *queries*:
    out = q + attn(ln(x), ln(q)), then a SwiGLU MLP residual.
    """

    n_embed: int
    n_inducing_points: int
    n_head: int
    dropout: float = 0.0
    bias: bool = False
    multiple_of: int = 4
    layernorm_eps: float = 1e-8
    use_adaln: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        q: Optional[jax.Array] = None,
        condition: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        B = x.shape[0]
        if self.n_inducing_points > 0 and q is None:
            inducing = self.param(
                "inducing_points",
                nn.initializers.normal(1.0),
                (self.n_inducing_points, self.n_embed),
                jnp.float32,
            )
            q = jnp.broadcast_to(
                inducing.astype(self.dtype)[None], (B, self.n_inducing_points, self.n_embed)
            )
        assert q is not None, "queries required when n_inducing_points == 0"

        ln = lambda name, affine=True: LayerNormFP32(
            epsilon=self.layernorm_eps, use_scale=affine, use_bias=affine, name=name
        )
        attn = CrossAttention(
            self.n_embed, self.n_head, self.dropout, self.bias, dtype=self.dtype, name="attn"
        )
        mlp = MLP(self.n_embed, self.multiple_of, dtype=self.dtype, name="mlp")

        if self.use_adaln:
            if q.ndim == 2:
                # per-batch modulation of the queries forces the batched layout
                q = jnp.broadcast_to(q[None], (B,) + q.shape)
            mod = _dense(
                6 * self.n_embed,
                True,
                self.dtype,
                name="adaln_modulation",
                kernel_init=nn.initializers.zeros,
            )(nn.silu(condition))
            shift_attn, scale_attn, gate_attn, shift_mlp, scale_mlp, gate_mlp = jnp.split(
                mod, 6, axis=-1
            )
            mod_q = _dense(
                2 * self.n_embed,
                True,
                self.dtype,
                name="adaln_modulation_q",
                kernel_init=nn.initializers.zeros,
            )(nn.silu(condition))
            shift_q, scale_q = jnp.split(mod_q, 2, axis=-1)
            # same swapped-argument quirk as Block (reference layers.py:48-56)
            h_x = modulate(ln("ln_1")(x), scale_attn, shift_attn)
            h_q = modulate(ln("ln_1q")(q), scale_q, shift_q)
            out = q + gate_attn * attn(h_x, h_q, deterministic=deterministic)
            out = out + gate_mlp * mlp(modulate(ln("ln_2")(out), scale_mlp, shift_mlp))
        else:
            y = attn(ln("ln_1")(x), ln("ln_1q")(q), deterministic=deterministic)
            out = (q[None] if q.ndim == 2 else q) + y
            out = out + mlp(ln("ln_2")(out))
        return out


# ---------------------------------------------------------------------------
# DiT support layers (reference layers.py:339-401)
# ---------------------------------------------------------------------------
class TimestepEmbedder(nn.Module):
    """Sinusoidal timestep embedding -> 2-layer MLP (layers.py:339-364)."""

    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def timestep_embedding(t: jax.Array, dim: int, max_period: int = 10_000) -> jax.Array:
        half = dim // 2
        freqs = jnp.exp(
            -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = t[:, None].astype(jnp.float32) * freqs[None]
        embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        if dim % 2:
            embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
        return embedding

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        t_freq = self.timestep_embedding(t, self.frequency_embedding_size)
        # normal(0.02) init parity with reference nnets.py:477-478
        init = nn.initializers.normal(0.02)
        h = _dense(self.hidden_size, True, self.dtype, name="mlp_0", kernel_init=init)(
            t_freq.astype(self.dtype)
        )
        return _dense(self.hidden_size, True, self.dtype, name="mlp_2", kernel_init=init)(
            nn.silu(h)
        )


def get_1d_sincos_pos_embed(embed_dim: int, seq_len: int) -> np.ndarray:
    """Frozen 1-D sin-cos positional table (layers.py:367-385); numpy on host."""
    assert embed_dim % 2 == 0, "Embedding dimension must be even"
    positions = np.arange(seq_len, dtype=np.float32).reshape(-1, 1)
    omega = np.arange(embed_dim // 2, dtype=np.float32) / (embed_dim / 2.0)
    omega = 1.0 / (10_000**omega)
    out = positions * omega.reshape(1, -1)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


class FinalLayerDiT(nn.Module):
    """adaLN-modulated output projection, zero-init (layers.py:388-401)."""

    n_embed: int
    n_embed_input: int
    bias: bool = True
    layernorm_eps: float = 1e-8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        mod = _dense(
            2 * self.n_embed,
            self.bias,
            self.dtype,
            name="adaln_modulation",
            kernel_init=nn.initializers.zeros,
        )(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = modulate(
            LayerNormFP32(
                epsilon=self.layernorm_eps, use_scale=False, use_bias=False, name="norm_final"
            )(x),
            shift,
            scale,
        )
        # zero-init output layer (nnets.py:490-492)
        return _dense(
            self.n_embed_input,
            self.bias,
            self.dtype,
            name="linear",
            kernel_init=nn.initializers.zeros,
        )(x)
