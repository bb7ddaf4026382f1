"""Network cores: set Encoder/Decoder (MCAB) and the DiT denoiser.

Parity with reference src/scldm/nnets.py, TPU-first:
- static shapes everywhere (token counts fixed by config),
- conditioning randomness (CFG dropout, mutually-exclusive class selection) is
  drawn from an explicit flax rng collection ("condition") instead of torch
  globals, expressed with traced `where`s (nnets.py:389-456 semantics),
- classifier-free-guidance sampling uses the reference's doubled-batch scheme
  (nnets.py:336-378).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scldm_tpu.nn.layers import (
    Block,
    CrossAttentionBlock,
    FinalLayerDiT,
    LayerNormFP32,
    TimestepEmbedder,
    _dense,
    get_1d_sincos_pos_embed,
)


# ---------------------------------------------------------------------------
# scVI-style MLP baseline (nnets.py:19-73)
# ---------------------------------------------------------------------------
class EncoderScvi(nn.Module):
    n_genes: int
    n_hidden: int
    n_layers: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = jnp.log1p(x)
        for i in range(self.n_layers):
            x = _dense(self.n_hidden, True, self.dtype, name=f"dense_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(x)
            x = nn.silu(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x


class DecoderScvi(nn.Module):
    n_latent: int
    n_hidden: int
    n_layers: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(self.n_layers):
            x = _dense(self.n_hidden, True, self.dtype, name=f"dense_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(x)
            x = nn.silu(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x


# ---------------------------------------------------------------------------
# Set encoder: MCAB pooling (nnets.py:81-144)
# ---------------------------------------------------------------------------
class Encoder(nn.Module):
    """Permutation-invariant pooling encoder.

    One MCAB with learned inducing points pools S gene tokens into
    `n_inducing_points` latent tokens, then `n_layer` self-attention blocks over
    the (small) latent token axis, then Linear(E -> E_latent) + non-affine LN.

    Quirk preserved from the reference: `positional_encoding=True` adds a
    zero-initialized, never-trained pos-embed — a no-op kept for checkpoint
    compatibility (reference nnets.py:104, parameter frozen at zeros).
    """

    n_layer: int
    n_inducing_points: int
    n_embed: int
    n_embed_latent: int
    n_head: int
    n_head_cross: int
    dropout: float = 0.0
    bias: bool = False
    multiple_of: int = 4
    layernorm_eps: float = 1e-8
    positional_encoding: bool = False
    remat: bool = False  # rematerialize block activations (census-scale memory)
    dtype: jnp.dtype = jnp.float32

    @property
    def latent_embedding(self) -> int:
        return self.n_embed_latent

    @property
    def latent_dim(self) -> int:
        return self.n_inducing_points

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        skip_pool: bool = False,
        pool_only: bool = False,
    ) -> jax.Array:
        if not skip_pool:
            x = CrossAttentionBlock(
                n_embed=self.n_embed,
                n_inducing_points=self.n_inducing_points,
                n_head=self.n_head_cross,
                dropout=self.dropout,
                bias=self.bias,
                multiple_of=self.multiple_of,
                layernorm_eps=self.layernorm_eps,
                dtype=self.dtype,
                name="ca_layer",
            )(x, deterministic=not train)
        # skip_pool: x is the already-pooled (B, M, E) MCAB output — the fused
        # encoder-pooling kernel (ops/fused_encoder.py) computed ca_layer

        if self.positional_encoding:
            pos = self.param(
                "pos_embed",
                nn.initializers.zeros,
                (1, self.n_inducing_points, self.n_embed),
                jnp.float32,
            )
            x = x + jax.lax.stop_gradient(pos.astype(x.dtype))

        if pool_only:
            # the caller runs the block stack + latent proj/LN as one fused
            # Pallas kernel (scldm_tpu.ops.fused_trunk); x is the pooled tokens
            return x

        block_cls = (
            # deterministic must ride POSITIONALLY under remat: flax's
            # lift forwards kwargs into jax.remat as traced values
            # (static_argnums covers positionals only), and Dropout
            # branches on the bool — a kwarg crashes at trace with
            # dropout>0. Index 3 counts self, x, condition.
            nn.remat(Block, static_argnums=(3,)) if self.remat else Block
        )
        for i in range(self.n_layer):
            x = block_cls(
                n_embed=self.n_embed,
                n_head=self.n_head,
                dropout=self.dropout,
                bias=self.bias,
                multiple_of=self.multiple_of,
                layernorm_eps=self.layernorm_eps,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, None, not train)

        h = _dense(self.n_embed_latent, self.bias, self.dtype, name="latent_proj")(x)
        h = LayerNormFP32(
            epsilon=self.layernorm_eps, use_scale=False, use_bias=False, name="latent_ln"
        )(h)
        return h


# ---------------------------------------------------------------------------
# Set decoder: equivariant unpooling (nnets.py:147-208)
# ---------------------------------------------------------------------------
class Decoder(nn.Module):
    """Latent tokens -> per-gene hidden states via gene-embedding queries.

    `shared_embedding=True` (default config) means the caller passes
    pre-embedded gene queries from the input layer's table; otherwise this
    module owns its own (n_genes+1, E) table.
    """

    n_genes: int
    n_embed: int
    n_embed_latent: int
    n_head: int
    n_head_cross: int
    n_layer: int
    n_inducing_points: int
    dropout: float = 0.0
    bias: bool = False
    multiple_of: int = 4
    layernorm_eps: float = 1e-8
    shared_embedding: bool = True
    use_adaln: bool = False
    remat: bool = False
    # rematerialize the gene-axis cross block in backward: its SwiGLU hidden
    # (B, G, ~2.75E) is the single largest activation at census scale (3 GB
    # per tensor at B=32/G=36601/E=512) — recomputing it trades ~one extra
    # cross forward for the HBM that otherwise caps the batch size
    remat_cross: bool = False
    # split the gene/query axis of the cross block into this many chunks
    # (exact: genes only interact with the latent kv, never each other).
    # Combined with remat_cross, peak memory falls from 4x(B,G,H) to
    # 4x(B,G/chunks,H): remat alone cannot help because the MLP *backward*
    # needs its hidden activation and hidden gradient live simultaneously
    cross_chunks: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, M, E_latent)
        genes: Optional[jax.Array] = None,  # (B,G)/(G,) ids or (B,G,E)/(G,E) pre-embedded
        condition: Optional[jax.Array] = None,
        train: bool = False,
        trunk_only: bool = False,  # stop before the cross block (fused-kernel path)
    ) -> jax.Array:
        x = LayerNormFP32(
            epsilon=self.layernorm_eps, use_scale=False, use_bias=False, name="latent_ln"
        )(x)
        x = _dense(self.n_embed, self.bias, self.dtype, name="latent_proj")(x)

        block_cls = (
            # deterministic must ride POSITIONALLY under remat: flax's
            # lift forwards kwargs into jax.remat as traced values
            # (static_argnums covers positionals only), and Dropout
            # branches on the bool — a kwarg crashes at trace with
            # dropout>0. Index 3 counts self, x, condition.
            nn.remat(Block, static_argnums=(3,)) if self.remat else Block
        )
        for i in range(self.n_layer):
            x = block_cls(
                n_embed=self.n_embed,
                n_head=self.n_head,
                dropout=self.dropout,
                bias=self.bias,
                multiple_of=self.multiple_of,
                layernorm_eps=self.layernorm_eps,
                use_adaln=self.use_adaln,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, condition, not train)

        if trunk_only:
            # the caller runs the cross block + head as one fused Pallas kernel
            # (scldm_tpu.ops.fused_decoder); x here is the pre-cross latent
            return x

        if self.shared_embedding:
            # pre-embedded queries: (B, G, E), or (G, E) when the gene list is
            # canonical/batch-shared (the training + generation hot path —
            # LN/q-proj then run once, not per batch element)
            assert genes.ndim in (2, 3) and jnp.issubdtype(genes.dtype, jnp.floating), (
                "shared_embedding=True expects pre-embedded gene queries"
            )
            q = genes
        else:
            q = nn.Embed(
                self.n_genes + 1,
                self.n_embed,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                embedding_init=nn.initializers.normal(1.0),
                name="gene_embedding",
            )(genes)

        cross_cls = (
            nn.remat(CrossAttentionBlock, static_argnums=(4,))
            if self.remat_cross
            else CrossAttentionBlock
        )
        cross = cross_cls(
            n_embed=self.n_embed,
            n_inducing_points=0,
            n_head=self.n_head_cross,
            dropout=self.dropout,
            bias=self.bias,
            multiple_of=self.multiple_of,
            layernorm_eps=self.layernorm_eps,
            use_adaln=self.use_adaln,
            dtype=self.dtype,
            name="decoder_cross_attention",
        )
        if self.cross_chunks <= 1:
            return cross(x, q, condition, not train)

        # chunked gene axis: same module (shared params) applied per slice —
        # exact because queries attend only to the latent kv
        axis = q.ndim - 2
        G = q.shape[axis]
        cs = -(-G // self.cross_chunks)
        pad = cs * self.cross_chunks - G
        if pad:
            widths = [(0, 0)] * q.ndim
            widths[axis] = (0, pad)
            q = jnp.pad(q, widths)
        outs = [
            cross(
                x,
                jax.lax.slice_in_dim(q, i * cs, (i + 1) * cs, axis=axis),
                condition,
                not train,
            )
            for i in range(self.cross_chunks)
        ]
        out = jnp.concatenate(outs, axis=-2)
        return out[..., :G, :] if pad else out


def build_cfg_segments(x, t, condition, cfg_scale, class_vocab_sizes, strategy):
    """Construct the fused-CFG row layout: [uncond(2B) | per-class cond(B)...].

    Shared by DiT.forward_with_cfg_batched and the Pallas fused-DiT sampler
    path. Returns (seg_x, seg_t, seg_cond, scale_segments, batch, half)."""
    batch = x.shape[0]
    half = batch // 2
    class_names = tuple(sorted(class_vocab_sizes.keys()))

    def null(n, rows):
        return jnp.full((rows,), class_vocab_sizes[n], dtype=jnp.int32)

    if not (condition and cfg_scale and class_names):
        return (
            x,
            t,
            {n: null(n, batch) for n in class_names},
            [],
            batch,
            half,
        )

    if strategy == "joint":
        seg_x = jnp.concatenate([x, x[half:]])
        seg_t = jnp.concatenate([t, t[half:]])
        # classes absent from the (possibly partial) condition ride as nulls
        seg_cond = {
            n: jnp.concatenate([
                null(n, batch),
                condition[n][half:].astype(jnp.int32) if n in condition else null(n, half),
            ])
            for n in class_names
        }
        scale_segments = [("__joint__", sum(cfg_scale.values()) / len(cfg_scale))]
    else:
        scale_names = sorted(cfg_scale.keys())
        seg_x = jnp.concatenate([x] + [x[half:]] * len(scale_names))
        seg_t = jnp.concatenate([t] + [t[half:]] * len(scale_names))
        seg_cond = {}
        for n in class_names:
            cols = [null(n, batch)]
            for name in scale_names:
                cols.append(
                    condition[n][half:].astype(jnp.int32)
                    if n == name and n in condition
                    else null(n, half)
                )
            seg_cond[n] = jnp.concatenate(cols)
        scale_segments = [(name, cfg_scale[name]) for name in scale_names]
    return seg_x, seg_t, seg_cond, scale_segments, batch, half


def combine_cfg_segments(out, scale_segments, batch, half):
    """Fold the segmented model output back into [uncond(B/2) | guided(B/2)]."""
    uncond_out = out[:batch]
    base_half = uncond_out[half:]
    guided = base_half
    for i, (_, scale) in enumerate(scale_segments):
        cond_pred = out[batch + i * half : batch + (i + 1) * half]
        guided = guided + scale * (cond_pred - base_half)
    return jnp.concatenate([uncond_out[:half], guided])


# ---------------------------------------------------------------------------
# DiT denoiser (nnets.py:216-492)
# ---------------------------------------------------------------------------
class DiT(nn.Module):
    """Diffusion Transformer over latent tokens with adaLN-zero conditioning.

    `class_vocab_sizes` maps condition-column name -> vocab size; each class
    embedding table holds one extra null row at index `vocab_size` used both
    for CFG dropout during training and as the unconditional token during
    guidance (nnets.py:239-242).
    """

    n_embed: int
    n_embed_input: int
    n_layer: int
    n_head: int
    seq_len: int
    dropout: float = 0.0
    bias: bool = True
    multiple_of: int = 4
    layernorm_eps: float = 1e-8
    class_vocab_sizes: Dict[str, int] = None
    cfg_dropout_prob: float = 0.1
    condition_strategy: str = "mutually_exclusive"  # or "joint"
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        vocab = self.class_vocab_sizes or {}
        use_cfg_embedding = int(self.cfg_dropout_prob > 0)
        self.class_names = tuple(sorted(vocab.keys()))
        self.class_embeddings = {
            name: nn.Embed(
                vocab[name] + use_cfg_embedding,
                self.n_embed,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                embedding_init=nn.initializers.normal(0.02),
                name=f"class_embedding_{name}",
            )
            for name in self.class_names
        }
        self.t_embedder = TimestepEmbedder(self.n_embed, dtype=self.dtype, name="t_embedder")
        block_cls = (
            # deterministic must ride POSITIONALLY under remat: flax's
            # lift forwards kwargs into jax.remat as traced values
            # (static_argnums covers positionals only), and Dropout
            # branches on the bool — a kwarg crashes at trace with
            # dropout>0. Index 3 counts self, x, condition.
            nn.remat(Block, static_argnums=(3,)) if self.remat else Block
        )
        self.blocks = [
            block_cls(
                n_embed=self.n_embed,
                n_head=self.n_head,
                dropout=self.dropout,
                bias=self.bias,
                multiple_of=self.multiple_of,
                layernorm_eps=self.layernorm_eps,
                use_adaln=True,
                elementwise_affine=False,
                dtype=self.dtype,
                name=f"block_{i}",
            )
            for i in range(self.n_layer)
        ]
        self.input_proj = _dense(self.n_embed, self.bias, self.dtype, name="input_proj")
        self.final_layer = FinalLayerDiT(
            self.n_embed,
            self.n_embed_input,
            self.bias,
            self.layernorm_eps,
            dtype=self.dtype,
            name="final_layer",
        )
        # frozen sin-cos positional table (nnets.py:469-470) — a compile-time
        # constant, the TPU analog of a requires_grad=False buffer
        self.pos_embed = jnp.asarray(
            get_1d_sincos_pos_embed(self.n_embed, self.seq_len)[None], jnp.float32
        )

    # -- conditioning (nnets.py:380-456) -------------------------------------
    def _null_tokens(self, name: str, batch: int) -> jax.Array:
        if self.cfg_dropout_prob <= 0:
            # the table has vocab_size + (cfg_dropout_prob > 0) rows, so with
            # no CFG row index vocab_size is out of bounds — XLA would CLAMP
            # the gather and the "null" token would silently alias the last
            # real class (the torch reference would device-assert instead)
            raise ValueError(
                f"null token for {name!r} needs the CFG embedding row, but "
                "cfg_dropout_prob=0 allocated none; train with "
                "cfg_dropout_prob>0 (reference default 0.8) to use "
                "CFG/null conditioning"
            )
        return jnp.full((batch,), self.class_vocab_sizes[name], dtype=jnp.int32)

    def _mutually_exclusive_embedding(
        self, condition: Dict[str, jax.Array], batch: int, force_drop_ids: bool
    ) -> jax.Array:
        available = [n for n in self.class_names if n in condition]
        if available and (force_drop_ids or len(available) > 1) and self.has_rng("condition"):
            rng = self.make_rng("condition")
            k_sel, k_drop = jax.random.split(rng)
            selected = jax.random.randint(k_sel, (), 0, len(available))
            drop_mask = (
                jax.random.uniform(k_drop, (batch,)) < self.cfg_dropout_prob
                if force_drop_ids
                else None
            )
        else:
            # no "condition" rng provided: deterministic first-class selection,
            # no dropout. (The reference draws from torch's unseeded global rng
            # even at eval, nnets.py:395 — callers that want the stochastic
            # selection pass rngs={"condition": key}.)
            if force_drop_ids:
                raise ValueError("training CFG dropout requires rngs={'condition': key}")
            selected = jnp.asarray(0)
            drop_mask = None

        emb = jnp.zeros((batch, self.n_embed), self.dtype)
        single = len(self.class_names) == 1 and drop_mask is None
        for name in self.class_names:
            if name in available:
                i = available.index(name)
                cond_vals = condition[name].astype(jnp.int32)
                if single:
                    # one class, no dropout: no null token is ever consumed,
                    # so this path stays legal at cfg_dropout_prob=0
                    emb = emb + self.class_embeddings[name](cond_vals)
                    continue
                null_vals = self._null_tokens(name, batch)
                if drop_mask is not None:
                    cond_or_null = jnp.where(drop_mask, null_vals, cond_vals)
                else:
                    cond_or_null = cond_vals
                vals = jnp.where(selected == i, cond_or_null, null_vals)
            else:
                vals = self._null_tokens(name, batch)
            emb = emb + self.class_embeddings[name](vals)
        return emb[:, None, :]

    def _joint_embedding(
        self, condition: Dict[str, jax.Array], batch: int, force_drop_ids: bool
    ) -> jax.Array:
        available = [n for n in self.class_names if n in condition]
        if not available:
            return jnp.zeros((batch, 1, self.n_embed), self.dtype)
        if force_drop_ids:
            rng = self.make_rng("condition")
            drop_mask = jax.random.uniform(rng, (batch,)) < self.cfg_dropout_prob
        else:
            drop_mask = jnp.zeros((batch,), bool)
        emb = jnp.zeros((batch, self.n_embed), self.dtype)
        for name in self.class_names:
            null_vals = self._null_tokens(name, batch)
            if name in condition:  # absent classes ride as null tokens, same
                vals = condition[name].astype(jnp.int32)  # as mutually-excl.
                final_vals = jnp.where(drop_mask, null_vals, vals)
            else:
                final_vals = null_vals
            emb = emb + self.class_embeddings[name](final_vals)
        return emb[:, None, :]

    def _get_condition_embedding(
        self, condition: Dict[str, jax.Array], batch: int, force_drop_ids: bool
    ) -> Optional[jax.Array]:
        if not self.class_names or not condition:
            return None
        if self.condition_strategy == "joint":
            return self._joint_embedding(condition, batch, force_drop_ids)
        return self._mutually_exclusive_embedding(condition, batch, force_drop_ids)

    def embed_condition(
        self,
        t: jax.Array,
        condition: Optional[Dict[str, jax.Array]] = None,
        force_drop_ids: Optional[bool] = None,
        train: bool = False,
    ) -> jax.Array:
        """Timestep + class-condition embedding only (rows, n_embed) — used by
        the fused-kernel training path, which runs the trunk outside the module
        (ops.fused_dit.fused_dit_train_apply) while keeping the conditioning
        rng semantics identical to __call__."""
        if force_drop_ids is None:
            force_drop_ids = train
        t_embedding = self.t_embedder(t)[:, None, :]
        cond_emb = self._get_condition_embedding(condition or {}, t.shape[0], force_drop_ids)
        if cond_emb is not None:
            t_embedding = t_embedding + cond_emb
        return t_embedding[:, 0, :]

    # -- forward (nnets.py:273-297) -------------------------------------------
    def _trunk(self, x: jax.Array, t_embedding: jax.Array, train: bool) -> jax.Array:
        x = self.input_proj(x.astype(self.dtype))
        x = x + self.pos_embed.astype(x.dtype)
        for block in self.blocks:
            x = block(x, t_embedding, not train)
        return self.final_layer(x, t_embedding).astype(jnp.float32)

    def __call__(
        self,
        x: jax.Array,  # (B, seq_len, n_embed_input)
        t: jax.Array,  # (B,)
        condition: Optional[Dict[str, jax.Array]] = None,
        force_drop_ids: Optional[bool] = None,
        train: bool = False,
    ) -> jax.Array:
        if force_drop_ids is None:
            force_drop_ids = train
        t_embedding = self.t_embedder(t)[:, None, :]

        cond_emb = self._get_condition_embedding(condition or {}, x.shape[0], force_drop_ids)
        if cond_emb is not None:
            t_embedding = t_embedding + cond_emb

        return self._trunk(x, t_embedding, train)

    # -- CFG sampling (nnets.py:336-378) ---------------------------------------
    def forward_with_cfg(
        self,
        x: jax.Array,
        t: jax.Array,
        condition: Optional[Dict[str, jax.Array]] = None,
        cfg_scale: Optional[Dict[str, float]] = None,
    ) -> jax.Array:
        """Doubled-batch CFG: first half unconditional, second half guided."""
        batch = x.shape[0]
        half = batch // 2

        uncond_condition = {n: self._null_tokens(n, batch) for n in self.class_names}
        uncond_out = self(x, t, uncond_condition, force_drop_ids=False)

        uncond_half = uncond_out[:half]
        base_half = uncond_out[half:]
        cond_out_half = base_half

        if condition is not None and cfg_scale is not None:
            x_half, t_half = x[half:], t[half:]
            if self.condition_strategy == "joint":
                full_cond_half = {k: v[half:] for k, v in condition.items()}
                cond_pred = self(x_half, t_half, full_cond_half, force_drop_ids=False)
                avg_scale = sum(cfg_scale.values()) / len(cfg_scale)
                cond_out_half = cond_out_half + avg_scale * (cond_pred - base_half)
            else:
                for name in sorted(cfg_scale.keys()):
                    single = {name: condition[name][half:]}
                    cond_pred = self(x_half, t_half, single, force_drop_ids=False)
                    cond_out_half = cond_out_half + cfg_scale[name] * (cond_pred - base_half)

        return jnp.concatenate([uncond_half, cond_out_half], axis=0)

    def forward_with_cfg_batched(
        self,
        x: jax.Array,
        t: jax.Array,
        condition: Optional[Dict[str, jax.Array]] = None,
        cfg_scale: Optional[Dict[str, float]] = None,
    ) -> jax.Array:
        """`forward_with_cfg` with all guidance branches fused into ONE model
        call: rows = [uncond(2B) | class_1 cond(B) | ... | class_k cond(B)].

        Per-row conditioning uses the no-dropout sum of class embeddings with
        null tokens for inactive classes — exactly what the reference's
        per-segment single-class forwards compute (the mutually-exclusive
        embedding with one available class degenerates to cond_emb + null
        embeddings of the other classes). Equivalence-tested against
        forward_with_cfg for both strategies."""
        seg_x, seg_t, seg_cond, scale_segments, batch, half = build_cfg_segments(
            x, t, condition, cfg_scale, self.class_vocab_sizes or {}, self.condition_strategy
        )
        if not scale_segments:
            return self(seg_x, seg_t, seg_cond, force_drop_ids=False)

        t_embedding = self.t_embedder(seg_t)[:, None, :]
        # no-dropout per-row sum of class embeddings (see docstring)
        t_embedding = t_embedding + self._joint_embedding(
            seg_cond, seg_x.shape[0], force_drop_ids=False
        )
        out = self._trunk(seg_x, t_embedding, train=False)
        return combine_cfg_segments(out, scale_segments, batch, half)

    def forward_with_cfg_joint(
        self,
        x: jax.Array,
        t: jax.Array,
        condition: Optional[Dict[str, jax.Array]] = None,
        cfg_scale: Optional[Dict[str, float]] = None,
    ) -> jax.Array:
        """Full-batch additive guidance (nnets.py:299-334)."""
        batch = x.shape[0]
        uncond_condition = {n: self._null_tokens(n, batch) for n in self.class_names}
        uncond_out = self(x, t, uncond_condition, force_drop_ids=False)
        guided = uncond_out
        if condition is not None and cfg_scale is not None:
            cond_out = self(x, t, condition, force_drop_ids=False)
            scale = next(iter(cfg_scale.values()))
            guided = guided + scale * (cond_out - uncond_out)
        return guided
