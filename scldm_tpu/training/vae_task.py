"""VAE training task: loss, jitted train/eval steps, DP over the mesh.

Replaces the reference `models.VAE` LightningModule (models.py:169-381) with a
functional task: one donated jitted train step (forward + NB NLL + AdamWLegacy
update + schedule) whose batch axis is sharded over the mesh "data" axis —
XLA's psum on the mean-reduced loss/grads is the DDP all-reduce.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scldm_tpu.constants import ModelEnum
from scldm_tpu.nn.heads import GaussianTransformerHead
from scldm_tpu.nn.vae import TransformerVAE
from scldm_tpu.ops.distributions import log_gaussian, log_nb_positive, nb_sample
from scldm_tpu.ops.transforms import log1p_cpm
from scldm_tpu.training import metrics as M
from scldm_tpu.training.optim import adamw_legacy, wsd_schedule
from scldm_tpu.training.state import TrainState, create_train_state

COUNTS = ModelEnum.COUNTS.value
GENES = ModelEnum.GENES.value
LIB = ModelEnum.LIBRARY_SIZE.value
C_SUB = ModelEnum.COUNTS_SUBSET.value
G_SUB = ModelEnum.GENES_SUBSET.value


def _ln_affine(x: jax.Array, tree: Dict, eps: float) -> jax.Array:
    m = x.mean(-1, keepdims=True)
    v = jnp.square(x - m).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * tree["scale"] + tree["bias"]


def _mcab_prep(vae: TransformerVAE, params):
    """Shared operands for the fused pooling kernels: block-diagonal query
    operand, LN1 affine + k/v projection weights, geometry."""
    from scldm_tpu.ops.fused_encoder import build_query_operand

    p = params["params"]
    ca = p["encoder"]["ca_layer"]
    eps = vae.encoder.layernorm_eps
    n_head = vae.encoder.n_head_cross
    E = vae.encoder.n_embed
    scale = 1.0 / ((E // n_head) ** 0.5)
    inducing = ca["inducing_points"].astype(jnp.float32)  # (Q, E)
    qn = _ln_affine(inducing, ca["ln_1q"]["LayerNorm_0"], eps)
    qp = qn @ ca["attn"]["c_attn_q"]["kernel"]
    qfull = build_query_operand(qp, n_head)  # (QH, E)
    wk, wv = jnp.split(ca["attn"]["c_attn"]["kernel"], 2, axis=-1)
    ln1 = ca["ln_1"]["LayerNorm_0"]
    weights = (ln1["scale"].reshape(1, E), ln1["bias"].reshape(1, E), wk, wv)
    return ca, inducing, qfull, weights, scale, eps, n_head


def _mcab_finish(vae, ca, inducing, qfull, weights, num, den, m, corr, scale, eps):
    """Zero-row correction + num/den division + c_proj + residual + MLP —
    the back half of the MCAB pooling shared by both kernel variants."""
    bf = jnp.bfloat16
    n_head = vae.encoder.n_head_cross
    E = vae.encoder.n_embed
    hd = E // n_head
    B = num.shape[0]
    wk, wv = weights[2], weights[3]

    if corr:
        # zero-row contribution, replicated with the kernel's exact op
        # sequence: emb=0 -> ln(0)=bias -> k0/v0 -> s0
        x0 = weights[1].astype(jnp.float32)  # (1, E)
        k0 = jnp.dot(x0.astype(bf), wk.astype(bf), preferred_element_type=jnp.float32)
        v0 = jnp.dot(x0.astype(bf), wv.astype(bf), preferred_element_type=jnp.float32)
        s0 = jax.lax.dot_general(
            k0.astype(bf), qfull.astype(bf), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, QH)
        e0 = jnp.exp(s0 * scale - m)  # (B, QH)
        den = den - float(corr) * e0
        num = num - float(corr) * e0[:, :, None] * v0[None]
    pooled = num / den[:, :, None]  # (B, QH, E)

    # per-head outputs live in each head's column block: take the diagonal
    Q = inducing.shape[0]
    y = jnp.einsum(
        "bhqhd->bqhd", pooled.reshape(B, n_head, Q, n_head, hd)
    ).reshape(B, Q, E)
    y = y @ ca["attn"]["c_proj"]["kernel"]

    out = inducing[None] + y  # residual connects to the raw queries
    hn = _ln_affine(out, ca["ln_2"]["LayerNorm_0"], eps)
    mlp = ca["mlp"]
    h1 = hn @ mlp["w1"]["kernel"]
    h2 = hn @ mlp["w2"]["kernel"]
    return out + (jax.nn.silu(h1) * h2) @ mlp["c_proj"]["kernel"]


def fused_encoder_pooling(
    vae: TransformerVAE,
    params,
    counts_dense: jax.Array,  # (B, G) — data (no gradient)
    window_len: int,  # genes_seq_len S of the packed token window
    interpret: bool = False,
) -> jax.Array:
    """Gather-free MCAB pooling over the dense gene axis -> (B, M, E).

    Computes input-embedding + ca_layer of the Encoder (nnets.py:81-144) via
    the flash-style Pallas kernel in ops/fused_encoder.py, plus the exact
    zero-row window correction (see that module's docstring). Only valid for
    the log1p count transform (zero count -> exactly zero embedding)."""
    from scldm_tpu.ops.fused_encoder import fused_encoder_pool

    ca, inducing, qfull, weights, scale, eps, n_head = _mcab_prep(vae, params)
    p = params["params"]
    table = p["input_layer"]["gene_embedding"]["embedding"][1:].astype(jnp.float32)
    B, G = counts_dense.shape
    block_g = 1024
    g_padded = G + ((-G) % min(block_g, G))

    num, den, m = fused_encoder_pool(
        counts_dense, table, qfull, weights, scale, eps, block_g, 8, interpret
    )
    m = jax.lax.stop_gradient(m)  # shift statistic: analytically grad-free
    # the window has (S - nnz) zero rows, the padded dense axis (g_padded -
    # nnz) -> subtract (g_padded - S)
    return _mcab_finish(
        vae, ca, inducing, qfull, weights, num, den, m,
        g_padded - window_len, scale, eps,
    )


def fused_window_pooling(
    vae: TransformerVAE,
    params,
    emb: jax.Array,  # (B, S, E) input_layer output (gathered token window)
    interpret: bool = False,
) -> jax.Array:
    """MCAB pooling over the packed token window -> (B, M, E) via the flash
    kernel (ops/fused_encoder.fused_window_pool). Any agg_func: the kernel
    consumes the embedding, not the counts.

    NOT wired into the default train path: measured 43.3 vs 40.3 ms/step at
    dentate shapes (B=128, S=6147, E=32) — XLA's saved-activation attention
    backward beats the recompute VJP when the (B, S, E) tensors fit HBM
    comfortably. Kept (tested) for long-window configs where they don't."""
    from scldm_tpu.ops.fused_encoder import fused_window_pool

    ca, inducing, qfull, weights, scale, eps, n_head = _mcab_prep(vae, params)
    B, S, E = emb.shape
    # tile sizes scale down with width: the kernel's VMEM working set is
    # ~(block_b*block_s*E + block_b*block_s*QH + block_b*QH*E) f32, and the
    # 1024x8 tiles that fit at E=32 exceed scoped VMEM at census width; the
    # backward's VJP recompute roughly doubles that, so it tiles half again
    block_s, block_b, bwd_block_s = (
        (512, 8, 256) if E >= 256 else (1024, 8, 0)
    )
    s_padded = S + ((-S) % min(block_s, S))

    num, den, m = fused_window_pool(
        emb, qfull, weights, scale, eps, block_s, block_b, bwd_block_s, interpret
    )
    m = jax.lax.stop_gradient(m)
    # only the kernel's own (s_padded - S) zero-emb pad rows need removing
    return _mcab_finish(
        vae, ca, inducing, qfull, weights, num, den, m, s_padded - S, scale, eps
    )


# fused-trunk kernel tile sizes (env-overridable for ablation sweeps)
import os as _os

TRUNK_BLOCK_ROWS = int(_os.environ.get("SCLDM_TRUNK_BR", "64"))
TRUNK_BWD_BLOCK_ROWS = int(_os.environ.get("SCLDM_TRUNK_BBR", "16"))


def _ln_noaffine(x: jax.Array, eps: float) -> jax.Array:
    m = x.mean(-1, keepdims=True)
    v = jnp.square(x - m).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps)


def _encoder_trunk_tail(vae: TransformerVAE, params, pooled, interpret: bool):
    """Encoder block stack (ONE Pallas kernel, ops/fused_trunk.py) + latent
    proj + non-affine LN — everything after the MCAB pooling. The zero-init,
    stop-gradient pos_embed quirk (nn/nnets.py Encoder) is frozen at zeros,
    so skipping it here is exact."""
    from scldm_tpu.ops.fused_trunk import extract_trunk_params, fused_trunk_blocks_trainable

    enc = params["params"]["encoder"]
    eps = vae.encoder.layernorm_eps
    dt = vae.encoder.dtype
    kp = extract_trunk_params(enc, vae.encoder.n_layer)
    h = fused_trunk_blocks_trainable(
        pooled.astype(dt), kp, vae.encoder.n_head, eps, TRUNK_BLOCK_ROWS, TRUNK_BWD_BLOCK_ROWS, interpret
    )
    h = (h @ enc["latent_proj"]["kernel"].astype(dt)).astype(jnp.float32)
    return _ln_noaffine(h, eps).astype(dt)


def _decoder_trunk(vae: TransformerVAE, params, h_z, interpret: bool):
    """Decoder latent LN + proj + block stack (ONE Pallas kernel) — everything
    before the cross block; pairs with the fused decoder tail."""
    from scldm_tpu.ops.fused_trunk import extract_trunk_params, fused_trunk_blocks_trainable

    dec = params["params"]["decoder"]
    eps = vae.decoder.layernorm_eps
    dt = vae.decoder.dtype
    zn = _ln_noaffine(h_z.astype(jnp.float32), eps).astype(dt)
    x = zn @ dec["latent_proj"]["kernel"].astype(dt)
    kp = extract_trunk_params(dec, vae.decoder.n_layer)
    return fused_trunk_blocks_trainable(
        x, kp, vae.decoder.n_head, eps, TRUNK_BLOCK_ROWS, TRUNK_BWD_BLOCK_ROWS, interpret
    )


def fused_nb_apply(
    vae: TransformerVAE,
    params,
    batch: Dict,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    interpret: bool = False,
    use_trunk: Optional[bool] = False,  # opt-in (kernel measured a net loss, ROADMAP #1)
    bwd_tiles: Optional[Tuple[int, int]] = None,  # (bwd_block_g, bwd_block_b) override for tuning
    batch_chunk: Optional[int] = None,  # split the tail kernel over batch slices of this size
) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """VAE forward with (a) the encoder input-embedding + MCAB pooling and
    (b) the decoder cross block + NB-head logit as fused Pallas kernels
    (ops/fused_encoder.py, ops/fused_decoder.py) over the canonical gene list.

    Matches `TransformerVAE.__call__` + shared-theta NB head on the batch-free
    gene path: the encoder trunk / decoder trunk run as flax modules; no
    (B, G, E)- or (B, S, E)-shaped tensor ever touches HBM. Differentiable end
    to end (the kernels carry custom VJPs; the thin prep math is plain jnp)."""
    from scldm_tpu.ops.fused_decoder import (
        build_attention_operands,
        fused_decoder_tail,
        pack_weights,
    )

    rngs = {"dropout": rng} if (train and rng is not None) else None
    # opt-in only: the whole-trunk kernel measured a net LOSS at reference
    # shapes (ROADMAP #1), so nothing routes through it unless asked —
    # mirroring VAETask(fused_trunk=True)'s explicit opt-in
    use_trunk = bool(use_trunk) and _fused_trunk_ok(vae)
    if (
        _fused_encoder_ok(vae)
        and COUNTS in batch
        and G_SUB in batch
        and _dense_pool_worth_it(batch[COUNTS].shape[1], batch[G_SUB].shape[1])
    ):
        pooled = fused_encoder_pooling(
            vae, params, batch[COUNTS], batch[G_SUB].shape[1], interpret=interpret
        )
        if use_trunk:
            h_z = _encoder_trunk_tail(vae, params, pooled, interpret)
        else:
            h_z = vae.apply(
                params, pooled, train,
                method=lambda m, e, tr: m.encoder(e, train=tr, skip_pool=True),
                rngs=rngs,
            )
    else:
        # NOTE: fused_window_pooling (flash over the packed (B, S, E) window)
        # measured 43.3 vs 40.3 ms/step here — XLA's saved-activation
        # attention backward beats the kernel's recompute VJP at these tensor
        # sizes, so the module path stays the default (see ROADMAP #flash).
        emb = vae.apply(
            params, batch[C_SUB], batch[G_SUB],
            method=lambda m, c, g: m.input_layer(c, g),
        )
        if use_trunk:
            pooled = vae.apply(
                params, emb, train,
                method=lambda m, e, tr: m.encoder(e, train=tr, pool_only=True),
                rngs=rngs,
            )
            h_z = _encoder_trunk_tail(vae, params, pooled, interpret)
        else:
            h_z = vae.apply(
                params, emb, train,
                method=lambda m, e, tr: m.encoder(e, train=tr), rngs=rngs,
            )
    if use_trunk:
        x = _decoder_trunk(vae, params, h_z, interpret)
    else:
        x = vae.apply(
            params, h_z, train,
            method=lambda m, z, tr: m.decoder(z, None, train=tr, trunk_only=True),
            rngs=rngs,
        )

    p = params["params"]
    ca = p["decoder"]["decoder_cross_attention"]
    head = p["decoder_head"]
    eps = vae.decoder.layernorm_eps
    n_head = vae.decoder.n_head_cross

    table = p["input_layer"]["gene_embedding"]["embedding"]  # (G+1, E)
    q = table[1:].astype(jnp.float32)  # canonical genes 1..G
    qp = _ln_affine(q, ca["ln_1q"]["LayerNorm_0"], eps) @ ca["attn"]["c_attn_q"]["kernel"]
    xn = _ln_affine(x.astype(jnp.float32), ca["ln_1"]["LayerNorm_0"], eps)
    kv = xn @ ca["attn"]["c_attn"]["kernel"]  # (B, M, 2E)
    k, v = jnp.split(kv, 2, axis=-1)
    kfull, vproj = build_attention_operands(k, v, ca["attn"]["c_proj"]["kernel"], n_head)
    weights = pack_weights(
        ca["ln_2"]["LayerNorm_0"]["scale"],
        ca["ln_2"]["LayerNorm_0"]["bias"],
        ca["mlp"]["w1"]["kernel"],
        ca["mlp"]["w2"]["kernel"],
        ca["mlp"]["c_proj"]["kernel"],
        head["params"]["kernel"],
        head["params"]["bias"],
    )
    # bwd tile sizes: per-shape measured defaults (ops/fused_decoder.
    # default_bwd_tiles, round-4 v5e sweep); bwd_tiles overrides for
    # benchmarks/tune_fused_tail.py sweeps
    from scldm_tpu.ops.fused_decoder import default_bwd_tiles

    B = kfull.shape[0]
    if batch_chunk and B > batch_chunk:
        # batch-chunked dispatch: N independent kernel launches over batch
        # slices. qp/q/weights are batch-free, so each chunk reuses them and
        # autodiff sums their weight grads through the concat; each chunk
        # runs at the chunk size's OWN best tiles instead of the compile-safe
        # (512, 8) forced at B > 128 — the round-5 fix for the dentate
        # B > 128 superlinear step time (and it lifts MAX_FUSED_BATCH: B=512
        # = 4 x 128-chunks where the monolithic backward fails to compile).
        tiles = bwd_tiles or default_bwd_tiles(vae.decoder.n_genes, batch_chunk)
        parts = []
        for lo in range(0, B, batch_chunk):
            hi = min(B, lo + batch_chunk)
            parts.append(fused_decoder_tail(
                qp, q, kfull[lo:hi], vproj[lo:hi], weights, n_head, eps,
                interpret=interpret,
                bwd_block_g=tiles[0], bwd_block_b=tiles[1],
            ))
        logits = jnp.concatenate(parts, axis=0)  # (B, G) f32
    else:
        if bwd_tiles is None:
            bwd_tiles = default_bwd_tiles(vae.decoder.n_genes, B)
        logits = fused_decoder_tail(
            qp, q, kfull, vproj, weights, n_head, eps, interpret=interpret,
            bwd_block_g=bwd_tiles[0], bwd_block_b=bwd_tiles[1],
        )  # (B, G) f32

    theta = jnp.exp(head["theta"]["embedding"][1:, 0].astype(jnp.float32))  # (G,)
    t = vae.decoder_head.t
    mu = jax.nn.softmax(logits / t, axis=1) * batch[LIB]
    return {"mu": mu, "theta": theta}, h_z


def gene_shard_constraint(mesh, x: jax.Array, gene_axis: int) -> jax.Array:
    """The gene-SP sharding convention, shared by VAETask and the LDM decode:
    constrain one tensor's gene axis over "model" (the batch axis, if any
    leading one, stays on "data")."""
    axes: list = [None] * x.ndim
    axes[gene_axis] = "model"
    if gene_axis > 0:
        axes[0] = "data"
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*axes)))


def algebraic_nb_apply(
    vae: TransformerVAE,
    params,
    batch: Dict,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    fused_gate: bool = False,  # swiglu_vec Pallas tail (single-device only)
    interpret: bool = False,
    gene_shard=None,  # VAETask._gene_shard-style (x, axis) constraint for gene-SP
    vw_fold: bool = False,  # fold c_proj into v: probs @ (v @ wo), see _algebraic_tail
) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """VAE forward with the decoder cross block + NB head REASSOCIATED in
    plain XLA: the SwiGLU down projection's only consumer is the head's mu
    vector, so ``wv = wmlp @ wmu`` replaces the (Hd, E) down matmul and the
    (B, G, E) MLP-output / head-input tensors are never materialized
    (the reference computes them in full — layers.py:267-333 +
    stochastic_layers.py:76-121). At census shapes (B=16, G=36601, E=512,
    Hd=1408) this removes ~0.84 TFLOP from the forward and ~1.7 TFLOP from
    the backward of the ~9.6 TFLOP train step, plus ~2.3 GB of (B, G, E)
    activations. Same algebra as ops/fused_decoder._tail_math, but expressed
    in differentiable XLA ops: width-agnostic (the Pallas tail is gated to
    E<=128 by its VMEM tiles), GSPMD-shardable, and keeps XLA's
    saved-activation backward.

    Requires the canonical batch-free gene-query path (lean wire batches,
    post-`_materialize`) and the `_algebraic_path_ok` architecture gate.
    """
    rngs = {"dropout": rng} if (train and rng is not None) else None
    emb = vae.apply(
        params, batch[C_SUB], batch[G_SUB],
        method=lambda m, c, g: m.input_layer(c, g),
    )
    h_z = vae.apply(
        params, emb, train,
        method=lambda m, e, tr: m.encoder(e, train=tr), rngs=rngs,
    )
    x = vae.apply(
        params, h_z, train,
        method=lambda m, z, tr: m.decoder(z, None, train=tr, trunk_only=True),
        rngs=rngs,
    )  # (B, M, E) pre-cross latents
    return (
        _algebraic_tail(
            vae, params, x, batch[LIB], fused_gate=fused_gate,
            interpret=interpret, gene_shard=gene_shard, vw_fold=vw_fold,
        ),
        h_z,
    )


def _algebraic_tail(
    vae: TransformerVAE,
    params,
    x: jax.Array,  # (B, M, E) pre-cross latents (decoder trunk output)
    library_size: jax.Array,  # (B, 1)
    fused_gate: bool = False,  # SwiGLU+head-vector as one Pallas kernel (single-device only)
    interpret: bool = False,
    gene_shard=None,  # (x, gene_axis) -> x constrained over the mesh "model" axis
    vw_fold: bool = False,  # reassociate probs @ (v @ wo) — see inline note
) -> Dict[str, jax.Array]:
    """The reassociated cross block + NB head over the canonical gene table
    (the differentiable back half of `algebraic_nb_apply`; also the decode
    tail of the LDM generation program when `LDMTask(algebraic_decode=)`).

    With `gene_shard` (gene-SP composition): the canonical query table is
    constrained over the mesh "model" axis, so GSPMD computes the cross
    attention, the two-dot SwiGLU and the head contraction on G/n genes per
    chip — the only cross-shard collectives are the softmax max/sum over the
    gene axis (and the loss reduction downstream). The Pallas fused_gate
    kernel cannot partition, so it is mutually exclusive with gene_shard.
    """
    from scldm_tpu.ops.attention import sdpa_shared_q, sdpa_shared_q_xla

    p = params["params"]
    ca = p["decoder"]["decoder_cross_attention"]
    head = p["decoder_head"]
    eps = vae.decoder.layernorm_eps
    n_head = vae.decoder.n_head_cross
    dt = vae.decoder.dtype
    E = vae.decoder.n_embed
    hd = E // n_head

    table = p["input_layer"]["gene_embedding"]["embedding"]  # (G+1, E) f32
    q32 = table[1:]  # canonical genes 1..G
    if gene_shard is not None:
        # gene-SP: one constraint at the source; GSPMD propagates the G/n
        # layout through qp/y/h/hn and the two-dot MLP to the logits
        q32 = gene_shard(q32, 0)
    qp = (
        _ln_affine(q32, ca["ln_1q"]["LayerNorm_0"], eps).astype(dt)
        @ ca["attn"]["c_attn_q"]["kernel"].astype(dt)
    )  # (G, E)
    xn = _ln_affine(x.astype(jnp.float32), ca["ln_1"]["LayerNorm_0"], eps).astype(dt)
    kv = xn @ ca["attn"]["c_attn"]["kernel"].astype(dt)  # (B, M, 2E)
    k, v = jnp.split(kv, 2, axis=-1)
    B, M = k.shape[0], k.shape[1]
    G = qp.shape[0]
    wo = ca["attn"]["c_proj"]["kernel"].astype(dt)  # (E, E)
    if vw_fold:
        # Fold the attention output projection into v (VERDICT r4 item 8):
        # y @ wo = sum_h probs_h @ (v_h @ wo_h), so precompute
        # vw[b,h,s,:] = v[b,s,h,:] @ wo[h*hd:(h+1)*hd, :] (tiny: 2·B·M·E²
        # FLOPs ≈ 1 GFLOP at census B=32) and contract probs against it in
        # ONE batched GEMM with K = H·M. This eliminates BOTH members of the
        # step's weakest matmul class — the (B·G, E)@(E, E) output projection
        # (67 TFLOP/s, bandwidth-bound at N=512) and the K=hd=64 probs@v
        # einsum — plus the (B, G, E) attention-output HBM round trip between
        # them. Same accumulation-reassociation family as wv = wmlp @ wmu.
        # GSPMD-compatible: everything shards on the gene/query axis (m).
        qh = qp.reshape(G, n_head, hd)
        scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        scores = jnp.einsum(
            "mhd,bshd->bhms", qh, k.reshape(B, M, n_head, hd),
            preferred_element_type=jnp.float32,
        )
        probs = jax.nn.softmax(scores * scale, axis=-1).astype(dt)
        vw = jnp.einsum(
            "bshd,hde->bhse",
            v.reshape(B, M, n_head, hd), wo.reshape(n_head, hd, E),
        )  # (B, H, M, E) — batch-dependent folded values, ~17 MB at census
        y = jnp.einsum("bhms,bhse->bme", probs, vw)  # (B, G, E), K = H·M
    else:
        attn = sdpa_shared_q if gene_shard is None else sdpa_shared_q_xla
        y = attn(
            qp.reshape(G, n_head, hd),
            k.reshape(B, M, n_head, hd),
            v.reshape(B, M, n_head, hd),
        ).reshape(B, G, E)
        y = y @ wo

    h = q32.astype(dt)[None] + y  # residual connects to the raw queries
    hn = _ln_affine(h.astype(jnp.float32), ca["ln_2"]["LayerNorm_0"], eps).astype(dt)
    mlp = ca["mlp"]
    wmu = head["params"]["kernel"]  # (E, 1) f32
    wv = (mlp["c_proj"]["kernel"] @ wmu).astype(dt)  # (Hd, 1) — the fusion
    if fused_gate:
        if gene_shard is not None:
            raise ValueError(
                "fused_gate (swiglu_vec Pallas tail) cannot GSPMD-partition "
                "and is mutually exclusive with gene_shard (gene-SP)"
            )
        w12 = jnp.concatenate(
            [mlp["w1"]["kernel"], mlp["w2"]["kernel"]], axis=1
        ).astype(dt)
        # SwiGLU up + gate + head-vector contraction per row tile in VMEM
        # (ops/fused_swiglu.swiglu_vec): the (B, G, 2Hd) up projection and
        # (B, G, Hd) gate — 6.1 GB + 3.1 GB saved-bwd residents at census
        # B=32, the allocations that OOM it — never touch HBM; the backward
        # recomputes. Single-device only (Pallas calls do not GSPMD-shard).
        from scldm_tpu.ops.fused_swiglu import swiglu_vec

        G_ = hn.shape[1]
        mlp_term = swiglu_vec(
            hn.reshape(-1, E), w12, wv, 512, interpret
        ).reshape(
            hn.shape[0], G_
        )
    else:
        # two separate matmuls, NOT hn @ concat(w1, w2): the concat form
        # materializes the f32 (B, G, 2Hd) up projection before the
        # split+gate fusion (6.6 GB at census; measured 2.16x the bare
        # matmul standalone), while the two-dot form lets XLA fuse the gate
        # into the second matmul's epilogue (1.43x — bench_swiglu, round 4)
        a = hn @ mlp["w1"]["kernel"].astype(dt)  # (B, G, Hd)
        b = hn @ mlp["w2"]["kernel"].astype(dt)
        g3 = jax.nn.silu(a) * b  # (B, G, Hd) — the largest live tensor
        mlp_term = jnp.einsum(
            "bgh,h->bg", g3, wv[:, 0], preferred_element_type=jnp.float32
        )
    logits = (
        jnp.einsum(
            "bge,e->bg", h, wmu[:, 0].astype(dt),
            preferred_element_type=jnp.float32,
        )
        + mlp_term
        + head["params"]["bias"][0].astype(jnp.float32)
    )
    theta = jnp.exp(head["theta"]["embedding"][1:, 0].astype(jnp.float32))
    if gene_shard is not None:
        # keep outputs explicitly gene-sharded (matches _apply_gene_sp): the
        # softmax over the full gene axis is GSPMD's collective to insert
        logits = gene_shard(logits, 1)
        theta = gene_shard(theta, 0)
    mu = jax.nn.softmax(logits / vae.decoder_head.t, axis=1) * library_size
    return {"mu": mu, "theta": theta}


def algebraic_decode(
    vae: TransformerVAE,
    params,
    z: jax.Array,  # (B, M, E_latent) latents (generation samples)
    library_size: jax.Array,  # (B, 1)
    fused_gate: bool = False,  # swiglu_vec Pallas tail (single-device only)
    gene_shard=None,  # (x, gene_axis) -> x constraint for gene-SP decode
    vw_fold: bool = False,  # fold c_proj into v (see _algebraic_tail)
    interpret: bool = False,  # run the Pallas tail in interpret mode (tests)
) -> Dict[str, jax.Array]:
    """`TransformerVAE.decode` over the canonical gene list with the
    reassociated cross+head tail — the generation decode's hot path
    (reference models.py:766-819 decodes the full (2B, G, E) tensor)."""
    x = vae.apply(
        params, z,
        method=lambda m, zz: m.decoder(zz, None, trunk_only=True),
    )
    return _algebraic_tail(
        vae, params, x, library_size, fused_gate=fused_gate,
        gene_shard=gene_shard, vw_fold=vw_fold, interpret=interpret,
    )


def _algebraic_path_ok(vae: TransformerVAE) -> bool:
    """Architecture gate for algebraic_nb_apply — `_fused_path_ok` minus the
    Pallas width limit (the reassociation is pure XLA, so any n_embed works)."""
    from scldm_tpu.nn.heads import NegativeBinomialTransformerHead

    head = vae.decoder_head
    return (
        isinstance(head, NegativeBinomialTransformerHead)
        and head.shared_theta
        and vae.decoder.shared_embedding
        and not vae.decoder.use_adaln
        and vae.decoder.dropout == 0.0
        and not vae.decoder.bias  # the raw-param prep omits qkv/proj biases
        and vae.decoder.n_embed % vae.decoder.n_head_cross == 0
    )


def _fused_path_ok(vae: TransformerVAE) -> bool:
    """Static conditions under which fused_nb_apply matches the module path
    and the kernel's tile sizes fit VMEM. The kernel exists to fuse the
    tiny-E (B,G,E) chain XLA would round-trip through HBM; at census width
    (E=512) its weight tiles alone exceed scoped VMEM and XLA's native
    MXU-shaped matmuls are the right path anyway."""
    from scldm_tpu.nn.heads import NegativeBinomialTransformerHead

    head = vae.decoder_head
    return (
        isinstance(head, NegativeBinomialTransformerHead)
        and head.shared_theta
        and vae.decoder.shared_embedding
        and not vae.decoder.use_adaln
        and vae.decoder.dropout == 0.0
        and not vae.decoder.bias  # kernel prep omits qkv/proj biases
        and vae.decoder.n_embed <= 128
    )


def _fused_trunk_ok(vae: TransformerVAE) -> bool:
    """Eligibility for the whole-trunk Pallas kernel on BOTH block stacks:
    the reference trunk config (bias-free, affine LN, no dropout, non-adaLN)
    at narrow width, without remat (the kernel's recompute VJP already never
    materializes residuals)."""
    from scldm_tpu.ops.fused_trunk import trunk_kernel_ok

    return (
        trunk_kernel_ok(vae.encoder.n_embed, vae.encoder.bias, vae.encoder.dropout, False)
        and trunk_kernel_ok(
            vae.decoder.n_embed, vae.decoder.bias, vae.decoder.dropout,
            vae.decoder.use_adaln,
        )
        and not vae.encoder.remat
        and not vae.decoder.remat
    )


def _fused_encoder_ok(vae: TransformerVAE) -> bool:
    """Extra conditions for the gather-free encoder pooling: the zero-row
    closed form requires embeddings that vanish at count 0 (log1p only)."""
    return (
        vae.input_layer.agg_func == "log1p"
        and vae.encoder.dropout == 0.0
        and not vae.encoder.bias
        and vae.encoder.n_embed <= 128  # same VMEM rationale as _fused_path_ok
    )


def _fused_window_ok(vae: TransformerVAE) -> bool:
    """Window-input pooling (fused_window_pooling) consumes the embedding
    directly, so any agg_func qualifies; attention must be bias/dropout-free
    (the kernel prep omits qkv biases). Width gates on the two VALIDATED tile
    geometries (fused_nb_apply's dispatch): (1024, 8) tiles at E<=128 and the
    narrow (512, 8, 256) tiles at E>=256 — widths in between would ride the
    wide-tile path with a 2-8x larger VMEM working set than anything
    measured. The kernel only pays off when the (B, S, E) window is
    wide/long enough that XLA's materialized attention chain dominates
    (census shapes), hence the explicit `VAETask(fused_pool=True)` opt-in
    rather than auto-dispatch."""
    E = vae.encoder.n_embed
    return vae.encoder.dropout == 0.0 and not vae.encoder.bias and (
        E <= 128 or E >= 256
    )


def _dense_pool_worth_it(n_genes: int, window_len: int, block_g: int = 1024) -> bool:
    """The dense-gene pooling does (padded G / S) times the token work of the
    packed-window path in exchange for eliminating the gather + scatter-add.
    Measured on v5e at dentate shapes (G=17402, S=6147, ratio 2.8) the dense
    kernel LOSES (~44 vs 40 ms/step); at parse1m/replogle (G=S=2000) it wins.
    Gate on the ratio."""
    g_padded = n_genes + ((-n_genes) % min(block_g, n_genes))
    return g_padded <= int(1.3 * window_len)


def vae_loss(
    counts: jax.Array, params: Dict[str, jax.Array], gaussian_head: bool
) -> jax.Array:
    """Reconstruction loss, summed over genes, averaged over the batch
    (reference models.py:233-247)."""
    if gaussian_head:
        y = log1p_cpm(counts)
        recon = log_gaussian(y, params["mu"])
    else:
        recon = -log_nb_positive(counts, params["mu"], params["theta"])
    return recon.sum(axis=1).mean()


def vae_loss_lean(
    genes_subset: jax.Array,  # (B, S) gene-token ids, 0 = <MASK> padding
    counts_subset: jax.Array,  # (B, S)
    params: Dict[str, jax.Array],  # mu (B, G), theta (G,) or (B, G)
    eps: float = 1e-8,
) -> jax.Array:
    """The NB reconstruction loss WITHOUT densifying the counts (round 5).

    The lean wire delivers only the expressed (gene, count) pairs; the dense
    (B, G) count matrix exists solely to feed the NLL, and rebuilding it is
    a scatter that measures 7.5/16.9/32.9 ms at dentate B=128/256/512
    (benchmarks/bench_gather.py densify_*) — ~19% of the whole train step.
    Split the gene sum instead: at c=0 the Gamma terms of the NB log-pmf
    vanish exactly (lgamma(theta)-lgamma(theta)-lgamma(1) = 0), so

        -sum_g log_nb(c_g) = -sum_g log_nb(0 | mu_g)          [elementwise]
                             -sum_{c_g>0} [log_nb(c_g) - log_nb(0 | mu_g)]

    with the correction gathered at the (B, S) expressed entries. Exactly the
    same floats as `vae_loss` term-for-term (same eps placement as
    ops/distributions.log_nb_positive); the gather's backward is a
    scatter-add, so the scatter moves fwd->bwd rather than disappearing —
    whether that nets a win is measured, not assumed
    (bench_batch_scaling --lean-loss)."""
    mu = params["mu"].astype(jnp.float32)
    theta = params["theta"].astype(jnp.float32)
    g_ids = genes_subset
    # zero-count baseline over ALL genes: theta * log(theta / (theta + mu))
    zero_term = theta * (jnp.log(theta + eps) - jnp.log(theta + mu + eps))
    base = -zero_term.sum(axis=1)  # (B,)
    # correction at the expressed entries only
    cols = jnp.clip(g_ids.astype(jnp.int32) - 1, 0, mu.shape[1] - 1)
    mu_s = jnp.take_along_axis(mu, cols, axis=1)  # (B, S)
    theta_s = (
        theta[cols] if theta.ndim == 1 else jnp.take_along_axis(theta, cols, axis=1)
    )
    c = counts_subset.astype(jnp.float32)
    corr = log_nb_positive(c, mu_s, theta_s, eps) - theta_s * (
        jnp.log(theta_s + eps) - jnp.log(theta_s + mu_s + eps)
    )
    corr = jnp.where(g_ids > 0, corr, 0.0)  # padding rows gathered garbage
    return (base - corr.sum(axis=1)).mean()


class VAETask:
    """Owns the model + optimizer + compiled steps. Pure-state in/out."""

    def __init__(
        self,
        vae: TransformerVAE,
        *,
        learning_rate: float = 1e-3,
        betas: Tuple[float, float] = (0.9, 0.95),
        weight_decay: float = 0.0,
        caution: bool = False,
        grad_clip: float = 10.0,
        num_training_steps: int = 10_000,
        num_warmup_steps: Optional[int] = None,
        final_lr_factor: float = 0.1,
        init_div_factor: float = 100,
        fract_decay: float = 0.1,
        decay_type: str = "sqrt",
        calculate_grad_norms: bool = False,
        fused_decoder: Optional[bool] = None,  # None = auto (TPU & eligible arch)
        fused_batch_chunk: Optional[int] = None,  # split the tail kernel over batch slices
        fused_trunk: Optional[bool] = None,  # opt-in only (measured loss at reference shapes)
        fused_pool: Optional[bool] = None,  # opt-in: window-kernel MCAB pooling (census widths)
        algebraic_tail: Optional[bool] = None,  # opt-in: XLA-reassociated cross+head (census widths)
        algebraic_fused_gate: bool = False,  # + swiglu_vec Pallas tail (single-device; opt-in pending TPU sign)
        algebraic_vw_fold: Optional[bool] = None,  # fold c_proj into v; None = on with the algebraic tail
        lean_loss: Optional[bool] = None,  # densify-free NB loss (opt-in pending TPU A/B)
        mesh: Optional[Mesh] = None,
        fsdp: bool = False,  # ZeRO-3 param/opt-state sharding over "data"
        gene_sp: bool = False,  # decode-side gene (sequence) parallelism over "model"
    ):
        self.vae = vae
        self.fsdp = fsdp
        self.calculate_grad_norms = calculate_grad_norms
        self.gaussian_head = isinstance(vae.decoder_head, GaussianTransformerHead)
        if fused_decoder is None:
            fused_decoder = jax.default_backend() == "tpu" and _fused_path_ok(vae)
        # pallas_call is opaque to GSPMD: the fused kernels cannot be
        # auto-partitioned over a real multi-device mesh
        if mesh is not None and mesh.devices.size > 1:
            fused_decoder = False
            fused_trunk = False
            fused_pool = False
        self.fused_decoder = fused_decoder and _fused_path_ok(vae)
        # batch-chunked tail dispatch (round 5): N kernel launches over batch
        # slices, each at the chunk size's own best bwd tiles — lifts the
        # MAX_FUSED_BATCH compile ceiling. None = auto (see _chunk_for: keep
        # the monolithic kernel with its batch-aware tiles while it compiles,
        # 128-row chunks above the ceiling — measured 182 vs 235 ms/step at
        # dentate B=512, faster than BOTH the module and algebraic fallbacks);
        # 0 = explicitly off; int = forced chunk size.
        self.fused_batch_chunk = (
            fused_batch_chunk if fused_batch_chunk is None else int(fused_batch_chunk)
        )
        # default OFF: measured 41.6 vs 40.5 ms/step at dentate shapes even
        # with the single-launch chained backward — XLA's saved-activation
        # backward wins when (B, 16, 32) activations are this small. Kept as
        # an opt-in for configs with deeper/narrower trunks (see ROADMAP #1).
        self.fused_trunk = bool(fused_trunk) and _fused_trunk_ok(vae)
        # opt-in only: at dentate shapes (B=128, S=6147, E=32) the window
        # kernel measured a LOSS (43.3 vs 40.3 ms/step — ROADMAP #flash); at
        # census widths (E>=256) XLA's materialized attention chain is the
        # slow side and the kernel wins (benchmarks/bench_census.py --fused-pool)
        self.fused_pool = bool(fused_pool) and _fused_window_ok(vae)
        # Default-on at wide embeds since the round-4 TPU measurement:
        # census (E=512, B=16) runs 133.9 ms/step on the module path vs
        # 118.4 ms reassociated (+13% throughput, MFU 40.1% -> 45.3%;
        # REVALIDATION census vs census_algebraic). At E<=128 the fused
        # Pallas tail is the measured win and takes dispatch precedence,
        # so auto only enables this where that kernel is width-ineligible.
        # Unlike the Pallas kernels this is plain XLA, so it stays valid
        # under a multi-device mesh (GSPMD partitions it like the module).
        if algebraic_tail is None:
            algebraic_tail = vae.decoder.n_embed > 128
        self.algebraic_tail = bool(algebraic_tail) and _algebraic_path_ok(vae)
        # the swiglu_vec kernel removes the (B, G, 2Hd)/(B, G, Hd) saved-bwd
        # residents (the census-B=32 OOM); Pallas calls do not GSPMD-shard,
        # so it is single-device only
        self.algebraic_fused_gate = (
            bool(algebraic_fused_gate) and self.algebraic_tail and mesh is None
        )
        # output-projection fold (VERDICT r4 item 8): plain-XLA reassociation,
        # GSPMD-shardable like the tail itself, composes with fused_gate
        # (fold changes the attention, gate the MLP). Default ON wherever the
        # algebraic tail runs since the round-5 TPU A/B: census B=32
        # 194.7 -> 182.2 ms/step (+6.8%, MFU 55.1% -> 58.9%, the census
        # record), B=16 102.8 -> 98.1 ms.
        if algebraic_vw_fold is None:
            algebraic_vw_fold = self.algebraic_tail
        self.algebraic_vw_fold = bool(algebraic_vw_fold) and self.algebraic_tail
        # densify-free NB train loss (vae_loss_lean): the gather's backward is
        # a scatter-add, so the densify scatter moves fwd->bwd rather than
        # disappearing — opt-in until the chip A/B says it nets a win
        self.lean_loss = bool(lean_loss)
        self._pool_interpret = False  # tests: run the pool kernel in interpret mode
        self.mesh = mesh
        # gene/sequence parallelism: shard the decoder's GENE axis over the
        # mesh "model" axis. The census step is activation-gated — the cross
        # block's SwiGLU hidden (B, G, ~2.75E) is the tensor that OOMs B=32
        # at G=36601/E=512 (ROADMAP census budget) — and gene tokens never
        # attend to each other, so splitting G is collective-free until the
        # loss psum. Mutually exclusive with Megatron TP (same mesh axis
        # carries activations, not param columns); params replicate over
        # "model" instead. Requires the shared-embedding decoder (the
        # default) so the queries can be constrained before the cross block.
        if gene_sp and mesh is not None and mesh.shape.get("model", 1) > 1:
            if not vae.decoder.shared_embedding:
                # refuse rather than silently falling back to Megatron TP —
                # the opposite parameter layout the flag opted out of
                raise ValueError(
                    "gene_sp requires the shared-embedding decoder (the "
                    "default): unshared queries cannot be sharding-"
                    "constrained on the gene axis before the cross block"
                )
            self.gene_sp = True
        else:
            self.gene_sp = False
        if self.gene_sp:
            # the fused Pallas paths partition manually and are only eligible
            # at E<=128, where activations are not the gate — module path only.
            # The algebraic tail COMPOSES with gene_sp (round 4): it is plain
            # XLA, so one sharding constraint on the canonical query table
            # gene-shards the whole reassociated cross+SwiGLU+head —
            # per-chip activations shrink to G/n AND the down matmul's
            # work/memory saving is kept (the census multi-chip layout).
            self.fused_decoder = False
            self.fused_pool = False
        if num_warmup_steps is None:
            num_warmup_steps = max(1, int(0.1 * num_training_steps))  # _utils.py:96-106
        schedule = wsd_schedule(
            num_training_steps=num_training_steps,
            final_lr_factor=final_lr_factor,
            num_warmup_steps=num_warmup_steps,
            init_div_factor=init_div_factor,
            fract_decay=fract_decay,
            decay_type=decay_type,
        )
        self.schedule = schedule
        self.grad_clip = grad_clip
        self.tx = adamw_legacy(
            learning_rate=lambda c: learning_rate * schedule(c),
            betas=betas,
            weight_decay=weight_decay,
            caution=caution,
        )

        # batch arrives device_put with P("data") (see parallel.shard_batch);
        # params enter with the DP/TP shardings pinned at init, and GSPMD
        # propagates them through the step (grads, optimizer state, outputs)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._train_steps = jax.jit(self._train_steps_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    # -- init -----------------------------------------------------------------
    def init_state(self, rng: jax.Array, example_batch: Dict) -> TrainState:
        if COUNTS not in example_batch:  # lean batch: init only needs shapes
            b = example_batch[LIB].shape[0]
            n_genes = self.vae.decoder.n_genes
            example_batch = dict(example_batch)
            from scldm_tpu.ops.transforms import canonical_gene_ids

            example_batch[COUNTS] = jnp.zeros((b, n_genes), jnp.float32)
            example_batch[GENES] = canonical_gene_ids(n_genes)
        # jit the init: eager flax init dispatches thousands of tiny ops, which
        # is pathological over remote-device transports
        params = jax.jit(self.vae.init)(
            rng,
            counts=jnp.asarray(example_batch[COUNTS]),
            genes=jnp.asarray(example_batch[GENES]),
            library_size=jnp.asarray(example_batch[LIB]),
            counts_subset=jnp.asarray(example_batch.get(C_SUB, example_batch[COUNTS])),
            genes_subset=jnp.asarray(example_batch.get(G_SUB, example_batch[GENES])),
        )
        if self.mesh is not None:
            from scldm_tpu.parallel.sharding_rules import shard_params

            params = shard_params(
                params, self.mesh, fsdp=self.fsdp, megatron=not self.gene_sp
            )
        state = create_train_state(rng, params, self.tx)
        if self.mesh is not None:
            # non-param leaves (rng, step) replicate; opt state follows params
            state = state.replace(
                rng=jax.device_put(state.rng, NamedSharding(self.mesh, P())),
                step=jax.device_put(state.step, NamedSharding(self.mesh, P())),
            )
        return state

    def _materialize(self, batch: Dict) -> Dict:
        """Rebuild dense counts / full gene ids on device when the loader sent
        only the expressed subsets (ops.transforms.densify_expressed); widens
        the uint16 wire format first."""
        from scldm_tpu.ops.transforms import widen_lean

        batch = widen_lean(batch)
        if COUNTS in batch:
            return batch
        from scldm_tpu.ops.transforms import canonical_gene_ids, densify_expressed

        n_genes = self.vae.decoder.n_genes
        counts = densify_expressed(batch[G_SUB], batch[C_SUB], n_genes)
        out = dict(batch)
        out[COUNTS] = counts
        # 1-D genes = batch-free decoder-query path (see canonical_gene_ids)
        out[GENES] = canonical_gene_ids(n_genes)
        if LIB not in out:
            out[LIB] = counts.sum(1, keepdims=True)
        return out

    def _gene_shard(self, x: jax.Array, gene_axis: int) -> jax.Array:
        return gene_shard_constraint(self.mesh, x, gene_axis)

    def _apply_gene_sp(self, params, batch, train: bool, rng):
        """`TransformerVAE.__call__` with the decoder's gene/query axis
        sharded over the mesh "model" axis (sequence parallelism over genes).

        The encode side (packed window, latent tokens) is batch-sharded as
        usual; the decoder queries are constrained to P(["data",] "model", -)
        before the cross block, so GSPMD computes the cross attention, SwiGLU
        and NB head on G/n_model genes per chip — gene tokens only attend to
        the latent kv, never each other, so the only collectives are the
        softmax/loss reductions over the gene axis. No reference analog (DDP
        only, SURVEY.md §2.6)."""
        rngs = {"dropout": rng} if (train and rng is not None) else None
        emb = self.vae.apply(
            params,
            batch.get(C_SUB, batch[COUNTS]),
            batch.get(G_SUB, batch[GENES]),
            method=lambda m, c, g: m.input_layer(c, g),
        )
        h_z = self.vae.apply(
            params, emb, train,
            method=lambda m, e, tr: m.encoder(e, train=tr), rngs=rngs,
        )
        genes = batch[GENES]
        q = self.vae.apply(params, genes, method="_decoder_queries")
        q = self._gene_shard(q, q.ndim - 2)
        out = self.vae.apply(
            params, h_z, q, genes, batch[LIB], train,
            method=lambda m, z, qq, g, l, tr: m._head_params(
                m.decoder(z, qq, train=tr), g, l
            ),
            rngs=rngs,
        )
        out = {k: self._gene_shard(v, v.ndim - 1) for k, v in out.items()}
        return out, h_z

    def _apply(self, params, batch, train: bool, rng: Optional[jax.Array] = None):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        if self.gene_sp:
            return self._apply_gene_sp(params, batch, train, rng)
        if self.fused_pool:
            return self._apply_fused_pool(params, batch, train, rngs)
        return self.vae.apply(
            params,
            counts=batch[COUNTS],
            genes=batch[GENES],
            library_size=batch[LIB],
            counts_subset=batch.get(C_SUB, batch[COUNTS]),
            genes_subset=batch.get(G_SUB, batch[GENES]),
            train=train,
            rngs=rngs,
        )

    def _apply_fused_pool(self, params, batch, train: bool, rngs):
        """`TransformerVAE.__call__` with the MCAB pooling replaced by the
        flash window kernel (ops/fused_encoder.fused_window_pool); trunk,
        decoder and head stay flax modules. Exact same math — the kernel
        streams LN + k/v projection + softmax over token tiles instead of
        materializing the (B, S, QH) attention chain in HBM."""
        emb = self.vae.apply(
            params,
            batch.get(C_SUB, batch[COUNTS]),
            batch.get(G_SUB, batch[GENES]),
            method=lambda m, c, g: m.input_layer(c, g),
        )
        pooled = fused_window_pooling(self.vae, params, emb, interpret=self._pool_interpret)
        h_z = self.vae.apply(
            params, pooled, train,
            method=lambda m, e, tr: m.encoder(e, train=tr, skip_pool=True),
            rngs=rngs,
        )
        out = self.vae.apply(
            params, h_z, batch[GENES], batch[LIB], train,
            method=lambda m, z, g, l, tr: m._head_params(
                m.decoder(z, m._decoder_queries(g), train=tr), g, l
            ),
            rngs=rngs,
        )
        return out, h_z

    def _use_fused(self, batch: Dict) -> bool:
        """Static (trace-time) gate for the fused decoder-tail path: eligible
        architecture, lean wire-format batch (canonical 1-D genes), and a
        batch small enough for the backward kernel's scoped-VMEM stack
        (ops/fused_decoder.MAX_FUSED_BATCH, measured compile ceiling)."""
        from scldm_tpu.ops.fused_decoder import MAX_FUSED_BATCH

        if not (self.fused_decoder and COUNTS not in batch and C_SUB in batch):
            return False
        b = batch[C_SUB].shape[0]
        chunk = self._chunk_for(b)
        if chunk:
            # chunked dispatch compiles at the CHUNK size, not the batch size
            return min(chunk, b) <= MAX_FUSED_BATCH
        return b <= MAX_FUSED_BATCH

    def _chunk_for(self, b: int) -> Optional[int]:
        """Resolve the tail kernel's batch-chunk size for a batch of B rows.
        Explicit settings win (0 = off); auto keeps the monolithic kernel —
        whose batch-aware bwd tiles are the measured optimum at B <= 256
        (parse1m B=256 +19%, round 4) — while it can compile, and dispatches
        128-row chunks above MAX_FUSED_BATCH, where the alternative was the
        module fallback (measured: chunked 182.0 vs module 235.1 vs algebraic
        222.0 ms/step at dentate B=512, round 5)."""
        from scldm_tpu.ops.fused_decoder import MAX_FUSED_BATCH

        if self.fused_batch_chunk is not None:
            return self.fused_batch_chunk or None
        return 128 if b > MAX_FUSED_BATCH else None

    def _use_algebraic(self, batch: Dict) -> bool:
        """Static gate for the XLA-reassociated cross+head path: eligible
        architecture + the canonical lean wire batch (the tail reads the
        full gene table as its batch-free query set)."""
        return self.algebraic_tail and COUNTS not in batch and C_SUB in batch

    def _use_lean_loss(self, batch: Dict, on_reassoc_path: bool) -> bool:
        """Static gate for the densify-free NB loss (vae_loss_lean): opted in,
        NB head, a lean wire batch, and no gene-SP (the subset correction
        spans the whole gene axis, which the dense loss shards trivially)."""
        return (
            self.lean_loss
            and on_reassoc_path
            and not self.gaussian_head
            and not self.gene_sp
            and COUNTS not in batch
            and C_SUB in batch
        )

    # -- steps -----------------------------------------------------------------
    def _train_step_impl(self, state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        # fused path: canonical 1-D genes (lean batch) + eligible architecture
        use_fused = self._use_fused(batch)
        use_algebraic = not use_fused and self._use_algebraic(batch)
        use_lean = self._use_lean_loss(batch, use_fused or use_algebraic)
        if use_lean:
            # the dense (B, G) counts exist only to feed the NLL — skip the
            # densify scatter entirely and keep the wire-format subsets
            from scldm_tpu.ops.transforms import widen_lean

            batch = widen_lean(batch)
        else:
            batch = self._materialize(batch)
        if self.gene_sp:
            # the NLL target shards like mu, so the loss computes shard-local
            # and only its sum crosses the "model" axis
            batch = dict(batch)
            batch[COUNTS] = self._gene_shard(batch[COUNTS], 1)
        rng, rng_d = jax.random.split(state.rng)

        def loss_fn(params):
            if use_fused:
                out, _ = fused_nb_apply(
                    self.vae, params, batch, train=True, rng=rng_d,
                    use_trunk=self.fused_trunk,
                    batch_chunk=self._chunk_for(batch[C_SUB].shape[0]),
                )
            elif use_algebraic:
                out, _ = algebraic_nb_apply(
                    self.vae, params, batch, train=True, rng=rng_d,
                    fused_gate=self.algebraic_fused_gate,
                    gene_shard=self._gene_shard if self.gene_sp else None,
                    vw_fold=self.algebraic_vw_fold,
                )
            else:
                out, _ = self._apply(params, batch, train=True, rng=rng_d)
            if use_lean:
                loss = vae_loss_lean(batch[G_SUB], batch[C_SUB], out)
            else:
                loss = vae_loss(batch[COUNTS], out, self.gaussian_head)
            aux = {"llh": loss}
            if "theta" in out:
                aux["theta"] = out["theta"].mean()
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        # one global-norm pass shared by the clip and the metric
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, self.grad_clip / (gnorm + 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        mets = {
            "train_loss": loss,
            "train_llh": aux["llh"],
            "grad_norm": gnorm,
            "lr_mult": self.schedule(state.step),
        }
        if "theta" in aux:
            mets["train_theta"] = aux["theta"]
        if self.calculate_grad_norms:
            mets.update(M.grad_norms_by_module(grads))
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        return new_state, mets

    def _train_steps_impl(self, state: TrainState, stacked: Dict) -> Tuple[TrainState, Dict]:
        """K optimizer steps in ONE compiled program (lax.scan over the leading
        axis of `stacked`). Amortizes per-dispatch latency — the dominant cost
        at reference batch sizes on remote-attached TPUs (~7x measured)."""

        def body(s, b):
            s, m = self._train_step_impl(s, b)
            return s, m

        state, mets = jax.lax.scan(body, state, stacked)
        return state, jax.tree_util.tree_map(lambda x: x.mean(), mets)

    def _eval_step_impl(self, params, batch: Dict, rng: jax.Array) -> Dict:
        """Validation metrics (reference models.py:289-333): loss, theta,
        zeros-accuracy, MSE/PCC on log1p-CPM-scaled sampled counts."""
        use_algebraic = self._use_algebraic(batch)
        batch = self._materialize(batch)
        if self.gene_sp:
            batch = dict(batch)
            batch[COUNTS] = self._gene_shard(batch[COUNTS], 1)
        if use_algebraic:
            out, _ = algebraic_nb_apply(
                self.vae, params, batch, train=False,
                fused_gate=self.algebraic_fused_gate,
                gene_shard=self._gene_shard if self.gene_sp else None,
                vw_fold=self.algebraic_vw_fold,
            )
        else:
            out, _ = self._apply(params, batch, train=False)
        counts = batch[COUNTS]
        loss = vae_loss(counts, out, self.gaussian_head)
        mets = {"val_loss": loss, "val_llh": loss}
        if self.gaussian_head:
            counts_pred = out["mu"]
            pred_scaled = counts_pred
        else:
            mets["val_theta"] = out["theta"].mean()
            counts_pred = nb_sample(rng, out["mu"], out["theta"])
            pred_scaled = log1p_cpm(counts_pred)
        true_scaled = log1p_cpm(counts)
        mets["val_zeros_accuracy"] = M.zeros_accuracy(counts_pred, counts)
        mets["val_mse"] = M.mse(pred_scaled, true_scaled)
        mets["val_pcc"] = M.nanmean(M.pearson_corrcoef(pred_scaled, true_scaled))
        return mets

    # -- public API --------------------------------------------------------------
    def train_step(self, state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        return self._train_step(state, batch)

    def train_steps(self, state: TrainState, stacked: Dict) -> Tuple[TrainState, Dict]:
        """K steps per dispatch; `stacked` leaves have shape (K, batch, ...)."""
        return self._train_steps(state, stacked)

    def eval_step(self, state: TrainState, batch: Dict, rng: jax.Array) -> Dict:
        return self._eval_step(state.params, batch, rng)

    def encode(self, params, batch) -> jax.Array:
        # same fallback convention as _apply: prefer the packed subsets, fall
        # back to full-length counts/genes — and accept lean batches that
        # carry ONLY subsets (no dense counts at all)
        from scldm_tpu.ops.transforms import widen_lean

        batch = widen_lean(batch)
        counts = batch.get(C_SUB, batch.get(COUNTS))
        genes = batch.get(G_SUB, batch.get(GENES))
        if counts is None or genes is None:
            raise KeyError(
                "encode needs counts/genes or counts_subset/genes_subset in the batch"
            )
        return self.vae.apply(params, counts=counts, genes=genes, method="encode")

    def reconstruct(self, params, batch, rng) -> jax.Array:
        out, z = self._apply(params, batch, train=False)
        if self.gaussian_head:
            return out["mu"], z
        return nb_sample(rng, out["mu"], out["theta"]), z
