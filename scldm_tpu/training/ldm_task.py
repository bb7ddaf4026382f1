"""Latent-diffusion training task (reference models.LatentDiffusion,
models.py:384-939), functional edition.

- The (frozen) VAE is the tokenizer: z = stop_gradient(vae.encode(batch)).
- DiT + SiT velocity loss on z; optimizer only touches DiT params.
- EMA of DiT params updated after every optimizer step (ema-pytorch parity).
- `make_sample_fn` builds one jitted program containing the whole generation
  path: size-factor sampling -> prior noise -> ODE integration with
  doubled-batch CFG -> VAE decode -> NB count sampling.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scldm_tpu.constants import NON_CONDITION_KEYS, ModelEnum
from scldm_tpu.nn.nnets import DiT
from scldm_tpu.nn.vae import TransformerVAE
from scldm_tpu.ops.distributions import nb_sample
from scldm_tpu.sampling.size_factors import SizeFactorSampler
from scldm_tpu.training.ema import ema_init, ema_update
from scldm_tpu.training.optim import wsd_schedule
from scldm_tpu.training.state import TrainState, create_train_state
from scldm_tpu.transport import Sampler, Transport

COUNTS = ModelEnum.COUNTS.value
GENES = ModelEnum.GENES.value
LIB = ModelEnum.LIBRARY_SIZE.value
C_SUB = ModelEnum.COUNTS_SUBSET.value
G_SUB = ModelEnum.GENES_SUBSET.value


def split_condition(batch: Dict, class_vocab_sizes: Dict[str, int]) -> Dict:
    """Label columns = batch keys that are condition classes (models.py:648-651)."""
    return {
        k: batch[k]
        for k in batch
        if k not in NON_CONDITION_KEYS and k in class_vocab_sizes
    }


class LDMTask:
    def __init__(
        self,
        vae: TransformerVAE,
        vae_params,
        dit: DiT,
        transport: Transport,
        *,
        learning_rate: float = 5e-4,
        betas: Tuple[float, float] = (0.9, 0.999),
        weight_decay: float = 0.0,
        grad_clip: float = 10.0,
        num_training_steps: int = 10_000,
        num_warmup_steps: Optional[int] = None,
        final_lr_factor: float = 0.1,
        fract_decay: float = 1.0,
        decay_type: str = "cosine",
        ema_decay: float = 0.9999,
        ema_update_every: int = 10,
        ema_update_after_step: int = 10_000,
        train_vae: bool = False,
        calculate_grad_norms: bool = False,
        fused_training: Optional[bool] = None,  # None = auto (TPU & no dropout)
        mesh: Optional[Mesh] = None,
        fsdp: bool = False,  # ZeRO-3 param/opt-state sharding over "data"
        fused_encode: Optional[bool] = None,  # None = auto (TPU, frozen VAE)
        pipeline_microbatches: Optional[int] = None,  # GPipe DiT trunk over "model"
        gene_sp: bool = False,  # decode gene (sequence) parallelism over "model"
        algebraic_decode: Optional[bool] = None,  # opt-in: reassociated decode tail
        algebraic_vw_fold: Optional[bool] = None,  # fold c_proj into v; None = on with the decode
        algebraic_fused_gate: bool = False,  # swiglu_vec decode tail (big serving batches; single-device)
    ):
        self.calculate_grad_norms = calculate_grad_norms
        self.fsdp = fsdp
        if fused_training is None:
            fused_training = jax.default_backend() == "tpu" and dit.dropout == 0.0
        # pallas_call is opaque to GSPMD: the fused trunk cannot be
        # auto-partitioned over a real multi-device mesh
        if mesh is not None and mesh.devices.size > 1:
            fused_training = False
        self.fused_training = fused_training and not train_vae
        # frozen-VAE tokenization is forward-only, so the window-pooling
        # kernel's recompute-backward weakness doesn't apply — but measured
        # (v5e, dentate shapes) it still LOSES: 12.9 vs 10.7 ms/step, because
        # XLA fuses the embedding mul into its attention chain while the
        # kernel forces the (B, S, E) emb + pad copies through HBM. Default
        # off; the deciding cost is the XLA row-gather either way (ROADMAP).
        if fused_encode is None:
            fused_encode = False
        self.fused_encode = fused_encode and not train_vae
        self.fused_encode_interpret = False  # tests force interpret mode
        # vae_as_tokenizer.train=true (reference models.py:431-435): the VAE is
        # finetuned jointly — its params ride in the train state and gradients
        # flow through encode
        self.train_vae = train_vae
        self.vae = vae
        self.vae_params = vae_params
        self.dit = dit
        self.transport = transport
        self.transport_sampler = Sampler(transport)
        self.mesh = mesh
        # GPipe pipeline parallelism for the DiT trunk (parallel/pipeline.py):
        # contiguous block ranges live on successive "model"-axis devices,
        # pipeline_microbatches microbatches stream through them. For DiTs too
        # deep/wide for one chip (reference-scale ones are not — ROADMAP #9);
        # params then replicate over "model" (the axis carries stages, not
        # Megatron columns). Requires dropout-free blocks (like the fused
        # path) and n_layer divisible by the "model" axis size.
        self.pipeline = (
            int(pipeline_microbatches)
            if (
                pipeline_microbatches
                and mesh is not None
                and mesh.shape.get("model", 1) > 1
            )
            else None
        )
        if self.pipeline:
            if dit.dropout != 0.0:
                raise ValueError("pipeline_microbatches requires DiT dropout=0")
            if dit.n_layer % mesh.shape["model"]:
                raise ValueError(
                    f"DiT n_layer={dit.n_layer} must divide into "
                    f"{mesh.shape['model']} pipeline stages"
                )
            self.fused_training = False  # the trunk runs via the pipeline
        # gene/sequence parallelism for the generation decode (and the VAE
        # encode/decode when finetuned): the mesh "model" axis carries the
        # decode ACTIVATION gene axis, so params must REPLICATE over "model"
        # (Megatron columns and gene shards on the same axis would force
        # GSPMD to re-gather operands inside every cross-block matmul —
        # sharding_rules.shard_params docstring). Mutually exclusive with
        # the pipeline, whose "model" axis carries trunk stages.
        self.gene_sp = (
            bool(gene_sp) and mesh is not None and mesh.shape.get("model", 1) > 1
        )
        if self.gene_sp and self.pipeline:
            raise ValueError(
                "gene_sp and pipeline_microbatches both claim the mesh "
                "'model' axis — enable at most one"
            )
        # the generation decode's cross+head reassociated so the SwiGLU down
        # projection contracts with the head mu vector — forward-only here, so
        # the win is pure matmul FLOPs + the (2B, G, E) decode temporaries.
        # Plain XLA: under gene_sp (or a pipeline-owned decode layout) it
        # COMPOSES with the gene-axis sharding — the query-table constraint
        # gene-shards the whole reassociated tail (round 4).
        # None auto-resolves exactly like VAETask(algebraic_tail=None): ON at
        # wide embeds (n_embed > 128), where the reassociation is the measured
        # training win and the fused Pallas tail is width-ineligible. At
        # E <= 128 generation keeps the module decode (the fused-DiT denoise
        # loop dominates there anyway).
        from scldm_tpu.training.vae_task import _algebraic_path_ok

        if algebraic_decode is None:
            algebraic_decode = vae.decoder.n_embed > 128
        self.algebraic_decode = bool(algebraic_decode) and _algebraic_path_ok(vae)
        # output-projection fold: rides the reassociated decode by default
        # (round-5 census training A/B: +6.8% at B=32; the decode tail is the
        # same program forward-only)
        if algebraic_vw_fold is None:
            algebraic_vw_fold = self.algebraic_decode
        self.algebraic_vw_fold = bool(algebraic_vw_fold) and self.algebraic_decode
        # swiglu_vec decode tail: streams the SwiGLU + head contraction per
        # row tile so the (2B, G, 2Hd)/(2B, G, Hd) forward temporaries never
        # exist — the serving-batch memory escape hatch (census gen-batch 64
        # OOMs those exact tensors in plain XLA). Pallas: single-device only.
        self.algebraic_fused_gate = (
            bool(algebraic_fused_gate) and self.algebraic_decode and mesh is None
        )
        self._decode_interpret = False  # tests: Pallas decode tail in interpret mode
        self.ema_cfg = dict(
            beta=ema_decay,
            update_every=ema_update_every,
            update_after_step=ema_update_after_step,
        )
        if num_warmup_steps is None:
            num_warmup_steps = max(1, int(0.1 * num_training_steps))
        self.schedule = wsd_schedule(
            num_training_steps=num_training_steps,
            final_lr_factor=final_lr_factor,
            num_warmup_steps=num_warmup_steps,
            fract_decay=fract_decay,
            decay_type=decay_type,
        )
        # LDM uses stock AdamW (ldm_base.yaml:36-39) — optax.adamw matches
        self.grad_clip = grad_clip
        self.tx = optax.adamw(
            learning_rate=lambda c: learning_rate * self.schedule(c),
            b1=betas[0],
            b2=betas[1],
            weight_decay=weight_decay,
        )

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._train_steps = jax.jit(self._train_steps_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl, static_argnames=("use_ema",))

    # -- init -------------------------------------------------------------------
    def init_state(self, rng: jax.Array, example_batch: Dict) -> TrainState:
        seq_len = self.dit.seq_len
        latent = self.dit.n_embed_input
        b = int(example_batch[LIB].shape[0]) if LIB in example_batch else int(
            example_batch[COUNTS].shape[0]
        )
        x = jnp.zeros((b, seq_len, latent))
        t = jnp.zeros((x.shape[0],))
        condition = split_condition(
            {k: jnp.asarray(v) for k, v in example_batch.items()},
            self.dit.class_vocab_sizes or {},
        )
        params = jax.jit(self.dit.init, static_argnames=("train",))(
            {"params": rng, "condition": rng}, x, t, condition, train=True
        )
        if self.train_vae:
            # joint finetuning: both trees optimized together
            params = {"dit": params, "vae": self.vae_params}
        if self.mesh is not None:
            from scldm_tpu.parallel.sharding_rules import shard_params

            # under the pipeline the "model" axis carries trunk STAGES, and
            # under gene_sp it carries decode activation gene shards: in both
            # cases the raw tree replicates there (megatron=False); otherwise
            # the axis carries Megatron parameter columns
            megatron = not (self.pipeline or self.gene_sp)
            params = shard_params(
                params, self.mesh, fsdp=self.fsdp, megatron=megatron
            )
            self.vae_params = shard_params(
                self.vae_params, self.mesh, fsdp=self.fsdp, megatron=megatron
            )
        ema_tree = params["dit"]["params"] if self.train_vae else params["params"]
        state = create_train_state(rng, params, self.tx, ema=ema_init(ema_tree))
        if self.mesh is not None:
            state = state.replace(
                rng=jax.device_put(state.rng, NamedSharding(self.mesh, P())),
                step=jax.device_put(state.step, NamedSharding(self.mesh, P())),
            )
        return state

    # -- internals -----------------------------------------------------------------
    def _encode_with(self, vae_params, batch: Dict) -> jax.Array:
        # the encoder only reads the expressed subsets, so lean batches
        # (no dense counts transferred) encode directly
        from scldm_tpu.ops.transforms import widen_lean
        from scldm_tpu.training.vae_task import _fused_window_ok, fused_window_pooling

        batch = widen_lean(batch)
        counts = batch.get(COUNTS, batch.get(C_SUB))
        genes = batch.get(GENES, batch.get(G_SUB))
        c_sub = batch.get(C_SUB, counts)
        g_sub = batch.get(G_SUB, genes)
        if self.fused_encode and _fused_window_ok(self.vae):
            emb = self.vae.apply(
                vae_params, c_sub, g_sub, method=lambda m, c, g: m.input_layer(c, g)
            )
            pooled = fused_window_pooling(
                self.vae, vae_params, emb, interpret=self.fused_encode_interpret
            )
            return self.vae.apply(
                vae_params, pooled,
                method=lambda m, e: m.encoder(e, train=False, skip_pool=True),
            )
        return self.vae.apply(
            vae_params,
            counts=counts,
            genes=genes,
            counts_subset=batch.get(C_SUB),
            genes_subset=batch.get(G_SUB),
            method="encode",
        )

    def _encode(self, batch: Dict) -> jax.Array:
        return jax.lax.stop_gradient(self._encode_with(self.vae_params, batch))

    def _split_trees(self, params, vae_params):
        """(dit_params, vae_params) for either parameter layout."""
        if self.train_vae:
            return params["dit"], params["vae"]
        return params, vae_params

    def _train_step_impl(
        self, state: TrainState, batch: Dict, frozen_vae_params
    ) -> Tuple[TrainState, Dict]:
        # frozen_vae_params rides as a jit OPERAND, never a closure: closed-over
        # arrays are baked into the HLO as constants, which at census scale
        # (128M-param VAE) bloats the compile payload by ~0.5 GB.
        rng, rng_t, rng_c, rng_d = jax.random.split(state.rng, 4)
        z = None if self.train_vae else jax.lax.stop_gradient(
            self._encode_with(frozen_vae_params, batch)
        )
        condition = split_condition(batch, self.dit.class_vocab_sizes or {})

        def loss_fn(params):
            dit_params, vae_params = self._split_trees(params, frozen_vae_params)
            zz = self._encode_with(vae_params, batch) if self.train_vae else z

            def model_fn(xt, t, condition):
                if self.pipeline:
                    # conditioning (rng-exact) via the module, trunk as a
                    # GPipe pipeline over the mesh "model" axis
                    from scldm_tpu.parallel.pipeline import pipeline_dit_apply

                    t_emb = self.dit.apply(
                        dit_params, t, condition, train=True,
                        method="embed_condition", rngs={"condition": rng_c},
                    )
                    return pipeline_dit_apply(
                        dit_params, xt, t_emb, mesh=self.mesh,
                        n_micro=self.pipeline,
                        n_layer=self.dit.n_layer, n_head=self.dit.n_head,
                        n_embed=self.dit.n_embed, seq_len=self.dit.seq_len,
                        eps=self.dit.layernorm_eps,
                    )
                if self.fused_training:
                    # conditioning (rng-exact) via the module, trunk via the
                    # fused Pallas forward+backward kernels
                    from scldm_tpu.ops.fused_dit import fused_dit_train_apply

                    t_emb = self.dit.apply(
                        dit_params, t, condition, train=True,
                        method="embed_condition", rngs={"condition": rng_c},
                    )
                    return fused_dit_train_apply(
                        dit_params, xt, t_emb,
                        n_layer=self.dit.n_layer, n_head=self.dit.n_head,
                        n_embed=self.dit.n_embed, seq_len=self.dit.seq_len,
                        eps=self.dit.layernorm_eps,
                    )
                return self.dit.apply(
                    dit_params,
                    xt,
                    t,
                    condition,
                    train=True,
                    rngs={"condition": rng_c, "dropout": rng_d},
                )

            terms = self.transport.training_losses(
                model_fn, rng_t, zz, {"condition": condition}
            )
            return terms["loss"].mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, self.grad_clip / (gnorm + 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        dit_tree = params["dit"]["params"] if self.train_vae else params["params"]
        ema = ema_update(state.ema, dit_tree, **self.ema_cfg)
        mets = {
            "train_loss": loss,
            "grad_norm": gnorm,
            "lr_mult": self.schedule(state.step),
        }
        if self.calculate_grad_norms:
            from scldm_tpu.training.metrics import grad_norms_by_module

            mets.update(grad_norms_by_module(grads, prefix="grad_norm/diffusion"))
        return (
            state.replace(step=state.step + 1, params=params, opt_state=opt_state, rng=rng, ema=ema),
            mets,
        )

    def _train_steps_impl(
        self, state: TrainState, stacked: Dict, frozen_vae_params
    ) -> Tuple[TrainState, Dict]:
        """K optimizer steps in one compiled program (see VAETask.train_steps)."""

        def body(s, b):
            s, m = self._train_step_impl(s, b, frozen_vae_params)
            return s, m

        state, mets = jax.lax.scan(body, state, stacked)
        return state, jax.tree_util.tree_map(lambda x: x.mean(), mets)

    def _eval_step_impl(
        self, params, ema_params, batch: Dict, rng: jax.Array, frozen_vae_params,
        use_ema: bool = False,
    ) -> Dict:
        rng_t, rng_c = jax.random.split(rng)
        dit_params, vae_params = self._split_trees(params, frozen_vae_params)
        z = jax.lax.stop_gradient(self._encode_with(vae_params, batch))
        condition = split_condition(batch, self.dit.class_vocab_sizes or {})
        p = {"params": ema_params} if use_ema else dit_params

        def model_fn(xt, t, condition):
            return self.dit.apply(
                p, xt, t, condition, train=False, rngs={"condition": rng_c}
            )

        terms = self.transport.training_losses(model_fn, rng_t, z, {"condition": condition})
        prefix = "val_ema" if use_ema else "val"
        return {f"{prefix}_loss": terms["loss"].mean(), f"{prefix}_diff": terms["loss"].mean()}

    # -- public API -------------------------------------------------------------------
    def train_step(self, state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        return self._train_step(state, batch, self.vae_params)

    def train_steps(self, state: TrainState, stacked: Dict) -> Tuple[TrainState, Dict]:
        return self._train_steps(state, stacked, self.vae_params)

    def eval_step(self, state: TrainState, batch: Dict, rng: jax.Array, ema: bool = False):
        return self._eval_step(
            state.params, state.ema.params, batch, rng, self.vae_params, use_ema=ema
        )

    # -- generation (models.py:766-819) ---------------------------------------------
    def make_sample_fn(
        self,
        size_factor_sampler: SizeFactorSampler,
        *,
        guidance_weight: Optional[Dict[str, float]] = None,
        sampling_method: str = "dopri5",
        num_steps: int = 50,
        use_ema: bool = True,
        fused_blocks: bool = True,
    ):
        """One jitted program: noise -> CFG ODE -> decode -> NB counts.

        Returned fn(params_or_state, rng, genes, condition) ->
        (counts (2B, G), z (2B, M, E)): first half unconditional, second half
        conditional — the reference's doubled-batch output convention.
        """
        if guidance_weight and self.dit.cfg_dropout_prob <= 0:
            raise ValueError(
                "CFG guidance needs null-token embedding rows, which only "
                "exist when the DiT was built with cfg_dropout_prob>0 "
                "(reference default 0.8); this model has none"
            )
        sample_ode = self.transport_sampler.sample_ode(
            sampling_method=sampling_method, num_steps=num_steps
        )
        latent = self.vae.encoder.latent_embedding
        seq_len = self.dit.seq_len

        # mesh-first generation: batch rides the "data" axis; with gene_sp
        # the decode is additionally sequence-parallel over the GENE axis —
        # the (2B, G, E) cross-attention activations (the memory gate for
        # census-scale decode, ROADMAP census budget) shrink by n_model per
        # chip, with GSPMD propagating the constraint back through the NB
        # head and the gene-query cross block. The reference has no analog
        # (single-device inference, experiments/scripts/inference.py:69).
        # Megatron-sharded tasks must NOT constrain the gene axis: their
        # "model" axis already carries parameter columns, and both uses at
        # once re-gather operands inside every decode matmul.
        mesh = self.mesh
        tp = (
            mesh is not None
            and mesh.shape.get("model", 1) > 1
            and (self.gene_sp or bool(self.pipeline))
        )

        def _constrain_genes(tree):
            if not tp:
                return tree
            def put(v):
                if v.ndim == 1:  # (G,) shared-theta row
                    return jax.lax.with_sharding_constraint(
                        v, NamedSharding(mesh, P("model"))
                    )
                return jax.lax.with_sharding_constraint(
                    v, NamedSharding(mesh, P("data", "model"))
                )
            return jax.tree_util.tree_map(put, tree)

        def _gene_shard(x, gene_axis):
            from scldm_tpu.training.vae_task import gene_shard_constraint

            return gene_shard_constraint(mesh, x, gene_axis)

        @partial(jax.jit, static_argnums=(5, 6))
        def sample_fn(
            dit_params, vae_params, rng, genes, condition, batch_size, alg_decode
        ):
            k_sf, k_z, k_nb = jax.random.split(rng, 3)
            log_sf = size_factor_sampler.sample(k_sf, condition, batch_size)
            z0 = jax.random.normal(k_z, (batch_size, seq_len, latent), jnp.float32)
            z_cfg = jnp.concatenate([z0, z0], axis=0)
            condition_cfg = (
                {k: jnp.concatenate([v, v], 0) for k, v in condition.items()}
                if condition
                else None
            )

            use_fused = (
                fused_blocks
                and jax.default_backend() == "tpu"
                and self.dit.dropout == 0.0
                # pallas_call is an opaque custom call to GSPMD — it cannot
                # be auto-partitioned over a real multi-device mesh, so the
                # denoise loop falls back to the module path there
                and (mesh is None or mesh.devices.size == 1)
            )
            if mesh is not None and not use_fused:
                # pin the denoise loop's batch to "data" (the fused-Pallas DiT
                # path is left unconstrained: pallas_call partitions manually)
                z_cfg = jax.lax.with_sharding_constraint(
                    z_cfg, NamedSharding(mesh, P("data"))
                )

            def model_fn(x, t, condition=None):
                # batched-CFG: one fused model call per denoiser step
                # (equivalent to the reference's separate uncond/cond forwards)
                if use_fused:
                    from scldm_tpu.nn.nnets import build_cfg_segments, combine_cfg_segments
                    from scldm_tpu.ops.fused_dit import fused_dit_forward

                    seg_x, seg_t, seg_cond, scale_segments, b, h = build_cfg_segments(
                        x, t, condition, guidance_weight,
                        self.dit.class_vocab_sizes or {}, self.dit.condition_strategy,
                    )
                    out = fused_dit_forward(
                        dit_params, seg_x, seg_t, seg_cond,
                        n_layer=self.dit.n_layer, n_head=self.dit.n_head,
                        n_embed=self.dit.n_embed, seq_len=self.dit.seq_len,
                        eps=self.dit.layernorm_eps,
                    )
                    if not scale_segments:
                        return out
                    return combine_cfg_segments(out, scale_segments, b, h)
                return self.dit.apply(
                    dit_params,
                    x,
                    t,
                    condition,
                    cfg_scale=guidance_weight,
                    method="forward_with_cfg_batched",
                )

            samples = sample_ode(z_cfg, model_fn, condition=condition_cfg)

            # 1-D genes = batch-shared canonical row: the decoder consumes it
            # directly (batch-free query path); 2-D doubles with the batch
            genes_cfg = (
                genes if genes.ndim == 1 else jnp.concatenate([genes, genes], axis=0)
            )
            sf = jnp.exp(log_sf).reshape(-1, 1)
            sf_cfg = jnp.concatenate([sf, sf], axis=0)
            if alg_decode:
                from scldm_tpu.training.vae_task import algebraic_decode as _alg_decode

                out = _alg_decode(
                    self.vae, vae_params, samples, sf_cfg,
                    gene_shard=_gene_shard if tp else None,
                    vw_fold=self.algebraic_vw_fold,
                    fused_gate=self.algebraic_fused_gate,
                    interpret=self._decode_interpret,
                )
            else:
                out = self.vae.apply(
                    vae_params, samples, genes_cfg, sf_cfg, method="decode"
                )
            out = _constrain_genes(out)
            counts = nb_sample(k_nb, out["mu"], out["theta"])
            return counts, samples

        def wrapped(state_or_params, rng, genes, condition=None, batch_size=None):
            if isinstance(state_or_params, TrainState):
                dit_p, vae_p = self._split_trees(state_or_params.params, self.vae_params)
                if use_ema:
                    dit_p = {"params": state_or_params.ema.params}
            else:
                if use_ema:
                    from scldm_tpu.utils.logger import logger

                    logger.warning(
                        "make_sample_fn(use_ema=True) got a raw params tree — "
                        "EMA weights live on the TrainState, so sampling runs "
                        "on the ONLINE weights. Pass the TrainState (or build "
                        "with use_ema=False) to silence this."
                    )
                dit_p, vae_p = self._split_trees(state_or_params, self.vae_params)
            if batch_size is None:
                if genes.ndim == 2:
                    batch_size = genes.shape[0]
                elif condition:
                    batch_size = next(iter(condition.values())).shape[0]
                else:
                    raise ValueError(
                        "batch_size required when genes is 1-D and no condition given"
                    )
            # the reassociated tail reads the FULL canonical gene table as its
            # query set — verify (host-side, once per call) the requested
            # genes really are the canonical row 1..G before routing to it
            alg_decode = bool(
                self.algebraic_decode
                and genes.ndim == 1
                and genes.shape[0] == self.vae.decoder.n_genes
                and np.array_equal(
                    np.asarray(genes),
                    np.arange(1, self.vae.decoder.n_genes + 1),
                )
            )
            return sample_fn(
                dit_p, vae_p, rng, genes, condition or {}, int(batch_size), alg_decode
            )

        return wrapped
