"""scVI-style VAE training task (reference models.VAEScvi, models.py:942-1230).

A true VAE: Gaussian posterior with reparameterization, ELBO =
recon NLL + kl_weight * (log q(z|x) - log p(z)) via the sampled z.
The MLP encoder/decoder use BatchNorm, so the train state carries a
`batch_stats` collection in `extra`.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scldm_tpu.constants import ModelEnum
from scldm_tpu.nn.priors import StandardPrior
from scldm_tpu.nn.vae import ScviVAE
from scldm_tpu.ops.distributions import log_nb_positive, nb_sample, normal_log_prob
from scldm_tpu.ops.transforms import log1p_cpm
from scldm_tpu.training import metrics as M
from scldm_tpu.training.optim import adamw_legacy, wsd_schedule
from scldm_tpu.training.state import TrainState, create_train_state

COUNTS = ModelEnum.COUNTS.value
GENES = ModelEnum.GENES.value
LIB = ModelEnum.LIBRARY_SIZE.value


class ScviTask:
    def __init__(
        self,
        vae: ScviVAE,
        *,
        n_latent: int,
        kl_weight: float = 1.0,
        learning_rate: float = 1e-3,
        betas: Tuple[float, float] = (0.9, 0.95),
        weight_decay: float = 0.0,
        grad_clip: float = 10.0,
        num_training_steps: int = 10_000,
        num_warmup_steps: Optional[int] = None,
        decay_type: str = "sqrt",
        fract_decay: float = 0.1,
        mesh: Optional[Mesh] = None,
    ):
        self.vae = vae
        self.prior = StandardPrior(n_latent)
        self.kl_weight = kl_weight
        self.mesh = mesh
        if num_warmup_steps is None:
            num_warmup_steps = max(1, int(0.1 * num_training_steps))
        self.schedule = wsd_schedule(
            num_training_steps=num_training_steps,
            num_warmup_steps=num_warmup_steps,
            decay_type=decay_type,
            fract_decay=fract_decay,
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            adamw_legacy(
                learning_rate=lambda c: learning_rate * self.schedule(c),
                betas=betas,
                weight_decay=weight_decay,
            ),
        )
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._train_steps = jax.jit(self._train_steps_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    def _materialize(self, batch: Dict) -> Dict:
        from scldm_tpu.ops.transforms import widen_lean

        batch = widen_lean(batch)
        if COUNTS in batch:
            return batch
        from scldm_tpu.ops.transforms import densify_expressed, full_gene_row

        n_genes = self.vae.decoder_head.n_genes
        counts = densify_expressed(
            batch["genes_subset"], batch["counts_subset"], n_genes
        )
        out = dict(batch)
        out[COUNTS] = counts
        out[GENES] = full_gene_row(counts.shape[0], n_genes)
        if LIB not in out:  # lean batches: same backfill contract as VAETask
            out[LIB] = counts.sum(1, keepdims=True)
        return out

    def init_state(self, rng: jax.Array, example_batch: Dict) -> TrainState:
        example_batch = jax.tree_util.tree_map(jnp.asarray, dict(example_batch))
        example_batch = self._materialize(example_batch)
        variables = jax.jit(self.vae.init, static_argnames=("train",))(
            {"params": rng, "sample": rng, "dropout": rng},
            counts=jnp.asarray(example_batch[COUNTS]),
            genes=jnp.asarray(example_batch[GENES]),
            library_size=jnp.asarray(example_batch[LIB]),
            train=True,
        )
        params = {"params": variables["params"]}
        batch_stats = variables.get("batch_stats", {})
        state = create_train_state(rng, params, self.tx, extra=batch_stats)
        if self.mesh is not None:
            state = jax.device_put(state, NamedSharding(self.mesh, P()))  # replicated
        return state

    def _elbo(self, out, aux_z, counts):
        """llh + kl terms (models.py:1031-1053)."""
        (loc, scale), z = aux_z
        recon = -log_nb_positive(counts, out["mu"], out["theta"])
        kl = self.kl_weight * (
            normal_log_prob(z, loc, scale) - self.prior.log_prob(z)
        )
        return recon.sum(1).mean(), kl.sum(1).mean()

    def _train_step_impl(self, state: TrainState, batch: Dict):
        # lean batches carry only the expressed subsets — rebuild the dense
        # counts ONCE here so the ELBO target and the model input agree
        # (_materialize is idempotent; _apply re-calling it is a no-op)
        batch = self._materialize(batch)
        rng, rng_s = jax.random.split(state.rng)

        def loss_fn(params):
            out, (posterior, z), new_vars = self._apply(
                params, state.extra, batch, rng_s, train=True
            )
            llh, kl = self._elbo(out, (posterior, z), batch[COUNTS])
            return llh + kl, (llh, kl, out, new_vars)

        (loss, (llh, kl, out, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        mets = {
            "train_loss": loss,
            "train_llh": llh,
            "train_kl": kl,
            "train_theta": out["theta"].mean(),
        }
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                rng=rng,
                extra=new_vars,
            ),
            mets,
        )

    def _train_steps_impl(self, state: TrainState, stacked: Dict):
        """K optimizer steps in one compiled program (see VAETask.train_steps) —
        amortizes dispatch latency the same way the other tasks do."""

        def body(s, b):
            return self._train_step_impl(s, b)

        state, mets = jax.lax.scan(body, state, stacked)
        return state, jax.tree_util.tree_map(lambda x: x.mean(), mets)

    def train_steps(self, state: TrainState, stacked: Dict):
        return self._train_steps(state, stacked)

    def _apply(self, params, batch_stats, batch, rng, train: bool):
        batch = self._materialize(batch)
        variables = {"params": params["params"], "batch_stats": batch_stats}
        if train:
            # scVI MLPs apply Dropout at train time (reference nnets.py:19-73,
            # dropout 0.1 default) — the "dropout" rng collection is required
            # alongside the reparameterization "sample" stream
            rng_s, rng_d = jax.random.split(rng)
            (out, posterior, z), mutated = self.vae.apply(
                variables,
                counts=batch[COUNTS],
                genes=batch[GENES],
                library_size=batch[LIB],
                train=True,
                rngs={"sample": rng_s, "dropout": rng_d},
                mutable=["batch_stats"],
            )
            return out, (posterior, z), mutated["batch_stats"]
        out, posterior, z = self.vae.apply(
            variables,
            counts=batch[COUNTS],
            genes=batch[GENES],
            library_size=batch[LIB],
            train=False,
            rngs={"sample": rng},
        )
        return out, (posterior, z), batch_stats

    def _eval_step_impl(self, params, batch_stats, batch: Dict, rng: jax.Array) -> Dict:
        batch = self._materialize(batch)  # lean batches: see _train_step_impl
        rng_s, rng_nb = jax.random.split(rng)
        out, (posterior, z), _ = self._apply(params, batch_stats, batch, rng_s, train=False)
        counts = batch[COUNTS]
        llh, kl = self._elbo(out, (posterior, z), counts)
        counts_pred = nb_sample(rng_nb, out["mu"], out["theta"])
        lib = counts.sum(1, keepdims=True)
        pred_scaled = jnp.log1p(counts_pred / lib * 10_000.0)
        true_scaled = jnp.log1p(counts / lib * 10_000.0)
        return {
            "val_loss": llh + kl,
            "val_llh": llh,
            "val_kl": kl,
            "val_zeros_accuracy": M.zeros_accuracy(counts_pred, counts),
            "val_mse": M.mse(pred_scaled, true_scaled),
            "val_pcc": M.nanmean(M.pearson_corrcoef(pred_scaled, true_scaled)),
        }

    # -- public API -----------------------------------------------------------
    def train_step(self, state, batch):
        return self._train_step(state, batch)

    def eval_step(self, state, batch, rng):
        return self._eval_step(state.params, state.extra, batch, rng)

    def sample(self, state, rng, library_size):
        """Prior sampling -> NB counts (models.py:1187-1195)."""
        k_z, k_nb = jax.random.split(rng)
        z = self.prior.sample(k_z, library_size.shape[0])
        out = self.vae.apply(
            {"params": state.params["params"], "batch_stats": state.extra},
            z,
            None,
            library_size,
            method="decode",
        )
        return nb_sample(k_nb, out["mu"], out["theta"])
