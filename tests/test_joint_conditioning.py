"""Perturbation-conditioned generation path (Parse1M/Replogle pattern):
joint condition strategy across two label classes, joint size-factor tables,
forward_with_cfg under the joint strategy, and the full LDM sample program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scldm_tpu.nn import DiT
from scldm_tpu.nn.vae import build_transformer_vae
from scldm_tpu.sampling.size_factors import SizeFactorSampler
from scldm_tpu.training.ldm_task import LDMTask
from scldm_tpu.transport import create_transport

N_GENES, B = 30, 8
VOCAB = {"cell_type": 3, "cytokine": 4}


@pytest.fixture(scope="module")
def setup():
    vae = build_transformer_vae(
        n_genes=N_GENES, n_embed=16, n_embed_latent=8, n_layer=1,
        n_inducing_points=4, n_head=2, n_head_cross=2,
    )
    key = jax.random.PRNGKey(0)
    counts = jax.random.poisson(key, 2.0, (B, N_GENES)).astype(jnp.float32)
    genes = jnp.tile(jnp.arange(1, N_GENES + 1)[None], (B, 1))
    batch = {
        "counts": counts,
        "genes": genes,
        "library_size": counts.sum(1, keepdims=True),
        "counts_subset": counts[:, :10],
        "genes_subset": genes[:, :10],
        "cell_type": jax.random.randint(key, (B,), 0, 3),
        "cytokine": jax.random.randint(key, (B,), 0, 4),
    }
    vae_params = vae.init(
        jax.random.PRNGKey(1), counts, genes, batch["library_size"],
        batch["counts_subset"], batch["genes_subset"],
    )
    dit = DiT(
        n_embed=32, n_embed_input=8, n_layer=1, n_head=2, seq_len=4,
        class_vocab_sizes=VOCAB, cfg_dropout_prob=0.5, condition_strategy="joint",
    )
    task = LDMTask(vae, vae_params, dit, create_transport(), num_training_steps=10)
    return task, batch


def test_joint_training_step(setup):
    task, batch = setup
    state = task.init_state(jax.random.PRNGKey(2), batch)
    state, m = task.train_step(state, batch)
    assert np.isfinite(float(m["train_loss"]))


def test_joint_cfg_generation(setup):
    task, batch = setup

    class _E:
        class_vocab_sizes = VOCAB
        mu_size_factor = {
            "cell_type_cytokine": {f"t{i}_k{j}": 3.0 + i + j for i in range(3) for j in range(4)}
        }
        sd_size_factor = {
            "cell_type_cytokine": {f"t{i}_k{j}": 0.1 for i in range(3) for j in range(4)}
        }
        joint_key = "cell_type_cytokine"
        joint_components = ["cell_type", "cytokine"]
        joint_idx_2_classes = {f"{i}_{j}": f"t{i}_k{j}" for i in range(3) for j in range(4)}

    sfs = SizeFactorSampler(_E(), condition_strategy="joint")
    state = task.init_state(jax.random.PRNGKey(2), batch)
    state, _ = task.train_step(state, batch)
    fn = task.make_sample_fn(
        sfs, guidance_weight={"cell_type": 1.0, "cytokine": 1.0},
        sampling_method="euler", num_steps=4,
    )
    cond = {"cell_type": batch["cell_type"], "cytokine": batch["cytokine"]}
    counts, z = fn(state, jax.random.PRNGKey(3), batch["genes"], cond)
    assert counts.shape == (2 * B, N_GENES)
    assert np.isfinite(np.asarray(counts)).all()
    # joint size factors flowed: conditional-half library sizes track the joint
    # per-(cell_type, cytokine) means (mu = 3 + i + j, sd small)
    cond_lib = np.log(np.asarray(counts[B:]).sum(1) + 1e-6)
    want = 3.0 + np.asarray(batch["cell_type"]) + np.asarray(batch["cytokine"])
    assert np.corrcoef(cond_lib, want)[0, 1] > 0.7


def test_joint_size_factor_sampler_moments():
    class _E:
        class_vocab_sizes = {"a": 2, "b": 2}
        mu_size_factor = {"a_b": {"x0_y0": 5.0, "x1_y1": 9.0}}
        sd_size_factor = {"a_b": {"x0_y0": 0.5, "x1_y1": 0.5}}
        joint_key = "a_b"
        joint_components = ["a", "b"]
        joint_idx_2_classes = {"0_0": "x0_y0", "1_1": "x1_y1"}

    sfs = SizeFactorSampler(_E(), condition_strategy="joint")
    cond = {"a": jnp.zeros(2000, jnp.int32), "b": jnp.zeros(2000, jnp.int32)}
    out = np.asarray(sfs.sample(jax.random.PRNGKey(0), cond, 2000))
    assert out.mean() == pytest.approx(5.0, abs=0.1)
    assert out.std() == pytest.approx(0.5, rel=0.15)
