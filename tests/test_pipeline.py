"""GPipe pipeline parallelism over the mesh "model" axis
(scldm_tpu/parallel/pipeline.py), validated on the 8-virtual-device CPU mesh.

The reference has no analog (DDP only, SURVEY.md §2.6); parity targets are
the flax DiT module itself."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scldm_tpu.nn import DiT
from scldm_tpu.parallel.mesh import make_mesh
from scldm_tpu.parallel.pipeline import (
    pipeline_blocks,
    pipeline_dit_apply,
    stack_block_params,
)

B, T, EIN, E, L, H = 16, 8, 4, 32, 8, 4


@pytest.fixture(scope="module")
def setup():
    dit = DiT(
        n_embed=E, n_embed_input=EIN, n_layer=L, n_head=H, seq_len=T,
        class_vocab_sizes={"clusters": 3}, cfg_dropout_prob=0.8,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, EIN))
    t = jax.random.uniform(jax.random.PRNGKey(1), (B,))
    cond = {"clusters": jax.random.randint(jax.random.PRNGKey(2), (B,), 0, 3)}
    params = dit.init(
        {"params": jax.random.PRNGKey(3), "condition": jax.random.PRNGKey(4)},
        x, t, cond, train=True,
    )
    return dit, params, x, t, cond


def _temb(dit, params, t, cond):
    return dit.apply(params, t, cond, train=False, method="embed_condition")


class TestPipelineDiT:
    def test_forward_matches_module(self, setup):
        """4 stages x 4 microbatches on a (2,4) mesh reproduce the flax DiT."""
        dit, params, x, t, cond = setup
        want = dit.apply(params, x, t, cond, train=False)
        mesh = make_mesh(n_data=2, n_model=4)
        got = pipeline_dit_apply(
            params, x, _temb(dit, params, t, cond), mesh=mesh, n_micro=4,
            n_layer=L, n_head=H, n_embed=E, seq_len=T,
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    def test_microbatch_and_stage_invariance(self, setup):
        """The schedule is math-invisible: any (n_stages, n_micro) pair gives
        the same outputs."""
        dit, params, x, t, cond = setup
        t_emb = _temb(dit, params, t, cond)
        results = []
        for n_data, n_model, n_micro in ((4, 2, 2), (2, 4, 8), (1, 8, 2)):
            mesh = make_mesh(n_data=n_data, n_model=n_model)
            results.append(
                np.asarray(pipeline_dit_apply(
                    params, x, t_emb, mesh=mesh, n_micro=n_micro,
                    n_layer=L, n_head=H, n_embed=E, seq_len=T,
                ))
            )
        np.testing.assert_allclose(results[0], results[1], rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(results[0], results[2], rtol=2e-4, atol=2e-5)

    def test_gradients_match_module(self, setup):
        """jax.grad through the schedule (ppermute transpose + reverse-time
        scan) equals the flax module's gradients — the GPipe backward."""
        dit, params, x, t, cond = setup
        gref = jax.random.normal(jax.random.PRNGKey(7), (B, T, EIN))
        mesh = make_mesh(n_data=2, n_model=4)

        def loss_pipe(p):
            out = pipeline_dit_apply(
                p, x, _temb(dit, p, t, cond), mesh=mesh, n_micro=4,
                n_layer=L, n_head=H, n_embed=E, seq_len=T,
            )
            return jnp.sum(out * gref)

        def loss_flax(p):
            return jnp.sum(dit.apply(p, x, t, cond, train=False) * gref)

        v1, g1 = jax.value_and_grad(loss_pipe)(params)
        v2, g2 = jax.value_and_grad(loss_flax)(params)
        assert float(v1) == pytest.approx(float(v2), rel=1e-4)
        flat1 = jax.tree_util.tree_leaves_with_path(g1)
        flat2 = dict(
            (jax.tree_util.keystr(kp), leaf)
            for kp, leaf in jax.tree_util.tree_leaves_with_path(g2)
        )
        assert len(flat1) == len(flat2)
        for kp, leaf in flat1:
            ref = flat2[jax.tree_util.keystr(kp)]
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(ref), rtol=5e-4, atol=1e-5,
                err_msg=jax.tree_util.keystr(kp),
            )

    def test_block_pipeline_standalone(self, setup):
        """pipeline_blocks alone == sequential _block_math over the stack."""
        from scldm_tpu.ops.fused_dit import WEIGHT_NAMES, _block_math

        dit, params, x, t, cond = setup
        h = jax.random.normal(jax.random.PRNGKey(8), (B, T, E))
        c = jax.random.normal(jax.random.PRNGKey(9), (B, E))
        stacked = stack_block_params(params, L)

        want = h.astype(jnp.float32)
        for i in range(L):
            w = [stacked[k][i] for k in WEIGHT_NAMES]
            want = _block_math(want, c, w, H, 1e-8)

        mesh = make_mesh(n_data=2, n_model=4)
        got = pipeline_blocks(
            h, c, stacked, mesh=mesh, n_micro=4, n_head=H, eps=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    def test_ldm_train_step_parity(self):
        """LDMTask(pipeline_microbatches=2) on a (4,2) mesh reproduces the
        plain flax train step: same loss, grad norm, and updated params."""
        from scldm_tpu.nn.vae import build_transformer_vae
        from scldm_tpu.parallel.mesh import shard_batch
        from scldm_tpu.training.ldm_task import LDMTask
        from scldm_tpu.transport import create_transport
        from tests.test_training import make_batch

        vae = build_transformer_vae(
            n_genes=40, n_embed=16, n_embed_latent=8, n_layer=1,
            n_inducing_points=4, n_head=2, n_head_cross=2,
        )
        batch = make_batch(jax.random.PRNGKey(0), n_genes=40)
        vae_params = vae.init(
            jax.random.PRNGKey(0), batch["counts"], batch["genes"],
            batch["library_size"], batch["counts_subset"], batch["genes_subset"],
        )
        dit = DiT(
            n_embed=32, n_embed_input=8, n_layer=2, n_head=2, seq_len=4,
            class_vocab_sizes={"clusters": 3}, cfg_dropout_prob=0.8,
        )
        t_ref = LDMTask(
            vae, vae_params, dit, create_transport(), num_training_steps=10,
            fused_training=False,
        )
        s1 = t_ref.init_state(jax.random.PRNGKey(3), batch)
        s1, m1 = t_ref.train_step(s1, batch)

        mesh = make_mesh(n_data=4, n_model=2)
        t_pipe = LDMTask(
            vae, vae_params, dit, create_transport(), num_training_steps=10,
            mesh=mesh, pipeline_microbatches=2,
        )
        assert t_pipe.pipeline == 2
        s2 = t_pipe.init_state(jax.random.PRNGKey(3), batch)
        # stage layout: params replicate over "model" (no Megatron columns)
        specs = [
            str(getattr(leaf.sharding, "spec", ""))
            for leaf in jax.tree_util.tree_leaves(s2.params)
        ]
        assert not any("model" in s for s in specs), specs
        s2, m2 = t_pipe.train_step(s2, shard_batch(batch, mesh))

        assert float(m1["train_loss"]) == pytest.approx(
            float(m2["train_loss"]), rel=1e-4
        )
        assert float(m1["grad_norm"]) == pytest.approx(
            float(m2["grad_norm"]), rel=1e-3
        )
        la = jax.tree_util.tree_leaves(s1.params)[0]
        lb = jax.tree_util.tree_leaves(s2.params)[0]
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5
        )

    def test_ldm_guards(self):
        """dropout>0 and indivisible layer counts are rejected loudly."""
        from scldm_tpu.nn.vae import build_transformer_vae
        from scldm_tpu.training.ldm_task import LDMTask
        from scldm_tpu.transport import create_transport

        vae = build_transformer_vae(
            n_genes=40, n_embed=16, n_embed_latent=8, n_layer=1,
            n_inducing_points=4, n_head=2, n_head_cross=2,
        )
        mesh = make_mesh(n_data=4, n_model=2)
        dit_drop = DiT(
            n_embed=32, n_embed_input=8, n_layer=2, n_head=2, seq_len=4,
            dropout=0.1, class_vocab_sizes={"clusters": 3},
        )
        with pytest.raises(ValueError, match="dropout"):
            LDMTask(vae, {}, dit_drop, create_transport(), num_training_steps=10,
                    mesh=mesh, pipeline_microbatches=2)
        dit_odd = DiT(
            n_embed=32, n_embed_input=8, n_layer=3, n_head=2, seq_len=4,
            class_vocab_sizes={"clusters": 3},
        )
        with pytest.raises(ValueError, match="stages"):
            LDMTask(vae, {}, dit_odd, create_transport(), num_training_steps=10,
                    mesh=mesh, pipeline_microbatches=2)

    def test_shape_guards(self, setup):
        dit, params, x, t, cond = setup
        h = jnp.zeros((B, T, E))
        c = jnp.zeros((B, E))
        stacked = stack_block_params(params, L)
        mesh = make_mesh(n_data=2, n_model=4)
        with pytest.raises(ValueError, match="microbatches"):
            pipeline_blocks(h[:6], c[:6], stacked, mesh=mesh, n_micro=4, n_head=H, eps=1e-8)
        bad = {k: v[:6] for k, v in stacked.items()}  # 6 layers, 4 stages
        with pytest.raises(ValueError, match="stages"):
            pipeline_blocks(h, c, bad, mesh=mesh, n_micro=4, n_head=H, eps=1e-8)
