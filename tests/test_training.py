"""Training stack tests: schedule, optimizer, EMA, metrics, end-to-end tasks,
multi-device data-parallel parity, checkpoint roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from scldm_tpu.nn import DiT
from scldm_tpu.nn.vae import build_transformer_vae
from scldm_tpu.parallel.mesh import make_mesh, shard_batch
from scldm_tpu.sampling.size_factors import SizeFactorSampler
from scldm_tpu.training import metrics as M
from scldm_tpu.training.checkpoint import CheckpointManager
from scldm_tpu.training.ema import current_decay, ema_init, ema_update
from scldm_tpu.training.ldm_task import LDMTask
from scldm_tpu.training.optim import adamw_legacy, wsd_schedule
from scldm_tpu.training.vae_task import VAETask
from scldm_tpu.transport import create_transport

N_GENES = 40
B = 16


def make_batch(key, n_genes=N_GENES, batch=B):
    counts = jax.random.poisson(key, 2.0, (batch, n_genes)).astype(jnp.float32)
    genes = jnp.tile(jnp.arange(1, n_genes + 1)[None], (batch, 1))
    return {
        "counts": counts,
        "genes": genes,
        "library_size": counts.sum(1, keepdims=True),
        "counts_subset": counts[:, :20],
        "genes_subset": genes[:, :20],
        "clusters": jax.random.randint(key, (batch,), 0, 3),
    }


# ---------------------------------------------------------------------------
# wsd schedule (reference _utils.py:19-59)
# ---------------------------------------------------------------------------
class TestWSD:
    def test_phases(self):
        s = wsd_schedule(1000, final_lr_factor=0.1, num_warmup_steps=100, fract_decay=0.2)
        assert float(s(0)) == pytest.approx(1 / 100)  # init_div_factor
        assert float(s(50)) == pytest.approx(0.5 + 0.5 / 100)
        assert float(s(100)) == pytest.approx(1.0)
        assert float(s(500)) == pytest.approx(1.0)  # hold until 800
        assert 0.1 < float(s(900)) < 1.0  # decaying
        assert float(s(2000)) == pytest.approx(0.1)

    def test_sqrt_decay(self):
        s = wsd_schedule(1000, num_warmup_steps=100, fract_decay=0.1, decay_type="sqrt")
        # at n_hold + n_anneal/4 -> 0.1 + 0.9*(1-0.5)
        assert float(s(925)) == pytest.approx(0.1 + 0.9 * (1 - 0.5), rel=1e-4)

    def test_cosine_midpoint(self):
        s = wsd_schedule(1000, num_warmup_steps=0, fract_decay=1.0, decay_type="cosine")
        assert float(s(500)) == pytest.approx(0.1 + 0.9 * 0.5, rel=1e-4)

    def test_warmup_wins_when_decay_spans_everything(self):
        """The LDM defaults (fract_decay=1.0 -> n_hold=0, 10% warmup): the
        reference's if-chain gives warmup precedence over the decay branch, so
        step 0 must start at 1/init_div_factor — NOT at the near-peak cosine
        value (a decay-first where() ordering silently eliminated warmup)."""
        import math

        W, T = 100, 1000
        s = wsd_schedule(T, num_warmup_steps=W, fract_decay=1.0, decay_type="cosine")

        def reference(step):  # _utils.py:42-57 verbatim semantics
            if step < W:
                return (step / W) + (1 - step / W) / 100
            elif step < 0:  # n_hold = 0
                return 1.0
            elif step < T:
                p = (step - W) / (T - W)
                return 0.1 + 0.9 * 0.5 * (1 + math.cos(math.pi * p))
            return 0.1

        for step in (0, 1, 50, 99, 100, 101, 500, 999, 1000, 1500):
            assert float(s(step)) == pytest.approx(reference(step), rel=1e-5), step
        assert float(s(0)) == pytest.approx(0.01)


# ---------------------------------------------------------------------------
# AdamWLegacy
# ---------------------------------------------------------------------------
class TestAdamWLegacy:
    def test_matches_reference_torch_impl(self):
        """Step-by-step parity against the reference timm-style update rule,
        re-derived in numpy (optimizers.py:85-140)."""
        lr, wd, b1, b2, eps = 0.1, 0.01, 0.9, 0.95, 1e-8
        p0 = np.array([1.0, -2.0, 3.0], np.float32)
        tx = adamw_legacy(lr, (b1, b2), eps, wd)
        params = {"w": jnp.array(p0)}
        state = tx.init(params)

        p = p0.copy()
        m = np.zeros_like(p)
        v = np.zeros_like(p)
        rng = np.random.default_rng(0)
        for step in range(1, 6):
            g = rng.normal(size=3).astype(np.float32)
            updates, state = tx.update({"w": jnp.array(g)}, state, params)
            params = optax.apply_updates(params, updates)
            # numpy reference
            p *= 1 - lr * wd
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            bc1, bc2 = 1 - b1**step, 1 - b2**step
            denom = np.sqrt(v) / np.sqrt(bc2) + eps
            p -= lr / bc1 * m / denom
            np.testing.assert_allclose(np.asarray(params["w"]), p, rtol=1e-5, atol=1e-6)

    def test_caution_masks_disagreeing_updates(self):
        tx = adamw_legacy(0.1, (0.9, 0.95), caution=True, weight_decay=0.0)
        params = {"w": jnp.array([1.0, 1.0])}
        state = tx.init(params)
        # first step: m = 0.1*g, same sign as g -> full update both coords
        updates, state = tx.update({"w": jnp.array([1.0, 1.0])}, state, params)
        # second step: small opposite gradient on coord 1 keeps m positive but
        # makes m*g < 0 there -> cautious mask zeroes that coordinate
        updates, state = tx.update({"w": jnp.array([1.0, -0.01])}, state, params)
        u = np.asarray(updates["w"])
        assert u[0] < 0  # still descending
        assert u[1] == 0  # cautious mask zeroed it

    def test_converges_on_quadratic(self):
        tx = adamw_legacy(0.05, (0.9, 0.95), weight_decay=0.0)
        params = jnp.array([5.0, -3.0])
        state = tx.init(params)
        for _ in range(500):
            g = 2 * params
            upd, state = tx.update(g, state, params)
            params = optax.apply_updates(params, upd)
        np.testing.assert_allclose(np.asarray(params), 0.0, atol=1e-2)


# ---------------------------------------------------------------------------
# EMA (ema-pytorch semantics)
# ---------------------------------------------------------------------------
class TestEMA:
    def test_copies_before_update_after_step(self):
        assert float(current_decay(jnp.array(5), update_after_step=100)) == 0.0

    def test_decay_ramp_and_clamp(self):
        d_early = float(current_decay(jnp.array(105), beta=0.9999, update_after_step=100))
        d_late = float(current_decay(jnp.array(1_000_000), beta=0.9999, update_after_step=100))
        assert 0 < d_early < 0.9
        assert d_late == pytest.approx(0.9999)

    def test_update_every_gating(self):
        params = {"w": jnp.array([0.0])}
        ema = ema_init(params)
        # steps 1..9 with update_every=10: no update happens until step 10
        for i in range(9):
            ema = ema_update(ema, {"w": jnp.array([1.0])}, update_every=10, update_after_step=0)
            assert float(ema.params["w"][0]) == 0.0
        ema = ema_update(ema, {"w": jnp.array([1.0])}, update_every=10, update_after_step=0)
        assert float(ema.params["w"][0]) > 0.0  # blended at step 10


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------
class TestMetrics:
    def test_pcc_matches_scipy(self, rng):
        from scipy.stats import pearsonr

        x = rng.normal(size=(50, 4)).astype(np.float32)
        y = rng.normal(size=(50, 4)).astype(np.float32)
        got = np.asarray(M.pearson_corrcoef(jnp.array(x), jnp.array(y)))
        want = [pearsonr(x[:, i], y[:, i]).statistic for i in range(4)]
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_pcc_constant_column_nan(self):
        x = jnp.ones((10, 2))
        y = jnp.ones((10, 2))
        assert np.isnan(np.asarray(M.pearson_corrcoef(x, y))).all()

    def test_r2(self, rng):
        from sklearn.metrics import r2_score as sk_r2

        p = rng.normal(size=20).astype(np.float32)
        t = rng.normal(size=20).astype(np.float32)
        assert float(M.r2_score(jnp.array(p), jnp.array(t))) == pytest.approx(
            sk_r2(t, p), rel=1e-4
        )

    def test_zeros_accuracy(self):
        p = jnp.array([[0.0, 1.0], [2.0, 0.0]])
        t = jnp.array([[0.0, 1.0], [0.0, 3.0]])
        assert float(M.zeros_accuracy(p, t)) == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# VAE task end-to-end
# ---------------------------------------------------------------------------
class TestVAETask:
    def _task(self, mesh=None):
        vae = build_transformer_vae(
            n_genes=N_GENES, n_embed=16, n_embed_latent=8, n_layer=1,
            n_inducing_points=4, n_head=2, n_head_cross=2,
        )
        return VAETask(vae, num_training_steps=100, learning_rate=1e-3, mesh=mesh)

    def test_loss_decreases(self):
        task = self._task()
        batch = make_batch(jax.random.PRNGKey(0))
        state = task.init_state(jax.random.PRNGKey(1), batch)
        state, m0 = task.train_step(state, batch)
        for _ in range(30):
            state, m = task.train_step(state, batch)
        assert float(m["train_loss"]) < float(m0["train_loss"])
        assert int(state.step) == 31

    def test_train_steps_matches_sequential(self):
        """K scanned steps in one program == K sequential dispatches."""
        import jax.numpy as jnp

        batches = [make_batch(jax.random.PRNGKey(i)) for i in range(3)]
        task_a = self._task()
        state_a = task_a.init_state(jax.random.PRNGKey(1), batches[0])
        for b in batches:
            state_a, m_seq = task_a.train_step(state_a, b)

        task_b = self._task()
        state_b = task_b.init_state(jax.random.PRNGKey(1), batches[0])
        stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
        state_b, m_scan = task_b.train_steps(state_b, stacked)

        assert int(state_b.step) == 3
        leaf_a = jax.tree_util.tree_leaves(state_a.params)[0]
        leaf_b = jax.tree_util.tree_leaves(state_b.params)[0]
        np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b), rtol=1e-5, atol=1e-6)

    def test_eval_metrics_present(self):
        task = self._task()
        batch = make_batch(jax.random.PRNGKey(0))
        state = task.init_state(jax.random.PRNGKey(1), batch)
        mets = task.eval_step(state, batch, jax.random.PRNGKey(2))
        for k in ("val_loss", "val_zeros_accuracy", "val_mse", "val_pcc", "val_theta"):
            assert k in mets
        assert np.isfinite(float(mets["val_loss"]))

    def test_dp_parity_with_mesh(self):
        """Same data, same init: loss identical with and without an 8-device
        mesh (the multi-node equivalence test the reference never had)."""
        batch = make_batch(jax.random.PRNGKey(0))
        task1 = self._task(mesh=None)
        state1 = task1.init_state(jax.random.PRNGKey(1), batch)
        _, m1 = task1.train_step(state1, batch)

        mesh = make_mesh()
        assert mesh.shape["data"] == 8
        task8 = self._task(mesh=mesh)
        state8 = task8.init_state(jax.random.PRNGKey(1), batch)
        sharded = shard_batch(batch, mesh)
        _, m8 = task8.train_step(state8, sharded)
        assert float(m1["train_loss"]) == pytest.approx(float(m8["train_loss"]), rel=1e-5)

    def test_tp_parity_with_2d_mesh(self):
        """(data=4, model=2) mesh with Megatron column/row-parallel params
        reproduces the single-device loss — GSPMD inserts the collectives."""
        batch = make_batch(jax.random.PRNGKey(0))
        task1 = self._task(mesh=None)
        state1 = task1.init_state(jax.random.PRNGKey(1), batch)
        _, m1 = task1.train_step(state1, batch)

        mesh = make_mesh(n_data=4, n_model=2)
        task_tp = self._task(mesh=mesh)
        state_tp = task_tp.init_state(jax.random.PRNGKey(1), batch)
        # check at least one param actually got model-sharded
        import jax as _jax

        shardings = {
            "/".join(str(getattr(k, "key", k)) for k in path): leaf.sharding.spec
            for path, leaf in _jax.tree_util.tree_leaves_with_path(state_tp.params)
        }
        assert any("model" in str(s) for s in shardings.values()), shardings
        sharded = shard_batch(batch, mesh)
        _, m_tp = task_tp.train_step(state_tp, sharded)
        assert float(m1["train_loss"]) == pytest.approx(float(m_tp["train_loss"]), rel=1e-4)

    def test_fsdp_parity_and_layout(self):
        """ZeRO-3 layout (params + Adam moments sharded over "data", GSPMD
        all-gather/reduce-scatter) reproduces the replicated-DP loss. The
        model is sized so several leaves pass the FSDP size threshold."""
        vae = build_transformer_vae(
            n_genes=N_GENES, n_embed=64, n_embed_latent=16, n_layer=1,
            n_inducing_points=4, n_head=4, n_head_cross=4,
        )
        batch = make_batch(jax.random.PRNGKey(0))
        base = VAETask(vae, num_training_steps=100, mesh=None)
        s1 = base.init_state(jax.random.PRNGKey(1), batch)
        for _ in range(2):
            s1, m1 = base.train_step(s1, batch)

        mesh = make_mesh()
        task_f = VAETask(vae, num_training_steps=100, mesh=mesh, fsdp=True)
        s8 = task_f.init_state(jax.random.PRNGKey(1), batch)

        def specs(tree):
            return {
                "/".join(str(getattr(k, "key", k)) for k in path): str(
                    getattr(leaf.sharding, "spec", leaf.sharding)
                )
                for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
                if hasattr(leaf, "sharding")
            }

        p_specs = specs(s8.params)
        assert any("data" in str(s) for s in p_specs.values()), p_specs
        # optimizer moments inherit the param layout (the ZeRO memory win)
        o_specs = specs(s8.opt_state)
        assert any("data" in str(s) for s in o_specs.values()), o_specs

        sharded = shard_batch(batch, mesh)
        for _ in range(2):
            s8, m8 = task_f.train_step(s8, sharded)
        assert float(m1["train_loss"]) == pytest.approx(float(m8["train_loss"]), rel=1e-4)

    def test_gene_sp_parity_and_layout(self):
        """Gene/sequence parallelism (VAETask(gene_sp=True)): the decoder's
        gene axis shards over "model" — dividing the census-gating cross-block
        activations per chip — while params replicate over that axis, and two
        training steps reproduce the single-device losses. No reference
        analog (DDP only, SURVEY.md §2.6)."""
        batch = make_batch(jax.random.PRNGKey(0))
        task1 = self._task(mesh=None)
        state1 = task1.init_state(jax.random.PRNGKey(1), batch)
        for _ in range(2):
            state1, m1 = task1.train_step(state1, batch)

        mesh = make_mesh(n_data=4, n_model=2)
        task_sp = VAETask(
            task1.vae, num_training_steps=100, learning_rate=1e-3,
            mesh=mesh, gene_sp=True,
        )
        assert task_sp.gene_sp
        state_sp = task_sp.init_state(jax.random.PRNGKey(1), batch)
        # params REPLICATE over "model": the axis carries the decode
        # activations' gene dim, not Megatron columns
        specs = [
            str(getattr(leaf.sharding, "spec", ""))
            for leaf in jax.tree_util.tree_leaves(state_sp.params)
        ]
        assert not any("model" in s for s in specs), specs
        sharded = shard_batch(batch, mesh)
        for _ in range(2):
            state_sp, m_sp = task_sp.train_step(state_sp, sharded)
        assert float(m1["train_loss"]) == pytest.approx(
            float(m_sp["train_loss"]), rel=1e-4
        )

        # the decode output really is gene-sharded over "model"
        fwd = jax.jit(lambda p, b: task_sp._apply(p, b, False)[0])
        out = fwd(state_sp.params, sharded)
        spec = tuple(out["mu"].sharding.spec)
        assert "model" in jax.tree_util.tree_leaves(spec), spec

        mets = task_sp.eval_step(state_sp, sharded, jax.random.PRNGKey(2))
        assert np.isfinite(float(mets["val_loss"]))

    def test_gene_sp_composes_with_fsdp(self):
        """gene_sp (activations over "model") + FSDP (params over "data")
        occupy different mesh axes and run together."""
        vae = build_transformer_vae(
            n_genes=N_GENES, n_embed=64, n_embed_latent=16, n_layer=1,
            n_inducing_points=4, n_head=4, n_head_cross=4,
        )
        batch = make_batch(jax.random.PRNGKey(0))
        mesh = make_mesh(n_data=4, n_model=2)
        task = VAETask(
            vae, num_training_steps=100, mesh=mesh, fsdp=True, gene_sp=True
        )
        state = task.init_state(jax.random.PRNGKey(1), batch)
        specs = [
            str(getattr(leaf.sharding, "spec", ""))
            for leaf in jax.tree_util.tree_leaves(state.params)
        ]
        assert any("data" in s for s in specs), specs
        assert not any("model" in s for s in specs), specs
        state, m = task.train_step(state, shard_batch(batch, mesh))
        assert np.isfinite(float(m["train_loss"]))

    def test_gene_sp_requires_shared_embedding(self):
        """gene_sp on an unshared-query decoder must refuse loudly — silently
        falling back to Megatron TP would give the opposite parameter layout
        the flag opted out of."""
        vae = build_transformer_vae(
            n_genes=N_GENES, n_embed=16, n_embed_latent=8, n_layer=1,
            n_inducing_points=4, n_head=2, n_head_cross=2,
            shared_embedding=False,
        )
        mesh = make_mesh(n_data=4, n_model=2)
        with pytest.raises(ValueError, match="shared-embedding"):
            VAETask(vae, num_training_steps=100, mesh=mesh, gene_sp=True)

    def test_fsdp_composes_with_tp(self):
        """FSDP over "data" composes with Megatron TP over "model" on a
        (4, 2) mesh — each parameter carries at most one of each axis."""
        vae = build_transformer_vae(
            n_genes=N_GENES, n_embed=64, n_embed_latent=16, n_layer=1,
            n_inducing_points=4, n_head=4, n_head_cross=4,
        )
        batch = make_batch(jax.random.PRNGKey(0))
        base = VAETask(vae, num_training_steps=100, mesh=None)
        s1 = base.init_state(jax.random.PRNGKey(1), batch)
        _, m1 = base.train_step(s1, batch)

        mesh = make_mesh(n_data=4, n_model=2)
        task_f = VAETask(vae, num_training_steps=100, mesh=mesh, fsdp=True)
        s8 = task_f.init_state(jax.random.PRNGKey(1), batch)
        specs = [
            str(getattr(leaf.sharding, "spec", ""))
            for leaf in jax.tree_util.tree_leaves(s8.params)
            if hasattr(leaf, "sharding")
        ]
        assert any("data" in s for s in specs)
        assert any("model" in s for s in specs)
        assert any("data" in s and "model" in s for s in specs), specs
        _, m8 = task_f.train_step(s8, shard_batch(batch, mesh))
        assert float(m1["train_loss"]) == pytest.approx(float(m8["train_loss"]), rel=1e-4)


# ---------------------------------------------------------------------------
# LDM task end-to-end
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ldm_setup():
    vae = build_transformer_vae(
        n_genes=N_GENES, n_embed=16, n_embed_latent=8, n_layer=1,
        n_inducing_points=4, n_head=2, n_head_cross=2,
    )
    batch = make_batch(jax.random.PRNGKey(0))
    vae_params = vae.init(
        jax.random.PRNGKey(0),
        counts=batch["counts"], genes=batch["genes"],
        library_size=batch["library_size"],
        counts_subset=batch["counts_subset"], genes_subset=batch["genes_subset"],
    )
    dit = DiT(
        n_embed=32, n_embed_input=8, n_layer=2, n_head=4, seq_len=4,
        class_vocab_sizes={"clusters": 3}, cfg_dropout_prob=0.8,
    )
    task = LDMTask(
        vae, vae_params, dit, create_transport(),
        num_training_steps=100, ema_update_after_step=0, ema_update_every=1,
    )
    # each test makes a fresh state: train_step donates its input state
    return task, lambda: task.init_state(jax.random.PRNGKey(3), batch), batch


class TestLDMTask:
    def test_fsdp_ldm_parity(self, ldm_setup):
        """LDM task with ZeRO-3 sharding reproduces the replicated loss
        (DiT params are large enough to shard at E=32 adaLN widths)."""
        task, init, batch = ldm_setup
        state = init()
        state, m1 = task.train_step(state, batch)

        mesh = make_mesh()
        vae = task.vae
        task_f = LDMTask(
            vae, task.vae_params, task.dit, create_transport(),
            num_training_steps=100, ema_update_after_step=0, ema_update_every=1,
            mesh=mesh, fsdp=True,
        )
        s8 = task_f.init_state(jax.random.PRNGKey(3), batch)
        s8, m8 = task_f.train_step(s8, shard_batch(batch, mesh))
        assert float(m1["train_loss"]) == pytest.approx(float(m8["train_loss"]), rel=1e-3)

    def test_train_loss_decreases(self, ldm_setup):
        task, init, batch = ldm_setup
        state = init()
        state, m0 = task.train_step(state, batch)
        for _ in range(40):
            state, m = task.train_step(state, batch)
        assert float(m["train_loss"]) < float(m0["train_loss"])

    def test_eval_raw_and_ema(self, ldm_setup):
        task, init, batch = ldm_setup
        state = init()
        state, _ = task.train_step(state, batch)
        m_raw = task.eval_step(state, batch, jax.random.PRNGKey(5))
        m_ema = task.eval_step(state, batch, jax.random.PRNGKey(5), ema=True)
        assert "val_loss" in m_raw and "val_ema_loss" in m_ema

    def test_sample_fn_shapes_and_cfg_halves(self, ldm_setup):
        task, init, batch = ldm_setup
        state = init()
        state, _ = task.train_step(state, batch)
        sfs = SizeFactorSampler.__new__(SizeFactorSampler)
        sfs.strategy = "mutually_exclusive"
        sfs.tables = {}
        sfs.joint_table = None
        sfs.joint_components = None
        fn = task.make_sample_fn(
            sfs, guidance_weight={"clusters": 1.0},
            sampling_method="euler", num_steps=5,
        )
        counts, z = fn(state, jax.random.PRNGKey(7), batch["genes"], {"clusters": batch["clusters"]})
        assert counts.shape == (2 * B, N_GENES)
        assert z.shape == (2 * B, 4, 8)
        assert (np.asarray(counts) >= 0).all()

    def test_sample_fn_gene_axis_sharded_parity(self, ldm_setup):
        """Mesh generation with a model axis >1: the decode is
        sequence-parallel over the GENE axis (with_sharding_constraint on the
        NB head outputs; GSPMD shards the (2B, G, E) cross activations by
        n_model per chip) and reproduces the unsharded program's samples.
        No reference analog — inference there is single-device
        (experiments/scripts/inference.py:69)."""
        task, init, batch = ldm_setup
        state = init()
        state, _ = task.train_step(state, batch)
        sfs = SizeFactorSampler.__new__(SizeFactorSampler)
        sfs.strategy = "mutually_exclusive"
        sfs.tables = {}
        sfs.joint_table = None
        sfs.joint_components = None
        kwargs = dict(
            guidance_weight={"clusters": 1.0}, sampling_method="euler",
            num_steps=3,
        )
        fn = task.make_sample_fn(sfs, **kwargs)
        cond = {"clusters": batch["clusters"]}
        counts1, z1 = fn(state, jax.random.PRNGKey(7), batch["genes"], cond)

        # same trained state through a mesh-carrying task: only the sharding
        # constraints differ, so values must match
        mesh = make_mesh(n_data=2, n_model=2)
        task_tp = LDMTask(
            task.vae, task.vae_params, task.dit, create_transport(),
            num_training_steps=100, ema_update_after_step=0,
            ema_update_every=1, mesh=mesh, gene_sp=True,
        )
        fn_tp = task_tp.make_sample_fn(sfs, **kwargs)
        counts2, z2 = fn_tp(state, jax.random.PRNGKey(7), batch["genes"], cond)

        # the gene axis really is sharded over "model"
        spec = counts2.sharding.spec
        assert "model" in jax.tree_util.tree_leaves(tuple(spec)), spec
        np.testing.assert_allclose(
            np.asarray(z1), np.asarray(z2), rtol=1e-5, atol=1e-5
        )
        # counts are discrete NB draws from (near-)identical mu/theta: allow
        # a vanishing fraction of threshold flips from fp re-association
        mismatch = (np.asarray(counts1) != np.asarray(counts2)).mean()
        assert mismatch < 1e-3, f"{mismatch:.4f} of counts differ"

    def test_gene_sp_replicates_params_megatron_shards_them(self, ldm_setup):
        """gene_sp=True must REPLICATE params over "model" (the axis carries
        decode activation gene shards); without it the axis carries Megatron
        columns — the two layouts must never mix on one task."""
        task, init, batch = ldm_setup
        mesh = make_mesh(n_data=2, n_model=2)

        def model_specs(t):
            s = t.init_state(jax.random.PRNGKey(3), batch)
            return [
                str(getattr(leaf.sharding, "spec", ""))
                for leaf in jax.tree_util.tree_leaves(s.params)
            ]

        sp = LDMTask(
            task.vae, task.vae_params, task.dit, create_transport(),
            num_training_steps=100, mesh=mesh, gene_sp=True,
        )
        assert not any("model" in s for s in model_specs(sp))
        # the frozen VAE tree replicates too (it runs the gene-sharded decode)
        vae_specs = [
            str(getattr(leaf.sharding, "spec", ""))
            for leaf in jax.tree_util.tree_leaves(sp.vae_params)
            if hasattr(leaf, "sharding")
        ]
        assert not any("model" in s for s in vae_specs)

        tp = LDMTask(
            task.vae, task.vae_params, task.dit, create_transport(),
            num_training_steps=100, mesh=mesh,
        )
        assert any("model" in s for s in model_specs(tp))

    def test_gene_sp_excludes_pipeline(self, ldm_setup):
        """gene_sp and the GPipe pipeline both claim the "model" axis."""
        task, init, batch = ldm_setup
        mesh = make_mesh(n_data=2, n_model=2)
        with pytest.raises(ValueError, match="model"):
            LDMTask(
                task.vae, task.vae_params, task.dit, create_transport(),
                num_training_steps=100, mesh=mesh, gene_sp=True,
                pipeline_microbatches=2,
            )


# ---------------------------------------------------------------------------
# checkpoint roundtrip
# ---------------------------------------------------------------------------
def test_checkpoint_roundtrip(tmp_path):
    vae = build_transformer_vae(
        n_genes=N_GENES, n_embed=16, n_embed_latent=8, n_layer=1,
        n_inducing_points=4, n_head=2, n_head_cross=2,
    )
    task = VAETask(vae, num_training_steps=10)
    batch = make_batch(jax.random.PRNGKey(0))
    state = task.init_state(jax.random.PRNGKey(1), batch)
    state, _ = task.train_step(state, batch)

    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save(int(state.step), state)
    mgr.save_config({"n_genes": N_GENES})

    template = task.init_state(jax.random.PRNGKey(1), batch)
    restored, step = mgr.maybe_restore(template)
    assert step == 1
    restored_leaf = jax.tree_util.tree_leaves(restored.params)[0]
    orig_leaf = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_allclose(np.asarray(restored_leaf), np.asarray(orig_leaf))
    assert mgr.load_config()["n_genes"] == N_GENES

    # training continues identically from the restored state
    _, m_a = task.train_step(state, batch)
    _, m_b = task.train_step(restored, batch)
    assert float(m_a["train_loss"]) == pytest.approx(float(m_b["train_loss"]), rel=1e-6)
    mgr.close()


def test_checkpoint_async_save_roundtrip(tmp_path):
    """async_save=True overlaps the write with training; readers
    (latest_step/restore/best_step) must drain in-flight saves so a
    save-then-restore in the same process stays correct."""
    vae = build_transformer_vae(
        n_genes=N_GENES, n_embed=16, n_embed_latent=8, n_layer=1,
        n_inducing_points=4, n_head=2, n_head_cross=2,
    )
    task = VAETask(vae, num_training_steps=10)
    batch = make_batch(jax.random.PRNGKey(0))
    state = task.init_state(jax.random.PRNGKey(1), batch)
    state, _ = task.train_step(state, batch)

    mgr = CheckpointManager(tmp_path / "ckpt", monitor="val_loss", async_save=True)
    mgr.save(int(state.step), state, metrics={"val_loss": 1.0})
    # no explicit wait: latest_step/restore must see the in-flight save
    template = task.init_state(jax.random.PRNGKey(1), batch)
    restored, step = mgr.maybe_restore(template)
    assert step == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )
    assert mgr.best_step() == 1
    mgr.close()


def test_checkpoint_best_k_retention(tmp_path):
    """Best-k-by-val_loss retention (reference ModelCheckpoint monitor=val_loss
    save_top_k, training/default.yaml:42-52): best/ keeps the k best monitored
    saves while the main dir keeps the latest for resume."""
    vae = build_transformer_vae(
        n_genes=N_GENES, n_embed=16, n_embed_latent=8, n_layer=1,
        n_inducing_points=4, n_head=2, n_head_cross=2,
    )
    task = VAETask(vae, num_training_steps=10)
    batch = make_batch(jax.random.PRNGKey(0))
    state = task.init_state(jax.random.PRNGKey(1), batch)

    mgr = CheckpointManager(tmp_path / "ckpt", monitor="val_loss", save_top_k=2)
    # losses dip at step 2 then worsen — best must stay pinned at step 2
    for step, loss in [(1, 5.0), (2, 1.0), (3, 3.0), (4, 4.0)]:
        state = state.replace(step=step)
        mgr.save(step, state, metrics={"val_loss": loss})
    assert mgr.best_step() == 2
    assert mgr.latest_step() == 4  # resume still sees the true latest

    restored_best = mgr.restore_best(task.init_state(jax.random.PRNGKey(1), batch))
    assert int(restored_best.step) == 2
    # top-2 retention: steps {2, 3} kept under best/, worse ones dropped
    kept = sorted(int(p.name) for p in (tmp_path / "ckpt" / "best").iterdir() if p.name.isdigit())
    assert kept == [2, 3]
    mgr.close()


def test_lean_batch_densify_parity():
    """Training on device-densified lean batches (no dense counts transferred)
    equals training on full batches."""
    import jax.numpy as jnp

    from scldm_tpu.nn.vae import build_transformer_vae
    from scldm_tpu.training.vae_task import VAETask

    vae = build_transformer_vae(
        n_genes=N_GENES, n_embed=16, n_embed_latent=8, n_layer=1,
        n_inducing_points=4, n_head=2, n_head_cross=2,
    )
    # a full "expressed" batch where subsets losslessly capture the nonzeros
    key = jax.random.PRNGKey(0)
    counts = jax.random.poisson(key, 0.8, (8, N_GENES)).astype(jnp.float32)
    import numpy as _np

    c = _np.asarray(counts)
    gsub = _np.zeros((8, N_GENES), _np.int64)
    csub = _np.zeros((8, N_GENES), _np.float32)
    for i in range(8):
        nz = _np.nonzero(c[i])[0]
        gsub[i, : len(nz)] = nz + 1
        csub[i, : len(nz)] = c[i, nz]
    full = {
        "counts": c,
        "genes": _np.tile(_np.arange(1, N_GENES + 1)[None], (8, 1)),
        "library_size": c.sum(1, keepdims=True),
        "counts_subset": csub,
        "genes_subset": gsub,
    }
    lean = {k: v for k, v in full.items() if k not in ("counts", "genes")}

    task = VAETask(vae, num_training_steps=10)
    s1 = task.init_state(jax.random.PRNGKey(1), full)
    s2 = task.init_state(jax.random.PRNGKey(1), full)
    _, m_full = task.train_step(s1, dict(full))
    _, m_lean = task.train_step(s2, dict(lean))
    assert float(m_full["train_loss"]) == pytest.approx(float(m_lean["train_loss"]), rel=1e-6)


def test_ldm_train_vae_finetuning():
    """vae_as_tokenizer.train=true: gradients flow into the VAE params
    (reference models.py:431-435 joint finetuning)."""
    vae = build_transformer_vae(
        n_genes=N_GENES, n_embed=16, n_embed_latent=8, n_layer=1,
        n_inducing_points=4, n_head=2, n_head_cross=2,
    )
    batch = make_batch(jax.random.PRNGKey(0))
    vae_params = vae.init(
        jax.random.PRNGKey(0), batch["counts"], batch["genes"],
        batch["library_size"], batch["counts_subset"], batch["genes_subset"],
    )
    dit = DiT(n_embed=32, n_embed_input=8, n_layer=1, n_head=2, seq_len=4,
              class_vocab_sizes={"clusters": 3}, cfg_dropout_prob=0.8)
    task = LDMTask(vae, vae_params, dit, create_transport(),
                   num_training_steps=50, train_vae=True,
                   ema_update_after_step=0, ema_update_every=1)
    state = task.init_state(jax.random.PRNGKey(1), batch)
    assert "vae" in state.params and "dit" in state.params
    # the LDM loss only reaches the VAE through encode: encoder params move,
    # decoder/head params stay untouched
    enc_before = np.asarray(
        jax.tree_util.tree_leaves(state.params["vae"]["params"]["encoder"])[0]
    ).copy()
    dec_before = np.asarray(
        jax.tree_util.tree_leaves(state.params["vae"]["params"]["decoder"])[0]
    ).copy()
    for _ in range(3):
        state, m = task.train_step(state, batch)
    enc_after = np.asarray(
        jax.tree_util.tree_leaves(state.params["vae"]["params"]["encoder"])[0]
    )
    dec_after = np.asarray(
        jax.tree_util.tree_leaves(state.params["vae"]["params"]["decoder"])[0]
    )
    assert not np.allclose(enc_before, enc_after), "VAE encoder params did not move"
    np.testing.assert_array_equal(dec_before, dec_after)
    assert np.isfinite(float(m["train_loss"]))
    # eval + sampling use the finetuned trees
    mets = task.eval_step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(mets["val_loss"]))
    sfs = SizeFactorSampler.__new__(SizeFactorSampler)
    sfs.strategy = "mutually_exclusive"; sfs.tables = {}
    sfs.joint_table = None; sfs.joint_components = None
    fn = task.make_sample_fn(sfs, guidance_weight={"clusters": 1.0},
                             sampling_method="euler", num_steps=3)
    counts, z = fn(state, jax.random.PRNGKey(3), batch["genes"],
                   {"clusters": batch["clusters"]})
    assert counts.shape == (2 * B, N_GENES)
