"""algebraic_nb_apply: XLA-reassociated decoder cross block + NB head.

The reassociation (wv = wmlp @ wmu; the (B, G, E) MLP output and head input
are never formed) must be numerically equivalent to the flax module path —
same floats reassociated, so f32 models agree to tight tolerance in outputs
AND gradients. Mirrors the fused-decoder kernel's test strategy
(tests/test_fused_decoder.py) for the pure-XLA variant that covers census
widths (E > 128, where the Pallas tail is ineligible).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scldm_tpu.nn.vae import build_transformer_vae
from scldm_tpu.training.vae_task import (
    VAETask,
    _algebraic_path_ok,
    algebraic_nb_apply,
    vae_loss,
)

G, S, B, E = 50, 24, 4, 48  # E > n_head_cross * 8 keeps heads non-trivial


def _lean_batch(rng, batch=B, n_genes=G, seq_len=S):
    genes_sub = np.zeros((batch, seq_len), np.int32)
    counts_sub = np.zeros((batch, seq_len), np.float32)
    for i in range(batch):
        nnz = int(rng.integers(seq_len // 2, seq_len))
        idx = np.sort(rng.choice(n_genes, size=nnz, replace=False))
        genes_sub[i, :nnz] = idx + 1
        counts_sub[i, :nnz] = rng.poisson(3.0, size=nnz) + 1
    return {
        "genes_subset": jnp.asarray(genes_sub),
        "counts_subset": jnp.asarray(counts_sub),
        "library_size": jnp.asarray(counts_sub.sum(1, keepdims=True)),
    }


def _build(dtype=jnp.float32, **kw):
    kwargs = dict(
        n_genes=G, n_embed=E, n_embed_latent=16, n_layer=2,
        n_inducing_points=8, n_head=4, n_head_cross=4, multiple_of=8,
        dtype=dtype,
    )
    kwargs.update(kw)  # tests may override (e.g. n_embed for width gates)
    return build_transformer_vae(**kwargs)


@pytest.fixture(scope="module")
def setup():
    vae = _build()
    task = VAETask(vae, num_training_steps=100)
    batch = _lean_batch(np.random.default_rng(0))
    state = task.init_state(jax.random.PRNGKey(0), batch)
    return vae, task, batch, state


def test_path_eligibility(setup):
    vae, *_ = setup
    assert _algebraic_path_ok(vae)
    # dropout / biased / non-shared-theta variants are ineligible
    assert not _algebraic_path_ok(_build(dropout=0.1))
    assert not _algebraic_path_ok(_build(bias=True))
    assert not _algebraic_path_ok(_build(decoder_head="gaussian"))


def test_forward_matches_module(setup):
    vae, task, batch, state = setup
    mat = task._materialize(batch)
    out_mod, hz_mod = task._apply(state.params, mat, train=False)
    out_alg, hz_alg = algebraic_nb_apply(vae, state.params, mat, train=False)
    np.testing.assert_allclose(hz_alg, hz_mod, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out_alg["theta"], out_mod["theta"], rtol=1e-6)
    # mu goes through a softmax over G — reassociated matmuls agree to ~1e-4
    np.testing.assert_allclose(out_alg["mu"], out_mod["mu"], rtol=2e-3, atol=1e-5)


def test_gradients_match_module(setup):
    vae, task, batch, state = setup
    mat = task._materialize(batch)

    def loss_mod(p):
        out, _ = task._apply(p, mat, train=False)
        return vae_loss(mat["counts"], out, False)

    def loss_alg(p):
        out, _ = algebraic_nb_apply(vae, p, mat, train=False)
        return vae_loss(mat["counts"], out, False)

    l_mod, g_mod = jax.value_and_grad(loss_mod)(state.params)
    l_alg, g_alg = jax.value_and_grad(loss_alg)(state.params)
    np.testing.assert_allclose(l_alg, l_mod, rtol=1e-5)
    flat_mod = jax.tree_util.tree_leaves_with_path(g_mod)
    flat_alg = jax.tree_util.tree_leaves(g_alg)
    for (path, gm), ga in zip(flat_mod, flat_alg):
        np.testing.assert_allclose(
            ga, gm, rtol=5e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_gate_matches_plain_algebraic(setup):
    """fused_gate=True (ops/fused_swiglu.swiglu_vec: SwiGLU + head-vector
    contraction per row tile, recompute VJP) must reproduce the plain
    algebraic tail in outputs AND gradients — same reassociated floats,
    just never materializing the (B, G, 2Hd)/(B, G, Hd) tensors."""
    vae, task, batch, state = setup
    mat = task._materialize(batch)

    def loss(p, fused):
        out, _ = algebraic_nb_apply(
            vae, p, batch, train=False, fused_gate=fused, interpret=fused
        )
        return vae_loss(mat["counts"], out, False)

    l_plain, g_plain = jax.value_and_grad(lambda p: loss(p, False))(state.params)
    l_fused, g_fused = jax.value_and_grad(lambda p: loss(p, True))(state.params)
    np.testing.assert_allclose(l_fused, l_plain, rtol=1e-5)
    flat_plain = jax.tree_util.tree_leaves_with_path(g_plain)
    flat_fused = jax.tree_util.tree_leaves(g_fused)
    for (path, gp), gf in zip(flat_plain, flat_fused):
        np.testing.assert_allclose(
            gf, gp, rtol=5e-3, atol=1e-4, err_msg=jax.tree_util.keystr(path)
        )


def test_vw_fold_matches_plain_algebraic(setup):
    """vw_fold=True (fold the attention output projection into v:
    y @ wo == sum_h probs_h @ (v_h @ wo_h)) must reproduce the plain
    algebraic tail in outputs AND gradients — the same floats with the
    contraction order reassociated (VERDICT r4 item 8)."""
    vae, task, batch, state = setup
    mat = task._materialize(batch)

    def loss(p, fold):
        out, _ = algebraic_nb_apply(vae, p, batch, train=False, vw_fold=fold)
        return vae_loss(mat["counts"], out, False)

    l_plain, g_plain = jax.value_and_grad(lambda p: loss(p, False))(state.params)
    l_fold, g_fold = jax.value_and_grad(lambda p: loss(p, True))(state.params)
    np.testing.assert_allclose(l_fold, l_plain, rtol=1e-5)
    flat_plain = jax.tree_util.tree_leaves_with_path(g_plain)
    flat_fold = jax.tree_util.tree_leaves(g_fold)
    for (path, gp), gf in zip(flat_plain, flat_fold):
        np.testing.assert_allclose(
            gf, gp, rtol=5e-3, atol=1e-4, err_msg=jax.tree_util.keystr(path)
        )


def test_vw_fold_task_dispatch_and_gene_sp():
    """VAETask(algebraic_vw_fold=True) trains to the same loss as the plain
    algebraic task, and the fold composes with gene-SP (it is pure einsums
    sharded on the gene/query axis; the folded vw values replicate)."""
    from scldm_tpu.parallel.mesh import make_mesh, shard_batch

    vae = _build()
    batch = _lean_batch(np.random.default_rng(5), batch=8)
    t_plain = VAETask(
        vae, num_training_steps=100, algebraic_tail=True, algebraic_vw_fold=False
    )
    t_fold = VAETask(
        vae, num_training_steps=100, algebraic_tail=True, algebraic_vw_fold=True
    )
    assert t_fold.algebraic_vw_fold and not t_plain.algebraic_vw_fold
    # default (None): the fold rides the algebraic tail (round-5 TPU A/B:
    # census B=32 194.7 -> 182.2 ms/step, the new record)
    assert VAETask(
        vae, num_training_steps=10, algebraic_tail=True
    ).algebraic_vw_fold
    # the flag is subordinate to the tail itself
    assert not VAETask(
        vae, num_training_steps=10, algebraic_tail=False, algebraic_vw_fold=True
    ).algebraic_vw_fold
    s_p = t_plain.init_state(jax.random.PRNGKey(0), batch)
    s_f = t_fold.init_state(jax.random.PRNGKey(0), batch)
    s_p, m_p = t_plain.train_step(s_p, batch)
    s_f, m_f = t_fold.train_step(s_f, batch)
    np.testing.assert_allclose(
        float(m_f["train_loss"]), float(m_p["train_loss"]), rtol=1e-5
    )
    e_p = t_plain.eval_step(s_p, batch, jax.random.PRNGKey(7))
    e_f = t_fold.eval_step(s_f, batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(
        float(e_f["val_loss"]), float(e_p["val_loss"]), rtol=1e-4
    )

    if len(jax.devices()) >= 4:
        mesh = make_mesh(n_data=2, n_model=2)
        t_sp = VAETask(
            vae, num_training_steps=100, algebraic_tail=True,
            algebraic_vw_fold=True, mesh=mesh, gene_sp=True,
        )
        assert t_sp.algebraic_vw_fold and t_sp.gene_sp
        s_sp = t_sp.init_state(jax.random.PRNGKey(0), batch)
        s_sp, m_sp = t_sp.train_step(s_sp, shard_batch(batch, mesh))
        np.testing.assert_allclose(
            float(m_sp["train_loss"]), float(m_p["train_loss"]), rtol=1e-4
        )


def test_lean_loss_matches_dense(setup):
    """vae_loss_lean (densify-free NB loss over the wire-format subsets) must
    reproduce the dense vae_loss in value AND gradients — the same NLL terms
    with the gene sum split at the zero counts."""
    from scldm_tpu.training.vae_task import vae_loss_lean

    vae, task, batch, state = setup
    mat = task._materialize(batch)

    def loss_dense(p):
        out, _ = algebraic_nb_apply(vae, p, batch, train=False)
        return vae_loss(mat["counts"], out, False)

    def loss_lean(p):
        out, _ = algebraic_nb_apply(vae, p, batch, train=False)
        return vae_loss_lean(mat["genes_subset"], mat["counts_subset"], out)

    l_d, g_d = jax.value_and_grad(loss_dense)(state.params)
    l_l, g_l = jax.value_and_grad(loss_lean)(state.params)
    np.testing.assert_allclose(l_l, l_d, rtol=1e-6)
    flat_d = jax.tree_util.tree_leaves_with_path(g_d)
    flat_l = jax.tree_util.tree_leaves(g_l)
    for (path, gd), gl in zip(flat_d, flat_l):
        np.testing.assert_allclose(
            gl, gd, rtol=1e-4, atol=1e-6, err_msg=jax.tree_util.keystr(path)
        )

    # task-level dispatch: same train loss as the dense-loss task
    t_lean = VAETask(
        vae, num_training_steps=100, algebraic_tail=True, lean_loss=True
    )
    t_dense = VAETask(vae, num_training_steps=100, algebraic_tail=True)
    assert t_lean._use_lean_loss(batch, True)
    assert not t_lean._use_lean_loss(mat, True)  # dense batches keep vae_loss
    s_l = t_lean.init_state(jax.random.PRNGKey(0), batch)
    s_d = t_dense.init_state(jax.random.PRNGKey(0), batch)
    _, m_l = t_lean.train_step(s_l, batch)
    _, m_d = t_dense.train_step(s_d, batch)
    np.testing.assert_allclose(
        float(m_l["train_loss"]), float(m_d["train_loss"]), rtol=1e-5
    )


def test_auto_default_follows_width():
    """algebraic_tail=None (the default) auto-enables only at wide embeds
    (n_embed > 128), where the round-4 TPU measurement showed +13% and the
    fused Pallas tail is width-ineligible; explicit False always wins."""
    wide = _build(n_embed=256)
    narrow = _build(n_embed=48)
    assert VAETask(wide, num_training_steps=10).algebraic_tail
    assert not VAETask(narrow, num_training_steps=10).algebraic_tail
    assert not VAETask(
        wide, num_training_steps=10, algebraic_tail=False
    ).algebraic_tail


def test_task_dispatch_and_parity(setup):
    vae, _, batch, _ = setup
    task_alg = VAETask(vae, num_training_steps=100, algebraic_tail=True)
    task_mod = VAETask(vae, num_training_steps=100, fused_decoder=False)
    assert task_alg.algebraic_tail
    assert task_alg._use_algebraic(batch)
    # a dense (non-lean) batch falls back to the module path
    dense = task_alg._materialize(batch)
    assert not task_alg._use_algebraic(dense)

    state_a = task_alg.init_state(jax.random.PRNGKey(0), batch)
    state_m = task_mod.init_state(jax.random.PRNGKey(0), batch)
    state_a, mets_a = task_alg.train_step(state_a, batch)
    state_m, mets_m = task_mod.train_step(state_m, batch)
    np.testing.assert_allclose(
        float(mets_a["train_loss"]), float(mets_m["train_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(mets_a["grad_norm"]), float(mets_m["grad_norm"]), rtol=1e-3
    )
    ev_a = task_alg.eval_step(state_a, batch, jax.random.PRNGKey(7))
    ev_m = task_mod.eval_step(state_m, batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(
        float(ev_a["val_loss"]), float(ev_m["val_loss"]), rtol=1e-4
    )

    # one more step so updated params flow through the reassociated backward
    # (train_step donates its input state — the old handles die here)
    _, mets_a2 = task_alg.train_step(state_a, batch)
    _, mets_m2 = task_mod.train_step(state_m, batch)
    np.testing.assert_allclose(
        float(mets_a2["train_loss"]), float(mets_m2["train_loss"]), rtol=1e-4
    )


def test_bf16_model_runs_finite():
    vae = _build(dtype=jnp.bfloat16)
    task = VAETask(vae, num_training_steps=100, algebraic_tail=True)
    batch = _lean_batch(np.random.default_rng(1))
    state = task.init_state(jax.random.PRNGKey(0), batch)
    state, mets = task.train_step(state, batch)
    assert np.isfinite(float(mets["train_loss"]))


def test_algebraic_decode_auto_resolves_like_vae_task():
    """LDMTask(algebraic_decode=None) mirrors VAETask(algebraic_tail=None):
    auto-on at wide embeds (n_embed > 128, the measured serving win), off at
    narrow ones where the fused Pallas paths own the dispatch (round-5 fix —
    the census CFG serving number previously ran the stale module decode)."""
    from scldm_tpu.nn.nnets import DiT
    from scldm_tpu.training.ldm_task import LDMTask
    from scldm_tpu.transport import create_transport

    dit = DiT(n_embed=32, n_embed_input=16, n_layer=2, n_head=4, seq_len=8)
    wide = _build(n_embed=256, n_head=8, n_head_cross=8, multiple_of=64)
    narrow = _build()
    kwargs = dict(num_training_steps=10)
    t_wide = LDMTask(wide, {}, dit, create_transport(), **kwargs)
    assert t_wide.algebraic_decode
    # the vw fold rides the decode by default (round-5 TPU A/B), and is
    # subordinate to it
    assert t_wide.algebraic_vw_fold
    t_narrow = LDMTask(narrow, {}, dit, create_transport(), **kwargs)
    assert not t_narrow.algebraic_decode
    assert not t_narrow.algebraic_vw_fold
    # explicit settings still override the auto in both directions
    assert not LDMTask(
        wide, {}, dit, create_transport(), algebraic_decode=False, **kwargs
    ).algebraic_decode
    assert LDMTask(
        narrow, {}, dit, create_transport(), algebraic_decode=True, **kwargs
    ).algebraic_decode
    # ineligible architectures never enable, auto or forced
    assert not LDMTask(
        _build(n_embed=256, bias=True), {}, dit, create_transport(),
        algebraic_decode=True, **kwargs
    ).algebraic_decode


def test_generation_algebraic_decode_parity():
    """LDMTask(algebraic_decode=True): the generation program's decode tail
    reassociated — identical latents, (near-)identical NB counts vs the
    module decode (discrete draws tolerate a vanishing flip fraction from
    fp reassociation, same bar as the gene-SP parity test)."""
    from scldm_tpu.nn.nnets import DiT
    from scldm_tpu.sampling.size_factors import SizeFactorSampler
    from scldm_tpu.training.ldm_task import LDMTask
    from scldm_tpu.transport import create_transport

    vae = _build()
    batch = _lean_batch(np.random.default_rng(2))
    genes = jnp.arange(1, G + 1)  # canonical 1-D decode row
    task_probe = VAETask(vae, num_training_steps=10)
    vae_params = task_probe.init_state(jax.random.PRNGKey(0), batch).params
    dit = DiT(
        n_embed=32, n_embed_input=16, n_layer=2, n_head=4, seq_len=8,
        class_vocab_sizes={"clusters": 3}, cfg_dropout_prob=0.8,
    )
    kwargs = dict(num_training_steps=50, ema_update_after_step=0, ema_update_every=1)
    task_mod = LDMTask(vae, vae_params, dit, create_transport(), **kwargs)
    task_alg = LDMTask(
        vae, vae_params, dit, create_transport(), algebraic_decode=True, **kwargs
    )
    assert task_alg.algebraic_decode

    state = task_mod.init_state(jax.random.PRNGKey(3), {"library_size": batch["library_size"], "clusters": jnp.zeros((B,), jnp.int32)})
    sfs = SizeFactorSampler.__new__(SizeFactorSampler)
    sfs.strategy = "mutually_exclusive"
    sfs.tables = {}
    sfs.joint_table = None
    sfs.joint_components = None
    fkw = dict(guidance_weight={"clusters": 1.0}, sampling_method="euler", num_steps=3)
    cond = {"clusters": jnp.zeros((B,), jnp.int32)}
    fn_mod = task_mod.make_sample_fn(sfs, **fkw)
    fn_alg = task_alg.make_sample_fn(sfs, **fkw)
    c1, z1 = fn_mod(state, jax.random.PRNGKey(7), genes, cond)
    c2, z2 = fn_alg(state, jax.random.PRNGKey(7), genes, cond)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-6)
    mismatch = (np.asarray(c1) != np.asarray(c2)).mean()
    assert mismatch < 1e-3, f"{mismatch:.4f} of counts differ"

    # non-canonical 1-D genes must NOT route through the reassociated tail
    sub = jnp.arange(1, G // 2 + 1)
    c3, _ = fn_alg(state, jax.random.PRNGKey(7), sub, cond, batch_size=B)
    assert c3.shape == (2 * B, G // 2)

    # gene-SP composition (round 4): the reassociated decode tail shards
    # over "model" via the query-table constraint and reproduces the values
    if len(jax.devices()) >= 4:
        from scldm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=2, n_model=2)
        task_sp = LDMTask(
            vae, vae_params, dit, create_transport(), algebraic_decode=True,
            mesh=mesh, gene_sp=True, **kwargs
        )
        assert task_sp.algebraic_decode and task_sp.gene_sp
        fn_sp = task_sp.make_sample_fn(sfs, **fkw)
        c4, z4 = fn_sp(state, jax.random.PRNGKey(7), genes, cond)
        spec = c4.sharding.spec
        assert "model" in jax.tree_util.tree_leaves(tuple(spec)), spec
        np.testing.assert_allclose(
            np.asarray(z2), np.asarray(z4), rtol=1e-5, atol=1e-5
        )
        mismatch = (np.asarray(c2) != np.asarray(c4)).mean()
        assert mismatch < 1e-3, f"{mismatch:.4f} of counts differ"


def test_generation_fused_gate_decode_parity():
    """LDMTask(algebraic_fused_gate=True): the serving-batch memory escape
    hatch (swiglu_vec decode tail — the (2B, G, 2Hd)/(2B, G, Hd) forward
    temporaries that OOM census gen-batch 64 never exist) must reproduce the
    plain algebraic decode."""
    from scldm_tpu.nn.nnets import DiT
    from scldm_tpu.sampling.size_factors import SizeFactorSampler
    from scldm_tpu.training.ldm_task import LDMTask
    from scldm_tpu.transport import create_transport

    vae = _build()
    batch = _lean_batch(np.random.default_rng(2))
    genes = jnp.arange(1, G + 1)
    vae_params = VAETask(vae, num_training_steps=10).init_state(
        jax.random.PRNGKey(0), batch
    ).params
    dit = DiT(
        n_embed=32, n_embed_input=16, n_layer=2, n_head=4, seq_len=8,
        class_vocab_sizes={"clusters": 3}, cfg_dropout_prob=0.8,
    )
    kwargs = dict(num_training_steps=50, ema_update_after_step=0,
                  ema_update_every=1, algebraic_decode=True)
    task_plain = LDMTask(vae, vae_params, dit, create_transport(), **kwargs)
    task_gate = LDMTask(
        vae, vae_params, dit, create_transport(), algebraic_fused_gate=True,
        **kwargs,
    )
    assert task_gate.algebraic_fused_gate
    task_gate._decode_interpret = True  # Pallas tail on CPU

    state = task_plain.init_state(
        jax.random.PRNGKey(3),
        {"library_size": batch["library_size"],
         "clusters": jnp.zeros((B,), jnp.int32)},
    )
    sfs = SizeFactorSampler.__new__(SizeFactorSampler)
    sfs.strategy = "mutually_exclusive"
    sfs.tables = {}
    sfs.joint_table = None
    sfs.joint_components = None
    fkw = dict(guidance_weight={"clusters": 1.0}, sampling_method="euler",
               num_steps=3)
    cond = {"clusters": jnp.zeros((B,), jnp.int32)}
    c1, z1 = task_plain.make_sample_fn(sfs, **fkw)(
        state, jax.random.PRNGKey(7), genes, cond
    )
    c2, z2 = task_gate.make_sample_fn(sfs, **fkw)(
        state, jax.random.PRNGKey(7), genes, cond
    )
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-6)
    mismatch = (np.asarray(c1) != np.asarray(c2)).mean()
    assert mismatch < 1e-3, f"{mismatch:.4f} of counts differ"


def test_mesh_dp_parity():
    """Unlike the Pallas tail (opaque to GSPMD, force-disabled under a real
    mesh), the algebraic path is plain XLA: the same task under an 8-device
    DP mesh reproduces the single-device loss."""
    from scldm_tpu.parallel.mesh import make_mesh, shard_batch

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    vae = _build()
    batch = _lean_batch(np.random.default_rng(3), batch=8)
    task1 = VAETask(vae, num_training_steps=100, algebraic_tail=True)
    s1 = task1.init_state(jax.random.PRNGKey(0), batch)
    s1, m1 = task1.train_step(s1, batch)

    mesh = make_mesh()
    task8 = VAETask(vae, num_training_steps=100, algebraic_tail=True, mesh=mesh)
    assert task8.algebraic_tail  # NOT disabled by the mesh (Pallas paths are)
    s8 = task8.init_state(jax.random.PRNGKey(0), batch)
    s8, m8 = task8.train_step(s8, shard_batch(batch, mesh))
    np.testing.assert_allclose(
        float(m8["train_loss"]), float(m1["train_loss"]), rtol=1e-4
    )


def test_gene_sp_composes_with_algebraic_tail():
    """gene-SP + algebraic tail (round 4): the reassociated cross+head is
    plain XLA, so one sharding constraint on the canonical query table
    gene-shards it over "model" — per-chip activations drop to G/n AND the
    down-matmul saving is kept. Train loss AND eval metrics must match the
    single-device algebraic task."""
    from scldm_tpu.parallel.mesh import make_mesh, shard_batch

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >=4 devices")
    vae = _build()
    batch = _lean_batch(np.random.default_rng(3), batch=8)

    task1 = VAETask(vae, num_training_steps=100, algebraic_tail=True)
    s1 = task1.init_state(jax.random.PRNGKey(0), batch)
    s1, m1 = task1.train_step(s1, batch)
    e1 = task1.eval_step(s1, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(n_data=len(devs) // 2, n_model=2)
    task = VAETask(
        vae, num_training_steps=100, algebraic_tail=True, mesh=mesh, gene_sp=True
    )
    assert task.gene_sp and task.algebraic_tail  # composition, not fallback
    s8 = task.init_state(jax.random.PRNGKey(0), batch)
    s8, m8 = task.train_step(s8, shard_batch(batch, mesh))
    e8 = task.eval_step(s8, shard_batch(batch, mesh), jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(m8["train_loss"]), float(m1["train_loss"]), rtol=1e-4
    )
    for key in ("val_loss", "val_theta", "val_mse"):
        np.testing.assert_allclose(
            float(e8[key]), float(e1[key]), rtol=1e-3, err_msg=key
        )


def test_fused_gate_rejects_gene_shard():
    """The swiglu_vec Pallas tail cannot GSPMD-partition, so _algebraic_tail
    must refuse the fused_gate + gene_shard combination loudly instead of
    compiling a broken (or silently all-gathering) mesh layout."""
    from scldm_tpu.training.vae_task import _algebraic_tail

    vae = _build()
    batch = _lean_batch(np.random.default_rng(0))
    task = VAETask(vae, num_training_steps=10, algebraic_tail=True)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    x = jnp.zeros((B, vae.encoder.n_inducing_points, vae.decoder.n_embed))
    with pytest.raises(ValueError, match="mutually exclusive"):
        _algebraic_tail(
            vae, state.params, x, batch["library_size"],
            fused_gate=True, gene_shard=lambda t, a: t,
        )
