"""Equivalence tests for the gather-free fused encoder pooling
(ops/fused_encoder.py) and its integration into the VAE train path.

The dense-gene formulation is only engaged when the padded gene axis is close
to the packed window (parse1m/replogle shapes, G = genes_seq_len = 2000 —
reference experiments/configs/datamodule/default.yaml:84-111); the
zero-row closed-form correction makes it exact for the log1p transform.
Interpret mode on CPU; real-TPU execution is exercised by the perf harness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scldm_tpu.nn.vae import build_transformer_vae
from scldm_tpu.training.vae_task import (
    VAETask,
    _dense_pool_worth_it,
    _fused_encoder_ok,
    fused_encoder_pooling,
    fused_nb_apply,
    vae_loss,
)

G, B, S = 60, 8, 50  # gate-passing: padded G (60) <= 1.3 * S (65)


def _lean_batch(seed=0, g=G, s=S, b=B):
    rng = np.random.default_rng(seed)
    gs = np.zeros((b, s), np.int32)
    cs = np.zeros((b, s), np.float32)
    for i in range(b):
        nnz = int(rng.integers(5, s))
        idx = np.sort(rng.choice(g, nnz, replace=False))
        gs[i, :nnz] = idx + 1
        cs[i, :nnz] = rng.poisson(3.0, nnz) + 1
    return {
        "genes_subset": jnp.asarray(gs),
        "counts_subset": jnp.asarray(cs),
        "library_size": jnp.asarray(cs.sum(1, keepdims=True)),
    }


@pytest.fixture(scope="module")
def setup():
    vae = build_transformer_vae(n_genes=G)
    lean = _lean_batch()
    task = VAETask(vae, num_training_steps=100)
    state = task.init_state(jax.random.PRNGKey(0), lean)
    return vae, task, state, task._materialize(lean)


def test_gate_shapes():
    # dentate shapes lose (dense does ~2.8x the token work); parse1m ties win
    assert not _dense_pool_worth_it(17_002, 6_147)
    assert _dense_pool_worth_it(2_000, 2_000)
    assert _dense_pool_worth_it(G, S)
    assert not _dense_pool_worth_it(G, 20)


def test_eligibility():
    assert _fused_encoder_ok(build_transformer_vae(n_genes=G))
    assert not _fused_encoder_ok(
        build_transformer_vae(n_genes=G, agg_func="scaled_log1p")
    )


def test_pooling_matches_module_ca_layer(setup):
    """Kernel + zero-row correction == input_layer + MCAB pooling over the
    packed window (the encoder front half, reference nnets.py:81-144)."""
    vae, task, state, batch = setup
    pooled_f = jax.jit(
        lambda p: fused_encoder_pooling(
            vae, p, batch["counts"], batch["genes_subset"].shape[1], interpret=True
        )
    )(state.params)

    def module_encode(p):
        emb = vae.apply(
            p, batch["counts_subset"], batch["genes_subset"],
            method=lambda m, c, g: m.input_layer(c, g),
        )
        return vae.apply(p, emb, method=lambda m, e: m.encoder(e, train=False))

    def fused_encode(p):
        # encoder trunk on the kernel's pooled tokens (skip_pool skips MCAB)
        return vae.apply(
            p, pooled_f, method=lambda m, e: m.encoder(e, train=False, skip_pool=True)
        )

    h_m = jax.jit(module_encode)(state.params)
    h_f = jax.jit(fused_encode)(state.params)
    mag = float(jnp.abs(h_m).max())
    assert float(jnp.abs(h_f - h_m).max()) < 0.01 * mag + 1e-3


def test_fused_apply_uses_encoder_kernel_and_matches(setup):
    vae, task, state, batch = setup
    out_m, z_m = jax.jit(lambda p: task._apply(p, batch, train=False))(state.params)
    out_f, z_f = jax.jit(
        lambda p: fused_nb_apply(vae, p, batch, train=False, interpret=True)
    )(state.params)
    zmag = float(jnp.abs(z_m).max())
    assert float(jnp.abs(z_f - z_m).max()) < 0.02 * zmag
    mag = float(jnp.abs(out_m["mu"]).max())
    assert float(jnp.abs(out_m["mu"] - out_f["mu"]).max()) < 0.02 * mag


def test_fused_apply_gradients_close(setup):
    vae, task, state, batch = setup

    def loss_m(p):
        out, _ = task._apply(p, batch, train=False)
        return vae_loss(batch["counts"], out, False)

    def loss_f(p):
        out, _ = fused_nb_apply(vae, p, batch, train=False, interpret=True)
        return vae_loss(batch["counts"], out, False)

    lm, gm = jax.jit(jax.value_and_grad(loss_m))(state.params)
    lf, gf = jax.jit(jax.value_and_grad(loss_f))(state.params)
    assert abs(float(lm) - float(lf)) < 0.01 * abs(float(lm))
    flat_m = jax.tree_util.tree_flatten_with_path(gm)[0]
    flat_f = jax.tree_util.tree_flatten(gf)[0]
    for (path, a), b in zip(flat_m, flat_f):
        name = "/".join(str(k.key) for k in path)
        if "decoder_head/params/bias" in name:
            continue  # softmax-invariant: true gradient is 0, both are noise
        scale = float(jnp.abs(a).max()) + 1e-4
        assert float(jnp.abs(b - a).max()) < 0.08 * scale, name


def test_window_pooling_matches_module_at_sparse_shapes():
    """At S << G (dense gate off) the window-input kernel is the engaged
    pooling path; its output must match the module encoder within bf16."""
    from scldm_tpu.training.vae_task import _fused_window_ok, fused_window_pooling

    g, s = 60, 20
    assert not _dense_pool_worth_it(g, s)
    vae = build_transformer_vae(n_genes=g)
    assert _fused_window_ok(vae)
    lean = _lean_batch(seed=5, g=g, s=s)
    task = VAETask(vae, num_training_steps=10)
    state = task.init_state(jax.random.PRNGKey(0), lean)

    emb = vae.apply(
        state.params, lean["counts_subset"], lean["genes_subset"],
        method=lambda m, c, gg: m.input_layer(c, gg),
    )
    h_m = jax.jit(
        lambda p: vae.apply(p, emb, method=lambda m, e: m.encoder(e, train=False))
    )(state.params)
    h_f = jax.jit(
        lambda p: vae.apply(
            p, fused_window_pooling(vae, p, emb, interpret=True),
            method=lambda m, e: m.encoder(e, train=False, skip_pool=True),
        )
    )(state.params)
    mag = float(jnp.abs(h_m).max())
    assert float(jnp.abs(h_f - h_m).max()) < 0.02 * mag


def test_window_pooling_census_width_tiles():
    """E >= 256 engages the narrower (512-token) tile path whose 1024-token
    tiles would blow scoped VMEM at census width; forward AND gradient must
    still match the module encoder (the custom-VJP backward shares the tile
    geometry with the forward)."""
    from scldm_tpu.training.vae_task import fused_window_pooling

    g, s, b = 700, 600, 4  # s > block_s(512) -> multi-tile at the wide path
    vae = build_transformer_vae(
        n_genes=g, n_embed=512, n_embed_latent=64, n_layer=1,
        n_inducing_points=64, n_head=8,
    )
    lean = _lean_batch(seed=7, g=g, s=s, b=b)
    task = VAETask(vae, num_training_steps=10)
    state = task.init_state(jax.random.PRNGKey(0), lean)

    emb = vae.apply(
        state.params, lean["counts_subset"], lean["genes_subset"],
        method=lambda m, c, gg: m.input_layer(c, gg),
    )
    # random projection: sum(h*w) has a real gradient. sum(h**2) would NOT —
    # h is non-affine-LN output, so its square-sum is ~constant and both
    # paths' gradients would be pure numerical noise.
    w = jax.random.normal(jax.random.PRNGKey(3), (b, 64, 64))

    def via_module(p, e):
        h = vae.apply(p, e, method=lambda m, x: m.encoder(x, train=False))
        return h, jnp.sum(h * w)

    def via_kernel(p, e):
        h = vae.apply(
            p, fused_window_pooling(vae, p, e, interpret=True),
            method=lambda m, x: m.encoder(x, train=False, skip_pool=True),
        )
        return h, jnp.sum(h * w)

    h_m, h_f = via_module(state.params, emb)[0], via_kernel(state.params, emb)[0]
    mag = float(jnp.abs(h_m).max())
    assert float(jnp.abs(h_f - h_m).max()) < 0.02 * mag

    g_m = jax.grad(lambda p, e: via_module(p, e)[1], argnums=1)(state.params, emb)
    g_f = jax.grad(lambda p, e: via_kernel(p, e)[1], argnums=1)(state.params, emb)
    gmag = float(jnp.abs(g_m).max()) + 1e-30
    assert float(jnp.abs(g_f - g_m).max()) < 0.03 * gmag

    # PARAM gradients at this exact shape pin the fwd/bwd pad-length contract:
    # s=600 rounds to 1024 under the forward's 512-token tiles but to 768
    # under the backward's 256-token tiles — a backward that pads to its own
    # roundup differentiates a function with 256 fewer zero-emb rows than the
    # forward computed, biasing every weight/query gradient (while demb, cut
    # back to [:B, :S], stays clean — which is why the emb check above could
    # not catch it).
    import flax

    gp_m = jax.grad(lambda p, e: via_module(p, e)[1])(state.params, emb)
    gp_f = jax.grad(lambda p, e: via_kernel(p, e)[1])(state.params, emb)
    flat_m = flax.traverse_util.flatten_dict(gp_m["params"])
    flat_f = flax.traverse_util.flatten_dict(gp_f["params"])
    for key in flat_m:
        a, b_ = np.asarray(flat_m[key]), np.asarray(flat_f[key])
        denom = np.abs(a).max() + 1e-30
        assert np.abs(b_ - a).max() < 0.03 * denom + 1e-6, "/".join(key)


def test_vae_task_fused_pool_step_matches_default():
    """`VAETask(fused_pool=True)` (the census --fused-pool path) must produce
    the same loss and finite matching grads as the module path on one train
    step — the _apply_fused_pool decomposition (input_layer -> window kernel
    -> skip_pool encoder -> decoder/head) is exactly the module forward."""
    g, s, b = 300, 280, 4  # s > block_s? no — single tile; multi-tile is
    # covered by test_window_pooling_census_width_tiles; this pins the task wiring
    vae = build_transformer_vae(
        n_genes=g, n_embed=256, n_embed_latent=32, n_layer=1,
        n_inducing_points=16, n_head=8,
    )
    lean = _lean_batch(seed=11, g=g, s=s, b=b)

    t_ref = VAETask(vae, num_training_steps=10)
    t_fp = VAETask(vae, num_training_steps=10, fused_pool=True)
    assert t_fp.fused_pool, "gate should accept bias-free dropout-free arch"
    t_fp._pool_interpret = True  # CPU backend

    s_ref = t_ref.init_state(jax.random.PRNGKey(0), lean)
    s_fp = t_fp.init_state(jax.random.PRNGKey(0), lean)

    s_ref1, m_ref = t_ref.train_step(s_ref, dict(lean))
    s_fp1, m_fp = t_fp.train_step(s_fp, dict(lean))
    l_ref, l_fp = float(m_ref["train_loss"]), float(m_fp["train_loss"])
    assert np.isfinite(l_fp)
    assert abs(l_fp - l_ref) < 5e-3 * abs(l_ref), (l_ref, l_fp)
    g_ref, g_fp = float(m_ref["grad_norm"]), float(m_fp["grad_norm"])
    assert abs(g_fp - g_ref) < 0.02 * abs(g_ref), (g_ref, g_fp)


def test_train_step_runs_with_fused_encoder():
    """End-to-end train_steps at gate-passing shapes (interpret-free CPU run
    uses the non-fused branch on non-TPU backends via fused_decoder gating;
    here we call fused_nb_apply directly under value_and_grad)."""
    vae = build_transformer_vae(n_genes=G)
    lean = _lean_batch(seed=3)
    task = VAETask(vae, num_training_steps=10)
    state = task.init_state(jax.random.PRNGKey(1), lean)
    batch = task._materialize(lean)

    def loss_fn(p):
        out, _ = fused_nb_apply(vae, p, batch, train=False, interpret=True)
        return vae_loss(batch["counts"], out, False)

    l0, g = jax.value_and_grad(loss_fn)(state.params)
    assert np.isfinite(float(l0))
    gnorm = float(jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.square(x))), g, 0.0
    ))
    assert np.isfinite(gnorm) and gnorm > 0


def test_ldm_fused_encode_matches_module():
    """LDMTask's frozen-VAE tokenization through the window-pooling kernel
    equals the module encode (the kernel is forward-only there — the LDM
    step's dominant segment at reference shapes)."""
    from scldm_tpu.nn.nnets import DiT
    from scldm_tpu.training.ldm_task import LDMTask
    from scldm_tpu.transport import create_transport

    g, s = 60, 20
    vae = build_transformer_vae(n_genes=g)
    lean = _lean_batch(seed=7, g=g, s=s)
    vt = VAETask(vae, num_training_steps=10)
    vs = vt.init_state(jax.random.PRNGKey(0), lean)
    dit = DiT(
        n_embed=32, n_embed_input=16, n_layer=1, n_head=4, seq_len=16,
        class_vocab_sizes={}, cfg_dropout_prob=0.0,
    )

    def make(fused):
        t = LDMTask(
            vae, vs.params, dit, create_transport(),
            num_training_steps=10, fused_encode=fused,
        )
        t.fused_encode_interpret = True
        return t

    z_mod = jax.jit(lambda b: make(False)._encode(b))(lean)
    z_fused = jax.jit(lambda b: make(True)._encode(b))(lean)
    mag = float(jnp.abs(z_mod).max())
    assert float(jnp.abs(z_fused - z_mod).max()) < 0.02 * mag
