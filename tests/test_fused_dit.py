"""Fused DiT-block Pallas kernel equivalence vs the flax Block."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scldm_tpu.nn.layers import Block
from scldm_tpu.ops.fused_dit import extract_block_params, fused_dit_block

R, T, E, H = 12, 16, 64, 4


@pytest.fixture(scope="module")
def block_setup():
    block = Block(
        n_embed=E, n_head=H, bias=True, multiple_of=4, layernorm_eps=1e-8,
        use_adaln=True, elementwise_affine=False,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (R, T, E))
    c = jax.random.normal(jax.random.PRNGKey(1), (R, 1, E))
    params = block.init(key, x, condition=c)
    # adaLN weights are zero-init; randomize so the test exercises real math
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    flat = {
        k: (jax.random.normal(jax.random.PRNGKey(i), v.shape) * 0.05 if "adaln" in k[0] else v)
        for i, (k, v) in enumerate(flat.items())
    }
    params = {"params": flax.traverse_util.unflatten_dict(flat)}
    return block, params, x, c


def test_fused_matches_flax_block(block_setup):
    block, params, x, c = block_setup
    want = block.apply(params, x, condition=c)
    kp = extract_block_params(params["params"])
    got = fused_dit_block(x, c[:, 0, :], kp, n_head=H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fused_row_padding(block_setup):
    """Row counts that don't divide block_rows pad + unpad correctly."""
    block, params, x, c = block_setup
    kp = extract_block_params(params["params"])
    got = fused_dit_block(x[:5], c[:5, 0, :], kp, n_head=H, block_rows=8, interpret=True)
    want = block.apply(params, x[:5], condition=c[:5])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fused_bf16(block_setup):
    block, params, x, c = block_setup
    kp = extract_block_params(params["params"])
    kp16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), kp)
    got = fused_dit_block(
        x.astype(jnp.bfloat16), c[:, 0, :].astype(jnp.bfloat16), kp16, n_head=H,
        interpret=True,
    )
    want = block.apply(params, x, condition=c)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=5e-2, atol=5e-2
    )


def test_fused_dit_forward_matches_module():
    """Full fused forward (param-tree path) == DiT.forward_with_cfg_batched."""
    from scldm_tpu.nn import DiT
    from scldm_tpu.nn.nnets import build_cfg_segments, combine_cfg_segments
    from scldm_tpu.ops.fused_dit import fused_dit_forward
    import flax

    vocab = {"clusters": 5}
    dit = DiT(n_embed=64, n_embed_input=16, n_layer=2, n_head=4, seq_len=16,
              class_vocab_sizes=vocab, cfg_dropout_prob=0.8, bias=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 16, 16))
    t = jax.random.uniform(jax.random.PRNGKey(1), (8,))
    cond = {"clusters": jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 5)}
    params = dit.init({"params": key, "condition": key}, x[:4], t[:4],
                      {"clusters": cond["clusters"][:4]}, train=True)
    # randomize the zero-init layers so the comparison is nontrivial
    flat = flax.traverse_util.flatten_dict(params["params"])
    flat = {k: (jax.random.normal(jax.random.PRNGKey(i), v.shape) * 0.05
                if ("adaln" in "/".join(k) or k[-2:] == ("linear", "kernel")) else v)
            for i, (k, v) in enumerate(flat.items())}
    params = {"params": flax.traverse_util.unflatten_dict(flat)}

    scales = {"clusters": 1.5}
    want = dit.apply(params, x, t, cond, scales, method="forward_with_cfg_batched")

    seg_x, seg_t, seg_cond, scale_segments, b, h = build_cfg_segments(
        x, t, cond, scales, vocab, "mutually_exclusive")
    out = fused_dit_forward(
        params, seg_x, seg_t, seg_cond,
        n_layer=2, n_head=4, n_embed=64, seq_len=16, eps=1e-8, interpret=True,
    )
    got = combine_cfg_segments(out, scale_segments, b, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4)


def test_trainable_fused_block_gradients(block_setup):
    """Pallas backward kernel gradients == jax.grad of the flax Block."""
    from scldm_tpu.ops.fused_dit import fused_dit_block_trainable

    block, params, x, c = block_setup
    kp = extract_block_params(params["params"])
    c2 = c[:, 0, :]

    w = jax.random.normal(jax.random.PRNGKey(9), (R, T, E))

    def loss_fused(x, c2, kp):
        out = fused_dit_block_trainable(x, c2, kp, H, 1e-8, 64, 8, True)
        return (out * w).sum()

    def loss_flax(x, c, params):
        out = block.apply(params, x, condition=c)
        return (out * w).sum()

    gx, gc, gp = jax.grad(loss_fused, argnums=(0, 1, 2))(x, c2, kp)
    gx_ref, gc_ref, gp_ref = jax.grad(loss_flax, argnums=(0, 1, 2))(x, c, params)

    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(gc), np.asarray(gc_ref[:, 0, :]), rtol=1e-3, atol=1e-3
    )
    ref_flat = gp_ref["params"]
    pairs = {
        "wada": ref_flat["adaln_modulation"]["kernel"],
        "bada": ref_flat["adaln_modulation"]["bias"],
        "wqkv": ref_flat["attn"]["c_attn"]["kernel"],
        "bqkv": ref_flat["attn"]["c_attn"]["bias"],
        "wproj": ref_flat["attn"]["c_proj"]["kernel"],
        "bproj": ref_flat["attn"]["c_proj"]["bias"],
        "w1": ref_flat["mlp"]["w1"]["kernel"],
        "w2": ref_flat["mlp"]["w2"]["kernel"],
        "wmlp": ref_flat["mlp"]["c_proj"]["kernel"],
    }
    for name, want in pairs.items():
        np.testing.assert_allclose(
            np.asarray(gp[name]), np.asarray(want), rtol=2e-3, atol=2e-3,
            err_msg=name,
        )


def test_trainable_fused_block_census_seq_len():
    """Auto block-row sizing at the census latent's T=64: the VMEM working set
    scales with block_rows*T, so the defaults must shrink the row blocks (the
    T=16 defaults blow the 16M scoped-vmem stack at T=64 — seen live on v5e).
    Gradients stay exact vs the flax Block through the (br, 1, E) c-blocks."""
    from scldm_tpu.ops.fused_dit import fused_dit_block_trainable

    Rc, Tc, Ec, Hc = 6, 64, 32, 4
    block = Block(
        n_embed=Ec, n_head=Hc, bias=True, multiple_of=4, layernorm_eps=1e-8,
        use_adaln=True, elementwise_affine=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (Rc, Tc, Ec))
    c = jax.random.normal(jax.random.PRNGKey(1), (Rc, 1, Ec))
    params = block.init(jax.random.PRNGKey(2), x, condition=c)
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    flat = {
        k: (jax.random.normal(jax.random.PRNGKey(i), v.shape) * 0.05 if "adaln" in k[0] else v)
        for i, (k, v) in enumerate(flat.items())
    }
    params = {"params": flax.traverse_util.unflatten_dict(flat)}
    kp = extract_block_params(params["params"])
    w = jax.random.normal(jax.random.PRNGKey(9), (Rc, Tc, Ec))

    def loss_fused(x, c2, kp):
        # block_rows/bwd_block_rows None = auto (256//64 = 4 bwd rows)
        out = fused_dit_block_trainable(x, c2, kp, Hc, 1e-8, None, None, True)
        return (out * w).sum()

    def loss_flax(x, c, params):
        return (block.apply(params, x, condition=c) * w).sum()

    gx, gc, gp = jax.grad(loss_fused, argnums=(0, 1, 2))(x, c[:, 0, :], kp)
    gx_ref, gc_ref, _ = jax.grad(loss_flax, argnums=(0, 1, 2))(x, c, params)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(gc), np.asarray(gc_ref[:, 0, :]), rtol=1e-3, atol=1e-3
    )


def test_fused_training_loss_and_grads_match_flax():
    """LDM train step with fused_training=True reproduces the flax path's loss
    and gradients (same rngs)."""
    from scldm_tpu.nn import DiT
    from scldm_tpu.nn.vae import build_transformer_vae
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
    dit = DiT(n_embed=32, n_embed_input=8, n_layer=2, n_head=2, seq_len=4,
              class_vocab_sizes={"clusters": 3}, cfg_dropout_prob=0.8)

    def task(fused):
        t = LDMTask(vae, vae_params, dit, create_transport(), num_training_steps=10,
                    fused_training=fused)
        if fused:
            # force interpret-mode kernels on CPU for the test
            import scldm_tpu.ops.fused_dit as fd
            orig = fd.fused_dit_train_apply
            t._orig = orig
        return t

    t_flax = LDMTask(vae, vae_params, dit, create_transport(), num_training_steps=10,
                     fused_training=False)
    t_fused = LDMTask(vae, vae_params, dit, create_transport(), num_training_steps=10,
                      fused_training=True)

    import scldm_tpu.ops.fused_dit as fd
    import functools as ft
    real = fd.fused_dit_train_apply
    fd_interp = ft.partial(real, interpret=True)
    fd.fused_dit_train_apply = fd_interp
    try:
        s1 = t_flax.init_state(jax.random.PRNGKey(3), batch)
        s2 = t_fused.init_state(jax.random.PRNGKey(3), batch)
        s1b, m1 = t_flax.train_step(s1, batch)
        s2b, m2 = t_fused.train_step(s2, batch)
    finally:
        fd.fused_dit_train_apply = real

    assert float(m1["train_loss"]) == pytest.approx(float(m2["train_loss"]), rel=1e-4)
    assert float(m1["grad_norm"]) == pytest.approx(float(m2["grad_norm"]), rel=1e-3)
    la = jax.tree_util.tree_leaves(s1b.params)[0]
    lb = jax.tree_util.tree_leaves(s2b.params)[0]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5)
