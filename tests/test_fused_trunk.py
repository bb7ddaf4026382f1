"""Fused whole-trunk Pallas kernel equivalence vs the flax Block stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scldm_tpu.nn.layers import Block
from scldm_tpu.ops.fused_trunk import (
    extract_trunk_params,
    fused_trunk_blocks,
    fused_trunk_blocks_trainable,
    trunk_kernel_ok,
)

R, T, E, H, L = 12, 16, 32, 8, 3


def _flax_trunk(params, x):
    """The reference trunk: L plain Blocks applied in sequence."""
    for i in range(L):
        x = Block(
            n_embed=E, n_head=H, bias=False, multiple_of=4, layernorm_eps=1e-8
        ).apply({"params": params[f"block_{i}"]}, x)
    return x


@pytest.fixture(scope="module")
def trunk_setup():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (R, T, E))
    block = Block(n_embed=E, n_head=H, bias=False, multiple_of=4, layernorm_eps=1e-8)
    tree = {}
    for i in range(L):
        p = block.init(jax.random.PRNGKey(10 + i), x)["params"]
        # randomize the LN affine params so the test exercises real math
        p["ln_1"]["LayerNorm_0"] = {
            "scale": 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(20 + i), (E,)),
            "bias": 0.1 * jax.random.normal(jax.random.PRNGKey(30 + i), (E,)),
        }
        p["ln_2"]["LayerNorm_0"] = {
            "scale": 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(40 + i), (E,)),
            "bias": 0.1 * jax.random.normal(jax.random.PRNGKey(50 + i), (E,)),
        }
        tree[f"block_{i}"] = p
    return tree, x


def test_fused_trunk_matches_flax_blocks(trunk_setup):
    tree, x = trunk_setup
    want = _flax_trunk(tree, x)
    kp = extract_trunk_params(tree, L)
    got = fused_trunk_blocks(x, kp, n_head=H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fused_trunk_row_padding(trunk_setup):
    """Row counts that don't divide block_rows pad + unpad correctly."""
    tree, x = trunk_setup
    kp = extract_trunk_params(tree, L)
    got = fused_trunk_blocks(x[:5], kp, n_head=H, block_rows=8, interpret=True)
    want = _flax_trunk(tree, x[:5])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fused_trunk_bf16(trunk_setup):
    tree, x = trunk_setup
    kp = extract_trunk_params(tree, L)
    kp16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), kp)
    got = fused_trunk_blocks(x.astype(jnp.bfloat16), kp16, n_head=H, interpret=True)
    want = _flax_trunk(tree, x)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=6e-2, atol=6e-2
    )


def test_trainable_fused_trunk_gradients(trunk_setup):
    """Pallas backward kernel gradients == jax.grad of the flax trunk —
    including grads THROUGH extract_trunk_params back to the per-block tree."""
    tree, x = trunk_setup
    w = jax.random.normal(jax.random.PRNGKey(9), (R, T, E))

    def loss_fused(x, tree):
        kp = extract_trunk_params(tree, L)
        out = fused_trunk_blocks_trainable(x, kp, H, 1e-8, 64, 8, True)
        return (out * w).sum()

    def loss_flax(x, tree):
        return (_flax_trunk(tree, x) * w).sum()

    gx, gt = jax.grad(loss_fused, argnums=(0, 1))(x, tree)
    gx_ref, gt_ref = jax.grad(loss_flax, argnums=(0, 1))(x, tree)

    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-3, atol=1e-3)
    flat = jax.tree_util.tree_leaves_with_path(gt)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(gt_ref))
    assert flat, "no gradient leaves"
    for path, g in flat:
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(flat_ref[path]), rtol=2e-3, atol=2e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_trunk_kernel_gate():
    assert trunk_kernel_ok(32, bias=False, dropout=0.0, use_adaln=False)
    assert not trunk_kernel_ok(32, bias=True, dropout=0.0, use_adaln=False)
    assert not trunk_kernel_ok(32, bias=False, dropout=0.1, use_adaln=False)
    assert not trunk_kernel_ok(32, bias=False, dropout=0.0, use_adaln=True)
    assert not trunk_kernel_ok(512, bias=False, dropout=0.0, use_adaln=False)


def test_fused_apply_trunk_path_matches_no_trunk():
    """fused_nb_apply(use_trunk=True) == use_trunk=False: same outputs, same
    latent, close gradients (the trunk kernel composes with the fused
    encoder-pool / decoder-tail kernels)."""
    from scldm_tpu.nn.vae import build_transformer_vae
    from scldm_tpu.training.vae_task import (
        VAETask, _fused_trunk_ok, fused_nb_apply, vae_loss,
    )

    G, B, S = 60, 8, 20
    vae = build_transformer_vae(n_genes=G)
    assert _fused_trunk_ok(vae)
    rng = np.random.default_rng(0)
    gs = np.zeros((B, S), np.int32)
    cs = np.zeros((B, S), np.float32)
    for i in range(B):
        nnz = int(rng.integers(5, S))
        idx = np.sort(rng.choice(G, nnz, replace=False))
        gs[i, :nnz] = idx + 1
        cs[i, :nnz] = rng.poisson(3.0, nnz) + 1
    lean = {
        "genes_subset": jnp.asarray(gs),
        "counts_subset": jnp.asarray(cs),
        "library_size": jnp.asarray(cs.sum(1, keepdims=True)),
    }
    task = VAETask(vae, num_training_steps=100)
    state = task.init_state(jax.random.PRNGKey(0), lean)
    batch = task._materialize(lean)

    def loss(p, use_trunk):
        out, z = fused_nb_apply(
            vae, p, batch, train=False, interpret=True, use_trunk=use_trunk
        )
        return vae_loss(batch["counts"], out, False), z

    (l_t, z_t), g_t = jax.jit(
        jax.value_and_grad(lambda p: loss(p, True), has_aux=True)
    )(state.params)
    (l_n, z_n), g_n = jax.jit(
        jax.value_and_grad(lambda p: loss(p, False), has_aux=True)
    )(state.params)
    assert abs(float(l_t) - float(l_n)) < 1e-3 * abs(float(l_n))
    np.testing.assert_allclose(np.asarray(z_t), np.asarray(z_n), atol=1e-4)
    flat_t = jax.tree_util.tree_flatten_with_path(g_t)[0]
    flat_n = dict(jax.tree_util.tree_flatten_with_path(g_n)[0])
    for path, a in flat_t:
        b = flat_n[path]
        scale = float(jnp.abs(b).max()) + 1e-4
        assert float(jnp.abs(a - b).max()) < 0.03 * scale, jax.tree_util.keystr(path)
