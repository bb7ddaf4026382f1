"""Flash many-query/few-KV cross-attention (ops/fused_cross.py).

The census decoder unpools G ~= 36k gene queries into 64 latent tokens;
XLA materializes the (B, H, G, M) scores/probs in HBM. The kernel must match
the einsum reference forward (bf16 matmul tolerance) and bit-match its
gradients (the custom VJP replays the XLA reference — see module docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scldm_tpu.ops.fused_cross import (
    _attn_reference,
    build_blockdiag_operands,
    flash_cross_attention,
)


def _operands(seed=0, g=700, e=256, b=3, m=16):
    rng = np.random.default_rng(seed)
    qp = jnp.asarray(rng.normal(size=(g, e)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, m, e)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, m, e)), jnp.float32)
    return qp, k, v


def test_blockdiag_operands_reproduce_per_head_layout():
    qp, k, v = _operands()
    H = 8
    B, M, E = k.shape
    hd = E // H
    kblk, vblk = build_blockdiag_operands(k, v, H)
    assert kblk.shape == (B, E, H * M) and vblk.shape == (B, H * M, E)
    k4 = np.asarray(k).reshape(B, M, H, hd)
    # head h's key block lives in rows h*hd..(h+1)*hd and cols h*M..(h+1)*M
    h, b_, m_ = 3, 1, 5
    np.testing.assert_allclose(
        np.asarray(kblk)[b_, h * hd : (h + 1) * hd, h * M + m_], k4[b_, m_, h]
    )
    # off-diagonal head blocks are zero
    assert float(np.abs(np.asarray(kblk)[b_, :hd, h * M + m_]).max()) == 0.0


def test_flash_cross_matches_reference_multi_tile():
    """g=700 with block_g=512 -> 2 gene tiles incl. a padded one; b=3 with
    block_b=2 -> padded batch tile."""
    qp, k, v = _operands()
    y_ref = _attn_reference(qp, k, v, 8)
    y = flash_cross_attention(qp, k, v, 8, 512, 2, True)
    mag = float(jnp.abs(y_ref).max())
    assert float(jnp.abs(y - y_ref).max()) < 0.01 * mag


def test_flash_cross_gradients_bitmatch_reference():
    """The VJP replays the einsum reference, so grads match it exactly."""
    qp, k, v = _operands(seed=1, g=600)
    w = jnp.asarray(np.random.default_rng(2).normal(size=(3, 600, 256)), jnp.float32)

    def loss_ref(qp_, k_, v_):
        return jnp.sum(_attn_reference(qp_, k_, v_, 8) * w)

    def loss_kern(qp_, k_, v_):
        return jnp.sum(flash_cross_attention(qp_, k_, v_, 8, 512, 2, True) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(qp, k, v)
    g_k = jax.grad(loss_kern, argnums=(0, 1, 2))(qp, k, v)
    for a, b_ in zip(g_ref, g_k):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_sdpa_shared_q_dispatch_gate(monkeypatch):
    """Default OFF (measured end-to-end loss — ROADMAP); with the env opt-in
    the gate still requires TPU + census-like shapes, so on CPU it never
    fires and every existing CPU test exercises the einsum path unchanged."""
    from scldm_tpu.ops import attention

    q_census = jnp.zeros((36601, 8, 64))
    k_census = jnp.zeros((4, 64, 8, 64))
    assert not attention._use_flash_cross(q_census, k_census)  # default off
    monkeypatch.setattr(attention, "_FLASH_CROSS_ENABLED", True)
    assert not attention._use_flash_cross(q_census, k_census)  # CPU backend
    if jax.default_backend() == "tpu":  # pragma: no cover - TPU-only
        assert attention._use_flash_cross(q_census, k_census)
        assert not attention._use_flash_cross(jnp.zeros((100, 8, 64)), k_census)


def test_sdpa_shared_q_reference_path_unchanged():
    """CrossAttention's batch-shared path on CPU equals the plain einsum."""
    from scldm_tpu.ops.attention import sdpa_shared_q

    qp, k, v = _operands(seed=3, g=128, e=64, b=2, m=8)
    H, hd = 4, 16
    y = sdpa_shared_q(
        qp.reshape(128, H, hd), k.reshape(2, 8, H, hd), v.reshape(2, 8, H, hd)
    )
    y_ref = _attn_reference(qp, k, v, H).reshape(2, 128, H, hd)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
