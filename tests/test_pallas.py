"""Pallas flash-attention kernel correctness (interpreter mode on CPU; the
same kernel compiles for real TPUs via the sdpa dispatcher)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scldm_tpu.ops.attention import sdpa_xla
from scldm_tpu.ops.flash_attention import flash_attention


def _qkv(key, B, M, S, H, D, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, M, H, D), dtype)
    k = jax.random.normal(kk, (B, S, H, D), dtype)
    v = jax.random.normal(kv, (B, S, H, D), dtype)
    return q, k, v


class TestFlashAttention:
    @pytest.mark.parametrize(
        "B,M,S,H,D",
        [
            (2, 256, 1024, 4, 8),     # long-kv self-attn shape, tiny head dim
            (1, 1024, 1024, 2, 64),   # square
            (2, 300, 700, 2, 16),     # non-tile-aligned lengths (padding + mask)
        ],
    )
    def test_matches_xla_sdpa(self, B, M, S, H, D):
        q, k, v = _qkv(jax.random.PRNGKey(0), B, M, S, H, D)
        got = flash_attention(q, k, v, block_q=128, block_kv=256, interpret=True)
        want = sdpa_xla(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    def test_bf16_inputs(self):
        q, k, v = _qkv(jax.random.PRNGKey(1), 1, 128, 512, 2, 32, jnp.bfloat16)
        got = flash_attention(q, k, v, block_q=128, block_kv=256, interpret=True)
        want = sdpa_xla(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
        )

    def test_softmax_normalization(self):
        """With v = ones, attention output must be exactly ones."""
        q, k, _ = _qkv(jax.random.PRNGKey(2), 1, 128, 512, 2, 16)
        v = jnp.ones((1, 512, 2, 16))
        got = flash_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(got), 1.0, rtol=1e-5)
