"""Equivalence of ops/fused_swiglu.fused_swiglu_gate vs the plain XLA
formulation, forward and VJP, in interpret mode (CPU CI) — including padded
(non-tile-multiple) shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scldm_tpu.ops.fused_swiglu import fused_swiglu_gate, swiglu_reference

jax.config.update("jax_enable_x64", False)


def make(R, E, H, dtype, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k1, (R, E), dtype) * 0.5
    w1 = jax.random.normal(k2, (E, H), dtype) * (E**-0.5)
    w2 = jax.random.normal(k3, (E, H), dtype) * (E**-0.5)
    return x, w1, w2


@pytest.mark.parametrize(
    "R,E,H,br,bh",
    [
        (256, 128, 256, 128, 128),   # exact tiling
        (200, 128, 192, 128, 128),   # row + hidden padding
        (64, 128, 128, 512, 512),    # blocks clamp to array size
    ],
)
def test_forward_matches(R, E, H, br, bh):
    x, w1, w2 = make(R, E, H, jnp.float32)
    got = fused_swiglu_gate(x, w1, w2, br, bh, True)
    want = swiglu_reference(x, w1, w2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("R,E,H", [(256, 128, 256), (200, 128, 192)])
def test_vjp_matches(R, E, H):
    x, w1, w2 = make(R, E, H, jnp.float32)
    dg = jax.random.normal(jax.random.PRNGKey(9), (R, H), jnp.float32)

    def loss_fused(x, w1, w2):
        return jnp.sum(fused_swiglu_gate(x, w1, w2, 128, 128, True) * dg)

    def loss_ref(x, w1, w2):
        return jnp.sum(swiglu_reference(x, w1, w2) * dg)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w1, w2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w1, w2)
    for a, b, name in zip(g_fused, g_ref, ("dx", "dw1", "dw2")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_bf16_forward_close():
    x, w1, w2 = make(192, 128, 256, jnp.bfloat16)
    got = fused_swiglu_gate(x, w1, w2, 128, 128, True).astype(jnp.float32)
    want = swiglu_reference(x, w1, w2).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


# -- swiglu_vec (gate + folded head-vector contraction) ------------------------
from scldm_tpu.ops.fused_swiglu import swiglu_vec, swiglu_vec_reference


def make_vec(R, E, H, dtype, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k1, (R, E), dtype) * 0.5
    w12 = jax.random.normal(k2, (E, 2 * H), dtype) * (E**-0.5)
    wv = jax.random.normal(k3, (H, 1), dtype) * (H**-0.5)
    return x, w12, wv


@pytest.mark.parametrize("R,E,H,br", [(256, 128, 256, 128), (200, 128, 192, 128)])
def test_vec_forward_matches(R, E, H, br):
    x, w12, wv = make_vec(R, E, H, jnp.float32)
    got = swiglu_vec(x, w12, wv, br, True)
    want = swiglu_vec_reference(x, w12, wv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("R,E,H", [(256, 128, 256), (200, 128, 192)])
def test_vec_vjp_matches(R, E, H):
    x, w12, wv = make_vec(R, E, H, jnp.float32)
    ds = jax.random.normal(jax.random.PRNGKey(7), (R, 1), jnp.float32)

    def loss_fused(x, w12, wv):
        return jnp.sum(swiglu_vec(x, w12, wv, 128, True) * ds)

    def loss_ref(x, w12, wv):
        return jnp.sum(swiglu_vec_reference(x, w12, wv) * ds)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w12, wv)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w12, wv)
    for a, b, name in zip(g_fused, g_ref, ("dx", "dw12", "dwv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
        )
