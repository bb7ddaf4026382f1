"""utils/flops.py underpins every published MFU number (bench_census divides
measured step time by these analytic counts), so the analytic model is pinned
against XLA's own compiled-program cost analysis: if the architecture drifts
(extra projection, changed MLP widths) without the count following, the MFU
claims silently break."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scldm_tpu.nn.vae import build_transformer_vae
from scldm_tpu.utils.flops import (
    dit_forward_flops,
    get_flops,
    measured_flops,
    vae_forward_flops,
)


def test_vae_analytic_vs_xla_measured():
    B, G, S, E = 4, 400, 120, 32
    vae = build_transformer_vae(n_genes=G)  # f32: cost analysis is exact
    rng = np.random.default_rng(0)
    counts = jnp.asarray(rng.poisson(1.0, (B, G)).astype(np.float32))
    genes = jnp.tile(jnp.arange(1, G + 1)[None], (B, 1))
    sub_c = jnp.asarray(counts[:, :S])
    sub_g = jnp.asarray(genes[:, :S])
    lib = counts.sum(1, keepdims=True)
    params = vae.init(jax.random.PRNGKey(0), counts, genes, lib, sub_c, sub_g)

    def fwd(params, counts, genes, lib, sub_c, sub_g):
        out, z = vae.apply(params, counts, genes, lib, sub_c, sub_g)
        return out["mu"], z

    measured = measured_flops(fwd, params, counts, genes, lib, sub_c, sub_g)
    if measured is None:
        pytest.skip("XLA cost analysis unavailable on this backend")
    analytic = B * vae_forward_flops(n_genes=G, genes_seq_len=S)
    # the analytic count covers the matmul-dominant terms; elementwise ops
    # (LN, softmax, embedding mul) add a platform-dependent remainder
    ratio = measured / analytic
    assert 0.75 < ratio < 1.6, (measured, analytic, ratio)


def test_dit_analytic_vs_xla_measured():
    from scldm_tpu.nn.nnets import DiT

    B, T, E_in = 8, 16, 16
    dit = DiT(n_embed=64, n_embed_input=E_in, n_layer=2, n_head=4, seq_len=T,
              class_vocab_sizes={"c": 5}, cfg_dropout_prob=0.8)
    x = jnp.zeros((B, T, E_in))
    t = jnp.linspace(0.1, 0.9, B)
    cond = {"c": jnp.zeros((B,), jnp.int32)}
    params = dit.init(
        {"params": jax.random.PRNGKey(0), "condition": jax.random.PRNGKey(1)},
        x, t, cond, train=False,
    )

    def fwd(params, x, t):
        return dit.apply(params, x, t, cond, train=False)

    measured = measured_flops(fwd, params, x, t)
    if measured is None:
        pytest.skip("XLA cost analysis unavailable on this backend")
    analytic = B * dit_forward_flops(seq_len=T, n_embed=64, n_embed_input=E_in, n_layer=2)
    ratio = measured / analytic
    assert 0.75 < ratio < 1.6, (measured, analytic, ratio)


def test_get_flops_reference_signature():
    """The signature the reference config expects (vae_base.yaml:95-104
    references a scldm.flops.get_flops that does not exist there)."""
    fwd = get_flops(seq_len=128, d_model=64, n_layers=4, backward=False)
    fb = get_flops(seq_len=128, d_model=64, n_layers=4, backward=True)
    assert fb == 3 * fwd > 0
    with_head = get_flops(seq_len=128, d_model=64, n_layers=4,
                          vocab_size=1000, backward=False)
    assert with_head == fwd + 2 * 128 * 64 * 1000
