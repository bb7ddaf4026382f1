"""Equivalence tests for the fused decoder-tail Pallas kernel
(ops/fused_decoder.py) and its integration into the VAE train path.

Runs in pallas interpret mode on the CPU test mesh; real-TPU execution is
exercised by bench.py / the driver. Tolerances reflect the kernel's internal
bfloat16 matmuls (the module path on TPU runs bf16 too)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scldm_tpu.nn.vae import build_transformer_vae
from scldm_tpu.ops.fused_decoder import (
    build_attention_operands,
    fused_decoder_tail,
    pack_weights,
)
from scldm_tpu.training.vae_task import VAETask, _fused_path_ok, fused_nb_apply, vae_loss

H, HD, M, E, HID = 4, 8, 16, 32, 88


def _ref_tail(qp, q, k, v, wproj, raw, eps=1e-8):
    G, B = qp.shape[0], k.shape[0]
    k4 = k.reshape(B, M, H, HD).transpose(0, 2, 1, 3)
    v4 = v.reshape(B, M, H, HD).transpose(0, 2, 1, 3)
    qp4 = qp.reshape(G, H, HD)
    s = jnp.einsum("ghd,bhmd->bhgm", qp4, k4) / np.sqrt(HD)
    p = jax.nn.softmax(s, -1)
    o = jnp.einsum("bhgm,bhmd->bhgd", p, v4)
    y = jnp.einsum("bhgd,hde->bge", o, wproj.reshape(H, HD, E))
    h = q[None] + y
    mean = h.mean(-1, keepdims=True)
    var = ((h - mean) ** 2).mean(-1, keepdims=True)
    hn = (h - mean) * jax.lax.rsqrt(var + eps) * raw["ln2g"] + raw["ln2b"]
    mm = (jax.nn.silu(hn @ raw["w1"]) * (hn @ raw["w2"])) @ raw["wmlp"]
    return ((h + mm) @ raw["wmu"]).squeeze(-1) + raw["bmu"][0]


def _make(G, B, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3)
    raw = dict(
        ln2g=f(E) + 1.0, ln2b=f(E), w1=f(E, HID), w2=f(E, HID),
        wmlp=f(HID, E), wmu=f(E, 1), bmu=f(1),
    )
    return f(G, E), f(G, E), f(B, M, E), f(B, M, E), f(E, E), raw


def _kernel_call(qp, q, k, v, wproj, raw):
    w = pack_weights(
        raw["ln2g"], raw["ln2b"], raw["w1"], raw["w2"], raw["wmlp"],
        raw["wmu"], raw["bmu"],
    )
    kf, vp = build_attention_operands(k, v, wproj, H)
    # non-divisible-by-block shapes on purpose (exercises padding); interpret
    return fused_decoder_tail(qp, q, kf, vp, w, H, 1e-8, 64, 8, 64, 8, True)


def test_kernel_forward_matches_reference():
    qp, q, k, v, wproj, raw = _make(150, 12)
    out_ref = jax.jit(_ref_tail, static_argnames=())(qp, q, k, v, wproj, raw)
    out_k = jax.jit(_kernel_call)(qp, q, k, v, wproj, raw)
    assert out_k.shape == out_ref.shape == (12, 150)
    mag = float(jnp.abs(out_ref).max())
    assert float(jnp.abs(out_ref - out_k).max()) < 0.01 * mag + 1e-3


def test_kernel_gradients_match_reference():
    qp, q, k, v, wproj, raw = _make(96, 8, seed=1)

    def loss_r(qp, k, v, wproj, raw):
        return jnp.sum(jnp.tanh(_ref_tail(qp, q, k, v, wproj, raw) * 0.1))

    def loss_k(qp, k, v, wproj, raw):
        return jnp.sum(jnp.tanh(_kernel_call(qp, q, k, v, wproj, raw) * 0.1))

    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3, 4)))(qp, k, v, wproj, raw)
    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3, 4)))(qp, k, v, wproj, raw)
    flat_r, _ = jax.tree_util.tree_flatten(gr)
    flat_k, _ = jax.tree_util.tree_flatten(gk)
    for a, b in zip(flat_k, flat_r):
        scale = float(jnp.abs(b).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) < 0.02 * scale + 1e-4


@pytest.fixture(scope="module")
def small_vae_setup():
    G, B, S = 60, 8, 20
    vae = build_transformer_vae(n_genes=G)
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
    return vae, task, state, task._materialize(lean)


def test_fused_apply_matches_module_path(small_vae_setup):
    vae, task, state, batch = small_vae_setup
    assert _fused_path_ok(vae)
    out_m, z_m = jax.jit(lambda p: task._apply(p, batch, train=False))(state.params)
    out_f, z_f = jax.jit(
        lambda p: fused_nb_apply(vae, p, batch, train=False, interpret=True)
    )(state.params)
    assert out_f["theta"].shape == (vae.decoder.n_genes,)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_m), atol=1e-5)
    mag = float(jnp.abs(out_m["mu"]).max())
    assert float(jnp.abs(out_m["mu"] - out_f["mu"]).max()) < 0.01 * mag
    np.testing.assert_allclose(
        np.asarray(out_f["theta"]),
        np.asarray(jnp.broadcast_to(out_m["theta"], out_f["theta"].shape)),
        atol=1e-6,
    )


def test_fused_apply_loss_and_grads_close(small_vae_setup):
    vae, task, state, batch = small_vae_setup

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


def test_batch_chunked_matches_single_call(small_vae_setup):
    """batch_chunk splits the tail kernel over batch slices (round 5 — the
    B>128 superlinearity fix): the chunked forward must equal the single-call
    forward exactly (same kernel, same tiles, disjoint batch rows), and the
    gradients must agree (weight grads sum through the concat)."""
    vae, task, state, batch = small_vae_setup

    def loss(p, chunk):
        out, _ = fused_nb_apply(
            vae, p, batch, train=False, interpret=True, batch_chunk=chunk
        )
        return vae_loss(batch["counts"], out, False)

    out1, _ = jax.jit(lambda p: fused_nb_apply(
        vae, p, batch, train=False, interpret=True))(state.params)
    out3, _ = jax.jit(lambda p: fused_nb_apply(
        vae, p, batch, train=False, interpret=True, batch_chunk=3))(state.params)
    np.testing.assert_allclose(
        np.asarray(out3["mu"]), np.asarray(out1["mu"]), rtol=1e-5, atol=1e-6
    )
    l1, g1 = jax.jit(jax.value_and_grad(lambda p: loss(p, None)))(state.params)
    l3, g3 = jax.jit(jax.value_and_grad(lambda p: loss(p, 3)))(state.params)
    np.testing.assert_allclose(float(l3), float(l1), rtol=1e-6)
    # weight grads sum over batch in a different order (per-chunk kernel
    # backwards + concat-VJP) — fp reassociation, not a math difference;
    # bar set well under the 2-8% kernel-vs-module tolerances above
    for a, b in zip(jax.tree_util.tree_leaves(g3), jax.tree_util.tree_leaves(g1)):
        scale = float(jnp.abs(b).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) < 5e-3 * scale + 1e-6


def test_chunked_dispatch_gates():
    """fused_batch_chunk lifts the MAX_FUSED_BATCH batch gate (compile cost
    is per chunk), and the VAETask plumbs the chunk into the fused call."""
    from scldm_tpu.ops.fused_decoder import MAX_FUSED_BATCH

    vae = build_transformer_vae(n_genes=40)
    task = VAETask(vae, num_training_steps=10, fused_decoder=True,
                   fused_batch_chunk=128)
    big = {
        "genes_subset": jnp.zeros((MAX_FUSED_BATCH + 1, 4), jnp.int32),
        "counts_subset": jnp.zeros((MAX_FUSED_BATCH + 1, 4), jnp.float32),
    }
    assert task.fused_batch_chunk == 128
    assert task._use_fused(big)
    # a chunk larger than the compile ceiling still refuses
    task2 = VAETask(vae, num_training_steps=10, fused_decoder=True,
                    fused_batch_chunk=MAX_FUSED_BATCH + 1)
    assert not task2._use_fused(big)


def test_gaussian_head_not_eligible():
    vae = build_transformer_vae(n_genes=40, decoder_head="gaussian")
    assert not _fused_path_ok(vae)
    task = VAETask(vae, num_training_steps=10, fused_decoder=True)
    assert not task.fused_decoder  # forced flag still gated by eligibility


def test_large_batch_auto_chunks_instead_of_module_fallback():
    """B > MAX_FUSED_BATCH: the auto default now dispatches 128-row chunks
    (round-5 measurement: 182.0 ms/step vs the module fallback's 235.1 at
    dentate B=512) instead of abandoning the kernel; B <= MAX_FUSED_BATCH
    keeps the monolithic kernel with its batch-aware bwd tiles; explicitly
    disabling chunking (fused_batch_chunk=0) restores the module fallback."""
    from scldm_tpu.ops.fused_decoder import MAX_FUSED_BATCH

    vae = build_transformer_vae(n_genes=40)
    task = VAETask(vae, num_training_steps=10, fused_decoder=True)
    assert task.fused_decoder
    small = {
        "genes_subset": jnp.zeros((MAX_FUSED_BATCH, 4), jnp.int32),
        "counts_subset": jnp.zeros((MAX_FUSED_BATCH, 4), jnp.float32),
    }
    big = {
        "genes_subset": jnp.zeros((MAX_FUSED_BATCH + 1, 4), jnp.int32),
        "counts_subset": jnp.zeros((MAX_FUSED_BATCH + 1, 4), jnp.float32),
    }
    assert task._use_fused(small)
    assert task._chunk_for(MAX_FUSED_BATCH) is None  # monolith while it compiles
    assert task._use_fused(big)  # auto-chunked, no longer a module fallback
    assert task._chunk_for(MAX_FUSED_BATCH + 1) == 128
    assert not task._use_fused({**small, "counts": jnp.zeros((8, 40))})

    off = VAETask(vae, num_training_steps=10, fused_decoder=True,
                  fused_batch_chunk=0)
    assert not off._use_fused(big)  # explicit off: the old module fallback
    assert off._use_fused(small)
