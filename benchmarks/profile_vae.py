#!/usr/bin/env python
"""Segment timing for the VAE train step: forward / loss / grad / optimizer.

Each segment runs K times inside one compiled program (lax.scan over a stacked
batch) so remote-dispatch latency (~4 ms on the tunneled chip) amortizes away;
we report (dispatch_time - overhead) / K. Used to locate where the step budget
goes (VERDICT round-1 item #3: raise MFU).
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import argparse

_p = argparse.ArgumentParser()
_p.add_argument("--batch", type=int, default=128)
BATCH = _p.parse_known_args()[0].batch
N_GENES = 17_002
SEQ_LEN = 6_147
K = 10


def synth_batch(rng):
    counts = np.zeros((BATCH, N_GENES), np.float32)
    for i in range(BATCH):
        nnz = rng.integers(1500, 4000)
        idx = rng.choice(N_GENES, size=nnz, replace=False)
        counts[i, idx] = rng.poisson(3.0, size=nnz) + 1
    genes = np.tile(np.arange(1, N_GENES + 1, dtype=np.int64)[None], (BATCH, 1))
    genes_sub = np.zeros((BATCH, SEQ_LEN), np.int64)
    counts_sub = np.zeros((BATCH, SEQ_LEN), np.float32)
    for i in range(BATCH):
        nz = np.nonzero(counts[i])[0]
        genes_sub[i, : len(nz)] = genes[i, nz]
        counts_sub[i, : len(nz)] = counts[i, nz]
    return {
        "counts": counts,
        "genes": genes,
        "library_size": counts.sum(1, keepdims=True),
        "counts_subset": counts_sub,
        "genes_subset": genes_sub,
    }


def _force(out):
    # on the tunneled 'axon' platform block_until_ready can return before
    # execution completes; a scalar host fetch is the only reliable sync
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def dispatch_ms(fn, *args, iters=5):
    _force(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    from scldm_tpu.nn.vae import build_transformer_vae
    from scldm_tpu.ops.distributions import log_nb_positive
    from scldm_tpu.training.vae_task import VAETask, vae_loss

    vae = build_transformer_vae(n_genes=N_GENES, dtype=jnp.bfloat16)
    task = VAETask(vae, num_training_steps=10_000)
    batch = synth_batch(np.random.default_rng(0))
    state = task.init_state(jax.random.PRNGKey(0), batch)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    stacked = jax.tree_util.tree_map(lambda x: jnp.stack([x] * K), batch)

    # measure raw dispatch overhead with a trivial program
    @jax.jit
    def noop(x):
        return x + 1.0

    overhead = dispatch_ms(noop, jnp.zeros(8))
    print(f"{'dispatch_overhead':22s} {overhead:8.3f} ms")

    def scan_over(fn_of_batch):
        """Run fn K times over the stacked batch in one program."""

        def run(params, stacked):
            def body(c, b):
                r = fn_of_batch(params, b)
                s = jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(x).astype(jnp.float32), r, 0.0
                )
                return c + s, None

            tot, _ = jax.lax.scan(body, 0.0, stacked)
            return tot

        return jax.jit(run)

    def fwd(params, b):
        out, z = task._apply(params, b, train=False)
        return (out["mu"].sum(),)

    def fwd_loss(params, b):
        out, _ = task._apply(params, b, train=False)
        return (vae_loss(b["counts"], out, task.gaussian_head),)

    grad_fn = jax.grad(lambda p, b: fwd_loss(p, b)[0])

    out, _ = jax.jit(lambda p, b: task._apply(p, b, train=False))(state.params, batch)
    mu, theta = out["mu"], out["theta"]
    mu_s = jnp.stack([mu] * K)

    def nb_loss(params, b):
        # params unused; b carries stacked mu via closure trick below
        return (-log_nb_positive(b["counts"], b["mu"], theta).sum(1).mean(),)

    def nb_loss_grad(params, b):
        g = jax.grad(lambda m: -log_nb_positive(b["counts"], m, theta).sum(1).mean())(
            b["mu"]
        )
        return (g,)

    batch_mu = dict(batch, mu=mu)
    stacked_mu = dict(stacked, mu=mu_s)

    # full train step: the production fused-K program (donation disabled via
    # fresh state copies held outside)
    import copy

    def run_full():
        s = jax.tree_util.tree_map(lambda x: x + 0 if hasattr(x, "dtype") else x, state)
        _, m = task.train_steps(s, stacked)
        return m["train_loss"]

    full = dispatch_ms(run_full)

    # upstream segments (round 5): ALL tail variants show the same ~2.27x
    # step time at B=256 (REVALIDATION batch_scaling_*), so the superlinear
    # segment is in the shared front half — embedding gather, its backward
    # scatter-add into the (G+1, E) table, or the MCAB pool over S=6147
    def embed_fwd(params, b):
        emb = vae.apply(
            params, b["counts_subset"], b["genes_subset"],
            method=lambda m, c, g: m.input_layer(c, g),
        )
        return (jnp.sum(emb.astype(jnp.float32)),)

    def embed_enc_fwd(params, b):
        emb = vae.apply(
            params, b["counts_subset"], b["genes_subset"],
            method=lambda m, c, g: m.input_layer(c, g),
        )
        h_z = vae.apply(
            params, emb, method=lambda m, e: m.encoder(e, train=False)
        )
        return (jnp.sum(h_z.astype(jnp.float32)),)

    embed_scatter = jax.grad(lambda p, b: embed_fwd(p, b)[0])

    rows = [
        ("train_step(K)", full),
        ("fwd_only", dispatch_ms(scan_over(fwd), state.params, stacked)),
        ("fwd_loss", dispatch_ms(scan_over(fwd_loss), state.params, stacked)),
        (
            "grad(fwd_loss)",
            dispatch_ms(scan_over(lambda p, b: (grad_fn(p, b),)), state.params, stacked),
        ),
        ("nb_loss_only", dispatch_ms(scan_over(nb_loss), state.params, stacked_mu)),
        ("nb_loss_grad", dispatch_ms(scan_over(nb_loss_grad), state.params, stacked_mu)),
        ("embed_fwd", dispatch_ms(scan_over(embed_fwd), state.params, stacked)),
        ("embed_enc_fwd", dispatch_ms(scan_over(embed_enc_fwd), state.params, stacked)),
        (
            "embed_scatter_bwd",
            dispatch_ms(
                scan_over(lambda p, b: (embed_scatter(p, b),)), state.params, stacked
            ),
        ),
    ]
    for name, ms in rows:
        per = (ms - overhead) / K
        print(
            f"{name:22s} {ms:8.3f} ms total  {per:7.3f} ms/step  "
            f"({BATCH / (per / 1e3):,.0f} cells/s)"
        )


if __name__ == "__main__":
    main()
