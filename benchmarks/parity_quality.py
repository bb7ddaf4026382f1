#!/usr/bin/env python
"""Training-dynamics parity anchor: the reference PyTorch VAE vs ours, same
weights, same data, same optimizer — loss trajectories side by side.

VERDICT r3 item 6: layer-level forward parity (tests/test_torch_parity.py)
proves the numerics of each op, but not that a full TRAINING RUN follows the
reference's dynamics. This harness closes that gap in the only controlled way
available offline (the released reference checkpoints and the dentate dataset
need network):

  1. build the torch mirror of the reference TransformerVAE (module names and
     math per /root/reference/src/scldm/models.py:170-247, layers.py:229-333,
     stochastic_layers.py:76-121; same mirror the parity tests validate),
  2. import its torch.manual_seed(0) init into our flax params byte-for-byte
     (utils/torch_import.py), so both runs start at the SAME point,
  3. train both on the IDENTICAL synthetic NB dataset in the identical batch
     order with the identical loss (NB NLL, sum-genes mean-batch — reference
     models.py:233-247) and optimizer (AdamW: decoupled wd, bias correction —
     reference optim.py AdamWLegacy semantics; torch.optim.AdamW here),
  4. record train-loss trajectories + held-out val NLL / PCC / zeros-accuracy
     and their relative gaps into PARITY_QUALITY.json.

Both runs are float32 on CPU: this is a *dynamics* experiment, not a speed
one — any divergence is then attributable to framework numerics, not dtype.

Run: python -m benchmarks.parity_quality [--steps 300] [--out PARITY_QUALITY.json]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

# the controlled comparison is CPU f32 for both frameworks (see module doc)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

# -- matched experiment scale (CPU-trainable in ~1 min per framework) ---------
G = 1000        # genes
S = 384         # tokenized subset length
B = 32          # batch
E, E_LAT, N_IND, N_LAYER, N_HEAD, N_HEAD_X = 128, 32, 16, 2, 4, 2
N_CELLS, N_VAL = 2048, 256
LR, BETAS, EPS_OPT, WD, CLIP = 1e-3, (0.9, 0.95), 1e-8, 0.01, 10.0
EPS_LN = 1e-8


def make_dataset(seed: int = 0):
    """Cluster-structured NB counts: K archetype programs, lognormal gene
    means, NB sampling — enough structure that the VAE's PCC/zeros-accuracy
    move during training (pure-noise data would leave eval metrics flat)."""
    rng = np.random.default_rng(seed)
    K = 8
    programs = rng.lognormal(mean=-1.2, sigma=1.4, size=(K, G)).astype(np.float64)
    labels = rng.integers(0, K, size=N_CELLS)
    mu = programs[labels] * rng.lognormal(0.0, 0.25, size=(N_CELLS, 1))
    theta_true = 2.0
    p = theta_true / (theta_true + mu)
    counts = rng.negative_binomial(theta_true, p).astype(np.float32)
    # deterministic tokenization: top-S expressed genes per cell (stable order)
    order = np.argsort(-counts, axis=1, kind="stable")[:, :S]
    genes_sub = (order + 1).astype(np.int32)          # vocab ids, 0 = mask
    counts_sub = np.take_along_axis(counts, order, axis=1)
    lib = counts.sum(1, keepdims=True).astype(np.float32)
    genes_full = np.tile(np.arange(1, G + 1, dtype=np.int32)[None], (N_CELLS, 1))
    return {
        "counts": counts, "genes": genes_full, "library_size": lib,
        "counts_subset": counts_sub, "genes_subset": genes_sub,
    }


def batch_order(n_train: int, steps: int, seed: int = 1):
    """One shared shuffled index stream both frameworks consume identically."""
    rng = np.random.default_rng(seed)
    idx = []
    while len(idx) * 1 < steps:
        perm = rng.permutation(n_train)
        idx.extend(perm[i : i + B] for i in range(0, n_train - B + 1, B))
    return idx[:steps]


def slice_batch(data, rows):
    return {k: v[rows] for k, v in data.items()}


# -- torch side ----------------------------------------------------------------
def run_torch(data, order, steps, log_every):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(0)
    torch.set_num_threads(max(os.cpu_count() // 2, 1))

    class MLP(nn.Module):
        def __init__(self, e, multiple_of=4):
            super().__init__()
            h = int(2 * e * 4 / 3)
            h = multiple_of * ((h + multiple_of - 1) // multiple_of)
            self.w1 = nn.Linear(e, h, bias=False)
            self.w2 = nn.Linear(e, h, bias=False)
            self.c_proj = nn.Linear(h, e, bias=False)

        def forward(self, x):
            return self.c_proj(F.silu(self.w1(x)) * self.w2(x))

    def attn(q, k, v, n_head):
        Bq, M, D = q.shape
        Sk = k.shape[1]
        q = q.view(Bq, M, n_head, D // n_head).transpose(1, 2)
        k = k.view(Bq, Sk, n_head, D // n_head).transpose(1, 2)
        v = v.view(Bq, Sk, n_head, D // n_head).transpose(1, 2)
        return (
            F.scaled_dot_product_attention(q, k, v).transpose(1, 2).reshape(Bq, M, D)
        )

    class SelfAttention(nn.Module):
        def __init__(self, e, n_head):
            super().__init__()
            self.n_head = n_head
            self.c_attn = nn.Linear(e, 3 * e, bias=False)
            self.c_proj = nn.Linear(e, e, bias=False)

        def forward(self, x):
            q, k, v = self.c_attn(x).chunk(3, dim=-1)
            return self.c_proj(attn(q, k, v, self.n_head))

    class CrossAttention(nn.Module):
        def __init__(self, e, n_head):
            super().__init__()
            self.n_head = n_head
            self.c_attn = nn.Linear(e, 2 * e, bias=False)
            self.c_attn_q = nn.Linear(e, e, bias=False)
            self.c_proj = nn.Linear(e, e, bias=False)

        def forward(self, x, q):
            k, v = self.c_attn(x).chunk(2, dim=-1)
            return self.c_proj(attn(self.c_attn_q(q), k, v, self.n_head))

    class Block(nn.Module):
        def __init__(self, e, n_head):
            super().__init__()
            self.ln_1 = nn.LayerNorm(e, eps=EPS_LN)
            self.ln_2 = nn.LayerNorm(e, eps=EPS_LN)
            self.attn = SelfAttention(e, n_head)
            self.mlp = MLP(e)

        def forward(self, x):
            x = x + self.attn(self.ln_1(x))
            return x + self.mlp(self.ln_2(x))

    class CrossAttentionBlock(nn.Module):
        def __init__(self, e, n_inducing, n_head):
            super().__init__()
            self.inducing_points = (
                nn.Parameter(torch.randn(n_inducing, e)) if n_inducing else None
            )
            self.ln_1 = nn.LayerNorm(e, eps=EPS_LN)
            self.ln_1q = nn.LayerNorm(e, eps=EPS_LN)
            self.ln_2 = nn.LayerNorm(e, eps=EPS_LN)
            self.attn = CrossAttention(e, n_head)
            self.mlp = MLP(e)

        def forward(self, x, q=None):
            if q is None:
                q = self.inducing_points.expand(x.shape[0], -1, -1)
            out = q + self.attn(self.ln_1(x), self.ln_1q(q))
            return out + self.mlp(self.ln_2(out))

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.ca_layer = CrossAttentionBlock(E, N_IND, N_HEAD_X)
            self.pos_embed = nn.Parameter(
                torch.zeros(1, N_IND, E), requires_grad=False
            )
            self.encoder_layers = nn.ModuleList(
                [Block(E, N_HEAD) for _ in range(N_LAYER)]
            )
            self.encoder_latent_input = nn.Sequential(
                nn.Linear(E, E_LAT, bias=False),
                nn.LayerNorm(E_LAT, eps=EPS_LN, elementwise_affine=False),
            )

        def forward(self, x):
            x = self.ca_layer(x)
            x = x + self.pos_embed
            for layer in self.encoder_layers:
                x = layer(x)
            return self.encoder_latent_input(x)

    class Decoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.decoder_latent_input = nn.Sequential(
                nn.LayerNorm(E_LAT, eps=EPS_LN, elementwise_affine=False),
                nn.Linear(E_LAT, E, bias=False),
            )
            self.decoder_layers = nn.ModuleList(
                [Block(E, N_HEAD) for _ in range(N_LAYER)]
            )
            self.decoder_cross_attention = CrossAttentionBlock(E, 0, N_HEAD_X)

        def forward(self, x, q):
            x = self.decoder_latent_input(x)
            for layer in self.decoder_layers:
                x = layer(x)
            return self.decoder_cross_attention(x, q)

    class VAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.input_layer = nn.Module()
            self.input_layer.gene_embedding = nn.Embedding(G + 1, E)
            self.encoder = Encoder()
            self.decoder = Decoder()
            self.decoder_head = nn.Module()
            self.decoder_head.params = nn.Linear(E, 1, bias=True)
            self.decoder_head.theta = nn.Embedding(G + 1, 1)
            nn.init.ones_(self.decoder_head.theta.weight)

        def forward(self, counts, genes, lib, c_sub, g_sub):
            emb = self.input_layer.gene_embedding(g_sub) * torch.log1p(
                c_sub
            ).unsqueeze(-1)
            h_z = self.encoder(emb)
            q = self.input_layer.gene_embedding(genes)
            h_x = self.decoder(h_z, q)
            mu = self.decoder_head.params(h_x).squeeze(-1)
            theta = torch.exp(self.decoder_head.theta(genes)).squeeze(-1)
            mu = F.softmax(mu, dim=1) * lib
            return mu, theta, h_z

    def log_nb_positive(x, mu, theta, eps=1e-8):
        log_theta_mu_eps = torch.log(theta + mu + eps)
        return (
            theta * (torch.log(theta + eps) - log_theta_mu_eps)
            + x * (torch.log(mu + eps) - log_theta_mu_eps)
            + torch.lgamma(x + theta)
            - torch.lgamma(theta)
            - torch.lgamma(x + 1.0)
        )

    model = VAE()
    init_sd = {k: v.clone() for k, v in model.state_dict().items()}
    opt = torch.optim.AdamW(
        model.parameters(), lr=LR, betas=BETAS, eps=EPS_OPT, weight_decay=WD
    )

    def to_t(b):
        return (
            torch.from_numpy(b["counts"]),
            torch.from_numpy(b["genes"]).long(),
            torch.from_numpy(b["library_size"]),
            torch.from_numpy(b["counts_subset"]),
            torch.from_numpy(b["genes_subset"]).long(),
        )

    def loss_fn(b):
        counts, genes, lib, c_sub, g_sub = to_t(b)
        mu, theta, _ = model(counts, genes, lib, c_sub, g_sub)
        return -log_nb_positive(counts, mu, theta).sum(1).mean()

    traj = []
    t0 = time.perf_counter()
    for step, rows in enumerate(order[:steps]):
        opt.zero_grad()
        loss = loss_fn(slice_batch(data, rows))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        opt.step()
        if step % log_every == 0 or step == steps - 1:
            traj.append((step, float(loss.detach())))
    train_s = time.perf_counter() - t0

    # held-out eval
    val = slice_batch(data, np.arange(N_CELLS - N_VAL, N_CELLS))
    with torch.no_grad():
        counts, genes, lib, c_sub, g_sub = to_t(val)
        mu, theta, _ = model(counts, genes, lib, c_sub, g_sub)
        nll = float(-log_nb_positive(counts, mu, theta).sum(1).mean())
        mu_np, c_np = mu.numpy(), counts.numpy()
    return {
        "trajectory": traj,
        "val_nll": nll,
        "val_pcc": pcc(mu_np, c_np),
        "val_zeros_acc": zeros_acc(mu_np, c_np),
        "train_seconds": round(train_s, 1),
        "init_state_dict": init_sd,
    }


# -- shared eval metrics ---------------------------------------------------------
def pcc(mu, counts):
    a, b = mu.ravel(), counts.ravel()
    a = a - a.mean()
    b = b - b.mean()
    return float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def zeros_acc(mu, counts):
    return float(((mu < 0.5) == (counts == 0)).mean())


# -- jax side ----------------------------------------------------------------
def run_jax(data, order, steps, log_every, init_sd):
    import jax
    import jax.numpy as jnp
    import optax

    from scldm_tpu.nn.vae import build_transformer_vae
    from scldm_tpu.ops.distributions import log_nb_positive
    from scldm_tpu.training.optim import adamw_legacy, clip_by_global_norm
    from scldm_tpu.utils.torch_import import import_torch_state_dict

    model = build_transformer_vae(
        n_genes=G, n_embed=E, n_embed_latent=E_LAT, n_layer=N_LAYER,
        n_inducing_points=N_IND, n_head=N_HEAD, n_head_cross=N_HEAD_X,
    )
    b0 = slice_batch(data, order[0])
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b0["counts"]), jnp.asarray(b0["genes"]),
        jnp.asarray(b0["library_size"]), jnp.asarray(b0["counts_subset"]),
        jnp.asarray(b0["genes_subset"]),
    )
    params = import_torch_state_dict(init_sd, template, strict=True)

    tx = optax.chain(
        clip_by_global_norm(CLIP),
        adamw_legacy(LR, betas=BETAS, eps=EPS_OPT, weight_decay=WD),
    )
    opt_state = tx.init(params)

    def loss_fn(p, b):
        out, _ = model.apply(
            p, b["counts"], b["genes"], b["library_size"],
            b["counts_subset"], b["genes_subset"],
        )
        return -log_nb_positive(b["counts"], out["mu"], out["theta"]).sum(1).mean()

    @jax.jit
    def train_step(p, s, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    traj = []
    t0 = time.perf_counter()
    for step, rows in enumerate(order[:steps]):
        b = {k: jnp.asarray(v) for k, v in slice_batch(data, rows).items()}
        params, opt_state, loss = train_step(params, opt_state, b)
        if step % log_every == 0 or step == steps - 1:
            traj.append((step, float(loss)))
    train_s = time.perf_counter() - t0

    val = slice_batch(data, np.arange(N_CELLS - N_VAL, N_CELLS))
    out, _ = jax.jit(
        lambda p, b: model.apply(
            p, b["counts"], b["genes"], b["library_size"],
            b["counts_subset"], b["genes_subset"],
        )
    )(params, {k: jnp.asarray(v) for k, v in val.items()})
    nll = float(
        -log_nb_positive(
            jnp.asarray(val["counts"]), out["mu"], out["theta"]
        ).sum(1).mean()
    )
    mu_np = np.asarray(out["mu"])
    return {
        "trajectory": traj,
        "val_nll": nll,
        "val_pcc": pcc(mu_np, val["counts"]),
        "val_zeros_acc": zeros_acc(mu_np, val["counts"]),
        "train_seconds": round(train_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--out", default=str(Path(__file__).parent.parent / "PARITY_QUALITY.json"))
    args = ap.parse_args()

    data = make_dataset()
    n_train = N_CELLS - N_VAL
    order = batch_order(n_train, args.steps)

    t = run_torch(data, order, args.steps, args.log_every)
    init_sd = t.pop("init_state_dict")
    j = run_jax(data, order, args.steps, args.log_every, init_sd)

    gaps = [
        (s1, abs(l1 - l2) / max(abs(l1), 1e-9))
        for (s1, l1), (_, l2) in zip(t["trajectory"], j["trajectory"])
    ]
    report = {
        "config": {
            "genes": G, "subset": S, "batch": B, "n_embed": E,
            "n_layer": N_LAYER, "steps": args.steps, "lr": LR,
            "weight_decay": WD, "betas": BETAS, "grad_clip": CLIP,
            "identical_init": True, "identical_data_order": True,
            "dtype": "float32/cpu both frameworks",
        },
        "torch_reference": {k: t[k] for k in
                            ("trajectory", "val_nll", "val_pcc", "val_zeros_acc", "train_seconds")},
        "jax_ours": j,
        "rel_loss_gap_by_step": gaps,
        "max_rel_loss_gap": max(g for _, g in gaps),
        "final_rel_loss_gap": gaps[-1][1],
        "val_nll_rel_gap": abs(t["val_nll"] - j["val_nll"]) / abs(t["val_nll"]),
    }
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps({
        "metric": "parity_final_rel_loss_gap",
        "value": round(report["final_rel_loss_gap"], 5),
        "unit": "fraction",
        "vs_baseline": None,
        "torch_val_nll": round(t["val_nll"], 3),
        "jax_val_nll": round(j["val_nll"], 3),
        "max_rel_loss_gap": round(report["max_rel_loss_gap"], 5),
    }))


if __name__ == "__main__":
    main()
