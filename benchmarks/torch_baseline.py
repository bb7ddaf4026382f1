"""PyTorch baseline proxy for bench.py.

The reference publishes no throughput numbers (BASELINE.md), so the baseline is
measured: this is an independent PyTorch implementation of the same
architecture (MCAB set-VAE with shared gene embedding + shared-theta NB head,
matching experiments/configs/model/vae_base.yaml defaults) driven for a few
train steps on this host's CPU torch build. It is NOT copied from the
reference — it exists so `vs_baseline` in bench output is a measured ratio.
"""

from __future__ import annotations

import math
import time

import numpy as np


def measure_torch_cells_per_sec(
    batch: int,
    n_genes: int,
    seq_len: int,
    n_embed: int = 32,
    n_latent: int = 16,
    n_layer: int = 8,
    n_inducing: int = 16,
    n_head: int = 8,
    n_head_cross: int = 4,
    steps: int = 3,
    threads: int | None = None,
) -> float:
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    if threads:
        torch.set_num_threads(threads)

    class MLP(nn.Module):
        def __init__(self, e):
            super().__init__()
            h = 4 * ((int(2 * e * 4 / 3) + 3) // 4)
            self.w1, self.w2 = nn.Linear(e, h, bias=False), nn.Linear(e, h, bias=False)
            self.proj = nn.Linear(h, e, bias=False)

        def forward(self, x):
            return self.proj(F.silu(self.w1(x)) * self.w2(x))

    def attn(q, k, v, h):
        B, M, E = q.shape
        S = k.shape[1]
        q = q.view(B, M, h, E // h).transpose(1, 2)
        k = k.view(B, S, h, E // h).transpose(1, 2)
        v = v.view(B, S, h, E // h).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        return o.transpose(1, 2).reshape(B, M, E)

    class SelfBlock(nn.Module):
        def __init__(self, e, h):
            super().__init__()
            self.h = h
            self.ln1, self.ln2 = nn.LayerNorm(e), nn.LayerNorm(e)
            self.qkv = nn.Linear(e, 3 * e, bias=False)
            self.proj = nn.Linear(e, e, bias=False)
            self.mlp = MLP(e)

        def forward(self, x):
            q, k, v = self.qkv(self.ln1(x)).chunk(3, -1)
            x = x + self.proj(attn(q, k, v, self.h))
            return x + self.mlp(self.ln2(x))

    class CrossBlock(nn.Module):
        def __init__(self, e, h, n_ind):
            super().__init__()
            self.h = h
            self.ind = nn.Parameter(torch.randn(n_ind, e)) if n_ind else None
            self.ln1, self.ln1q, self.ln2 = nn.LayerNorm(e), nn.LayerNorm(e), nn.LayerNorm(e)
            self.kv = nn.Linear(e, 2 * e, bias=False)
            self.q = nn.Linear(e, e, bias=False)
            self.proj = nn.Linear(e, e, bias=False)
            self.mlp = MLP(e)

        def forward(self, x, q=None):
            if q is None:
                q = self.ind.expand(x.shape[0], -1, -1)
            k, v = self.kv(self.ln1(x)).chunk(2, -1)
            out = q + self.proj(attn(self.q(self.ln1q(q)), k, v, self.h))
            return out + self.mlp(self.ln2(out))

    class SetVAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(n_genes + 1, n_embed)
            self.pool = CrossBlock(n_embed, n_head_cross, n_inducing)
            self.enc = nn.ModuleList([SelfBlock(n_embed, n_head) for _ in range(n_layer)])
            self.to_lat = nn.Linear(n_embed, n_latent, bias=False)
            self.lat_ln = nn.LayerNorm(n_latent, elementwise_affine=False)
            self.from_lat = nn.Linear(n_latent, n_embed, bias=False)
            self.dec = nn.ModuleList([SelfBlock(n_embed, n_head) for _ in range(n_layer)])
            self.unpool = CrossBlock(n_embed, n_head_cross, 0)
            self.mu_head = nn.Linear(n_embed, 1)
            self.theta = nn.Embedding(n_genes + 1, 1)

        def forward(self, counts, genes, lib, c_sub, g_sub):
            x = self.emb(g_sub) * torch.log1p(c_sub).unsqueeze(-1)
            x = self.pool(x)
            for b in self.enc:
                x = b(x)
            z = self.lat_ln(self.to_lat(x))
            y = self.from_lat(z)
            for b in self.dec:
                y = b(y)
            h = self.unpool(y, self.emb(genes))
            mu = F.softmax(self.mu_head(h).squeeze(-1), dim=1) * lib
            theta = torch.exp(self.theta(genes).squeeze(-1))
            eps = 1e-8
            lt = torch.log(theta + mu + eps)
            ll = (
                theta * (torch.log(theta + eps) - lt)
                + counts * (torch.log(mu + eps) - lt)
                + torch.lgamma(counts + theta)
                - torch.lgamma(theta)
                - torch.lgamma(counts + 1)
            )
            return -ll.sum(1).mean()

    torch.manual_seed(0)
    model = SetVAE()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=0.0)
    rng = np.random.default_rng(0)
    counts = torch.tensor(rng.poisson(1.2, size=(batch, n_genes)).astype(np.float32))
    genes = torch.arange(1, n_genes + 1).expand(batch, -1)
    lib = counts.sum(1, keepdim=True)
    c_sub = counts[:, :seq_len].contiguous()
    g_sub = genes[:, :seq_len].contiguous()

    def step():
        opt.zero_grad(set_to_none=True)
        loss = model(counts, genes, lib, c_sub, g_sub)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return batch * steps / dt
