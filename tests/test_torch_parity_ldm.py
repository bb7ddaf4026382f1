"""Numerical parity of the full LDM chain vs a PyTorch mirror of the
reference DiT (nnets.py:216-492) — denoiser forward, both CFG strategies, and
the Euler ODE sampler over the velocity transport (transport/transport.py:324-369,
integrators.py:79-130 in the reference).

Like tests/test_torch_parity.py this builds an independent torch module
hierarchy with the reference's exact parameter names, imports its state_dict
via utils.torch_import, and checks the JAX programs reproduce the torch math —
validating that released reference LDM checkpoints (download_artifacts.py)
would sample identically on TPU.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from scldm_tpu.nn.layers import get_1d_sincos_pos_embed
from scldm_tpu.nn.nnets import DiT
from scldm_tpu.transport import Sampler, create_transport
from scldm_tpu.utils.torch_import import import_torch_state_dict

E, E_IN, N_LAYER, N_HEAD, SEQ, B = 32, 8, 2, 4, 6, 4
VOCAB = {"cell_type": 5, "tissue": 3}
EPS = 1e-8


@pytest.fixture(autouse=True)
def _exact_matmuls():
    """This host's XLA:CPU computes default-precision f32 dots in a reduced
    (bf16-class) mode (~0.2% error) — force exact f32 so the comparison
    measures semantics, not backend fast-math."""
    with jax.default_matmul_precision("highest"):
        yield


def modulate(x, shift, scale):
    return x * (1 + scale) + shift


class TorchMLP(nn.Module):
    def __init__(self, e, multiple_of=4):
        super().__init__()
        h = int(2 * e * 4 / 3)
        h = multiple_of * ((h + multiple_of - 1) // multiple_of)
        self.w1 = nn.Linear(e, h, bias=False)
        self.w2 = nn.Linear(e, h, bias=False)
        self.c_proj = nn.Linear(h, e, bias=False)

    def forward(self, x):
        return self.c_proj(F.silu(self.w1(x)) * self.w2(x))


class TorchSelfAttention(nn.Module):
    def __init__(self, e, n_head, bias=True):
        super().__init__()
        self.n_head = n_head
        self.c_attn = nn.Linear(e, 3 * e, bias=bias)
        self.c_proj = nn.Linear(e, e, bias=bias)

    def forward(self, x):
        Bq, S, D = x.shape
        q, k, v = self.c_attn(x).chunk(3, dim=-1)
        q = q.view(Bq, S, self.n_head, D // self.n_head).transpose(1, 2)
        k = k.view(Bq, S, self.n_head, D // self.n_head).transpose(1, 2)
        v = v.view(Bq, S, self.n_head, D // self.n_head).transpose(1, 2)
        y = F.scaled_dot_product_attention(q, k, v)
        return self.c_proj(y.transpose(1, 2).reshape(Bq, S, D))


class TorchDiTBlock(nn.Module):
    """Reference Block with use_adaln=True, elementwise_affine=False
    (layers.py:121-216)."""

    def __init__(self, e, n_head):
        super().__init__()
        self.ln_1 = nn.LayerNorm(e, eps=EPS, elementwise_affine=False)
        self.ln_2 = nn.LayerNorm(e, eps=EPS, elementwise_affine=False)
        self.attn = TorchSelfAttention(e, n_head)
        self.mlp = TorchMLP(e)
        self.adaln_modulation = nn.Sequential(nn.SiLU(), nn.Linear(e, 6 * e, bias=True))

    def forward(self, x, condition):
        sa, sca, ga, sm, scm, gm = self.adaln_modulation(condition).chunk(6, dim=-1)
        x = x + ga * self.attn(modulate(self.ln_1(x), sca, sa))
        return x + gm * self.mlp(modulate(self.ln_2(x), scm, sm))


class TorchTimestepEmbedder(nn.Module):
    def __init__(self, hidden, freq=256):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(freq, hidden), nn.SiLU(), nn.Linear(hidden, hidden)
        )
        self.freq = freq

    def forward(self, t):
        half = self.freq // 2
        freqs = torch.exp(
            -math.log(10_000) * torch.arange(half, dtype=torch.float32) / half
        )
        args = t[:, None].float() * freqs[None]
        emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        return self.mlp(emb)


class TorchFinalLayerDit(nn.Module):
    def __init__(self, e, e_in):
        super().__init__()
        self.norm_final = nn.LayerNorm(e, eps=EPS, elementwise_affine=False)
        self.linear = nn.Linear(e, e_in, bias=True)
        self.adaln_modulation = nn.Sequential(nn.SiLU(), nn.Linear(e, 2 * e, bias=True))

    def forward(self, x, c):
        shift, scale = self.adaln_modulation(c).chunk(2, dim=-1)
        return self.linear(modulate(self.norm_final(x), shift, scale))


class TorchDiT(nn.Module):
    """Mirror of reference DiT (nnets.py:216-344) with its parameter names."""

    def __init__(self, condition_strategy="joint"):
        super().__init__()
        self.class_vocab_sizes = VOCAB
        self.condition_strategy = condition_strategy
        self.class_embeddings = nn.ModuleDict(
            {n: nn.Embedding(v + 1, E) for n, v in VOCAB.items()}
        )
        self.t_embedder = TorchTimestepEmbedder(E)
        pos = get_1d_sincos_pos_embed(E, SEQ)
        self.pos_embed = nn.Parameter(
            torch.from_numpy(pos).float().unsqueeze(0), requires_grad=False
        )
        self.blocks = nn.ModuleList([TorchDiTBlock(E, N_HEAD) for _ in range(N_LAYER)])
        self.input_proj = nn.Linear(E_IN, E, bias=True)
        self.final_layer = TorchFinalLayerDit(E, E_IN)

    def _condition_embedding(self, condition, batch):
        """Eval-time embedding (force_drop_ids=False): available classes use
        their values, missing classes the null token — identical for both
        strategies when a single forward is deterministic (reference
        nnets.py:389-456 with no dropout and one available class or joint)."""
        emb = 0.0
        for name in sorted(VOCAB.keys()):
            vals = condition.get(
                name, torch.full((batch,), VOCAB[name], dtype=torch.long)
            )
            emb = emb + self.class_embeddings[name](vals)
        return emb.unsqueeze(1)

    def forward(self, x, t, condition):
        c = self.t_embedder(t).unsqueeze(1) + self._condition_embedding(
            condition, x.shape[0]
        )
        x = self.input_proj(x) + self.pos_embed
        for block in self.blocks:
            x = block(x, c)
        return self.final_layer(x, c)


def _randomize(m: nn.Module):
    """Non-degenerate weights: reference init zeroes adaLN + final layers,
    which would make parity trivial. pos_embed stays frozen sincos (the jax
    DiT holds it as a constant, reference nnets.py:471-473)."""
    g = torch.Generator().manual_seed(7)
    for name, p in m.named_parameters():
        if name == "pos_embed":
            continue
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
    return m


@pytest.fixture(scope="module", params=["joint", "mutually_exclusive"])
def models(request):
    strategy = request.param
    tmodel = _randomize(TorchDiT(strategy)).eval()
    jmodel = DiT(
        n_embed=E, n_embed_input=E_IN, n_layer=N_LAYER, n_head=N_HEAD,
        seq_len=SEQ, class_vocab_sizes=VOCAB, condition_strategy=strategy,
        layernorm_eps=EPS,
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, SEQ, E_IN)), jnp.float32)
    t = jnp.asarray(np.linspace(0.1, 0.9, B), jnp.float32)
    cond = {
        "cell_type": jnp.asarray([0, 1, 2, 3], jnp.int32),
        "tissue": jnp.asarray([0, 1, 2, 0], jnp.int32),
    }
    template = jmodel.init(jax.random.PRNGKey(0), x, t, cond, force_drop_ids=False)
    params = import_torch_state_dict(tmodel.state_dict(), template, strict=True)
    return strategy, tmodel, jmodel, params, (x, t, cond)


def _torch_inputs(x, t, cond):
    return (
        torch.from_numpy(np.asarray(x)),
        torch.from_numpy(np.asarray(t)),
        {k: torch.from_numpy(np.asarray(v)).long() for k, v in cond.items()},
    )


class TestDiTParity:
    def test_forward_matches(self, models):
        strategy, tmodel, jmodel, params, (x, t, cond) = models
        # deterministic eval forward: joint uses both classes; mutually-
        # exclusive is deterministic only with a single available class
        use_cond = cond if strategy == "joint" else {"cell_type": cond["cell_type"]}
        xt, tt, ct = _torch_inputs(x, t, use_cond)
        with torch.no_grad():
            out_t = tmodel(xt, tt, ct)
        out_j = jmodel.apply(params, x, t, use_cond, force_drop_ids=False)
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), rtol=2e-4, atol=2e-4)

    def test_unconditional_forward_matches(self, models):
        _, tmodel, jmodel, params, (x, t, _) = models
        null_cond = {n: jnp.full((B,), v, jnp.int32) for n, v in VOCAB.items()}
        xt, tt, ct = _torch_inputs(x, t, null_cond)
        with torch.no_grad():
            out_t = tmodel(xt, tt, ct)
        out_j = jmodel.apply(params, x, t, null_cond, force_drop_ids=False)
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), rtol=2e-4, atol=2e-4)

    def _torch_cfg(self, strategy, tmodel, x, t, cond, cfg_scale):
        """Reference CFG semantics (nnets.py:299-378): doubled batch, first
        half unconditional; guidance on the second half."""
        xt, tt, ct = _torch_inputs(x, t, cond)
        half = xt.shape[0] // 2
        null = {
            n: torch.full((xt.shape[0],), v, dtype=torch.long) for n, v in VOCAB.items()
        }
        with torch.no_grad():
            uncond = tmodel(xt, tt, null)
            base = uncond[half:]
            guided = base.clone()
            if strategy == "joint":
                cond_pred = tmodel(
                    xt[half:], tt[half:], {k: v[half:] for k, v in ct.items()}
                )
                avg = sum(cfg_scale.values()) / len(cfg_scale)
                guided = guided + avg * (cond_pred - base)
            else:
                for name in sorted(cfg_scale.keys()):
                    cond_pred = tmodel(
                        xt[half:], tt[half:], {name: ct[name][half:]}
                    )
                    guided = guided + cfg_scale[name] * (cond_pred - base)
        return torch.cat([uncond[:half], guided]).numpy()

    def test_forward_with_cfg_matches(self, models):
        strategy, tmodel, jmodel, params, (x, t, cond) = models
        cfg = {"cell_type": 2.0, "tissue": 1.3}
        ref = self._torch_cfg(strategy, tmodel, x, t, cond, cfg)
        out = jmodel.apply(
            params, x, t, cond, cfg, method="forward_with_cfg"
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=3e-4)

    def test_forward_with_cfg_batched_matches(self, models):
        strategy, tmodel, jmodel, params, (x, t, cond) = models
        cfg = {"cell_type": 2.0, "tissue": 1.3}
        ref = self._torch_cfg(strategy, tmodel, x, t, cond, cfg)
        out = jmodel.apply(
            params, x, t, cond, cfg, method="forward_with_cfg_batched"
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=3e-4)


class TestSamplerParity:
    def test_euler_ode_matches_torch_loop(self, models):
        """Full velocity-ODE chain: my Sampler.sample_ode(euler) vs an
        independent torch Euler loop over linspace(t0=0, t1=1, N) — the
        reference's fixed-grid torchdiffeq contract (integrators.py:98-113,
        check_interval t0=0/t1=1 for velocity ODE, transport.py:77-95)."""
        strategy, tmodel, jmodel, params, (x, _, cond) = models
        cfg = {"cell_type": 1.8, "tissue": 1.8}
        sampler = Sampler(create_transport())
        sample_fn = sampler.sample_ode(sampling_method="euler", num_steps=9)

        def model_fn(z, t, **kw):
            return jmodel.apply(
                params, z, t, cond, cfg, method="forward_with_cfg_batched"
            )

        out_j = np.asarray(sample_fn(x, model_fn))

        ts = np.linspace(0.0, 1.0, 9)
        z = torch.from_numpy(np.asarray(x))
        helper = TestDiTParity()
        for k in range(len(ts) - 1):
            t_vec = jnp.full((B,), ts[k], jnp.float32)
            v = helper._torch_cfg(
                strategy, tmodel, jnp.asarray(z.numpy()), t_vec, cond, cfg
            )
            z = z + torch.from_numpy(v) * (ts[k + 1] - ts[k])
        np.testing.assert_allclose(out_j, z.numpy(), rtol=2e-3, atol=2e-3)

    def test_trajectory_endpoints(self, models):
        """return_trajectory contract: [0] is the initial state, [-1] the
        sample (reference models.py:812 takes [-1])."""
        _, _, jmodel, params, (x, _, cond) = models
        sampler = Sampler(create_transport())
        fn = sampler.sample_ode(
            sampling_method="euler", num_steps=5, return_trajectory=True
        )

        def model_fn(z, t, **kw):
            return jmodel.apply(params, z, t, cond, force_drop_ids=False)

        traj = fn(x, model_fn)
        assert traj.shape[0] == 5
        np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(x), rtol=1e-6)
        final = sampler.sample_ode(sampling_method="euler", num_steps=5)(x, model_fn)
        np.testing.assert_allclose(
            np.asarray(traj[-1]), np.asarray(final), rtol=1e-5, atol=1e-6
        )
