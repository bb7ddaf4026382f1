"""SiT flow-matching transport: training losses + sampling closures.

Behavioral parity with reference src/scldm/transport/transport.py:13-430, with
explicit JAX rng threading instead of torch's global generator, and samplers
that compile to single XLA programs (scan / while_loop) instead of Python step
loops.
"""

from __future__ import annotations

import enum
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from scldm_tpu.transport import path as path_mod
from scldm_tpu.transport.integrators import (
    _odeint_fixed_tree,
    odeint_dopri5,
    odeint_euler,
    odeint_heun,
    sdeint,
)

ModelFn = Callable[..., jax.Array]  # model(x, t, **kwargs) -> prediction


class ModelType(enum.Enum):
    NOISE = enum.auto()
    SCORE = enum.auto()
    VELOCITY = enum.auto()


class PathType(enum.Enum):
    LINEAR = enum.auto()
    GVP = enum.auto()
    VP = enum.auto()


class WeightType(enum.Enum):
    NONE = enum.auto()
    VELOCITY = enum.auto()
    LIKELIHOOD = enum.auto()


def mean_flat(x: jax.Array) -> jax.Array:
    """Mean over all non-batch dimensions (reference transport/utils.py:15-17)."""
    return x.reshape(x.shape[0], -1).mean(axis=1)


class Transport:
    """Flow-matching loss + parameterization conversions (transport.py:37-202)."""

    def __init__(self, *, model_type, path_type, loss_type, train_eps, sample_eps):
        path_options = {
            PathType.LINEAR: path_mod.ICPlan,
            PathType.GVP: path_mod.GVPCPlan,
            PathType.VP: path_mod.VPCPlan,
        }
        self.loss_type = loss_type
        self.model_type = model_type
        self.path_type = path_type
        self.path_sampler = path_options[path_type]()
        self.train_eps = train_eps
        self.sample_eps = sample_eps

    # -- intervals (transport.py:69-95) -------------------------------------
    def check_interval(
        self,
        train_eps,
        sample_eps,
        *,
        diffusion_form="SBDM",
        sde=False,
        reverse=False,
        eval=False,
        last_step_size=0.0,
    ):
        t0, t1 = 0.0, 1.0
        eps = train_eps if not eval else sample_eps
        if isinstance(self.path_sampler, path_mod.VPCPlan):
            t1 = 1.0 - eps if (not sde or last_step_size == 0) else 1.0 - last_step_size
        elif isinstance(self.path_sampler, (path_mod.ICPlan, path_mod.GVPCPlan)) and (
            self.model_type != ModelType.VELOCITY or sde
        ):
            t0 = (
                eps
                if (diffusion_form == "SBDM" and sde) or self.model_type != ModelType.VELOCITY
                else 0.0
            )
            t1 = 1.0 - eps if (not sde or last_step_size == 0) else 1.0 - last_step_size
        if reverse:
            t0, t1 = 1.0 - t0, 1.0 - t1
        return t0, t1

    # -- prior (transport.py:59-67) ------------------------------------------
    def prior_logp(self, z: jax.Array) -> jax.Array:
        n = jnp.prod(jnp.asarray(z.shape[1:]))
        flat = z.reshape(z.shape[0], -1)
        return -n / 2.0 * jnp.log(2.0 * jnp.pi) - jnp.sum(flat**2, axis=1) / 2.0

    # -- sampling t, x0 (transport.py:97-108) ---------------------------------
    def sample(self, rng: jax.Array, x1: jax.Array):
        k0, kt = jax.random.split(rng)
        x0 = jax.random.normal(k0, x1.shape, x1.dtype)
        t0, t1 = self.check_interval(self.train_eps, self.sample_eps)
        t = jax.random.uniform(kt, (x1.shape[0],), jnp.float32) * (t1 - t0) + t0
        return t, x0, x1

    # -- training loss (transport.py:110-150) ---------------------------------
    def training_losses(
        self,
        model: ModelFn,
        rng: jax.Array,
        x1: jax.Array,
        model_kwargs: Dict[str, Any] | None = None,
    ) -> Dict[str, jax.Array]:
        """Per-sample flow-matching loss. `model` is called as model(xt, t, **kwargs)."""
        if model_kwargs is None:
            model_kwargs = {}
        t, x0, x1 = self.sample(rng, x1)
        t, xt, ut = self.path_sampler.plan(t, x0, x1)
        model_output = model(xt, t, **model_kwargs)
        assert model_output.shape == xt.shape

        terms: Dict[str, jax.Array] = {"pred": model_output}
        if self.model_type == ModelType.VELOCITY:
            terms["loss"] = mean_flat((model_output - ut) ** 2)
        else:
            _, drift_var = self.path_sampler.compute_drift(xt, t)
            sigma_t, _ = self.path_sampler.compute_sigma_t(path_mod.expand_t_like_x(t, xt))
            if self.loss_type == WeightType.VELOCITY:
                weight = (drift_var / sigma_t) ** 2
            elif self.loss_type == WeightType.LIKELIHOOD:
                weight = drift_var / (sigma_t**2)
            elif self.loss_type == WeightType.NONE:
                weight = 1.0
            else:
                raise NotImplementedError(self.loss_type)
            if self.model_type == ModelType.NOISE:
                terms["loss"] = mean_flat(weight * (model_output - x0) ** 2)
            else:
                terms["loss"] = mean_flat(weight * (model_output * sigma_t + x0) ** 2)
        return terms

    # -- drift / score closures (transport.py:152-202) ------------------------
    def get_drift(self):
        def score_ode(x, t, model, **kwargs):
            drift_mean, drift_var = self.path_sampler.compute_drift(x, t)
            return -drift_mean + drift_var * model(x, t, **kwargs)

        def noise_ode(x, t, model, **kwargs):
            drift_mean, drift_var = self.path_sampler.compute_drift(x, t)
            sigma_t, _ = self.path_sampler.compute_sigma_t(path_mod.expand_t_like_x(t, x))
            score = model(x, t, **kwargs) / -sigma_t
            return -drift_mean + drift_var * score

        def velocity_ode(x, t, model, **kwargs):
            return model(x, t, **kwargs)

        drift_fn = {
            ModelType.NOISE: noise_ode,
            ModelType.SCORE: score_ode,
            ModelType.VELOCITY: velocity_ode,
        }[self.model_type]

        def body_fn(x, t, model, **kwargs):
            out = drift_fn(x, t, model, **kwargs)
            assert out.shape == x.shape
            return out

        return body_fn

    def get_score(self):
        if self.model_type == ModelType.NOISE:
            return lambda x, t, model, **kw: model(x, t, **kw) / -self.path_sampler.compute_sigma_t(
                path_mod.expand_t_like_x(t, x)
            )[0]
        if self.model_type == ModelType.SCORE:
            return lambda x, t, model, **kw: model(x, t, **kw)
        if self.model_type == ModelType.VELOCITY:
            return lambda x, t, model, **kw: self.path_sampler.get_score_from_velocity(
                model(x, t, **kw), x, t
            )
        raise NotImplementedError(self.model_type)


class Sampler:
    """ODE/SDE sampling closures (transport.py:205-430), compiled-loop edition.

    Every returned `sample_fn` is a pure function `(init, model, **model_kwargs)
    -> final_state` suitable for wrapping in `jax.jit`.
    """

    def __init__(self, transport: Transport):
        self.transport = transport
        self.drift = transport.get_drift()
        self.score = transport.get_score()

    def _sde_pieces(self, diffusion_form="SBDM", diffusion_norm=1.0):
        def diffusion_fn(x, t):
            return self.transport.path_sampler.compute_diffusion(
                x, t, form=diffusion_form, norm=diffusion_norm
            )

        def sde_drift(x, t, model, **kwargs):
            return self.drift(x, t, model, **kwargs) + diffusion_fn(x, t) * self.score(
                x, t, model, **kwargs
            )

        return sde_drift, diffusion_fn

    def _last_step_fn(self, sde_drift, *, last_step, last_step_size):
        """Deterministic final correction step (transport.py:240-267)."""
        if last_step is None:
            return lambda x, t, model, **kw: x
        if last_step == "Mean":
            return lambda x, t, model, **kw: x + sde_drift(x, t, model, **kw) * last_step_size
        if last_step == "Tweedie":
            alpha = self.transport.path_sampler.compute_alpha_t
            sigma = self.transport.path_sampler.compute_sigma_t

            def tweedie(x, t, model, **kw):
                a = alpha(t)[0][0]
                s = sigma(t)[0][0]
                return x / a + (s**2) / a * self.score(x, t, model, **kw)

            return tweedie
        if last_step == "Euler":
            return lambda x, t, model, **kw: x + self.drift(x, t, model, **kw) * last_step_size
        raise NotImplementedError(last_step)

    def sample_sde(
        self,
        *,
        sampling_method="Euler",
        diffusion_form="SBDM",
        diffusion_norm=1.0,
        last_step="Mean",
        last_step_size=0.04,
        num_steps=250,
        return_trajectory=False,
    ):
        """SDE sampler (transport.py:269-322). Returns fn(rng, init, model, **kwargs).

        With return_trajectory, returns the saved states plus the deterministic
        last step appended (the reference's `xs + [last]` list, transport.py:312-322).
        """
        if last_step is None:
            last_step_size = 0.0
        sde_drift, sde_diffusion = self._sde_pieces(diffusion_form, diffusion_norm)
        t0, t1 = self.transport.check_interval(
            self.transport.train_eps,
            self.transport.sample_eps,
            diffusion_form=diffusion_form,
            sde=True,
            eval=True,
            reverse=False,
            last_step_size=last_step_size,
        )
        last_step_fn = self._last_step_fn(
            sde_drift, last_step=last_step, last_step_size=last_step_size
        )

        def _sample(rng, init, model, **model_kwargs):
            drift = lambda x, t: sde_drift(x, t, model, **model_kwargs)
            diffusion = lambda x, t: sde_diffusion(x, t)
            x = sdeint(
                drift, diffusion, rng, init, t0, t1, num_steps,
                method=sampling_method, return_trajectory=return_trajectory,
            )
            ts = jnp.full((init.shape[0],), t1, init.dtype)
            if return_trajectory:
                last = last_step_fn(x[-1], ts, model, **model_kwargs)
                return jnp.concatenate([x, last[None]], axis=0)
            return last_step_fn(x, ts, model, **model_kwargs)

        return _sample

    def sample_ode(
        self,
        *,
        sampling_method="dopri5",
        num_steps=50,
        atol=1e-5,
        rtol=1e-5,
        reverse=False,
        return_trajectory=False,
    ):
        """ODE sampler (transport.py:324-369). Returns fn(init, model, **kwargs).

        By default returns the final state directly (what every reference
        caller actually uses — it takes `[-1]`, models.py:812). With
        return_trajectory, returns the (num_steps, batch, ...) saved states at
        linspace(t0, t1, num_steps) including the initial point — the full
        torchdiffeq output contract; for dopri5 each inter-save segment is
        integrated adaptively to (atol, rtol).

        reverse=True integrates data -> noise: with forward interval (t0, t1),
        we solve ds over (1-t1, 1-t0) with drift -v(x, 1-s). (The reference's
        reverse branch flips the interval into (1, 0), which its own
        `t0 < t1` integrator assert forbids — broken upstream in SiT; this is
        the working equivalent.)
        """
        t0, t1 = self.transport.check_interval(
            self.transport.train_eps,
            self.transport.sample_eps,
            sde=False,
            eval=True,
            reverse=False,
            last_step_size=0.0,
        )
        if reverse:
            base_drift = lambda x, t, model, **kw: -self.drift(
                x, jnp.ones_like(t) * (1.0 - t), model, **kw
            )
            t0, t1 = 1.0 - t1, 1.0 - t0
        else:
            base_drift = self.drift

        def _sample(init, model, **model_kwargs):
            drift = lambda x, t: base_drift(x, t, model, **model_kwargs)
            if sampling_method == "euler":
                return odeint_euler(
                    drift, init, t0, t1, num_steps, return_trajectory=return_trajectory
                )
            if sampling_method == "heun":
                return odeint_heun(
                    drift, init, t0, t1, num_steps, return_trajectory=return_trajectory
                )
            if sampling_method == "dopri5":
                save_ts = jnp.linspace(t0, t1, num_steps) if return_trajectory else None
                return odeint_dopri5(
                    drift, init, t0, t1, rtol=rtol, atol=atol, save_ts=save_ts
                )
            raise NotImplementedError(sampling_method)

        return _sample

    def sample_ode_likelihood(
        self, *, sampling_method="euler", num_steps=50, atol=1e-5, rtol=1e-5
    ):
        """Hutchinson-estimator exact log-likelihood ODE (transport.py:371-430).

        Integrates the reverse-time PF-ODE jointly with the divergence estimate.
        sampling_method: "euler"/"heun" fixed-step scans, or "dopri5" — adaptive
        RK45 over the augmented (x, logp) pytree state (the reference's solver
        menu, transport.py:371-430). Returns fn(rng, x, model, **kwargs)
        -> (logp, z0).
        """
        t0, t1 = self.transport.check_interval(
            self.transport.train_eps,
            self.transport.sample_eps,
            sde=False,
            eval=True,
            reverse=False,
            last_step_size=0.0,
        )

        def _sample(rng, x, model, **model_kwargs):
            eps = (
                jax.random.randint(rng, x.shape, 0, 2, dtype=jnp.int32).astype(x.dtype) * 2.0
                - 1.0
            )

            def aug_drift(state, t_vec):
                # reverse-time PF-ODE over the augmented (x, logp) state:
                # dx/ds = -f(x, 1-s), dlogp/ds = +div f (Hutchinson estimate,
                # one jvp per eval shared between f and its divergence)
                xc, _logp = state
                rev_t = jnp.ones_like(t_vec) * (1.0 - t_vec)
                f, jvp_val = jax.jvp(
                    lambda y: self.drift(y, rev_t, model, **model_kwargs), (xc,), (eps,)
                )
                div_est = jnp.sum((jvp_val * eps).reshape(xc.shape[0], -1), axis=1)
                return (-f, div_est)

            init = (x, jnp.zeros((x.shape[0],), x.dtype))
            if sampling_method == "euler":
                z0, delta_logp = _odeint_fixed_tree(
                    aug_drift, init, t0, t1, num_steps, heun=False
                )
            elif sampling_method == "heun":
                z0, delta_logp = _odeint_fixed_tree(
                    aug_drift, init, t0, t1, num_steps, heun=True
                )
            elif sampling_method == "dopri5":
                z0, delta_logp = odeint_dopri5(
                    aug_drift, init, t0, t1, rtol=rtol, atol=atol
                )
            else:
                raise NotImplementedError(sampling_method)
            prior_logp = self.transport.prior_logp(z0)
            return prior_logp - delta_logp, z0

        return _sample
