"""Reverse-SDE sampling: predictor-corrector loop as one `lax.scan`.

JAX counterpart of `sbi/samplers/score/diffuser.py:124-180` (`Diffuser.run`),
`predictors.py:92` (Euler-Maruyama), `correctors.py:93,135` (Langevin /
Gibbs). The reference's 500-step python loop becomes a single scanned XLA
program; all samples advance in parallel.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ...utils.sbiutils import next_key

Array = jax.Array

PREDICTORS = {}
CORRECTORS = {}


def register_predictor(name):
    def deco(fn):
        PREDICTORS[name] = fn
        return fn

    return deco


def register_corrector(name):
    def deco(fn):
        CORRECTORS[name] = fn
        return fn

    return deco


@register_predictor("euler_maruyama")
def euler_maruyama_predictor(estimator, params, z, cond_z, t0, t1, key):
    """One reverse-SDE Euler-Maruyama step from t0 to t1 (< t0).

    dz = [f(z,t) - g(t)^2 s(z,t)] dt + g(t) dW  (reverse time)
    """
    dt = t1 - t0  # negative
    t0b = jnp.broadcast_to(t0, (z.shape[0],))
    score = estimator.score_z_fn(params, z, cond_z, t0b)
    drift = estimator.drift_fn(z, t0b)
    diff = estimator.diffusion_fn(z, t0b)
    eps = jax.random.normal(key, z.shape)
    z_mean = z + (drift - diff**2 * score) * dt
    return z_mean + diff * jnp.sqrt(-dt) * eps


@register_corrector("langevin")
def langevin_corrector(estimator, params, z, cond_z, t, key, snr: float = 0.16,
                       num_steps: int = 1, **kwargs):
    tb = jnp.broadcast_to(t, (z.shape[0],))

    def body(carry, k):
        z = carry
        score = estimator.score_z_fn(params, z, cond_z, tb)
        noise = jax.random.normal(k, z.shape)
        grad_norm = jnp.linalg.norm(score, axis=-1, keepdims=True).mean()
        noise_norm = jnp.sqrt(jnp.asarray(z.shape[-1], jnp.float32))
        eps = 2 * (snr * noise_norm / jnp.clip(grad_norm, 1e-8)) ** 2
        z = z + eps * score + jnp.sqrt(2 * eps) * noise
        return z, None

    keys = jax.random.split(key, num_steps)
    z, _ = jax.lax.scan(body, z, keys)
    return z


@register_corrector("gibbs")
def gibbs_corrector(estimator, params, z, cond_z, t, key, t_prev=None,
                    num_steps: int = 5, **kwargs):
    """(Pseudo) Gibbs corrector, matching the reference's scheme
    (`sbi/samplers/score/correctors.py:134-166`): alternately re-noise one
    step FORWARD via the forward SDE, then denoise with the reverse
    predictor — an approximate Gibbs move that preserves the time-t
    marginal. (The previous Tweedie-mean re-noising systematically
    inflated the marginal variance; caught by
    tests/test_score_samplers_deep.py's analytic-score grid.)"""
    t1 = t
    t0 = t_prev if t_prev is not None else jnp.minimum(
        t1 * 1.25 + 1e-3, estimator.t_max
    )
    dt = t0 - t1  # positive (forward in diffusion time)
    t1b = jnp.broadcast_to(t1, (z.shape[0],))

    def body(carry, k):
        z = carry
        k_n, k_d = jax.random.split(k)
        # forward SDE t1 -> t0
        f = estimator.drift_fn(z, t1b)
        g = estimator.diffusion_fn(z, t1b)
        eps = jax.random.normal(k_n, z.shape)
        z = z + f * dt + g * jnp.sqrt(dt) * eps
        # reverse predictor t0 -> t1
        z = euler_maruyama_predictor(estimator, params, z, cond_z, t0, t1, k_d)
        return z, None

    keys = jax.random.split(key, num_steps)
    z, _ = jax.lax.scan(body, z, keys)
    return z


class Diffuser:
    """Predictor-corrector reverse diffusion (ref diffuser.py:15)."""

    def __init__(
        self,
        vector_field_estimator,
        predictor: str | Callable = "euler_maruyama",
        corrector: Optional[str | Callable] = None,
        corrector_params: Optional[dict] = None,
    ):
        self.estimator = vector_field_estimator
        self.predictor = (
            PREDICTORS[predictor] if isinstance(predictor, str) else predictor
        )
        self.corrector = (
            CORRECTORS[corrector] if isinstance(corrector, str) else corrector
        )
        self.corrector_params = corrector_params or {}

    def run(
        self,
        num_samples: int,
        x: Array,
        steps: int = 500,
        ts: Optional[Array] = None,
        key: Optional[Array] = None,
        score_fn: Optional[Callable] = None,
        params=None,
    ) -> Array:
        """Sample (num_samples, B, D) in *raw theta space*.

        ``score_fn(z, t) -> (N, D)``: optional override of the estimator's
        conditional score — used for iid score composition (FNPE/Gauss
        adaptors), where many observations share one posterior.

        ``params``: explicit estimator params pytree — pass when calling
        under ``jax.jit`` so params are traced arguments rather than
        trace-time constants (keeps the compiled program reusable across
        param updates)."""
        if score_fn is not None:
            return self._run_with_score_fn(num_samples, score_fn, steps, ts, key)
        est = self.estimator
        key = next_key(key)
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        B = x.shape[0]
        D = est.input_shape[0]
        cond_z = est._embed_condition(x)
        cond_rep = jnp.repeat(cond_z, num_samples, axis=0)
        if ts is None:
            ts = est.solve_schedule(steps)  # t_max -> t_min

        k_init, k_run = jax.random.split(key)
        # Initial noise from the t_max marginal.
        t_max = ts[0]
        std0 = est.std_fn(jnp.asarray([t_max]))[0]
        z = std0 * jax.random.normal(k_init, (B * num_samples, D))

        params = est.params if params is None else params
        predictor = self.predictor
        corrector = self.corrector
        corrector_params = self.corrector_params
        # The corrector registry is public: only pass t_prev to correctors
        # that declare it (or **kwargs) — externally registered correctors
        # with the old (est, params, z, cond, t, key) signature keep working.
        corrector_takes_t_prev = False
        if corrector is not None:
            import inspect

            try:
                sig = inspect.signature(corrector)
                corrector_takes_t_prev = "t_prev" in sig.parameters or any(
                    p.kind is inspect.Parameter.VAR_KEYWORD
                    for p in sig.parameters.values()
                )
            except (TypeError, ValueError):
                pass

        def step(z, inp):
            t0, t1, k = inp
            kp, kc = jax.random.split(k)
            z = predictor(est, params, z, cond_rep, t0, t1, kp)
            if corrector is not None:
                extra = {"t_prev": t0} if corrector_takes_t_prev else {}
                z = corrector(est, params, z, cond_rep, t1, kc,
                              **extra, **corrector_params)
            return z, None

        keys = jax.random.split(k_run, ts.shape[0] - 1)
        z, _ = jax.lax.scan(step, z, (ts[:-1], ts[1:], keys))

        theta = est.input_transform.inverse(z)
        return theta.reshape(num_samples, B, D) if B == 1 else theta.reshape(
            B, num_samples, D
        ).swapaxes(0, 1)

    def _run_with_score_fn(self, num_samples, score_fn, steps, ts, key,
                           corrector_snr: float = 0.16, corrector_steps: int = 1):
        """Reverse SDE with an explicit z-space score fn (single posterior).
        Includes Langevin corrector steps by default — composed iid scores
        are biased at t > 0 (the reference's FNPE docstring notes the same),
        and the corrector re-equilibrates each time marginal."""
        est = self.estimator
        key = next_key(key)
        D = est.input_shape[0]
        if ts is None:
            ts = est.solve_schedule(steps)
        k_init, k_run = jax.random.split(key)
        std0 = est.std_fn(jnp.asarray([ts[0]]))[0]
        z = std0 * jax.random.normal(k_init, (num_samples, D))

        def step(z, inp):
            t0, t1, k = inp
            kp, kc = jax.random.split(k)
            dt = t1 - t0
            t0b = jnp.broadcast_to(t0, (z.shape[0],))
            score = score_fn(z, t0)
            drift = est.drift_fn(z, t0b)
            diff = est.diffusion_fn(z, t0b)
            eps = jax.random.normal(kp, z.shape)
            z = z + (drift - diff**2 * score) * dt + diff * jnp.sqrt(-dt) * eps

            def langevin(z, k_i):
                s = score_fn(z, t1)
                noise = jax.random.normal(k_i, z.shape)
                g_norm = jnp.linalg.norm(s, axis=-1, keepdims=True).mean()
                n_norm = jnp.sqrt(jnp.asarray(D, jnp.float32))
                eps_l = 2 * (corrector_snr * n_norm / jnp.clip(g_norm, 1e-8)) ** 2
                return z + eps_l * s + jnp.sqrt(2 * eps_l) * noise

            for i in range(corrector_steps):
                z = langevin(z, jax.random.fold_in(kc, i))
            return z, None

        keys = jax.random.split(k_run, ts.shape[0] - 1)
        z, _ = jax.lax.scan(step, z, (ts[:-1], ts[1:], keys))
        theta = est.input_transform.inverse(z)
        return theta.reshape(num_samples, 1, D)
