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
                       num_steps: int = 1):
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
def gibbs_corrector(estimator, params, z, cond_z, t, key, **kwargs):
    """Ancestral resampling corrector: re-noise from the marginal."""
    tb = jnp.broadcast_to(t, (z.shape[0],))
    score = estimator.score_z_fn(params, z, cond_z, tb)
    std = estimator.std_fn(tb)[:, None]
    z0_hat = z + std**2 * score  # denoised estimate (Tweedie)
    mean_t = estimator.mean_t_fn(tb)[:, None]
    eps = jax.random.normal(key, z.shape)
    return mean_t * z0_hat / jnp.clip(mean_t, 1e-6) + std * eps


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
    ) -> Array:
        """Sample (num_samples, B, D) in *raw theta space*."""
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

        params = est.params
        predictor = self.predictor
        corrector = self.corrector
        corrector_params = self.corrector_params

        def step(z, inp):
            t0, t1, k = inp
            kp, kc = jax.random.split(k)
            z = predictor(est, params, z, cond_rep, t0, t1, kp)
            if corrector is not None:
                z = corrector(est, params, z, cond_rep, t1, kc, **corrector_params)
            return z, None

        keys = jax.random.split(k_run, ts.shape[0] - 1)
        z, _ = jax.lax.scan(step, z, (ts[:-1], ts[1:], keys))

        theta = est.input_transform.inverse(z)
        return theta.reshape(num_samples, B, D) if B == 1 else theta.reshape(
            B, num_samples, D
        ).swapaxes(0, 1)
