"""Conditional score estimators with VP / subVP / VE SDE schedules.

JAX counterpart of `sbi/neural_nets/estimators/score_estimator.py`
(DSM loss `:221-305`, schedules `mean_t_fn/std_fn/drift/diffusion` per
subclass `:519,632,760`). The network predicts noise eps-hat; the score is
-eps_hat / std_t (standard parameterization).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from .base import ConditionalVectorFieldEstimator

Array = jax.Array


class ConditionalScoreEstimator(ConditionalVectorFieldEstimator):
    """Base score estimator; subclasses fix the SDE geometry."""

    SCORE_DEFINED = True
    SDE_DEFINED = True
    MARGINALS_DEFINED = True

    t_min: float = 1e-3
    t_max: float = 1.0

    def __init__(
        self,
        net,
        params,
        input_shape,
        condition_shape,
        input_transform=None,
        condition_transform=None,
        weight_fn: str = "max_likelihood",
        condition_dropout: float = 0.0,
    ):
        super().__init__(
            net, params, input_shape, condition_shape, input_transform,
            condition_transform,
        )
        self.weight_fn = weight_fn
        # >0 enables classifier-free guidance: the condition embedding is
        # zeroed with this probability during training, so the same net also
        # learns the unconditional score (Ho & Salimans 2022).
        self.condition_dropout = condition_dropout

    # ------------------------------------------------------------- schedules
    def mean_t_fn(self, times: Array) -> Array:
        raise NotImplementedError

    def std_fn(self, times: Array) -> Array:
        raise NotImplementedError

    def drift_fn(self, input: Array, times: Array) -> Array:
        raise NotImplementedError

    def diffusion_fn(self, input: Array, times: Array) -> Array:
        raise NotImplementedError

    # --------------------------------------------------------------- forward
    def forward_fn(self, params, input: Array, condition: Array, time: Array) -> Array:
        """Score in *raw theta space*. input (B, D) raw, condition (B, ...)
        raw, time scalar or (B,) -> (B, D)."""
        z, _ = self.input_transform.forward_and_log_det(input)
        zc = self._embed_condition(condition)
        time = jnp.broadcast_to(jnp.asarray(time, jnp.float32), (z.shape[0],))
        eps_hat = self.net.apply(params, z, zc, time)
        std = self.std_fn(time)[:, None]
        score_z = -eps_hat / std
        # d z / d theta = 1/scale => score_theta = score_z / scale
        scale = getattr(self.input_transform, "scale", jnp.ones(z.shape[-1]))
        return score_z / scale

    def score_fn(self, params, input, condition, time):
        return self.forward_fn(params, input, condition, time)

    def ode_fn(self, params, input: Array, condition: Array, time: Array) -> Array:
        """Probability-flow ODE velocity: drift - 0.5 diffusion^2 * score.

        Operates in z-space internally; exposed in z-space for the posterior's
        ODE sampler (which handles the z<->raw transform at the boundary)."""
        time = jnp.broadcast_to(jnp.asarray(time, jnp.float32), (input.shape[0],))
        zc = self._embed_condition(condition)
        eps_hat = self.net.apply(params, input, zc, time)
        std = self.std_fn(time)[:, None]
        score_z = -eps_hat / std
        drift = self.drift_fn(input, time)
        diff = self.diffusion_fn(input, time)
        return drift - 0.5 * diff**2 * score_z

    # score in z-space for the SDE sampler
    def score_z_fn(self, params, z: Array, condition_z: Array, time: Array) -> Array:
        time = jnp.broadcast_to(jnp.asarray(time, jnp.float32), (z.shape[0],))
        eps_hat = self.net.apply(params, z, condition_z, time)
        return -eps_hat / self.std_fn(time)[:, None]

    def ode_z_fn(self, params, z: Array, condition_z: Array, time: Array) -> Array:
        """Probability-flow ODE velocity in z-space, pre-embedded condition."""
        time = jnp.broadcast_to(jnp.asarray(time, jnp.float32), (z.shape[0],))
        score_z = self.score_z_fn(params, z, condition_z, time)
        drift = self.drift_fn(z, time)
        diff = self.diffusion_fn(z, time)
        return drift - 0.5 * diff**2 * score_z

    # ------------------------------------------------------------------ loss
    def loss_fn(self, params, input: Array, condition: Array, key: Array,
                times: Optional[Array] = None) -> Array:
        """Denoising score matching (ref `:221-305`): predict the noise.

        loss = w(t) * ||eps_hat(mean_t*z + std_t*eps, x, t) - eps||^2
        """
        z, _ = self.input_transform.forward_and_log_det(input)
        zc = self._embed_condition(condition)
        B = z.shape[0]
        k_t, k_eps = jax.random.split(key)
        if times is None:
            times = jax.random.uniform(
                k_t, (B,), minval=self.t_min, maxval=self.t_max
            )
        eps = jax.random.normal(k_eps, z.shape)
        mean_t = self.mean_t_fn(times)[:, None]
        std_t = self.std_fn(times)[:, None]
        z_t = mean_t * z + std_t * eps
        if self.condition_dropout > 0.0:
            k_drop = jax.random.fold_in(key, 7)
            keep = jax.random.bernoulli(
                k_drop, 1.0 - self.condition_dropout, (B,)
            )
            zc = zc * keep.reshape((B,) + (1,) * (zc.ndim - 1))
        eps_hat = self.net.apply(params, z_t, zc, times)
        return jnp.mean((eps_hat - eps) ** 2, axis=-1)


class VPScoreEstimator(ConditionalScoreEstimator):
    """Variance-preserving SDE (DDPM-like), ref `:519`."""

    def __init__(self, *args, beta_min: float = 0.1, beta_max: float = 20.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.beta_min = beta_min
        self.beta_max = beta_max

    def _beta(self, t):
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def _int_beta(self, t):
        return self.beta_min * t + 0.5 * t**2 * (self.beta_max - self.beta_min)

    def mean_t_fn(self, times):
        return jnp.exp(-0.5 * self._int_beta(times))

    def std_fn(self, times):
        return jnp.sqrt(jnp.clip(1.0 - jnp.exp(-self._int_beta(times)), 1e-6))

    def drift_fn(self, input, times):
        return -0.5 * self._beta(times)[:, None] * input

    def diffusion_fn(self, input, times):
        return jnp.sqrt(self._beta(times))[:, None]


class SubVPScoreEstimator(VPScoreEstimator):
    """Sub-VP SDE, ref `:632`."""

    def std_fn(self, times):
        return jnp.clip(1.0 - jnp.exp(-self._int_beta(times)), 1e-4)

    def diffusion_fn(self, input, times):
        disc = 1.0 - jnp.exp(-2.0 * self._int_beta(times))
        return jnp.sqrt(self._beta(times) * disc)[:, None]


class VEScoreEstimator(ConditionalScoreEstimator):
    """Variance-exploding SDE (SMLD), ref `:760`."""

    def __init__(self, *args, sigma_min: float = 0.01, sigma_max: float = 10.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max

    def _sigma(self, t):
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** t

    def mean_t_fn(self, times):
        return jnp.ones_like(times)

    def std_fn(self, times):
        return self._sigma(times)

    def drift_fn(self, input, times):
        return jnp.zeros_like(input)

    def diffusion_fn(self, input, times):
        log_ratio = math.log(self.sigma_max / self.sigma_min)
        return (self._sigma(times) * jnp.sqrt(2.0 * log_ratio))[:, None]
