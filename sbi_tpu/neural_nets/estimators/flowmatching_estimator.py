"""Flow-matching estimator (rectified flow / conditional OT paths).

JAX counterpart of `sbi/neural_nets/estimators/flowmatching_estimator.py`
(FM loss `:261-336`, ode_fn/score conversions `:337-391`). Path:
z_t = (1-t) z0 + t z1, z0 ~ N(0, I), z1 = data; target velocity z1 - z0.
Time runs 0 (noise) -> 1 (data).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .base import ConditionalVectorFieldEstimator

Array = jax.Array


class FlowMatchingEstimator(ConditionalVectorFieldEstimator):
    SCORE_DEFINED = True
    SDE_DEFINED = False
    MARGINALS_DEFINED = True

    t_min: float = 0.0
    t_max: float = 1.0

    def __init__(self, net, params, input_shape, condition_shape,
                 input_transform=None, condition_transform=None,
                 noise_scale: float = 1e-3, gaussian_baseline: bool = False):
        super().__init__(net, params, input_shape, condition_shape,
                         input_transform, condition_transform)
        self.noise_scale = noise_scale
        self.gaussian_baseline = gaussian_baseline

    def _baseline_velocity(self, z: Array, time: Array) -> Array:
        """Analytic Gaussian-baseline velocity (ref
        `flowmatching_estimator.py:158-259,321-330`: net learns only the
        residual to the data's Gaussian fit). In z-space the fitted Gaussian
        is N(0, I) by construction of the z-score transform, so with
        independent z0, z1 ~ N(0, I) on the OT path
        E[z1 - z0 | z_t] = (2t - 1) z_t / ((1-t)^2 + t^2)."""
        t = jnp.broadcast_to(jnp.asarray(time, jnp.float32),
                             (z.shape[0],))[:, None]
        return (2.0 * t - 1.0) * z / ((1.0 - t) ** 2 + t**2)

    # --------------------------------------------------------------- forward
    def forward_fn(self, params, input: Array, condition: Array, time: Array) -> Array:
        """Velocity in z-space: input here is z_t (B, D)."""
        zc = self._embed_condition(condition)
        time = jnp.broadcast_to(jnp.asarray(time, jnp.float32), (input.shape[0],))
        v = self.net.apply(params, input, zc, time)
        if self.gaussian_baseline:
            v = v + self._baseline_velocity(input, time)
        return v

    def ode_fn(self, params, input: Array, condition: Array, time: Array) -> Array:
        return self.forward_fn(params, input, condition, time)

    def ode_z_fn(self, params, z: Array, condition_z: Array, time: Array) -> Array:
        """Velocity in z-space with a pre-embedded condition."""
        time = jnp.broadcast_to(jnp.asarray(time, jnp.float32), (z.shape[0],))
        v = self.net.apply(params, z, condition_z, time)
        if self.gaussian_baseline:
            v = v + self._baseline_velocity(z, time)
        return v

    # for the SDE sampler interface (score-based corrector reuse)
    def score_z_fn(self, params, z, condition_z, time):
        time = jnp.broadcast_to(jnp.asarray(time, jnp.float32), (z.shape[0],))
        v = self.net.apply(params, z, condition_z, time)
        if self.gaussian_baseline:
            v = v + self._baseline_velocity(z, time)
        t = time[:, None]
        one_m_t = jnp.clip(1.0 - t, self.noise_scale)
        z1_hat = z + one_m_t * v
        return (t * z1_hat - z) / one_m_t**2

    # marginal stats of the rectified-flow path (for iid composition etc.)
    def mean_t_fn(self, times):
        return times

    def std_fn(self, times):
        return jnp.clip(1.0 - times, self.noise_scale)

    def score_fn(self, params, input, condition, time):
        """Score from velocity (ref `:337-391`): for the OT path,
        score(z,t) = (t*v(z,t) - z) / (1 - t)^2... using the standard
        conversion s = (t v - z) / (1 - t) / (1 - t + t^2/t) simplified for
        z0 ~ N(0,I): s(z,t) = -(z - t*(z + (1-t) v)) / (1-t)^2."""
        time = jnp.asarray(time, jnp.float32)
        v = self.forward_fn(params, input, condition, time)
        t = jnp.broadcast_to(time, (input.shape[0],))[:, None]
        one_m_t = jnp.clip(1.0 - t, self.noise_scale)
        # E[z1|z_t] = z_t + (1-t) v ; score = (t*E[z1|z_t] - z_t)/(1-t)^2
        z1_hat = input + one_m_t * v
        return (t * z1_hat - input) / one_m_t**2

    # ------------------------------------------------------------------ loss
    def loss_fn(self, params, input: Array, condition: Array, key: Array,
                times: Optional[Array] = None) -> Array:
        z1, _ = self.input_transform.forward_and_log_det(input)
        zc = self._embed_condition(condition)
        B = z1.shape[0]
        k_t, k_z0 = jax.random.split(key)
        if times is None:
            times = jax.random.uniform(k_t, (B,))
        z0 = jax.random.normal(k_z0, z1.shape)
        t = times[:, None]
        z_t = (1.0 - t) * z0 + t * z1
        v_target = z1 - z0
        v_hat = self.net.apply(params, z_t, zc, times)
        if self.gaussian_baseline:
            # net regresses only the residual to the analytic baseline
            # (ref `:321-330`)
            v_hat = v_hat + self._baseline_velocity(z_t, times)
        return jnp.mean((v_hat - v_target) ** 2, axis=-1)
