"""Ratio-based potential: log r(x_o, theta) + log p(theta), trial-summed.

JAX counterpart of `sbi/inference/potentials/ratio_based_potential.py:16-122`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...utils.sbiutils import ensure_theta_batched
from ...utils.transforms import mcmc_transform
from .base_potential import BasePotential

Array = jax.Array


def _log_ratios_over_trials(x: Array, theta: Array, ratio_estimator) -> Array:
    """sum_t log r(x_t, theta) -> (B,)."""
    T = x.shape[0]
    B = theta.shape[0]
    x_rep = jnp.broadcast_to(x[:, None], (T, B) + tuple(x.shape[1:])).reshape(
        (T * B,) + tuple(x.shape[1:])
    )
    theta_rep = jnp.broadcast_to(theta[None], (T, B, theta.shape[1])).reshape(
        T * B, theta.shape[1]
    )
    logits = ratio_estimator.log_ratio_fn(ratio_estimator.params, theta_rep, x_rep)
    return logits.reshape(T, B).sum(axis=0)


class RatioBasedPotential(BasePotential):
    allow_iid_x = True

    def __init__(self, ratio_estimator, prior, x_o=None, device=None):
        self.ratio_estimator = ratio_estimator
        super().__init__(prior, x_o, device)

    def __call__(self, theta, track_gradients: bool = True):
        theta = ensure_theta_batched(theta)
        log_ratio = _log_ratios_over_trials(self.x_o, theta, self.ratio_estimator)
        prior_lp = self.prior.log_prob(theta) if self.prior is not None else 0.0
        return log_ratio + prior_lp

    def batched_over_x(self, xs: Array, reps: int):
        """Pure potential for batched observations: chain i of B*reps is
        scored against observation i // reps (one x per chain)."""
        est = self.ratio_estimator
        prior = self.prior
        xs_rep = jnp.repeat(
            jnp.atleast_2d(jnp.asarray(xs, jnp.float32)), reps, axis=0
        )

        def potential(theta: Array) -> Array:
            logits = est.log_ratio_fn(est.params, theta, xs_rep)
            return logits + (prior.log_prob(theta) if prior is not None else 0.0)

        return potential


def ratio_estimator_based_potential(
    ratio_estimator, prior, x_o, enable_transform: bool = True
) -> Tuple[RatioBasedPotential, object]:
    potential_fn = RatioBasedPotential(ratio_estimator, prior, x_o)
    theta_transform = mcmc_transform(prior, enable_transform=enable_transform)
    return potential_fn, theta_transform
