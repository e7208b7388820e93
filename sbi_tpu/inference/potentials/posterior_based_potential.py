"""Posterior-based potential: log q(theta | x_o), -inf outside prior support.

JAX counterpart of `sbi/inference/potentials/posterior_based_potential.py:26-65`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...neural_nets.estimators.base import ConditionalDensityEstimator

Array = jax.Array
from ...utils.sbiutils import ensure_theta_batched, within_support
from ...utils.transforms import mcmc_transform
from .base_potential import BasePotential


class PosteriorBasedPotential(BasePotential):
    allow_iid_x = False

    def __init__(self, posterior_estimator: ConditionalDensityEstimator, prior, x_o=None, device=None):
        self.posterior_estimator = posterior_estimator
        super().__init__(prior, x_o, device)

    def __call__(self, theta, track_gradients: bool = True):
        theta = ensure_theta_batched(theta)
        x = self.x_o  # (1, *event) — iid not allowed for NPE potential
        lp = self.posterior_estimator.log_prob(theta[:, None, :], x)[:, 0]
        if self.prior is not None:
            in_support = within_support(self.prior, theta)
            lp = jnp.where(in_support, lp, -jnp.inf)
        return lp

    def batched_over_x(self, xs: Array, reps: int):
        """Pure potential for batched observations: chain i of B*reps is
        scored against observation i // reps."""
        est = self.posterior_estimator
        prior = self.prior
        xs_rep = jnp.repeat(
            jnp.atleast_2d(jnp.asarray(xs, jnp.float32)), reps, axis=0
        )

        def potential(theta: Array) -> Array:
            lp = est.log_prob_fn(est.params, theta[None], xs_rep)[0]
            if prior is not None:
                lp = jnp.where(within_support(prior, theta), lp, -jnp.inf)
            return lp

        return potential


def posterior_estimator_based_potential(
    posterior_estimator: ConditionalDensityEstimator,
    prior,
    x_o,
    enable_transform: bool = True,
) -> Tuple[PosteriorBasedPotential, object]:
    """Factory (ref `sbi/inference/__init__.py:52`): returns (potential,
    theta_transform to unconstrained space)."""
    potential_fn = PosteriorBasedPotential(posterior_estimator, prior, x_o)
    theta_transform = mcmc_transform(prior, enable_transform=enable_transform)
    return potential_fn, theta_transform
