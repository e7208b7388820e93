"""Likelihood-based potential: sum_i log p(x_i | theta) + log p(theta).

JAX counterpart of `sbi/inference/potentials/likelihood_based_potential.py`
(`:186-220` trial batching, `:132-183` condition_on_theta). The iid-trial sum
is a single batched estimator call — trials ride the estimator's sample axis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...neural_nets.estimators.base import ConditionalDensityEstimator
from ...utils.sbiutils import ensure_theta_batched
from ...utils.transforms import mcmc_transform
from .base_potential import BasePotential

Array = jax.Array


def _log_likelihoods_over_trials(
    x: Array,
    theta: Array,
    estimator: ConditionalDensityEstimator,
    params=None,
) -> Array:
    """sum_t log p(x_t | theta) for every theta. x: (T, *x_event),
    theta: (B, D) -> (B,). Ref `:186-220`."""
    params = estimator.params if params is None else params
    # estimator convention: input (S, B, *ev) = x trials, condition = theta.
    T = x.shape[0]
    B = theta.shape[0]
    x_rep = jnp.broadcast_to(x[:, None], (T, B) + tuple(x.shape[1:]))
    lp = estimator.log_prob_fn(params, x_rep, theta)  # (T, B)
    return lp.sum(axis=0)


class LikelihoodBasedPotential(BasePotential):
    allow_iid_x = True

    def __init__(self, likelihood_estimator: ConditionalDensityEstimator, prior, x_o=None, device=None):
        self.likelihood_estimator = likelihood_estimator
        super().__init__(prior, x_o, device)

    def __call__(self, theta, track_gradients: bool = True):
        theta = ensure_theta_batched(theta)
        log_likelihood = _log_likelihoods_over_trials(
            self.x_o, theta, self.likelihood_estimator
        )
        prior_lp = self.prior.log_prob(theta) if self.prior is not None else 0.0
        return log_likelihood + prior_lp

    def batched_over_x(self, xs: Array, reps: int):
        """Pure potential for batched observations: chain i of B*reps total
        chains is scored against observation i // reps (one x per chain, no
        iid trials). Used by MCMCPosterior.sample_batched to run ALL
        observations' chains in one sampler invocation."""
        est = self.likelihood_estimator
        prior = self.prior
        xs_rep = jnp.repeat(jnp.atleast_2d(jnp.asarray(xs, jnp.float32)), reps, axis=0)

        def potential(theta: Array) -> Array:
            lp = est.log_prob_fn(est.params, xs_rep[None], theta)[0]
            return lp + (prior.log_prob(theta) if prior is not None else 0.0)

        return potential

    def condition_on_theta(self, local_theta: Array, dims_global_theta):
        """Return potential over global dims with local thetas fixed per trial
        (ref `:132-183`)."""
        dims_global_theta = list(dims_global_theta)
        estimator = self.likelihood_estimator
        x_o = self.x_o
        prior = self.prior

        def potential(theta_global):
            theta_global = ensure_theta_batched(theta_global)
            B = theta_global.shape[0]
            T = x_o.shape[0]
            # Build full theta per (trial, batch): global dims from
            # theta_global, local dims from local_theta (one row per trial).
            D = len(dims_global_theta) + local_theta.shape[1]
            full = jnp.zeros((T, B, D))
            g = jnp.broadcast_to(
                theta_global[None], (T, B, theta_global.shape[1])
            )
            full = full.at[:, :, jnp.array(dims_global_theta)].set(g)
            local_dims = jnp.array(
                [d for d in range(D) if d not in dims_global_theta]
            )
            l = jnp.broadcast_to(local_theta[:, None, :], (T, B, local_theta.shape[1]))
            full = full.at[:, :, local_dims].set(l)
            # log p(x_t | theta_t) per trial, summed.
            x_rep = jnp.broadcast_to(x_o[:, None], (T, B) + tuple(x_o.shape[1:]))
            lp = estimator.log_prob_fn(
                estimator.params,
                x_rep.reshape((T * B, 1) + tuple(x_o.shape[1:])).swapaxes(0, 1),
                full.reshape(T * B, D),
            )[0].reshape(T, B)
            return lp.sum(axis=0)

        return potential


def likelihood_estimator_based_potential(
    likelihood_estimator: ConditionalDensityEstimator,
    prior,
    x_o,
    enable_transform: bool = True,
) -> Tuple[LikelihoodBasedPotential, object]:
    potential_fn = LikelihoodBasedPotential(likelihood_estimator, prior, x_o)
    theta_transform = mcmc_transform(prior, enable_transform=enable_transform)
    return potential_fn, theta_transform


class MixedLikelihoodBasedPotential(LikelihoodBasedPotential):
    """For MNLE estimators (mixed discrete/continuous x)."""


def mixed_likelihood_estimator_based_potential(
    likelihood_estimator, prior, x_o, enable_transform: bool = True
):
    potential_fn = MixedLikelihoodBasedPotential(likelihood_estimator, prior, x_o)
    theta_transform = mcmc_transform(prior, enable_transform=enable_transform)
    return potential_fn, theta_transform
