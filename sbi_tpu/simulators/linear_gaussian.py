"""Linear-Gaussian toy simulator with analytic posteriors.

JAX counterpart of `sbi/simulators/linear_gaussian.py:29,62,108,155`. The
analytic posteriors are the oracle for the C2ST integration tests
(cf. `tests/linearGaussian_snpe_test.py` in the reference).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.distributions import MultivariateNormal
from ..utils.sbiutils import next_key

Array = jax.Array


def linear_gaussian(
    theta: Array,
    likelihood_shift: Array,
    likelihood_cov: Array,
    key: Optional[Array] = None,
    num_discarded_dims: int = 0,
) -> Array:
    """Simulate x ~ N(theta + shift, cov); optionally replace trailing dims
    with pure noise (ref `linear_gaussian.py:29`, different-dims variant)."""
    key = next_key(key)
    theta = jnp.atleast_2d(jnp.asarray(theta, jnp.float32))
    if num_discarded_dims:
        theta = theta[:, :-num_discarded_dims]
    chol = jnp.linalg.cholesky(jnp.asarray(likelihood_cov, jnp.float32))
    eps = jax.random.normal(key, theta.shape)
    return theta + jnp.asarray(likelihood_shift, jnp.float32) + eps @ chol.T


def diagonal_linear_gaussian(theta: Array, std: float = 1.0, key=None) -> Array:
    key = next_key(key)
    theta = jnp.atleast_2d(jnp.asarray(theta, jnp.float32))
    return theta + std * jax.random.normal(key, theta.shape)


def true_posterior_linear_gaussian_mvn_prior(
    x_o: Array,
    likelihood_shift: Array,
    likelihood_cov: Array,
    prior_mean: Array,
    prior_cov: Array,
) -> MultivariateNormal:
    """Conjugate posterior for one or multiple iid trials x_o (ref `:62`).

    x_o: (D,) or (num_trials, D).
    """
    x_o = jnp.atleast_2d(jnp.asarray(x_o, jnp.float32))
    num_trials = x_o.shape[0]
    likelihood_shift = jnp.asarray(likelihood_shift, jnp.float32)
    likelihood_cov = jnp.asarray(likelihood_cov, jnp.float32)
    prior_mean = jnp.asarray(prior_mean, jnp.float32)
    prior_cov = jnp.asarray(prior_cov, jnp.float32)

    prior_prec = jnp.linalg.inv(prior_cov)
    lik_prec = jnp.linalg.inv(likelihood_cov)

    post_prec = prior_prec + num_trials * lik_prec
    post_cov = jnp.linalg.inv(post_prec)
    xbar = jnp.mean(x_o - likelihood_shift, axis=0)
    post_mean = post_cov @ (num_trials * lik_prec @ xbar + prior_prec @ prior_mean)
    # Symmetrize for float32 Cholesky stability.
    post_cov = 0.5 * (post_cov + post_cov.T)
    return MultivariateNormal(post_mean, covariance_matrix=post_cov)


def samples_true_posterior_linear_gaussian_uniform_prior(
    x_o: Array,
    likelihood_shift: Array,
    likelihood_cov: Array,
    prior,
    num_samples: int = 1000,
    key: Optional[Array] = None,
) -> Array:
    """Rejection-sample the truncated-Gaussian posterior under a uniform prior
    (ref `linear_gaussian.py:108`)."""
    key = next_key(key)
    x_o = jnp.atleast_2d(jnp.asarray(x_o, jnp.float32))
    num_trials, D = x_o.shape
    likelihood_cov = jnp.asarray(likelihood_cov, jnp.float32)
    # Posterior \propto prod_i N(x_i; theta+shift, cov) on the box: a Gaussian
    # centered at the trial mean with cov/num_trials, truncated to the box.
    center = jnp.mean(x_o - jnp.asarray(likelihood_shift, jnp.float32), axis=0)
    mvn = MultivariateNormal(center, covariance_matrix=likelihood_cov / num_trials)

    samples = []
    total = 0
    while total < num_samples:
        key, sub = jax.random.split(key)
        cand = mvn.sample(sub, (max(2 * num_samples, 1000),))
        inside = prior.within_support(cand)
        acc = cand[inside]
        samples.append(acc)
        total += int(acc.shape[0])
    return jnp.concatenate(samples, axis=0)[:num_samples]


def samples_true_posterior_linear_gaussian_mvn_prior_different_dims(
    x_o: Array,
    likelihood_shift: Array,
    likelihood_cov: Array,
    prior_mean: Array,
    prior_cov: Array,
    num_discarded_dims: int,
    num_samples: int = 1000,
    key: Optional[Array] = None,
) -> Array:
    """Posterior when x has extra noise dims carrying no information
    (ref `linear_gaussian.py:155`): condition only on the informative dims."""
    key = next_key(key)
    x_o = jnp.atleast_2d(jnp.asarray(x_o, jnp.float32))
    x_informative = x_o[:, : x_o.shape[1] - num_discarded_dims] if num_discarded_dims else x_o
    posterior = true_posterior_linear_gaussian_mvn_prior(
        x_informative, likelihood_shift, likelihood_cov, prior_mean, prior_cov
    )
    return posterior.sample(key, (num_samples,))
