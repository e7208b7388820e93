"""Regression tests for round-1 advisor findings (ADVICE.md):

- NPE_A posterior log_prob must be normalized (no double logsumexp).
- NLE append_simulations must honor exclude_invalid_x (default: keep).
- DirectPosterior.leakage_correction must be per-observation for batched x.
- Calibration kernel must weight the atomic proposal loss.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.inference import NLE, NPE_A, NPE_C
from sbi_tpu.neural_nets.factory import posterior_nn
from sbi_tpu.simulators.linear_gaussian import linear_gaussian
from sbi_tpu.utils.distributions import BoxUniform, MultivariateNormal
from sbi_tpu.utils.sbiutils import seed_all_backends


def test_npe_a_log_prob_normalized():
    """exp(log_prob) must integrate to ~1 over a grid (2-D)."""
    seed_all_backends(0)
    num_dim = 2
    prior = MultivariateNormal(jnp.zeros(num_dim), covariance_matrix=jnp.eye(num_dim))
    shift, cov = -1.0 * jnp.ones(num_dim), 0.3 * jnp.eye(num_dim)
    theta = prior.sample(jax.random.PRNGKey(0), (1500,))
    x = linear_gaussian(theta, shift, cov, key=jax.random.PRNGKey(1))
    inference = NPE_A(prior=prior)
    inference.append_simulations(theta, x).train(max_num_epochs=40)
    posterior = inference.build_posterior().set_default_x(jnp.zeros((1, num_dim)))

    g = jnp.linspace(-5.0, 5.0, 120)
    gg = jnp.stack(jnp.meshgrid(g, g), axis=-1).reshape(-1, 2)
    lp = posterior.log_prob(gg)
    mass = float(jnp.exp(lp).sum() * (g[1] - g[0]) ** 2)
    assert 0.8 < mass < 1.2, f"NPE-A posterior density integrates to {mass}"


def test_nle_keeps_invalid_x_by_default():
    seed_all_backends(0)
    prior = BoxUniform(-jnp.ones(2), jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (100,))
    x = jnp.asarray(theta)
    x = x.at[0, 0].set(jnp.nan)
    inference = NLE(prior=prior)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        inference.append_simulations(theta, x)
        assert any("NaN" in str(wi.message) for wi in w)
    # default keeps the invalid row
    assert inference._theta_roundwise[0].shape[0] == 100
    inference2 = NLE(prior=prior)
    inference2.append_simulations(theta, x, exclude_invalid_x=True)
    assert inference2._theta_roundwise[0].shape[0] == 99


def test_leakage_correction_per_observation():
    """Batched x must get per-x acceptance, not the first row's."""
    seed_all_backends(0)
    num_dim = 2
    prior = BoxUniform(-jnp.ones(num_dim), jnp.ones(num_dim))
    theta = prior.sample(jax.random.PRNGKey(0), (1200,))
    x = linear_gaussian(
        theta, jnp.zeros(num_dim), 0.1 * jnp.eye(num_dim), key=jax.random.PRNGKey(1)
    )
    inference = NPE_C(prior=prior, density_estimator=posterior_nn("mdn"))
    inference.append_simulations(theta, x).train(max_num_epochs=30)
    posterior = inference.build_posterior()
    # One observation deep inside the data manifold, one far outside (the
    # flow leaks mass outside the box there).
    xs = jnp.stack([jnp.zeros(num_dim), 5.0 * jnp.ones(num_dim)])
    acc = posterior.leakage_correction(xs)
    assert acc.shape == (2,)
    assert float(acc[0]) > float(acc[1]), "in-distribution x should leak less"
    # log_prob_batched must apply each observation's own correction.
    th = jnp.zeros((3, 2, num_dim))
    lp = posterior.log_prob_batched(th, xs)
    assert lp.shape == (3, 2)


def test_calibration_kernel_weights_atomic_loss():
    """A zero calibration kernel must zero the proposal-round loss."""
    seed_all_backends(0)
    num_dim = 2
    prior = MultivariateNormal(jnp.zeros(num_dim), covariance_matrix=jnp.eye(num_dim))
    theta = prior.sample(jax.random.PRNGKey(0), (400,))
    x = linear_gaussian(
        theta, jnp.zeros(num_dim), 0.3 * jnp.eye(num_dim), key=jax.random.PRNGKey(1)
    )
    inference = NPE_C(prior=prior)  # maf net -> atomic loss in round 2
    inference.append_simulations(theta, x).train(max_num_epochs=3)
    posterior = inference.build_posterior().set_default_x(jnp.zeros((1, num_dim)))
    theta2 = posterior.sample((400,), key=jax.random.PRNGKey(2))
    x2 = linear_gaussian(
        theta2, jnp.zeros(num_dim), 0.3 * jnp.eye(num_dim), key=jax.random.PRNGKey(3)
    )
    inference.append_simulations(theta2, x2, proposal=posterior)
    inference._num_atoms = 10
    inference.use_non_atomic_loss = False
    loss_fn = inference._make_proposal_loss_fn(
        posterior, calibration_kernel=lambda xb: jnp.zeros(xb.shape[0])
    )
    l = loss_fn(
        inference._neural_net.params,
        jax.random.PRNGKey(0),
        theta2[:50],
        x2[:50],
        jnp.zeros(50),
    )
    assert float(jnp.abs(l).max()) == 0.0
