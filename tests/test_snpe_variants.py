"""NPE_A / NPE_B sequential tests vs analytic posteriors (counterpart of the
reference's `tests/linearGaussian_snpe_test.py` A/B variants)."""

import jax
import jax.numpy as jnp
import pytest

from sbi_tpu.inference import NPE_A, NPE_B
from sbi_tpu.simulators.linear_gaussian import (
    linear_gaussian,
    true_posterior_linear_gaussian_mvn_prior,
)
from sbi_tpu.utils.distributions import MultivariateNormal
from sbi_tpu.utils.metrics import check_c2st
from sbi_tpu.utils.sbiutils import seed_all_backends

NUM_DIM = 2
SHIFT = -1.0 * jnp.ones(NUM_DIM)
LIK_COV = 0.3 * jnp.eye(NUM_DIM)
X_O = jnp.zeros((1, NUM_DIM))


def _gt_samples(n, key):
    gt = true_posterior_linear_gaussian_mvn_prior(
        X_O, SHIFT, LIK_COV, jnp.zeros(NUM_DIM), jnp.eye(NUM_DIM)
    )
    return gt.sample(key, (n,))


@pytest.mark.slow
def test_c2st_npe_a_two_rounds():
    """NPE-A: MLE on proposal data + analytic MoG correction in the final
    round (ref npe_a.py:495,622)."""
    seed_all_backends(3)
    prior = MultivariateNormal(jnp.zeros(NUM_DIM), covariance_matrix=jnp.eye(NUM_DIM))
    inference = NPE_A(prior=prior)
    proposal = prior
    num_rounds = 2
    for r in range(num_rounds):
        if r == 0:
            theta = prior.sample(jax.random.PRNGKey(r), (1200,))
        else:
            theta = proposal.sample((1200,), key=jax.random.PRNGKey(r))
        x = linear_gaussian(theta, SHIFT, LIK_COV, key=jax.random.PRNGKey(50 + r))
        inference.append_simulations(theta, x, proposal=None if r == 0 else proposal)
        inference.train(final_round=(r == num_rounds - 1))
        posterior = inference.build_posterior().set_default_x(X_O)
        proposal = posterior
    samples = posterior.sample((1000,), key=jax.random.PRNGKey(9))
    check_c2st(samples, _gt_samples(1000, jax.random.PRNGKey(10)), alg="snpe-a")
    # log_prob must be finite & normalized-ish on samples
    lp = posterior.log_prob(samples[:20])
    assert bool(jnp.isfinite(lp).all())


@pytest.mark.slow
def test_c2st_npe_b_two_rounds():
    """NPE-B: importance-weighted MLE loss (ref npe_b.py:110)."""
    seed_all_backends(4)
    prior = MultivariateNormal(jnp.zeros(NUM_DIM), covariance_matrix=jnp.eye(NUM_DIM))
    inference = NPE_B(prior=prior)
    proposal = prior
    for r in range(2):
        if r == 0:
            theta = prior.sample(jax.random.PRNGKey(r), (1200,))
        else:
            theta = proposal.sample((1200,), key=jax.random.PRNGKey(r))
        x = linear_gaussian(theta, SHIFT, LIK_COV, key=jax.random.PRNGKey(60 + r))
        inference.append_simulations(theta, x, proposal=None if r == 0 else proposal)
        inference.train()
        posterior = inference.build_posterior().set_default_x(X_O)
        proposal = posterior
    samples = posterior.sample((1000,), key=jax.random.PRNGKey(9))
    check_c2st(samples, _gt_samples(1000, jax.random.PRNGKey(10)), alg="snpe-b")
