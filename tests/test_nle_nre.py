"""NLE/NRE integration tests vs analytic posteriors (counterpart of
`tests/linearGaussian_snle_test.py`, `linearGaussian_snre_test.py`)."""

import jax
import jax.numpy as jnp
import pytest

from sbi_tpu.inference import BNRE, NLE_A, NRE_A, NRE_B, NRE_C
from sbi_tpu.simulators.linear_gaussian import (
    linear_gaussian,
    true_posterior_linear_gaussian_mvn_prior,
)
from sbi_tpu.utils.distributions import MultivariateNormal
from sbi_tpu.utils.metrics import check_c2st
from sbi_tpu.utils.sbiutils import seed_all_backends


def _setup(num_dim=2, num_simulations=2500):
    seed_all_backends(0)
    shift = -1.0 * jnp.ones(num_dim)
    cov = 0.3 * jnp.eye(num_dim)
    x_o = jnp.zeros((1, num_dim))
    prior = MultivariateNormal(jnp.zeros(num_dim), covariance_matrix=jnp.eye(num_dim))
    theta = prior.sample(jax.random.PRNGKey(0), (num_simulations,))
    x = linear_gaussian(theta, shift, cov, key=jax.random.PRNGKey(1))
    ref = true_posterior_linear_gaussian_mvn_prior(
        x_o, shift, cov, jnp.zeros(num_dim), jnp.eye(num_dim)
    ).sample(jax.random.PRNGKey(3), (1000,))
    return prior, theta, x, x_o, ref


@pytest.mark.slow
def test_c2st_nle_on_linear_gaussian():
    prior, theta, x, x_o, ref = _setup()
    inf = NLE_A(prior=prior)
    inf.append_simulations(theta, x).train(training_batch_size=100)
    posterior = inf.build_posterior()
    samples = posterior.sample(
        (1000,), x=x_o, key=jax.random.PRNGKey(2), num_chains=100, warmup_steps=100
    )
    check_c2st(samples, ref, alg="nle")


@pytest.mark.slow
@pytest.mark.parametrize("cls", [NRE_A, NRE_B, NRE_C])
def test_c2st_nre_on_linear_gaussian(cls):
    prior, theta, x, x_o, ref = _setup()
    inf = cls(prior=prior)
    inf.append_simulations(theta, x).train(training_batch_size=100)
    posterior = inf.build_posterior()
    samples = posterior.sample(
        (1000,), x=x_o, key=jax.random.PRNGKey(2), num_chains=100, warmup_steps=100
    )
    check_c2st(samples, ref, alg=cls.__name__)


@pytest.mark.slow
def test_bnre_trains_and_is_conservative():
    prior, theta, x, x_o, ref = _setup()
    inf = BNRE(prior=prior)
    inf.append_simulations(theta, x).train(training_batch_size=100)
    posterior = inf.build_posterior()
    samples = posterior.sample(
        (500,), x=x_o, key=jax.random.PRNGKey(2), num_chains=50, warmup_steps=100
    )
    # BNRE is conservative by construction — posterior var >= ~true var.
    true_var = 0.3 / 1.3
    assert float(samples.var(0).mean()) > 0.5 * true_var


def test_nle_iid_trials():
    """Multiple iid observations should tighten the NLE posterior."""
    prior, theta, x, x_o, _ = _setup(num_simulations=1500)
    inf = NLE_A(prior=prior)
    inf.append_simulations(theta, x).train(training_batch_size=100, max_num_epochs=60)
    posterior = inf.build_posterior()
    shift = -1.0 * jnp.ones(2)
    x_iid = jnp.zeros((5, 2))
    s1 = posterior.sample((300,), x=x_o, key=jax.random.PRNGKey(2),
                          num_chains=30, warmup_steps=80)
    s5 = posterior.sample((300,), x=x_iid, key=jax.random.PRNGKey(4),
                          num_chains=30, warmup_steps=80)
    assert float(s5.var(0).mean()) < float(s1.var(0).mean())
    # ... and TRACK the analytic 5-trial posterior, not just tighten:
    # precision = prior^-1 + T cov^-1 (trial log-liks sum in the potential)
    from sbi_tpu.utils.metrics import c2st

    T, cov = 5, 0.3 * jnp.eye(2)
    post_cov = jnp.linalg.inv(jnp.eye(2) + T * jnp.linalg.inv(cov))
    post_mean = post_cov @ (
        T * jnp.linalg.inv(cov) @ ((x_iid - shift).mean(0))
    )
    ref5 = MultivariateNormal(
        post_mean, covariance_matrix=post_cov
    ).sample(jax.random.PRNGKey(5), (300,))
    score = float(c2st(s5, ref5))
    assert score <= 0.68, score


def test_nre_iid_trials_track_analytic():
    """The ratio potential sums per-trial log-ratios for iid x; the 5-trial
    posterior must tighten AND track the analytic product posterior."""
    from sbi_tpu.utils.metrics import c2st

    prior, theta, x, x_o, _ = _setup(num_simulations=1500)
    inf = NRE_B(prior=prior)
    inf.append_simulations(theta, x).train(
        training_batch_size=100, max_num_epochs=80
    )
    posterior = inf.build_posterior()
    shift = -1.0 * jnp.ones(2)
    x_iid = jnp.zeros((5, 2))
    s1 = posterior.sample((300,), x=x_o, key=jax.random.PRNGKey(2),
                          num_chains=30, warmup_steps=80)
    s5 = posterior.sample((300,), x=x_iid, key=jax.random.PRNGKey(4),
                          num_chains=30, warmup_steps=80)
    assert float(s5.var(0).mean()) < float(s1.var(0).mean())
    T, cov = 5, 0.3 * jnp.eye(2)
    post_cov = jnp.linalg.inv(jnp.eye(2) + T * jnp.linalg.inv(cov))
    post_mean = post_cov @ (T * jnp.linalg.inv(cov) @ ((x_iid - shift).mean(0)))
    ref5 = MultivariateNormal(
        post_mean, covariance_matrix=post_cov
    ).sample(jax.random.PRNGKey(5), (300,))
    score = float(c2st(s5, ref5))
    assert score <= 0.7, score
