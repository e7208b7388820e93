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


@pytest.mark.parametrize(
    "cls, epochs, tol",
    [(NLE_A, 60, 0.68), (NRE_B, 80, 0.70)],
    ids=["nle", "nre"],
)
def test_iid_trials_track_analytic(cls, epochs, tol):
    """iid x: the likelihood/ratio potential sums per-trial terms, so the
    5-trial posterior must both TIGHTEN vs single-trial and TRACK the
    analytic product posterior (conjugate multi-trial linear-Gaussian)."""
    from sbi_tpu.utils.metrics import c2st

    prior, theta, x, x_o, _ = _setup(num_simulations=1500)
    inf = cls(prior=prior)
    inf.append_simulations(theta, x).train(
        training_batch_size=100, max_num_epochs=epochs
    )
    posterior = inf.build_posterior()
    shift = -1.0 * jnp.ones(2)
    x_iid = jnp.zeros((5, 2))
    s1 = posterior.sample((300,), x=x_o, key=jax.random.PRNGKey(2),
                          num_chains=30, warmup_steps=80)
    s5 = posterior.sample((300,), x=x_iid, key=jax.random.PRNGKey(4),
                          num_chains=30, warmup_steps=80)
    assert float(s5.var(0).mean()) < float(s1.var(0).mean())
    ref5 = true_posterior_linear_gaussian_mvn_prior(
        x_iid, shift, 0.3 * jnp.eye(2), jnp.zeros(2), jnp.eye(2)
    ).sample(jax.random.PRNGKey(5), (300,))
    score = float(c2st(s5, ref5))
    assert score <= tol, score
