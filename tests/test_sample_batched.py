"""Batched-observation sampling correctness for Direct and MCMC posteriors
(ref `direct_posterior.py:211-299`, `mcmc_posterior.py:369-516`): each
observation's column must track its own posterior, and per-observation
log-prob normalization must not leak across the batch."""

import jax
import jax.numpy as jnp
import pytest

from sbi_tpu.inference import NLE_A, NPE
from sbi_tpu.simulators.linear_gaussian import (
    linear_gaussian,
    true_posterior_linear_gaussian_mvn_prior,
)
from sbi_tpu.utils.distributions import MultivariateNormal
from sbi_tpu.utils.metrics import c2st
from sbi_tpu.utils.sbiutils import seed_all_backends

D = 2
SHIFT = -1.0 * jnp.ones(D)
COV = 0.3 * jnp.eye(D)


@pytest.fixture(scope="module")
def trained():
    seed_all_backends(0)
    prior = MultivariateNormal(jnp.zeros(D), covariance_matrix=jnp.eye(D))
    theta = prior.sample(jax.random.PRNGKey(0), (2500,))
    x = linear_gaussian(theta, SHIFT, COV, key=jax.random.PRNGKey(1))
    npe = NPE(prior=prior)
    npe.append_simulations(theta, x).train(training_batch_size=100)
    nle = NLE_A(prior=prior)
    nle.append_simulations(theta, x).train(training_batch_size=100)
    return prior, npe, nle


def _analytic(x_o, n=600, key=7):
    return true_posterior_linear_gaussian_mvn_prior(
        x_o[None], SHIFT, COV, jnp.zeros(D), jnp.eye(D)
    ).sample(jax.random.PRNGKey(key), (n,))


XS = jnp.array([[-1.5, -1.5], [0.0, 0.0], [1.5, 1.5]])


def test_direct_posterior_sample_batched(trained):
    prior, npe, _ = trained
    post = npe.build_posterior()
    s = post.sample_batched((600,), XS, key=jax.random.PRNGKey(2))
    assert s.shape == (600, 3, D)
    # column b must match observation b's analytic posterior
    for b in range(3):
        score = float(c2st(s[:, b], _analytic(XS[b], key=10 + b)))
        assert score <= 0.62, (b, score)
    # batched == per-observation sampling distributionally
    s1 = post.sample((600,), x=XS[2], key=jax.random.PRNGKey(3))
    assert float(c2st(s[:, 2], s1)) <= 0.58


def test_direct_posterior_log_prob_batched(trained):
    prior, npe, _ = trained
    post = npe.build_posterior()
    theta = prior.sample(jax.random.PRNGKey(5), (50,))
    theta_b = jnp.broadcast_to(theta[:, None, :], (50, 3, D))  # (S, B, D)
    lp_b = post.log_prob_batched(theta_b, XS)
    assert lp_b.shape == (50, 3)
    for b in range(3):
        lp = post.log_prob(theta, x=XS[b])
        assert jnp.allclose(lp_b[:, b], lp, atol=1e-3), b


def test_mcmc_posterior_sample_batched(trained):
    prior, _, nle = trained
    post = nle.build_posterior()
    s = post.sample_batched(
        (400,), XS, key=jax.random.PRNGKey(4), num_chains=40, warmup_steps=100
    )
    assert s.shape == (400, 3, D)
    assert bool(jnp.isfinite(s).all())
    means = s.mean(axis=0)
    # posterior mean ~ (x + 1)/ (1 + 0.3) * ... monotone in x
    assert bool((means[2] > means[0]).all()), means
    score = float(c2st(s[:, 1], _analytic(XS[1], n=400, key=20)))
    assert score <= 0.65, score


def test_ensemble_posterior_sample_batched_mixture(trained):
    """Vectorized mixture path (round-2 VERDICT item 5): one dispatch per
    member, columns track their own observation's posterior."""
    from sbi_tpu.inference.posteriors.ensemble_posterior import (
        EnsemblePosterior,
    )

    prior, npe, _ = trained
    p1 = npe.build_posterior()
    p2 = npe.build_posterior()
    ens = EnsemblePosterior([p1, p2])
    s = ens.sample_batched((500,), XS, key=jax.random.PRNGKey(6))
    assert s.shape == (500, 3, D)
    for b in (0, 2):
        score = float(c2st(s[:, b], _analytic(XS[b], n=500, key=30 + b)))
        assert score <= 0.62, (b, score)


def test_ensemble_posterior_sample_batched_product(trained):
    """PoE path: one vectorized MCMC run over all observations via the
    combined potential's batched_over_x."""
    from sbi_tpu.inference.posteriors.ensemble_posterior import (
        EnsemblePosterior,
    )

    prior, _, nle = trained
    p1 = nle.build_posterior()
    p2 = nle.build_posterior()
    ens = EnsemblePosterior([p1, p2], potential_combination="product")
    s = ens.sample_batched(
        (300,), XS, key=jax.random.PRNGKey(7), num_chains=30, warmup_steps=100
    )
    assert s.shape == (300, 3, D)
    assert bool(jnp.isfinite(s).all())
    means = s.mean(axis=0)
    assert bool((means[2] > means[0]).all()), means


def test_mcmc_sample_batched_bounded_programs(trained):
    """`max_sweeps_per_program` through the batched MCMC path: bounded
    device programs with carried chain state must track each
    observation's posterior like the monolithic program does."""
    prior, _, nle = trained
    post = nle.build_posterior()
    s = post.sample_batched(
        (400,), XS, key=jax.random.PRNGKey(8), num_chains=40,
        max_sweeps_per_program=8,
    )
    assert s.shape == (400, 3, D)
    assert bool(jnp.isfinite(s).all())
    for b in (0, 2):
        score = float(c2st(s[:, b], _analytic(XS[b], n=400, key=40 + b)))
        assert score <= 0.65, (b, score)
