"""VIPosterior tests (counterpart of the reference's `tests/vi_test.py`):
all four divergences against an analytic correlated-Gaussian potential,
amortized VI, PSIS quality control, and the NLE->VI pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.inference.posteriors.vi_posterior import VIPosterior
from sbi_tpu.inference.potentials.base_potential import CustomPotentialWrapper
from sbi_tpu.utils.distributions import BoxUniform, MultivariateNormal
from sbi_tpu.utils.metrics import c2st
from sbi_tpu.utils.sbiutils import seed_all_backends

MEAN = jnp.array([0.8, -1.2])
COV = jnp.array([[1.0, 0.6], [0.6, 1.5]])
PREC = jnp.linalg.inv(COV)


def _gauss_potential(theta, x_o=None):
    d = theta - MEAN
    return -0.5 * jnp.einsum("bi,ij,bj->b", d, PREC, d)


def _make_vi(vi_method="rKL", q="maf"):
    prior = MultivariateNormal(jnp.zeros(2), covariance_matrix=9.0 * jnp.eye(2))
    pot = CustomPotentialWrapper(_gauss_potential, prior=prior)
    return VIPosterior(pot, prior=prior, q=q, vi_method=vi_method).set_default_x(
        jnp.zeros((1, 2))
    )


@pytest.mark.parametrize("vi_method", ["rKL", "fKL", "IW", "alpha"])
def test_vi_divergences_recover_gaussian(vi_method):
    seed_all_backends(0)
    vi = _make_vi(vi_method)
    vi.train(max_num_iters=2000, learning_rate=2e-3, key=jax.random.PRNGKey(0))
    samples = vi.sample((4000,), key=jax.random.PRNGKey(1))
    mean = np.asarray(samples.mean(0))
    cov = np.cov(np.asarray(samples).T)
    # IW/alpha train mass-covering proposals — q is deliberately broader
    # than the posterior at finite K, so allow looser moments.
    atol_m, atol_c = (0.3, 0.6) if vi_method in ("IW", "alpha") else (0.15, 0.35)
    assert np.allclose(mean, np.asarray(MEAN), atol=atol_m), (vi_method, mean)
    assert np.allclose(cov, np.asarray(COV), atol=atol_c), (vi_method, cov)


@pytest.mark.parametrize("q", ["gaussian", "nsf", "nice", "naf", "unaf"])
def test_vi_q_families(q):
    seed_all_backends(0)
    vi = _make_vi("rKL", q=q)
    vi.train(max_num_iters=1000, key=jax.random.PRNGKey(0))
    samples = vi.sample((3000,), key=jax.random.PRNGKey(1))
    assert np.allclose(np.asarray(samples.mean(0)), np.asarray(MEAN), atol=0.25)


def test_vi_evaluate_psis():
    """A well-fit q must pass PSIS; an untrained one must not be silently OK."""
    seed_all_backends(0)
    vi = _make_vi("rKL")
    vi.train(max_num_iters=1500, key=jax.random.PRNGKey(0))
    k_hat = vi.evaluate(N=2000, key=jax.random.PRNGKey(1))
    assert k_hat < 0.7, f"PSIS k-hat {k_hat} for a well-fit Gaussian q"


def test_vi_log_prob_matches_target():
    seed_all_backends(0)
    vi = _make_vi("rKL")
    vi.train(max_num_iters=1500, key=jax.random.PRNGKey(0))
    pts = MEAN + 0.3 * jax.random.normal(jax.random.PRNGKey(2), (50, 2))
    lq = vi.log_prob(pts)
    gt = MultivariateNormal(MEAN, covariance_matrix=COV).log_prob(pts)
    assert float(jnp.abs(lq - gt).mean()) < 0.35


@pytest.mark.slow
def test_vi_posterior_from_nle_pipeline():
    """NLE -> build_posterior(sample_with='vi') -> C2ST vs analytic."""
    from sbi_tpu.inference import NLE
    from sbi_tpu.simulators.linear_gaussian import (
        linear_gaussian,
        true_posterior_linear_gaussian_mvn_prior,
    )

    seed_all_backends(0)
    num_dim = 2
    prior = MultivariateNormal(jnp.zeros(num_dim), covariance_matrix=jnp.eye(num_dim))
    shift, cov = -1.0 * jnp.ones(num_dim), 0.3 * jnp.eye(num_dim)
    theta = prior.sample(jax.random.PRNGKey(0), (2000,))
    x = linear_gaussian(theta, shift, cov, key=jax.random.PRNGKey(1))
    inference = NLE(prior=prior)
    inference.append_simulations(theta, x).train()
    x_o = jnp.zeros((1, num_dim))
    posterior = inference.build_posterior(sample_with="vi").set_default_x(x_o)
    posterior.train(max_num_iters=1500, key=jax.random.PRNGKey(2))
    samples = posterior.sample((1000,), key=jax.random.PRNGKey(3))
    gt = true_posterior_linear_gaussian_mvn_prior(
        x_o, shift, cov, jnp.zeros(num_dim), jnp.eye(num_dim)
    )
    ref = gt.sample(jax.random.PRNGKey(4), (1000,))
    score = float(c2st(samples, ref))
    assert score < 0.65, f"NLE+VI C2ST {score}"


def test_vi_amortized_across_observations():
    """train_amortized must give sensible samples for new x without refit.

    Potential: posterior-based is the cheapest to wire; use a tiny NPE."""
    from sbi_tpu.inference import NPE
    from sbi_tpu.simulators.linear_gaussian import linear_gaussian

    seed_all_backends(0)
    num_dim = 2
    prior = MultivariateNormal(jnp.zeros(num_dim), covariance_matrix=jnp.eye(num_dim))
    shift, cov = jnp.zeros(num_dim), 0.3 * jnp.eye(num_dim)
    theta = prior.sample(jax.random.PRNGKey(0), (1500,))
    x = linear_gaussian(theta, shift, cov, key=jax.random.PRNGKey(1))
    inference = NPE(prior=prior, density_estimator="mdn")
    inference.append_simulations(theta, x).train(max_num_epochs=40)
    posterior = inference.build_posterior(sample_with="vi")
    xs = jnp.stack([jnp.zeros(num_dim), 0.5 * jnp.ones(num_dim)])
    posterior.train_amortized(xs, max_num_iters=600, key=jax.random.PRNGKey(2))
    for x_i in xs:
        s = posterior.sample((500,), x=x_i[None], key=jax.random.PRNGKey(3))
        # posterior mean of this task is ~(x - shift)*cov_post; just check
        # samples concentrate around the NPE posterior mean.
        npe_s = inference.build_posterior().sample(
            (500,), x=x_i[None], key=jax.random.PRNGKey(4)
        )
        assert np.allclose(
            np.asarray(s.mean(0)), np.asarray(npe_s.mean(0)), atol=0.3
        )
