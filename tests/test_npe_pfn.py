"""NPE_PFN (in-context NPE) pipeline tests.

tabpfn is not installed in this image, so the in-context autoregressive
machinery is exercised through the adapter protocol with a Gaussian
linear-regression adapter — on a linear-Gaussian task its predictive is
exactly the right conditional family, so the resulting posterior can be
checked against the analytic one (the same end-to-end contract the
reference tests with the real TabPFN, `npe_pfn.py:43-374`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.simulators.linear_gaussian import (
    linear_gaussian,
    true_posterior_linear_gaussian_mvn_prior,
)
from sbi_tpu.utils.distributions import MultivariateNormal
from sbi_tpu.utils.metrics import c2st
from sbi_tpu.utils.sbiutils import seed_all_backends


class GaussianAdapter:
    """Linear-Gaussian in-context 'regressor': predictive mean from ridge
    regression on the context, homoscedastic sigma from residuals."""

    def fit(self, X, y):
        X1 = np.concatenate([X, np.ones((len(X), 1))], axis=1)
        self.w = np.linalg.lstsq(
            X1.T @ X1 + 1e-4 * np.eye(X1.shape[1]), X1.T @ y, rcond=None
        )[0]
        resid = y - X1 @ self.w
        self.sigma = max(float(resid.std()), 1e-3)

    def predict_dist(self, Xq):
        X1 = np.concatenate([Xq, np.ones((len(Xq), 1))], axis=1)
        mu = X1 @ self.w
        sigma = self.sigma

        def log_prob(y):
            return (
                -0.5 * ((y - mu) / sigma) ** 2
                - np.log(sigma)
                - 0.5 * np.log(2 * np.pi)
            )

        def sample(rng):
            return mu + sigma * rng.standard_normal(mu.shape)

        return log_prob, sample


@pytest.fixture(scope="module")
def pfn_setup():
    from sbi_tpu.inference import NPE_PFN

    seed_all_backends(0)
    D = 2
    prior = MultivariateNormal(jnp.zeros(D), jnp.eye(D))
    theta = prior.sample(jax.random.PRNGKey(0), (2000,))
    x = linear_gaussian(
        theta, -1.0 * jnp.ones(D), 0.5 * jnp.eye(D), key=jax.random.PRNGKey(1)
    )
    inf = NPE_PFN(prior=prior, adapter_factory=GaussianAdapter)
    inf.append_simulations(theta, x)
    inf.train()
    return inf, prior, D


def test_npe_pfn_requires_tabpfn_without_adapter():
    from sbi_tpu.inference import NPE_PFN
    from sbi_tpu.neural_nets.estimators.tabpfn_flow import tabpfn_available

    if tabpfn_available():
        pytest.skip("tabpfn installed — gate not exercised")
    with pytest.raises(ImportError, match="tabpfn"):
        NPE_PFN(prior=None)


def test_npe_pfn_posterior_matches_analytic(pfn_setup):
    inf, prior, D = pfn_setup
    x_o = jnp.zeros(D)
    ref = true_posterior_linear_gaussian_mvn_prior(
        x_o, -1.0 * jnp.ones(D), 0.5 * jnp.eye(D), jnp.zeros(D), jnp.eye(D)
    ).sample(jax.random.PRNGKey(5), (800,))
    posterior = inf.build_posterior(filter_size=1500)
    samples = posterior.sample((800,), x=x_o, key=jax.random.PRNGKey(2))
    score = float(c2st(samples, ref))
    assert score <= 0.65, f"NPE_PFN posterior C2ST {score}"
    lp = posterior.log_prob(samples[:16], x=x_o)
    assert lp.shape == (16,)
    assert bool(jnp.isfinite(lp).all())


def test_npe_pfn_context_filtering(pfn_setup):
    inf, prior, D = pfn_setup
    est = inf._neural_net
    x_o = np.zeros(D, np.float32)
    knn = est.filtered(x_o, filter_size=100, filter_type="knn")
    assert knn._ctx_theta.shape[0] == 100
    # knn context xs are closer to x_o than the full context on average
    d_knn = np.linalg.norm(knn._ctx_x - x_o, axis=1).mean()
    d_all = np.linalg.norm(est._ctx_x - x_o, axis=1).mean()
    assert d_knn < d_all
    first = est.filtered(x_o, filter_size=50, filter_type="first")
    assert np.allclose(first._ctx_theta, est._ctx_theta[:50])
    custom = est.filtered(x_o, filter_type=lambda xs, xo: np.arange(7))
    assert custom._ctx_theta.shape[0] == 7


def test_npe_pfn_other_samplers(pfn_setup):
    inf, prior, D = pfn_setup
    x_o = jnp.zeros(D)
    for method in ("direct", "rejection", "importance"):
        post = inf.build_posterior(sample_with=method)
        post.set_default_x(x_o)
        s = post.sample((64,), key=jax.random.PRNGKey(3))
        assert s.shape[-1] == D and bool(jnp.isfinite(s).all())
