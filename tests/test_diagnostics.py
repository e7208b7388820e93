"""Diagnostics unit tests: SBC/TARP calibration behavior, misspecification,
KDE, metrics (counterpart of `tests/sbc_test.py`, `metrics_test.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.diagnostics.sbc import check_sbc, run_sbc
from sbi_tpu.diagnostics.tarp import check_tarp, run_tarp
from sbi_tpu.utils.distributions import MultivariateNormal
from sbi_tpu.utils.kde import get_kde
from sbi_tpu.utils.metrics import c2st_jax, mmd, posterior_shrinkage, posterior_zscore
from sbi_tpu.utils.sbiutils import seed_all_backends


class _AnalyticPosterior:
    """Exactly-calibrated 'posterior' for theta|x with x = theta + noise."""

    def __init__(self, obs_var=0.25, prior_var=1.0):
        self.post_var = 1.0 / (1.0 / prior_var + 1.0 / obs_var)
        self.gain = self.post_var / obs_var

    def sample_batched(self, sample_shape, xs, key=None):
        n = sample_shape[0]
        mean = self.gain * xs  # (B, D)
        eps = jax.random.normal(key, (n,) + xs.shape)
        return mean[None] + jnp.sqrt(self.post_var) * eps


def _calibration_data(n=150, d=2, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    thetas = jax.random.normal(k1, (n, d))
    xs = thetas + 0.5 * jax.random.normal(k2, (n, d))
    return thetas, xs


def test_sbc_calibrated_posterior_uniform_ranks():
    seed_all_backends(0)
    thetas, xs = _calibration_data()
    post = _AnalyticPosterior()
    ranks, dap = run_sbc(thetas, xs, post, num_posterior_samples=200,
                         key=jax.random.PRNGKey(3))
    checks = check_sbc(ranks, thetas, dap, 200)
    assert float(checks["ks_pvals"].min()) > 0.01, checks["ks_pvals"]


def test_sbc_detects_miscalibration():
    seed_all_backends(0)
    thetas, xs = _calibration_data()

    class Bad(_AnalyticPosterior):
        def sample_batched(self, sample_shape, xs, key=None):
            return 0.1 * super().sample_batched(sample_shape, xs, key=key)

    ranks, dap = run_sbc(thetas, xs, Bad(), num_posterior_samples=200,
                         key=jax.random.PRNGKey(3))
    checks = check_sbc(ranks, thetas, dap, 200)
    assert float(checks["ks_pvals"].max()) < 0.01


def test_tarp_calibrated():
    seed_all_backends(0)
    thetas, xs = _calibration_data(n=300)
    ecp, alpha = run_tarp(thetas, xs, _AnalyticPosterior(),
                          num_posterior_samples=300, key=jax.random.PRNGKey(5))
    atc, ks = check_tarp(ecp, alpha)
    assert ks > 0.05
    assert float(jnp.abs(ecp - alpha).max()) < 0.15


def test_kde_fits_gaussian():
    samples = MultivariateNormal(jnp.zeros(2), covariance_matrix=jnp.eye(2)).sample(
        jax.random.PRNGKey(0), (2000,)
    )
    kde = get_kde(samples, bandwidth="scott")
    s = kde.sample(jax.random.PRNGKey(1), (1000,))
    assert np.allclose(np.asarray(s.mean(0)), 0.0, atol=0.2)
    lp = kde.log_prob(jnp.zeros((1, 2)))
    # true density at mode: 1/(2 pi) => log ~= -1.84
    assert abs(float(lp[0]) + 1.84) < 0.4


def test_c2st_jax_separates_and_matches():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (1000, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), (1000, 3))
    c = b + 2.0
    same = float(c2st_jax(a, b, key=jax.random.PRNGKey(2)))
    diff = float(c2st_jax(a, c, key=jax.random.PRNGKey(3)))
    assert abs(same - 0.5) < 0.1, same
    assert diff > 0.9, diff


def test_metrics_scalars():
    a = jax.random.normal(jax.random.PRNGKey(0), (500, 2))
    b = jax.random.normal(jax.random.PRNGKey(1), (500, 2)) + 1.0
    assert float(mmd(a, b)) > float(mmd(a, a[:250] * 1.0))
    shrink = posterior_shrinkage(a * 3, a)
    assert bool((shrink > 0.8).all())
    z = posterior_zscore(jnp.zeros(2), a)
    assert z.shape == (2,)
