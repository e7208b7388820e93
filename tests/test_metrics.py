"""Metric correctness — counterpart of the reference `tests/metrics_test.py`:
C2ST separation bounds, constant-feature robustness, Sinkhorn W2 vs the
analytic distance, MMD two-sample hypothesis tests, posterior shrinkage /
z-score closed forms, and ABC `Distance` properties."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.utils.metrics import (
    Distance,
    biased_mmd_hypothesis_test,
    c2st,
    c2st_jax,
    posterior_shrinkage,
    posterior_zscore,
    unbiased_mmd_squared_hypothesis_test,
    wasserstein_2_squared,
)
from sbi_tpu.utils.sbiutils import seed_all_backends


def _two_gaussians(sigma_shift, ndim=10, n=1024, seed=0):
    kx, ky = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(kx, (n, ndim))
    y = sigma_shift + jax.random.normal(ky, (n, ndim))
    return x, y


@pytest.mark.parametrize("classifier", ["mlp", "rf"])
@pytest.mark.parametrize(
    "dist_sigma, lo, hi",
    [(0.0, 0.45, 0.55), (1.0, 0.85, 1.0), (20.0, 0.98, 1.0)],
)
def test_c2st_with_different_distributions(dist_sigma, lo, hi, classifier):
    """C2ST ~0.5 for identical Gaussians, ->1.0 as the shift grows
    (ref `metrics_test.py:58-75`)."""
    seed_all_backends(0)
    x, y = _two_gaussians(dist_sigma)
    obs = float(c2st(x, y, classifier=classifier))
    assert lo <= obs <= hi, f"c2st[{classifier}] sigma={dist_sigma}: {obs}"


@pytest.mark.parametrize("dist_sigma, lo, hi", [(0.0, 0.4, 0.6), (1.0, 0.85, 1.0)])
def test_c2st_jax_matches_sklearn_regimes(dist_sigma, lo, hi):
    """The jitted-MLP C2ST agrees with the sklearn path in both regimes."""
    x, y = _two_gaussians(dist_sigma, seed=1)
    obs = float(c2st_jax(x, y, key=jax.random.PRNGKey(2)))
    assert lo <= obs <= hi, f"c2st_jax sigma={dist_sigma}: {obs}"


@pytest.mark.parametrize("dims_constant", (1, 2))
def test_c2st_with_constant_features(dims_constant):
    """Constant feature columns must not crash the classifier
    (ref `metrics_test.py:78-90`)."""
    num_samples = 512
    x = np.random.default_rng(0).normal(size=(num_samples, 2)).astype(np.float32)
    y = np.random.default_rng(1).normal(size=(num_samples, 2)).astype(np.float32)
    x[:, :dims_constant] = 1.0
    y[:, :dims_constant] = 1.0
    score = float(c2st(x, y))
    assert 0.0 <= score <= 1.0


@pytest.mark.parametrize("sigma", (0.0, 5.0, 20.0))
def test_wasserstein_2_distance(sigma):
    """Sinkhorn estimate matches the analytic ||shift||^2 within an order of
    magnitude (ref `metrics_test.py:92-119`)."""
    ndim = 10
    x, y = _two_gaussians(sigma, ndim=ndim, n=512, seed=2)
    analytic = float(np.linalg.norm(sigma * np.ones(ndim)) ** 2)
    estimate = float(wasserstein_2_squared(x, y[:-1], epsilon=5e-1))
    if analytic == 0.0:
        # identical distributions: the entropic estimate stays O(E||x-y||^2
        # between iid standard normals) = O(2*ndim), far from any real shift.
        assert estimate < 4 * ndim
    else:
        e1 = int(math.floor(math.log10(abs(analytic))))
        e2 = 0 if estimate == 0 else int(math.floor(math.log10(abs(estimate))))
        assert e1 == e2, f"analytic {analytic} vs estimate {estimate}"


@pytest.mark.parametrize(
    "test_fn", (unbiased_mmd_squared_hypothesis_test, biased_mmd_hypothesis_test)
)
@pytest.mark.parametrize("sigma", (0.0, 5.0))
def test_mmd_hypothesis_test(test_fn, sigma):
    """H0 accepted for identical Gaussians, rejected for a 5-sigma shift
    (ref `metrics_test.py:121-160`)."""
    x, y = _two_gaussians(sigma, n=512, seed=3)
    stat, threshold = test_fn(x, y)
    if sigma == 0.0:
        assert stat < threshold, f"{stat} !< {threshold}"
    else:
        assert stat > threshold, f"{stat} !> {threshold}"


def test_posterior_shrinkage_closed_form():
    """shrinkage = 1 - post_var/prior_var per dimension
    (ref `metrics_test.py:163-193`)."""
    rng = np.random.default_rng(0)
    prior = rng.normal(scale=2.0, size=(20000, 2)).astype(np.float32)
    post = rng.normal(scale=0.2, size=(20000, 2)).astype(np.float32)
    s = np.asarray(posterior_shrinkage(prior, post))
    assert s.shape == (2,)
    assert np.allclose(s, 1 - 0.2**2 / 2.0**2, atol=0.01)
    # no shrinkage when posterior == prior.
    s0 = np.asarray(posterior_shrinkage(prior, prior))
    assert np.allclose(s0, 0.0, atol=1e-5)


def test_posterior_zscore_closed_form():
    """z = |post_mean - true| / post_std (ref `metrics_test.py:196-215`)."""
    rng = np.random.default_rng(1)
    post = (1.0 + 0.5 * rng.normal(size=(20000, 3))).astype(np.float32)
    z_at_mean = np.asarray(posterior_zscore(np.ones(3), post))
    assert np.allclose(z_at_mean, 0.0, atol=0.02)
    z_off = np.asarray(posterior_zscore(np.zeros(3), post))
    assert np.allclose(z_off, 1.0 / 0.5, atol=0.05)


@pytest.mark.parametrize("distance", ("l2", "l1", "mse"))
def test_distance_identity_and_shapes(distance):
    """d(x, x) = 0; batched output shape (B,) (ref `metrics_test.py:218-250`)."""
    d = Distance(distance)
    x_o = jnp.arange(4.0)
    batch = jnp.tile(x_o, (7, 1))
    out = d(x_o, batch)
    assert out.shape == (7,)
    assert np.allclose(np.asarray(out), 0.0)
    # known values on a unit offset.
    off = batch + 1.0
    vals = np.asarray(d(x_o, off))
    expected = {"l2": 2.0, "l1": 4.0, "mse": 1.0}[distance]
    assert np.allclose(vals, expected), vals


def test_distance_custom_callable():
    d = Distance(lambda x_o, x: jnp.zeros(x.shape[0]))
    out = d(jnp.zeros(3), jnp.ones((5, 3)))
    assert out.shape == (5,) and float(out.sum()) == 0.0
