"""MoG container algebra — counterpart of the reference `tests/mog_test.py`:
creation/weights, single-component equivalence with an MVN, shape contracts,
sampling moments, conditioning (dimension reduction, weight renormalization,
analytic correctness), `from_gaussian`, `detach`, and validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import multivariate_normal

from sbi_tpu.neural_nets.estimators.mdn import MoG


def _random_mog(batch_size=2, num_components=3, dim=4, seed=0):
    kl, km, kc = jax.random.split(jax.random.PRNGKey(seed), 3)
    logits = jax.random.normal(kl, (batch_size, num_components))
    means = jax.random.normal(km, (batch_size, num_components, dim))
    # random SPD precision via A A^T + I, stored as lower Cholesky.
    A = 0.3 * jax.random.normal(kc, (batch_size, num_components, dim, dim))
    P = A @ jnp.swapaxes(A, -1, -2) + jnp.eye(dim)
    return MoG(logits, means, jnp.linalg.cholesky(P))


def test_mog_creation_and_properties():
    mog = _random_mog()
    assert mog.dim == 4
    assert mog.num_components == 3
    assert mog.batch_shape == (2,)
    assert np.allclose(np.asarray(mog.weights.sum(-1)), 1.0, atol=1e-6)
    # precisions reconstruct from the stored Cholesky factors.
    P = np.asarray(mog.precisions)
    assert np.allclose(P, np.swapaxes(P, -1, -2), atol=1e-5)


def test_log_prob_single_component_matches_mvn():
    """K=1 MoG log_prob == scipy multivariate_normal logpdf
    (ref `mog_test.py:62-94`)."""
    dim = 3
    mean = np.array([0.5, -1.0, 2.0], dtype=np.float32)
    cov = np.array(
        [[1.0, 0.3, 0.0], [0.3, 2.0, 0.1], [0.0, 0.1, 0.5]], dtype=np.float32
    )
    mog = MoG.from_gaussian(jnp.asarray(mean), jnp.asarray(cov))
    pts = np.random.default_rng(0).normal(size=(6, dim)).astype(np.float32)
    expected = multivariate_normal(mean, cov).logpdf(pts)
    got = np.array([float(mog.log_prob(jnp.asarray(p)[None])[0]) for p in pts])
    assert np.allclose(got, expected, atol=1e-3)


def test_log_prob_and_sample_shapes():
    mog = _random_mog(batch_size=5, num_components=2, dim=3)
    theta = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
    assert mog.log_prob(theta).shape == (5,)
    s = mog.sample(jax.random.PRNGKey(2), 11)
    assert s.shape == (11, 5, 3)


def test_sample_moments_converge():
    """Sample mean/cov match the analytic mixture moments
    (ref `mog_test.py:129-155`)."""
    dim = 2
    means = jnp.asarray([[[2.0, 0.0], [-2.0, 1.0]]])  # (1, 2, 2)
    logits = jnp.asarray([[jnp.log(0.25), jnp.log(0.75)]])
    P = jnp.tile(jnp.eye(dim) * 4.0, (1, 2, 1, 1))  # per-comp cov = 0.25 I
    mog = MoG(logits, means, jnp.linalg.cholesky(P))
    s = np.asarray(mog.sample(jax.random.PRNGKey(0), 40000))[:, 0, :]
    w = np.array([0.25, 0.75])
    mu = w @ np.asarray(means[0])
    assert np.allclose(s.mean(0), mu, atol=0.05)
    # mixture covariance = E[cov] + cov of means.
    mdiff = np.asarray(means[0]) - mu
    cov_true = 0.25 * np.eye(dim) + (w[:, None, None] * (
        mdiff[:, :, None] * mdiff[:, None, :]
    )).sum(0)
    emp_cov = np.cov(s.T)
    assert np.allclose(emp_cov, cov_true, atol=0.1)


def test_condition_reduces_dimension_and_renormalizes():
    mog = _random_mog(batch_size=2, num_components=3, dim=4)
    condition = jax.random.normal(jax.random.PRNGKey(3), (2, 4))
    cond = mog.condition(condition, [0, 2])
    assert cond.dim == 2
    assert cond.num_components == 3
    assert cond.batch_shape == (2,)
    assert np.allclose(np.asarray(cond.weights.sum(-1)), 1.0, atol=1e-6)


def test_condition_matches_analytic_gaussian_conditional():
    """K=1: conditioning must reproduce the closed-form Gaussian conditional."""
    mean = np.array([1.0, -1.0, 0.5])
    cov = np.array([[2.0, 0.8, 0.2], [0.8, 1.5, -0.3], [0.2, -0.3, 1.0]])
    mog = MoG.from_gaussian(jnp.asarray(mean), jnp.asarray(cov))
    y = 0.7  # fix dim 1
    condition = jnp.asarray([[0.0, y, 0.0]])
    cond = mog.condition(condition, [0, 2])

    # analytic: mu_a + S_ab S_bb^-1 (y - mu_b) over kept dims (0, 2).
    keep, fix = [0, 2], [1]
    S_aa = cov[np.ix_(keep, keep)]
    S_ab = cov[np.ix_(keep, fix)]
    S_bb = cov[np.ix_(fix, fix)]
    mu_cond = mean[keep] + (S_ab @ np.linalg.inv(S_bb) @ (y - mean[fix]))
    cov_cond = S_aa - S_ab @ np.linalg.inv(S_bb) @ S_ab.T

    assert np.allclose(np.asarray(cond.means[0, 0]), mu_cond, atol=1e-4)
    got_cov = np.linalg.inv(np.asarray(cond.precisions[0, 0]))
    assert np.allclose(got_cov, cov_cond, atol=1e-4)


def test_condition_mixture_matches_grid_ratio():
    """K=2: conditioned density equals joint/marginal on a grid."""
    mog = _random_mog(batch_size=1, num_components=2, dim=2, seed=5)
    y = 0.4  # fix dim 1
    cond = mog.condition(jnp.asarray([[0.0, y]]), [0])

    xs = jnp.linspace(-4, 4, 301)
    joint_pts = jnp.stack([xs, jnp.full_like(xs, y)], axis=1)
    joint = np.exp(np.asarray(mog.log_prob(joint_pts)))
    cond_density = np.exp(
        np.array([float(cond.log_prob(jnp.asarray([[x]]))[0]) for x in np.asarray(xs)])
    )
    marginal = np.trapezoid(joint, np.asarray(xs))
    assert np.allclose(cond_density, joint / marginal, atol=1e-3)


def test_from_gaussian_single_and_batched():
    mog = MoG.from_gaussian(jnp.zeros(3), jnp.eye(3))
    assert mog.num_components == 1 and mog.batch_shape == (1,)
    assert np.allclose(np.asarray(mog.precisions[0, 0]), np.eye(3), atol=1e-5)

    means_b = jax.random.normal(jax.random.PRNGKey(0), (4, 2))
    covs_b = jnp.tile(2.0 * jnp.eye(2), (4, 1, 1))
    mog_b = MoG.from_gaussian(means_b, covs_b)
    assert mog_b.batch_shape == (4,)
    # precision is the inverse of the covariance (ref `mog_test.py:229-244`).
    assert np.allclose(
        np.asarray(mog_b.precisions), np.tile(0.5 * np.eye(2), (4, 1, 1, 1)),
        atol=1e-5,
    )


def test_detach_stops_gradients():
    def loss(m):
        mog = MoG.from_gaussian(m, jnp.eye(2)).detach()
        return jnp.sum(mog.log_prob(jnp.zeros((1, 2))))

    g = jax.grad(loss)(jnp.ones(2))
    assert np.allclose(np.asarray(g), 0.0)


@pytest.mark.parametrize(
    "corrupt",
    ["nan_logits", "inf_means", "nan_prec", "non_pd"],
)
def test_validate_rejects_bad_parameters(corrupt):
    mog = _random_mog()
    logits, means, chols = mog.logits, mog.means, mog.precision_chols
    if corrupt == "nan_logits":
        logits = logits.at[0, 0].set(jnp.nan)
    elif corrupt == "inf_means":
        means = means.at[0, 0, 0].set(jnp.inf)
    elif corrupt == "nan_prec":
        chols = chols.at[0, 0, 0, 0].set(jnp.nan)
    elif corrupt == "non_pd":
        chols = chols.at[0, 0, 1, 1].set(-1.0)
    bad = MoG(logits, means, chols)
    with pytest.raises(ValueError):
        bad.validate()
    mog.validate()  # clean MoG passes


def test_mog_is_pytree():
    """MoG flows through jit/vmap as a pytree (the TPU-native contract)."""
    mog = _random_mog(batch_size=2, num_components=2, dim=2)

    @jax.jit
    def lp(m, theta):
        return m.log_prob(theta)

    theta = jnp.zeros((2, 2))
    assert np.allclose(np.asarray(lp(mog, theta)), np.asarray(mog.log_prob(theta)))


def test_mdn_get_uncorrected_mog():
    """MixtureDensityEstimator exposes its raw MoG head
    (ref `mixture_density_estimator_test.py:424-446`)."""
    from sbi_tpu.neural_nets.net_builders.mdn import build_mdn

    theta = jax.random.normal(jax.random.PRNGKey(0), (200, 2))
    x = jax.random.normal(jax.random.PRNGKey(1), (200, 3))
    est = build_mdn(theta, x, num_components=4)
    mog = est.get_uncorrected_mog(x[:5])
    assert isinstance(mog, MoG)
    assert mog.num_components == 4 and mog.dim == 2 and mog.batch_shape == (5,)
    mog.validate()
