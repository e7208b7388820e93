"""Unit tests for the distribution layer (counterpart of the reference's
user-input/transforms tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from sbi_tpu.utils.distributions import (
    Beta,
    BoxUniform,
    Exponential,
    Gamma,
    Independent,
    LogNormal,
    MultipleIndependent,
    MultivariateNormal,
    Normal,
    Uniform,
)
from sbi_tpu.utils.transforms import mcmc_transform


KEY = jax.random.PRNGKey(0)


def test_box_uniform_shapes():
    p = BoxUniform(-2 * jnp.ones(3), 2 * jnp.ones(3))
    s = p.sample(KEY, (10,))
    assert s.shape == (10, 3)
    assert p.log_prob(s).shape == (10,)
    assert bool(p.within_support(s).all())
    assert np.allclose(p.log_prob(s), 3 * np.log(1 / 4), atol=1e-5)
    outside = 3 * jnp.ones((1, 3))
    assert np.isneginf(np.asarray(p.log_prob(outside)))


def test_mvn_matches_scipy():
    cov = np.array([[2.0, 0.5], [0.5, 1.0]], dtype=np.float32)
    mean = np.array([1.0, -1.0], dtype=np.float32)
    p = MultivariateNormal(jnp.asarray(mean), covariance_matrix=jnp.asarray(cov))
    s = p.sample(KEY, (20,))
    ours = np.asarray(p.log_prob(s))
    theirs = st.multivariate_normal(mean, cov).logpdf(np.asarray(s))
    assert np.allclose(ours, theirs, atol=1e-4)


@pytest.mark.parametrize(
    "dist,scipy_dist",
    [
        (Gamma(2.0, 3.0), st.gamma(2.0, scale=1 / 3.0)),
        (Beta(2.0, 5.0), st.beta(2.0, 5.0)),
        (Exponential(1.5), st.expon(scale=1 / 1.5)),
        (LogNormal(0.5, 0.8), st.lognorm(0.8, scale=np.exp(0.5))),
        (Normal(1.0, 2.0), st.norm(1.0, 2.0)),
    ],
)
def test_scalar_dists_match_scipy(dist, scipy_dist):
    s = dist.sample(KEY, (50,))
    ours = np.asarray(dist.log_prob(s))
    theirs = scipy_dist.logpdf(np.asarray(s))
    assert np.allclose(ours, theirs, atol=1e-4)


def test_multiple_independent():
    p = MultipleIndependent(
        [Gamma(2.0, 1.0), BoxUniform(-jnp.ones(2), jnp.ones(2)), Normal(0.0, 1.0)]
    )
    assert p.event_shape == (4,)
    s = p.sample(KEY, (10,))
    assert s.shape == (10, 4)
    lp = p.log_prob(s)
    expected = (
        np.asarray(Gamma(2.0, 1.0).log_prob(s[:, 0]))
        + np.log(0.25)
        + np.asarray(Normal(0.0, 1.0).log_prob(s[:, 3]))
    )
    assert np.allclose(np.asarray(lp), expected, atol=1e-4)
    assert bool(p.within_support(s).all())


@pytest.mark.parametrize(
    "prior",
    [
        BoxUniform(-2 * jnp.ones(3), 2 * jnp.ones(3)),
        MultivariateNormal(jnp.ones(2), covariance_matrix=2 * jnp.eye(2)),
        MultipleIndependent([Gamma(2.0, 1.0), BoxUniform(-jnp.ones(2), jnp.ones(2))]),
    ],
)
def test_mcmc_transform_roundtrip(prior):
    t = mcmc_transform(prior)
    s = prior.sample(KEY, (20,))
    u, ldj = t.forward_and_log_det(s)
    assert bool(jnp.isfinite(u).all())
    assert ldj.shape == (20,)
    back, ildj = t.inverse_and_log_det(u)
    assert np.allclose(np.asarray(back), np.asarray(s), atol=1e-3)
    assert np.allclose(np.asarray(ldj + ildj), 0.0, atol=1e-3)


def test_pytree_flattening():
    p = BoxUniform(-jnp.ones(2), jnp.ones(2))

    @jax.jit
    def lp(dist, x):
        return dist.log_prob(x)

    out = lp(p, jnp.zeros((3, 2)))
    assert out.shape == (3,)
