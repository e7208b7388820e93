"""Transform correctness grids — counterpart of the reference's
`tests/transforms_test.py`: per-prior unconstraining transforms, forward/
inverse round trips, and log-det agreement with autodiff Jacobians.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.utils import BoxUniform
from sbi_tpu.utils.distributions import (
    Beta,
    Exponential,
    Gamma,
    LogNormal,
    MultipleIndependent,
    MultivariateNormal,
    Uniform,
)
from sbi_tpu.utils.transforms import mcmc_transform, transformed_potential

PRIORS = [
    ("box", BoxUniform(-2 * jnp.ones(3), 3 * jnp.ones(3))),
    ("mvn", MultivariateNormal(jnp.ones(2), 4.0 * jnp.eye(2))),
    ("gamma", Gamma(2.0 * jnp.ones(2), jnp.ones(2))),
    ("beta", Beta(2.0 * jnp.ones(2), 3.0 * jnp.ones(2))),
    ("lognormal", LogNormal(jnp.zeros(2), 0.5 * jnp.ones(2))),
    ("exponential", Exponential(2.0 * jnp.ones(2))),
    ("joint", MultipleIndependent([
        Gamma(2.0 * jnp.ones(1), jnp.ones(1)),
        Uniform(-jnp.ones(1), jnp.ones(1)),
        MultivariateNormal(jnp.zeros(2), jnp.eye(2)),
    ])),
]


def _prior_samples(prior, n=20):
    s = prior.sample(jax.random.PRNGKey(0), (n,))
    return jnp.atleast_2d(s)


@pytest.mark.parametrize("name,prior", PRIORS, ids=[p[0] for p in PRIORS])
def test_mcmc_transform_round_trip_and_unbounded(name, prior):
    """forward maps support -> R^D (finite everywhere), inverse returns."""
    tf = mcmc_transform(prior)
    theta = _prior_samples(prior)
    u, ldj = tf.forward_and_log_det(theta)
    assert bool(jnp.isfinite(u).all()) and bool(jnp.isfinite(ldj).all())
    back, ldj_inv = tf.inverse_and_log_det(u)
    assert jnp.allclose(back, theta, atol=1e-4), name
    # inverse log-det is the negative of forward's
    assert jnp.allclose(ldj + ldj_inv, 0.0, atol=1e-4), name
    # extreme unconstrained points map back INSIDE the support
    far = 20.0 * jnp.ones_like(u[:2])
    inside = tf.inv(far)
    lp = prior.log_prob(inside)
    assert bool(jnp.isfinite(lp).all()), name


@pytest.mark.parametrize("name,prior", PRIORS[:6], ids=[p[0] for p in PRIORS[:6]])
def test_log_det_matches_autodiff(name, prior):
    """forward_and_log_det's log|J| equals the autodiff Jacobian det."""
    tf = mcmc_transform(prior)
    theta = _prior_samples(prior, n=5)

    def fwd(t):
        return tf.forward_and_log_det(t[None])[0][0]

    for i in range(theta.shape[0]):
        J = jax.jacobian(fwd)(theta[i])
        _, ldj = tf.forward_and_log_det(theta[i][None])
        sign, logdet = jnp.linalg.slogdet(J)
        assert float(sign) > 0, name  # orientation-preserving
        assert abs(float(ldj[0]) - float(logdet)) < 1e-3, (
            name, float(ldj[0]), float(logdet))


def test_transformed_potential_preserves_density():
    """transformed_potential(pot, tf) is the density of tf(theta) under
    exp(pot): integrating it over u-space must match integrating exp(pot)
    over theta-space (1-D check)."""
    prior = BoxUniform(jnp.zeros(1), jnp.ones(1))
    tf = mcmc_transform(prior)

    def pot(theta):  # unnormalized Beta(2,2)-like bump on (0,1)
        t = theta[..., 0]
        return jnp.log(jnp.clip(t * (1 - t), 1e-12))

    pot_u = transformed_potential(pot, tf)
    grid_t = jnp.linspace(1e-4, 1 - 1e-4, 2001)[:, None]
    z_theta = jnp.trapezoid(jnp.exp(pot(grid_t)), grid_t[:, 0])
    grid_u = jnp.linspace(-12.0, 12.0, 4001)[:, None]
    z_u = jnp.trapezoid(jnp.exp(pot_u(grid_u)), grid_u[:, 0])
    assert abs(float(z_theta) - float(z_u)) < 1e-3


def test_mcmc_transform_disabled_is_identity():
    prior = BoxUniform(-jnp.ones(2), jnp.ones(2))
    tf = mcmc_transform(prior, enable_transform=False)
    theta = _prior_samples(prior)
    u, ldj = tf.forward_and_log_det(theta)
    assert jnp.allclose(u, theta) and jnp.allclose(ldj, 0.0)
