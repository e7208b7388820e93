"""Potential-layer tests vs analytic values (counterpart of
`tests/potential_test.py`) + guidance registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.inference import NLE_A, NPE
from sbi_tpu.inference.potentials.base_potential import CustomPotentialWrapper
from sbi_tpu.simulators.linear_gaussian import (
    linear_gaussian,
    true_posterior_linear_gaussian_mvn_prior,
)
from sbi_tpu.utils.distributions import MultivariateNormal
from sbi_tpu.utils.sbiutils import seed_all_backends


def _setup(n=1500):
    seed_all_backends(0)
    D = 2
    prior = MultivariateNormal(jnp.zeros(D), covariance_matrix=jnp.eye(D))
    theta = prior.sample(jax.random.PRNGKey(0), (n,))
    x = linear_gaussian(theta, -jnp.ones(D), 0.3 * jnp.eye(D),
                        key=jax.random.PRNGKey(1))
    return prior, theta, x


def test_likelihood_potential_matches_analytic_shape():
    prior, theta, x = _setup()
    inf = NLE_A(prior=prior)
    inf.append_simulations(theta, x).train(training_batch_size=100,
                                           max_num_epochs=50)
    post = inf.build_posterior()
    x_o = jnp.zeros((1, 2))
    post.potential_fn.set_x(x_o)
    gt = true_posterior_linear_gaussian_mvn_prior(
        x_o, -jnp.ones(2), 0.3 * jnp.eye(2), jnp.zeros(2), jnp.eye(2)
    )
    # potential differences should track the analytic log-density differences
    pts = gt.sample(jax.random.PRNGKey(2), (64,))
    pot = np.asarray(post.potential_fn(pts))
    ana = np.asarray(gt.log_prob(pts))
    corr = np.corrcoef(pot, ana)[0, 1]
    assert corr > 0.9, corr
    # gradient available and finite
    g = post.potential_fn.gradient(pts[:5])
    assert g.shape == (5, 2) and bool(jnp.isfinite(g).all())
    # iid trials: potential sums over trials (2 identical obs = ~2x ll part)
    post.potential_fn.set_x(jnp.zeros((2, 2)), x_is_iid=True)
    pot2 = np.asarray(post.potential_fn(pts))
    assert pot2.shape == (64,)


def test_custom_potential_wrapper():
    def my_pot(theta, x_o=None):
        return -0.5 * jnp.sum(theta**2, axis=-1)

    pot = CustomPotentialWrapper(my_pot, prior=None)
    out = pot(jnp.ones((4, 3)))
    assert np.allclose(np.asarray(out), -1.5)


def test_posterior_potential_outside_support():
    prior, theta, x = _setup(800)
    inf = NPE(prior=prior, density_estimator="mdn")
    inf.append_simulations(theta, x).train(training_batch_size=100,
                                           max_num_epochs=30)
    post = inf.build_posterior().set_default_x(jnp.zeros((1, 2)))
    # MVN prior has full support; use a wrapped finite check instead:
    lp = post.potential_fn(jnp.array([[50.0, 50.0]]))
    assert bool(jnp.isfinite(lp).all())  # extreme but in support


def test_guidance_registry():
    from sbi_tpu.inference.potentials.vector_field_adaptor import (
        GUIDANCE_METHODS,
        IID_METHODS,
    )

    assert {
        "prior", "interval", "classifier_free", "universal",
        "affine_classifier_free", "prior_guide",
    } <= set(GUIDANCE_METHODS)
    assert {"fnpe", "gauss", "auto_gauss", "jac_gauss"} <= set(IID_METHODS)


def test_cfg_condition_dropout_trains():
    """Score estimator with condition_dropout learns both scores."""
    from sbi_tpu.neural_nets.net_builders.vector_field_nets import (
        build_score_estimator,
    )

    theta = jax.random.normal(jax.random.PRNGKey(0), (256, 2))
    x = theta + 0.3 * jax.random.normal(jax.random.PRNGKey(1), (256, 2))
    est = build_score_estimator(theta, x, sde_type="vp")
    est.condition_dropout = 0.2
    loss = est.loss_fn(est.params, theta[:32], x[:32], jax.random.PRNGKey(2))
    assert loss.shape == (32,) and bool(jnp.isfinite(loss).all())
    # guided score fn composes
    from sbi_tpu.inference.potentials.vector_field_adaptor import (
        GUIDANCE_METHODS,
        build_iid_score_fn,
    )
    from sbi_tpu.utils.distributions import MultivariateNormal

    prior = MultivariateNormal(jnp.zeros(2), covariance_matrix=jnp.eye(2))
    base = build_iid_score_fn(est, prior, x[:1], method="fnpe")
    guided = GUIDANCE_METHODS["classifier_free"](
        base, est, prior, condition_z=est._embed_condition(x[:1]),
        guidance_scale=0.5,
    )
    out = guided(theta[:8], 0.5)
    assert out.shape == (8, 2) and bool(jnp.isfinite(out).all())


def test_theta_only_custom_potential_samples_without_x():
    """A custom potential that closes over theta only is a complete log
    density: MCMCPosterior samples it without set_default_x / x= (the
    docs/tutorials/04 banana example)."""
    from sbi_tpu.inference import MCMCPosterior
    from sbi_tpu.utils.distributions import MultivariateNormal

    def gauss_potential(theta):
        return -0.5 * (theta**2).sum(-1)

    posterior = MCMCPosterior(
        gauss_potential,
        proposal=MultivariateNormal(jnp.zeros(2),
                                    covariance_matrix=4.0 * jnp.eye(2)),
        num_chains=20,
        warmup_steps=50,
    )
    s = posterior.sample((500,), key=jax.random.PRNGKey(0))
    assert s.shape == (500, 2)
    assert jnp.all(jnp.abs(s.mean(0)) < 0.3)
    assert jnp.all(jnp.abs(s.std(0) - 1.0) < 0.3)
