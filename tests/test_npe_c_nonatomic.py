"""NPE-C non-atomic (MoG closed-form) loss tests.

Counterpart of the reference's mdn sequential cases in
`tests/linearGaussian_snpe_test.py` and the Appendix A1 math in
`sbi/inference/trainers/npe/npe_c.py:436-721`: the proposal posterior is
q(theta|x) * proposal(theta) / prior(theta), so the Gaussian prior must be
divided out in natural parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.inference import NPE_C
from sbi_tpu.neural_nets.estimators.mdn import MoG
from sbi_tpu.neural_nets.factory import posterior_nn
from sbi_tpu.simulators.linear_gaussian import (
    linear_gaussian,
    true_posterior_linear_gaussian_mvn_prior,
)
from sbi_tpu.utils.distributions import BoxUniform, MultivariateNormal
from sbi_tpu.utils.metrics import check_c2st
from sbi_tpu.utils.sbiutils import seed_all_backends


def _rand_mog(rng, B, K, D):
    logits = jnp.array(rng.normal(size=(B, K)), jnp.float32)
    means = jnp.array(rng.normal(size=(B, K, D)), jnp.float32)
    A = rng.normal(size=(B, K, D, D)) * 0.3
    P = np.einsum("bkij,bklj->bkil", A, A) + np.eye(D)[None, None] * 2.0
    return MoG(logits, means, jnp.linalg.cholesky(jnp.array(P, jnp.float32)))


def test_mog_product_prior_division_exact():
    """product(a, b, subtract_natural=(P0, eta0)).log_prob must equal
    log a + log b - log prior up to a per-row normalizing constant."""
    rng = np.random.default_rng(0)
    B, D = 3, 2
    a, b = _rand_mog(rng, B, 2, D), _rand_mog(rng, B, 3, D)
    P0 = jnp.eye(D) * 0.3
    mu0 = jnp.array([0.2, -0.1])
    pp = MoG.product(a, b, subtract_natural=(P0, P0 @ mu0))

    def logprior(t):
        d = t - mu0
        return (
            0.5 * jnp.linalg.slogdet(P0)[1]
            - 0.5 * (d @ P0 @ d)
            - D / 2 * jnp.log(2 * jnp.pi)
        )

    thetas = jnp.array(rng.normal(size=(6, D)), jnp.float32)
    for bi in range(B):
        consts = []
        for t in thetas:
            tb = jnp.broadcast_to(t, (B, D))
            target = a.log_prob(tb)[bi] + b.log_prob(tb)[bi] - logprior(t)
            consts.append(float(target - pp.log_prob(tb)[bi]))
        assert np.ptp(consts) < 1e-4, "prior-corrected product is not exact"


def test_mog_product_plain_matches_density_product():
    """Without subtraction, product().log_prob == log a + log b + const."""
    rng = np.random.default_rng(1)
    B, D = 2, 3
    a, b = _rand_mog(rng, B, 2, D), _rand_mog(rng, B, 2, D)
    pp = MoG.product(a, b)
    thetas = jnp.array(rng.normal(size=(5, D)), jnp.float32)
    for bi in range(B):
        consts = [
            float(
                a.log_prob(jnp.broadcast_to(t, (B, D)))[bi]
                + b.log_prob(jnp.broadcast_to(t, (B, D)))[bi]
                - pp.log_prob(jnp.broadcast_to(t, (B, D)))[bi]
            )
            for t in thetas
        ]
        assert np.ptp(consts) < 1e-4


@pytest.mark.slow
@pytest.mark.parametrize("prior_str", ["gaussian", "uniform"])
def test_c2st_snpe_c_non_atomic_mdn(prior_str):
    """2-round SNPE-C with MDN net + MDN proposal triggers the non-atomic
    closed form; must still recover the analytic posterior."""
    seed_all_backends(5)
    num_dim, num_samples = 2, 1000
    x_o = jnp.zeros((1, num_dim))
    shift = -1.0 * jnp.ones(num_dim)
    cov = 0.3 * jnp.eye(num_dim)

    if prior_str == "gaussian":
        prior = MultivariateNormal(
            jnp.zeros(num_dim), covariance_matrix=jnp.eye(num_dim)
        )
        gt = true_posterior_linear_gaussian_mvn_prior(
            x_o, shift, cov, jnp.zeros(num_dim), jnp.eye(num_dim)
        )
        target_samples = gt.sample(jax.random.PRNGKey(3), (num_samples,))
    else:
        from sbi_tpu.simulators.linear_gaussian import (
            samples_true_posterior_linear_gaussian_uniform_prior,
        )

        prior = BoxUniform(-2.0 * jnp.ones(num_dim), 2.0 * jnp.ones(num_dim))
        target_samples = samples_true_posterior_linear_gaussian_uniform_prior(
            x_o, shift, cov, prior, num_samples, key=jax.random.PRNGKey(3)
        )

    inference = NPE_C(prior=prior, density_estimator=posterior_nn("mdn"))
    proposal = prior
    for r in range(2):
        if r == 0:
            theta = prior.sample(jax.random.PRNGKey(10 + r), (1000,))
        else:
            theta = proposal.sample((1000,), key=jax.random.PRNGKey(10 + r))
        x = linear_gaussian(theta, shift, cov, key=jax.random.PRNGKey(20 + r))
        inference.append_simulations(theta, x, proposal=None if r == 0 else proposal)
        inference.train(training_batch_size=100)
        posterior = inference.build_posterior().set_default_x(x_o)
        proposal = posterior
    if prior_str in ("gaussian", "uniform"):
        assert inference.use_non_atomic_loss, "MoG case should auto-select non-atomic"
    samples = posterior.sample((num_samples,), key=jax.random.PRNGKey(2))
    check_c2st(samples, target_samples, alg=f"snpe-c-nonatomic-{prior_str}")


def test_non_atomic_gating_requires_gaussian_or_uniform_prior():
    """A prior outside {Uniform, MVN} must fall back to the atomic loss."""
    from sbi_tpu.utils.distributions import Gamma, Independent

    seed_all_backends(0)
    prior = Independent(Gamma(2.0 * jnp.ones(2), 2.0 * jnp.ones(2)), 1)
    inference = NPE_C(prior=prior, density_estimator=posterior_nn("mdn"))
    theta = prior.sample(jax.random.PRNGKey(0), (300,))
    x = theta + 0.1 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    inference.append_simulations(theta, x).train(max_num_epochs=2)
    posterior = inference.build_posterior().set_default_x(jnp.ones((1, 2)))
    theta2 = posterior.sample((300,), key=jax.random.PRNGKey(2))
    x2 = theta2 + 0.1 * jax.random.normal(jax.random.PRNGKey(3), theta2.shape)
    inference.append_simulations(theta2, x2, proposal=posterior)
    inference.train(max_num_epochs=2)
    assert not inference.use_non_atomic_loss
