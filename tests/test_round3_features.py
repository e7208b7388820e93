"""Round-3 feature regression tests:

- member data isolation in `train_ensemble(member_train_indices=...)`
- scale-heteroscedastic estimator options (NSF affine interleave with wide
  log-scale bounds, MDN log-parameterized precision)
- CNF density estimator end-to-end through NPE
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from sbi_tpu.inference import NLE_A, NPE
from sbi_tpu.neural_nets.factory import likelihood_nn, posterior_nn
from sbi_tpu.utils.distributions import BoxUniform, MultivariateNormal
from sbi_tpu.utils.metrics import c2st
from sbi_tpu.utils.sbiutils import seed_all_backends


def test_member_train_indices_isolate_member_data():
    """Two members trained on OPPOSITE data blocks (x=+theta vs x=-theta)
    must learn opposite conditionals — proves per-member index blocks are
    honored and no data leaks across members."""
    seed_all_backends(0)
    n = 1200
    theta = jr.uniform(jr.PRNGKey(0), (n, 1), minval=-2, maxval=2)
    noise = 0.1 * jr.normal(jr.PRNGKey(1), (n, 1))
    x_pos = theta[: n // 2] + noise[: n // 2]
    x_neg = -theta[n // 2:] + noise[n // 2:]
    x = jnp.concatenate([x_pos, x_neg])

    prior = BoxUniform(-2 * jnp.ones(1), 2 * jnp.ones(1))
    inf = NLE_A(prior=prior, density_estimator=likelihood_nn("mdn"))
    inf.append_simulations(theta, x)
    members = inf.train_ensemble(
        num_members=2,
        member_train_indices=[np.arange(n // 2), np.arange(n // 2, n)],
        max_num_epochs=400, stop_after_epochs=400, epoch_chunk=20,
        training_batch_size=100,
    )
    t = jnp.full((1, 1), 1.5)
    # member 0: p(x|theta) peaked at +1.5; member 1: peaked at -1.5
    lp0_pos = float(members[0].log_prob(jnp.array([[[1.5]]]), t)[0, 0])
    lp0_neg = float(members[0].log_prob(jnp.array([[[-1.5]]]), t)[0, 0])
    lp1_pos = float(members[1].log_prob(jnp.array([[[1.5]]]), t)[0, 0])
    lp1_neg = float(members[1].log_prob(jnp.array([[[-1.5]]]), t)[0, 0])
    assert lp0_pos > lp0_neg + 2.0, (lp0_pos, lp0_neg)
    assert lp1_neg > lp1_pos + 2.0, (lp1_pos, lp1_neg)


@pytest.mark.slow
def test_affine_interleave_fits_heteroscedastic_scales():
    """x | theta ~ N(0, 10^(-2 theta)) for theta in [0, 2]: the conditional
    std spans 4 orders of magnitude. The wide-log-scale-bound affine
    interleave must fit the narrow conditionals accurately (within ~1.5
    nats of the exact conditional entropy rate ~7.36), and its
    forward/inverse passes must stay finite at the extreme scales."""
    seed_all_backends(0)
    n = 6000
    theta = jr.uniform(jr.PRNGKey(0), (n, 1), minval=0.0, maxval=2.0)
    sigma = 10.0 ** (-2.0 * theta)
    x = sigma * jr.normal(jr.PRNGKey(1), (n, 1))

    prior = BoxUniform(jnp.zeros(1), 2 * jnp.ones(1))
    inf = NLE_A(
        prior=prior,
        density_estimator=likelihood_nn("nsf", interleave_affine=True),
    )
    inf.append_simulations(theta, x)
    inf.train(training_batch_size=200, epoch_chunk=10,
              stop_after_epochs=40, max_num_epochs=400)
    affine = inf._neural_net.snapshot()

    # Avg log-lik of the TRUE conditional at small scales (sigma ~ 2.5e-4;
    # exact value = -0.5 log(2 pi sigma^2) ~ 7.36 nats).
    t_test = jnp.full((500, 1), 1.8)
    x_test = 10.0 ** (-2.0 * 1.8) * jr.normal(jr.PRNGKey(2), (500, 1))
    lp_affine = float(affine.log_prob(x_test[None], t_test)[0].mean())
    assert lp_affine > 5.5, lp_affine
    # Sampling path round-trips through the wide-bound affine inverse.
    s = affine.sample((200,), t_test[:3], key=jr.PRNGKey(3))
    assert bool(jnp.isfinite(s).all())
    assert float(jnp.abs(s).max()) < 1.0  # draws live at the tiny scale


def test_mdn_log_scale_parameterization_reaches_tiny_scales():
    """MDN 'log' precision parameterization reaches precisions far beyond
    softplus's practical range (the raw output would need to be ~1e4)."""
    seed_all_backends(0)
    n = 4000
    theta = jr.uniform(jr.PRNGKey(0), (n, 1), minval=0.0, maxval=2.0)
    sigma = 10.0 ** (-2.0 * theta)
    x = sigma * jr.normal(jr.PRNGKey(1), (n, 1))
    prior = BoxUniform(jnp.zeros(1), 2 * jnp.ones(1))

    def fit(param):
        inf = NLE_A(
            prior=prior,
            density_estimator=likelihood_nn(
                "mdn", num_components=1, scale_parameterization=param
            ),
        )
        inf.append_simulations(theta, x)
        inf.train(training_batch_size=200, epoch_chunk=10,
                  stop_after_epochs=30, max_num_epochs=300)
        return inf._neural_net.snapshot()

    log_est = fit("log")
    t_test = jnp.full((500, 1), 1.8)
    x_test = 10.0 ** (-2.0 * 1.8) * jr.normal(jr.PRNGKey(2), (500, 1))
    lp = float(log_est.log_prob(x_test[None], t_test)[0].mean())
    # true conditional entropy rate ~ +7.3 nats; softplus stalls near the
    # global-scale density (~ 1-2 nats)
    assert lp > 4.0, lp


@pytest.mark.slow
def test_cnf_npe_end_to_end_c2st():
    """zuko_cnf trains through NPE and recovers the analytic posterior
    (the integration bar used for every other estimator family)."""
    from sbi_tpu.simulators.linear_gaussian import (
        diagonal_linear_gaussian,
        true_posterior_linear_gaussian_mvn_prior,
    )

    seed_all_backends(0)
    dim = 2
    prior = MultivariateNormal(jnp.zeros(dim), jnp.eye(dim))
    theta = prior.sample(jr.PRNGKey(0), (1500,))
    x = diagonal_linear_gaussian(theta, key=jr.PRNGKey(1))
    est = posterior_nn("zuko_cnf", hidden_features=48, num_steps=16)
    inf = NPE(prior=prior, density_estimator=est)
    inf.append_simulations(theta, x)
    inf.train(training_batch_size=250, epoch_chunk=5, stop_after_epochs=12,
              max_num_epochs=80)
    posterior = inf.build_posterior()
    x_o = jnp.ones((1, dim))
    samples = posterior.sample((800,), x=x_o, key=jr.PRNGKey(2))
    ref = true_posterior_linear_gaussian_mvn_prior(
        x_o[0],
        likelihood_shift=jnp.zeros(dim),
        likelihood_cov=jnp.eye(dim),
        prior_mean=jnp.zeros(dim),
        prior_cov=jnp.eye(dim),
    ).sample(jr.PRNGKey(3), (800,))
    score = float(c2st(samples, ref))
    assert 0.5 - 0.1 < score < 0.5 + 0.12, score
