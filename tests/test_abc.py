"""MCABC / SMCABC tests vs the analytic linear-Gaussian posterior
(counterpart of the reference's `tests/abc_test.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.inference import MCABC, SMCABC
from sbi_tpu.simulators.linear_gaussian import (
    linear_gaussian,
    true_posterior_linear_gaussian_mvn_prior,
)
from sbi_tpu.utils.distributions import MultivariateNormal
from sbi_tpu.utils.metrics import c2st
from sbi_tpu.utils.sbiutils import seed_all_backends

NUM_DIM = 2
SHIFT = -1.0 * jnp.ones(NUM_DIM)
LIK_COV = 0.3 * jnp.eye(NUM_DIM)
X_O = jnp.zeros((1, NUM_DIM))


def _prior():
    return MultivariateNormal(jnp.zeros(NUM_DIM), covariance_matrix=jnp.eye(NUM_DIM))


def _simulator(theta, key=None):
    return linear_gaussian(theta, SHIFT, LIK_COV, key=key)


def _gt_samples(n, key):
    gt = true_posterior_linear_gaussian_mvn_prior(
        X_O, SHIFT, LIK_COV, jnp.zeros(NUM_DIM), jnp.eye(NUM_DIM)
    )
    return gt.sample(key, (n,))


@pytest.mark.slow
def test_mcabc_quantile_recovers_posterior():
    seed_all_backends(0)
    abc = MCABC(_simulator, _prior())
    dist = abc(
        X_O, num_simulations=120_000, quantile=0.01, key=jax.random.PRNGKey(0)
    )
    theta_acc = dist.samples
    ref = _gt_samples(theta_acc.shape[0], jax.random.PRNGKey(1))
    score = float(c2st(theta_acc, ref))
    assert score < 0.65, f"MCABC C2ST {score}"


@pytest.mark.slow
def test_mcabc_lra_improves_tight_eps():
    """LRA-adjusted samples should be at least as good as raw acceptance."""
    seed_all_backends(0)
    abc = MCABC(_simulator, _prior())
    raw = abc(X_O, num_simulations=50_000, quantile=0.02, key=jax.random.PRNGKey(0)).samples
    adj = abc(
        X_O, num_simulations=50_000, quantile=0.02, lra=True,
        key=jax.random.PRNGKey(0),
    ).samples
    ref = _gt_samples(1000, jax.random.PRNGKey(1))
    c_raw = float(c2st(raw[:1000], ref))
    c_adj = float(c2st(adj[:1000], ref))
    assert c_adj < c_raw + 0.05, (c_raw, c_adj)


def test_mcabc_kde_return():
    seed_all_backends(0)
    abc = MCABC(_simulator, _prior())
    kde = abc(
        X_O, num_simulations=20_000, quantile=0.05, kde=True,
        key=jax.random.PRNGKey(0),
    )
    s = kde.sample(jax.random.PRNGKey(1), (500,))
    assert s.shape == (500, NUM_DIM)
    assert bool(jnp.isfinite(kde.log_prob(s)).all())


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["A", "B", "C"])
def test_smcabc_variants_recover_posterior(variant):
    seed_all_backends(0)
    abc = SMCABC(_simulator, _prior(), algorithm_variant=variant)
    dist = abc(
        X_O,
        num_particles=1000,
        num_initial_pop=5000,
        num_simulations=40_000,
        epsilon_decay=0.5,
        key=jax.random.PRNGKey(0),
    )
    theta = dist.sample(jax.random.PRNGKey(2), (1000,))
    ref = _gt_samples(theta.shape[0], jax.random.PRNGKey(1))
    score = float(c2st(theta, ref))
    assert score < 0.7, f"SMCABC-{variant} C2ST {score}"


@pytest.mark.slow
def test_smcabc_sass_and_summary():
    seed_all_backends(0)
    abc = SMCABC(_simulator, _prior())
    out = abc(
        X_O,
        num_particles=500,
        num_initial_pop=2000,
        num_simulations=15_000,
        sass=True,
        return_summary=True,
        key=jax.random.PRNGKey(0),
    )
    dist, summary = out
    theta = dist.sample(jax.random.PRNGKey(3), (500,))
    assert theta.shape[1] == NUM_DIM
    assert np.isfinite(np.asarray(theta)).all()
    assert "epsilons" in summary or len(summary) > 0
