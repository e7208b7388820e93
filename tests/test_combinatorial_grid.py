"""Combinatorial method x estimator x sampler grids on linear-Gaussian
(VERDICT r3 item 4): the reference parametrizes its accuracy suites over
these axes (`tests/linearGaussian_snpe_test.py:57-103`,
`linearGaussian_snle_test.py:61-108`, `linearGaussian_snre_test.py:64-118`)
and runs device-placement matrices (`tests/inference_on_device_test.py:337,
675`). Trained estimators are shared across sampler cells via module
fixtures so the grid stays within CI budget; sampler cells use fast-mode
MCMC parameters and assert against the analytic posterior.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from sbi_tpu.inference import NLE_A, NPE, NRE_B
from sbi_tpu.neural_nets.factory import posterior_nn
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


def _gt_samples(n, key):
    return true_posterior_linear_gaussian_mvn_prior(
        X_O, SHIFT, LIK_COV, jnp.zeros(NUM_DIM), jnp.eye(NUM_DIM)
    ).sample(key, (n,))


@pytest.fixture(scope="module")
def lg():
    seed_all_backends(0)
    prior = MultivariateNormal(jnp.zeros(NUM_DIM), jnp.eye(NUM_DIM))
    theta = prior.sample(jr.PRNGKey(0), (2500,))
    x = linear_gaussian(theta, SHIFT, LIK_COV, key=jr.PRNGKey(1))
    return prior, theta, x


@pytest.fixture(scope="module")
def trained_nle(lg):
    prior, theta, x = lg
    inf = NLE_A(prior=prior, density_estimator="maf")
    inf.append_simulations(theta, x).train(
        training_batch_size=100, max_num_epochs=120, epoch_chunk=10
    )
    return inf


@pytest.fixture(scope="module")
def trained_nre(lg):
    prior, theta, x = lg
    inf = NRE_B(prior=prior)
    inf.append_simulations(theta, x).train(
        training_batch_size=100, max_num_epochs=120, epoch_chunk=10
    )
    return inf


# --------------------------------------------------------- NPE x estimator
@pytest.mark.slow
@pytest.mark.parametrize("model", ["nsf", "made"])
def test_npe_estimator_grid(lg, model):
    """NPE accuracy cells beyond the mdn/maf pairs already pinned in
    `test_linear_gaussian_npe.py` (ref grid includes nsf/made builds)."""
    prior, theta, x = lg
    seed_all_backends(0)
    inf = NPE(prior=prior, density_estimator=posterior_nn(model))
    inf.append_simulations(theta, x).train(
        training_batch_size=100, max_num_epochs=150, epoch_chunk=10
    )
    post = inf.build_posterior().set_default_x(X_O)
    samples = post.sample((1000,), key=jr.PRNGKey(2))
    score = float(c2st(samples, _gt_samples(1000, jr.PRNGKey(3))))
    assert score < 0.62, f"npe-{model}: c2st {score}"


# ----------------------------------------------------------- NLE x sampler
@pytest.mark.slow
@pytest.mark.parametrize(
    "sample_with, method",
    [
        ("mcmc", "slice_jax_vectorized"),
        ("mcmc", "hmc"),
        ("mcmc", "nuts"),
        ("rejection", None),
        ("importance", None),
        ("vi", None),
    ],
)
def test_nle_sampler_grid(trained_nle, sample_with, method):
    """Every sampler backend on ONE trained likelihood estimator must
    recover the analytic posterior (ref `linearGaussian_snle_test.py`
    sampler parametrization; fast-mode settings)."""
    kwargs = {}
    if sample_with == "mcmc":
        kwargs = dict(
            mcmc_method=method,
            mcmc_parameters=dict(num_chains=20, warmup_steps=100, thin=2),
        )
    elif sample_with == "importance":
        kwargs = dict(importance_sampling_parameters=dict(oversampling_factor=16))
    post = trained_nle.build_posterior(sample_with=sample_with, **kwargs)
    if sample_with == "vi":
        post = post.set_default_x(X_O)
        post.train(max_num_iters=600, n_particles=128, key=jr.PRNGKey(7))
        samples = post.sample((600,), key=jr.PRNGKey(4))
    else:
        samples = post.sample((600,), x=X_O, key=jr.PRNGKey(4))
    gt = _gt_samples(600, jr.PRNGKey(5))
    score = float(c2st(samples, gt))
    tag = f"nle-{sample_with}-{method}"
    # Fast-mode bar: looser than the flagship 0.55, still catches a wrong
    # density or a broken sampler (prior-vs-posterior reads ~0.9 here).
    assert score < 0.66, f"{tag}: c2st {score}"
    assert np.allclose(
        np.asarray(samples.mean(0)), np.asarray(gt.mean(0)), atol=0.25
    ), tag


# ----------------------------------------------------------- NRE x sampler
@pytest.mark.slow
@pytest.mark.parametrize(
    "sample_with, method",
    [
        ("mcmc", "slice_jax_vectorized"),
        ("mcmc", "nuts"),
        ("rejection", None),
        ("vi", None),
    ],
)
def test_nre_sampler_grid(trained_nre, sample_with, method):
    kwargs = {}
    if sample_with == "mcmc":
        kwargs = dict(
            mcmc_method=method,
            mcmc_parameters=dict(num_chains=20, warmup_steps=100, thin=2),
        )
    post = trained_nre.build_posterior(sample_with=sample_with, **kwargs)
    if sample_with == "vi":
        post = post.set_default_x(X_O)
        post.train(max_num_iters=600, n_particles=128, key=jr.PRNGKey(7))
        samples = post.sample((600,), key=jr.PRNGKey(4))
    else:
        samples = post.sample((600,), x=X_O, key=jr.PRNGKey(4))
    gt = _gt_samples(600, jr.PRNGKey(5))
    score = float(c2st(samples, gt))
    assert score < 0.66, f"nre-{sample_with}-{method}: c2st {score}"


# ------------------------------------------------------- device placement
@pytest.mark.parametrize("data_device_idx", [0, 1])
@pytest.mark.parametrize("train_device_idx", [0, 1])
def test_device_placement_grid(lg, data_device_idx, train_device_idx):
    """Analog of the reference's device-placement matrix
    (`tests/inference_on_device_test.py:337,675`: data on one device,
    training on another): with 8 virtual devices, appended simulations and
    the train step may live on different devices; results must be
    placement-invariant and finite."""
    prior, theta, x = lg
    devices = jax.devices()
    theta_d = jax.device_put(theta[:800], devices[data_device_idx])
    x_d = jax.device_put(x[:800], devices[data_device_idx])
    with jax.default_device(devices[train_device_idx]):
        seed_all_backends(0)
        inf = NPE(prior=prior, density_estimator="mdn")
        inf.append_simulations(theta_d, x_d).train(
            training_batch_size=100, max_num_epochs=30, epoch_chunk=10
        )
        post = inf.build_posterior().set_default_x(X_O)
        samples = post.sample((100,), key=jr.PRNGKey(2))
    assert samples.shape == (100, NUM_DIM)
    assert bool(jnp.isfinite(samples).all())
    lp = post.log_prob(samples[:5])
    assert bool(jnp.isfinite(lp).all())


# --------------------------------------------- NLE x sampler x iid trials
@pytest.mark.slow
@pytest.mark.parametrize("method", ["slice_jax_vectorized", "hmc", "nuts"])
@pytest.mark.parametrize("num_trials", [1, 5])
def test_nle_sampler_iid_trial_grid(trained_nle, method, num_trials):
    """Cross cells the per-family iid tests skip: EVERY MCMC kernel must
    compose the per-trial likelihood terms identically — the multi-trial
    posterior's first two moments must track the analytic conjugate
    product posterior (ref `linearGaussian_snle_test.py` parametrizes
    num_trials the same way)."""
    x_iid = jnp.zeros((num_trials, NUM_DIM))
    post = trained_nle.build_posterior(
        sample_with="mcmc",
        mcmc_method=method,
        mcmc_parameters=dict(num_chains=20, warmup_steps=100, thin=2),
    )
    samples = post.sample((600,), x=x_iid, key=jr.PRNGKey(40 + num_trials))
    gt = true_posterior_linear_gaussian_mvn_prior(
        x_iid, SHIFT, LIK_COV, jnp.zeros(NUM_DIM), jnp.eye(NUM_DIM)
    ).sample(jr.PRNGKey(41), (600,))
    tag = f"nle-{method}-trials{num_trials}"
    assert np.allclose(
        np.asarray(samples.mean(0)), np.asarray(gt.mean(0)), atol=0.25
    ), f"{tag}: mean {samples.mean(0)} vs {gt.mean(0)}"
    # Variance must scale with the trial count (the analytic posterior
    # variance drops ~x(1/num_trials) through the product of likelihoods).
    assert np.allclose(
        np.asarray(samples.var(0)), np.asarray(gt.var(0)), rtol=0.6
    ), f"{tag}: var {samples.var(0)} vs {gt.var(0)}"
    score = float(c2st(samples, gt))
    assert score < 0.66, f"{tag}: c2st {score}"
