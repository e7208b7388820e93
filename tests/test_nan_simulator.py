"""Inference with failing (NaN/Inf) simulators — counterpart of the
reference `tests/inference_with_NaN_simulator_test.py`:

- `handle_invalid_x` masks non-finite rows (ref `sbi/utils/sbiutils.py:433`),
- z-scoring warns on extreme outliers / constant dims / single samples
  (ref `sbi/utils/sbiutils.py:39-123`),
- NPE trained on a 5%-NaN simulator still recovers the analytic posterior
  (ref `inference_with_NaN_simulator_test.py:70-121`),
- the RestrictionEstimator round-loop + restricted prior feeds any method
  (ref `inference_with_NaN_simulator_test.py:124-186`),
- the restricted prior's normalized log_prob integrates to ~1
  (ref `inference_with_NaN_simulator_test.py:188-240`).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.diagnostics import run_sbc
from sbi_tpu.inference import NPE
from sbi_tpu.neural_nets.factory import posterior_nn
from sbi_tpu.simulators.linear_gaussian import (
    linear_gaussian,
    samples_true_posterior_linear_gaussian_uniform_prior,
)
from sbi_tpu.utils import BoxUniform, warn_if_invalid_for_zscoring
from sbi_tpu.utils.distributions import MultivariateNormal
from sbi_tpu.utils.metrics import check_c2st
from sbi_tpu.utils.restriction_estimator import RestrictionEstimator
from sbi_tpu.utils.sbiutils import handle_invalid_x, seed_all_backends
from sbi_tpu.utils.simulation_utils import simulate_for_sbi
from sbi_tpu.utils.user_input_checks import process_prior, process_simulator


@pytest.mark.parametrize("x_shape", [(10, 1), (10, 10)])
def test_handle_invalid_x(x_shape):
    x = np.random.default_rng(0).uniform(size=x_shape).astype(np.float32)
    x[x < 0.1] = np.nan
    x[x > 0.9] = np.inf
    x[-1, :] = 0.5  # ensure at least one fully-valid row

    is_valid, num_nans, num_infs = handle_invalid_x(x, exclude_invalid_x=True)

    assert bool(jnp.isfinite(jnp.asarray(x)[np.asarray(is_valid)]).all())
    # every excluded row is accounted for by the NaN/Inf counters (a row
    # holding both NaNs and Infs is counted in each).
    assert int((~np.asarray(is_valid)).sum()) <= num_nans + num_infs
    # keep-all mode returns an all-true mask but still counts.
    keep_all, n2, i2 = handle_invalid_x(x, exclude_invalid_x=False)
    assert bool(jnp.all(keep_all)) and (n2, i2) == (num_nans, num_infs)


def test_z_scoring_warning_extreme_outlier():
    """Training data with an extreme outlier warns during net building
    (ref `inference_with_NaN_simulator_test.py:52-67`)."""
    num_dim = 2
    theta = jnp.ones((100, num_dim)) + jax.random.normal(
        jax.random.PRNGKey(0), (100, num_dim)
    )
    x = jax.random.uniform(jax.random.PRNGKey(1), (100, num_dim))
    x = x.at[0, 0].set(1e7)

    prior = BoxUniform(jnp.zeros(num_dim), jnp.ones(num_dim))
    with pytest.warns(UserWarning, match="extreme outliers"):
        NPE(prior=prior).append_simulations(theta, x).train(max_num_epochs=1)


def test_z_scoring_warning_units():
    with pytest.warns(UserWarning, match="constant values"):
        warn_if_invalid_for_zscoring(jnp.ones((50, 3)))
    with pytest.warns(UserWarning, match="one data sample"):
        warn_if_invalid_for_zscoring(jnp.ones((1, 3)))
    # clean Gaussian data: no warning.
    clean = jax.random.normal(jax.random.PRNGKey(0), (500, 3))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        warn_if_invalid_for_zscoring(clean)


@pytest.mark.slow
def test_inference_with_nan_simulator():
    """NPE trained with 5% NaN simulations (excluded) recovers the analytic
    truncated-Gaussian posterior; SBC ranks stay finite."""
    seed_all_backends(0)
    num_dim = 3
    likelihood_shift = -1.0 * jnp.ones(num_dim)
    likelihood_cov = 0.3 * jnp.eye(num_dim)
    x_o = jnp.zeros((1, num_dim))
    num_samples = 500
    num_simulations = 3000
    percent_nans = 0.05

    def linear_gaussian_nan(theta, key=None):
        x = linear_gaussian(theta, likelihood_shift, likelihood_cov, key=key)
        rng = np.random.default_rng(7)
        mask = rng.uniform(size=x.shape) < (percent_nans / x.shape[1])
        return jnp.where(jnp.asarray(mask), jnp.nan, x)

    prior = BoxUniform(-2.0 * jnp.ones(num_dim), 2.0 * jnp.ones(num_dim))
    target_samples = samples_true_posterior_linear_gaussian_uniform_prior(
        x_o, likelihood_shift, likelihood_cov, prior, num_samples,
        key=jax.random.PRNGKey(3),
    )

    simulator = process_simulator(linear_gaussian_nan, prior)
    theta, x = simulate_for_sbi(
        simulator, prior, num_simulations, show_progress_bar=False,
        key=jax.random.PRNGKey(0),
    )
    assert bool(jnp.isnan(x).any()), "simulator should produce NaNs"

    inference = NPE(prior=prior, density_estimator=posterior_nn("maf"))
    with pytest.warns(UserWarning, match="NaN"):
        inference.append_simulations(theta, x).train(training_batch_size=100)
    posterior = inference.build_posterior().set_default_x(x_o)
    samples = posterior.sample((num_samples,), key=jax.random.PRNGKey(2))
    check_c2st(samples, target_samples, alg="npe-nan-simulator")

    # SBC on the NaN-filtered amortized posterior: ranks must be finite.
    num_sbc = 100
    thetas = prior.sample(jax.random.PRNGKey(4), (num_sbc,))
    xs = simulator(thetas, key=jax.random.PRNGKey(5))
    valid, *_ = handle_invalid_x(xs)
    ranks, daps = run_sbc(
        thetas[np.asarray(valid)], xs[np.asarray(valid)], posterior,
        num_posterior_samples=300, key=jax.random.PRNGKey(6),
    )
    assert bool(jnp.isfinite(ranks).all())


@pytest.mark.slow
def test_inference_with_restriction_estimator():
    """Two-round RestrictionEstimator loop -> restricted prior -> NPE; C2ST
    vs the analytic posterior (ref `inference_with_NaN_simulator_test.py:124`)."""
    seed_all_backends(0)
    num_dim = 3
    likelihood_shift = -1.0 * jnp.ones(num_dim)
    likelihood_cov = 0.3 * jnp.eye(num_dim)
    x_o = jnp.zeros((1, num_dim))
    num_samples = 500
    num_simulations = 1500

    def linear_gaussian_nan(theta, key=None):
        x = linear_gaussian(theta, likelihood_shift, likelihood_cov, key=key)
        return jnp.where(theta[:, :1] < 0.0, jnp.nan, x)

    prior = BoxUniform(-2.0 * jnp.ones(num_dim), 2.0 * jnp.ones(num_dim))
    target_samples = samples_true_posterior_linear_gaussian_uniform_prior(
        x_o, likelihood_shift, likelihood_cov, prior, num_samples,
        key=jax.random.PRNGKey(3),
    )

    simulator = process_simulator(linear_gaussian_nan, prior)
    restriction_estimator = RestrictionEstimator(prior=prior)
    proposal = prior
    for r in range(2):
        theta, x = simulate_for_sbi(
            simulator, proposal, num_simulations, show_progress_bar=False,
            key=jax.random.PRNGKey(10 + r),
        )
        restriction_estimator.append_simulations(theta, x)
        if r == 0:
            restriction_estimator.train(max_num_epochs=60)
        proposal = restriction_estimator.restrict_prior()

    all_theta, all_x, is_valid = restriction_estimator.get_simulations()
    assert all_theta.shape[0] == 2 * num_simulations
    # round 2 proposed from the restricted prior -> mostly valid sims.
    assert float(is_valid[num_simulations:].mean()) > 0.8

    restricted_prior = restriction_estimator.restrict_prior()
    processed_prior, *_ = process_prior(restricted_prior)

    inference = NPE(prior=processed_prior, density_estimator=posterior_nn("maf"))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # NaN rows from round 1 are excluded
        inference.append_simulations(all_theta, all_x).train(
            training_batch_size=100
        )
    posterior = inference.build_posterior().set_default_x(x_o)
    samples = posterior.sample((num_samples,), key=jax.random.PRNGKey(2))
    check_c2st(samples, target_samples, alg="npe-restricted-prior")


@pytest.mark.parametrize("prior_kind", ["uniform", "gaussian"])
def test_restricted_prior_log_prob(prior_kind):
    """Normalized restricted-prior log_prob integrates to ~1 on a grid
    (ref `inference_with_NaN_simulator_test.py:188-240`)."""
    seed_all_backends(0)

    def simulator(theta, key=None):
        perturbed = theta + 0.5 * jax.random.normal(
            key if key is not None else jax.random.PRNGKey(0), theta.shape
        )
        return jnp.where(theta[:, :1] < 0.8, jnp.nan, perturbed)

    if prior_kind == "uniform":
        prior = BoxUniform(-2 * jnp.ones(2), 2 * jnp.ones(2))
    else:
        prior = MultivariateNormal(jnp.zeros(2), covariance_matrix=jnp.eye(2))

    sim = process_simulator(simulator, prior)
    theta, x = simulate_for_sbi(
        sim, prior, 1000, show_progress_bar=False, key=jax.random.PRNGKey(0)
    )
    restr = RestrictionEstimator(prior=prior)
    restr.append_simulations(theta, x)
    restr.train(max_num_epochs=40)
    restricted_prior = restr.restrict_prior()
    # populate the acceptance-rate estimate used for normalization.
    _ = restricted_prior.sample(jax.random.PRNGKey(1), (1000,))

    resolution = 200
    grid_range = 4.0
    ax = jnp.linspace(-grid_range, grid_range, resolution)
    gx, gy = jnp.meshgrid(ax, ax)
    grid = jnp.stack([gx.ravel(), gy.ravel()], axis=1)
    cell = (2 * grid_range / resolution) ** 2
    probs = jnp.exp(restricted_prior.log_prob(grid, normalize=True))
    integral = float(jnp.nan_to_num(probs, posinf=0.0).sum() * cell)
    assert 0.8 < integral < 1.2, f"normalized integral {integral}"


# ---------------------------------------------------------------------------
# z-score flag parsing and the transform_to_unconstrained option
# (ref `sbiutils_test.py:407-614`)
# ---------------------------------------------------------------------------


def test_z_score_parser():
    from sbi_tpu.utils import z_score_parser

    assert z_score_parser(None) == (False, False)
    assert z_score_parser("none") == (False, False)
    assert z_score_parser("independent") == (True, False)
    assert z_score_parser("structured") == (True, True)
    assert z_score_parser("transform_to_unconstrained") == (False, False)
    with pytest.warns(UserWarning, match="deprecated"):
        assert z_score_parser(True) == (True, False)
    with pytest.raises(ValueError, match="Invalid z-scoring"):
        z_score_parser("bogus")


@pytest.mark.parametrize("model", ["maf", "nsf", "mdn"])
def test_transform_to_unconstrained_builders(model):
    """z_score_theta='transform_to_unconstrained' + x_dist: the estimator
    models theta in unconstrained space and its samples land inside the
    prior's support by construction (ref `net_builders/mdn.py:66-80`)."""
    from sbi_tpu.neural_nets.factory import posterior_nn

    seed_all_backends(0)
    prior = BoxUniform(-2.0 * jnp.ones(2), 2.0 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (256,))
    x = theta + 0.1 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    est = posterior_nn(
        model, z_score_theta="transform_to_unconstrained", x_dist=prior,
        hidden_features=16, num_transforms=2,
    )(theta, x)

    lp = est.log_prob(theta[:6].reshape(2, 3, -1), x[:3])
    assert lp.shape == (2, 3) and bool(jnp.isfinite(lp).all())
    s = est.sample((64,), x[:3], key=jax.random.PRNGKey(2))
    assert bool((jnp.abs(s) <= 2.0 + 1e-4).all()), "samples escaped the support"
    # density integrates against the support: outside points get -inf-ish
    outside = jnp.asarray([[3.0, 0.0]])
    lp_out = est.log_prob(outside.reshape(1, 1, -1), x[:1])
    assert float(lp_out[0, 0]) < float(lp[0, 0])


def test_transform_to_unconstrained_requires_dist_and_guards():
    from sbi_tpu.neural_nets.factory import classifier_nn, posterior_nn
    from sbi_tpu.neural_nets.net_builders.vector_field_nets import (
        build_flow_matching_estimator,
    )

    theta = jax.random.normal(jax.random.PRNGKey(0), (64, 2))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    with pytest.raises(ValueError, match="x_dist"):
        posterior_nn("maf", z_score_theta="transform_to_unconstrained")(theta, x)
    # unsupported builders raise loudly instead of silently ignoring the flag.
    with pytest.raises(ValueError, match="not supported"):
        classifier_nn("resnet", z_score_theta="transform_to_unconstrained")(theta, x)
    with pytest.raises(ValueError, match="not supported"):
        build_flow_matching_estimator(
            theta, x, z_score_theta="transform_to_unconstrained"
        )
