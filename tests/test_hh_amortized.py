"""BASELINE config 5: amortized NPE on the Hodgkin-Huxley sweep + SBC/TARP
diagnostic battery (slow; the round-trip of the reference's flagship
tutorial)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.diagnostics import check_sbc, check_tarp, run_sbc, run_tarp
from sbi_tpu.inference import NPE
from sbi_tpu.simulators.hodgkin_huxley import hh_prior, hodgkin_huxley
from sbi_tpu.utils.sbiutils import seed_all_backends


@pytest.mark.slow
def test_hh_amortized_npe_with_diagnostics():
    seed_all_backends(0)
    prior = hh_prior()
    theta = prior.sample(jax.random.PRNGKey(0), (3000,))
    x = hodgkin_huxley(theta, key=jax.random.PRNGKey(1))
    finite = jnp.isfinite(x).all(axis=1)
    assert float(finite.mean()) > 0.99, float(finite.mean())

    inference = NPE(prior=prior, density_estimator="nsf")
    inference.append_simulations(theta, x).train(training_batch_size=200)
    posterior = inference.build_posterior()

    # point check: posterior concentrates around the true conductances
    theta_o = jnp.array([[120.0, 36.0]])  # classic squid-axon values
    x_o = hodgkin_huxley(theta_o, key=jax.random.PRNGKey(2))
    samples = posterior.sample((500,), x=x_o, key=jax.random.PRNGKey(3))
    post_mean = np.asarray(samples.mean(0))
    assert abs(post_mean[0] - 120.0) < 40.0, post_mean
    assert abs(post_mean[1] - 36.0) < 15.0, post_mean

    # diagnostic battery over 100 fresh (theta, x) pairs
    thetas_cal = prior.sample(jax.random.PRNGKey(10), (100,))
    xs_cal = hodgkin_huxley(thetas_cal, key=jax.random.PRNGKey(11))
    ranks, dap = run_sbc(
        thetas_cal, xs_cal, posterior, num_posterior_samples=200,
        key=jax.random.PRNGKey(12),
    )
    checks = check_sbc(ranks, prior.sample(jax.random.PRNGKey(13), (100,)), dap, 200)
    # amortized NPE on a well-posed 2-param task should be roughly calibrated
    assert float(checks["ks_pvals"].min()) > 1e-4, checks["ks_pvals"]

    ecp, alpha = run_tarp(
        thetas_cal, xs_cal, posterior, num_posterior_samples=200,
        key=jax.random.PRNGKey(14),
    )
    assert float(jnp.abs(ecp - alpha).max()) < 0.3

    # LC2ST completes the BASELINE config-5 battery: one posterior draw per
    # calibration pair; the observed statistic should not blow past the
    # permutation null on a roughly-calibrated amortized posterior.
    from sbi_tpu.diagnostics import LC2ST

    q_cal = posterior.sample_batched(
        (1,), xs_cal, key=jax.random.PRNGKey(15)
    )[0]  # (100, D)
    lc2st = LC2ST(thetas_cal, xs_cal, q_cal, num_folds=2,
                  num_trials_null=20)
    lc2st.train_on_observed_data()
    lc2st.train_under_null_hypothesis()
    theta_post_o = posterior.sample((100,), x=x_o, key=jax.random.PRNGKey(16))
    p = float(lc2st.p_value(theta_post_o, x_o))
    assert 0.0 <= p <= 1.0
    # With only 20 permutation nulls, p has 0.05 granularity and p=0 occurs
    # ~1/21 of the time even under perfect calibration — compare the
    # observed statistic against the null DISTRIBUTION instead.
    stat = lc2st.get_statistic_on_observed_data(theta_post_o, x_o)
    null = lc2st.get_statistics_under_null_hypothesis(theta_post_o, x_o)
    assert stat < null.mean() + 5 * null.std() + 1e-6, (stat, null)
