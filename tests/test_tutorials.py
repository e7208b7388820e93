"""Tutorial workflows: each test runs the user-facing code path of one
reference tutorial notebook (`docs/tutorials/`, `docs/advanced_tutorials/`)
at miniature scale — the documented API sequences must keep working verbatim.

Cited notebooks: 00_getting_started, 01_Bayesian_workflow,
02_multiround_inference, 03_density_estimators, 04_embedding_networks,
05_conditional_distributions, 06_restriction_estimator,
07_sensitivity_analysis, 10_diagnostics_posterior_predictive_checks,
11_diagnostics_simulation_based_calibration, 12_iid_data_and_permutation_
invariant_embeddings, 13_diagnostics_lc2st (tests/test_lc2st.py),
15_importance_sampled_posteriors, 16_implemented_methods,
18_training_interface, 19_vector_field_methods,
21_diagnostics_misspecification_checks, Example_00_HodgkinHuxleyModel,
Example_01_DecisionMakingModel; plus the older-numbering topics the
reference docs cover in prose (08 summary statistics, 09 sampler
interface/sampling.rst, 14 TARP, 20 custom potentials).
"""

import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pytest

from sbi_tpu.inference import NPE, simulate_for_sbi
from sbi_tpu.utils import BoxUniform
from sbi_tpu.utils.sbiutils import seed_all_backends

D = 2
TRAIN_KW = dict(training_batch_size=50, max_num_epochs=12, stop_after_epochs=12)


def _simulator(theta, key=None):
    key = key if key is not None else jax.random.PRNGKey(0)
    return theta + 0.3 * jax.random.normal(key, jnp.shape(theta))


def _quick_npe(num_simulations=300, **npe_kw):
    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(D), 2 * jnp.ones(D))
    theta, x = simulate_for_sbi(
        _simulator, prior, num_simulations=num_simulations,
        show_progress_bar=False, key=jax.random.PRNGKey(0),
    )
    inference = NPE(prior=prior, **npe_kw)
    inference.append_simulations(theta, x).train(**TRAIN_KW)
    return prior, inference, theta, x


def test_00_getting_started():
    """00_getting_started: process prior/simulator, simulate, train NPE,
    sample/log_prob at an observation, pairplot."""
    from sbi_tpu.analysis import pairplot
    from sbi_tpu.utils.user_input_checks import process_prior, process_simulator

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(D), 2 * jnp.ones(D))
    prior, num_parameters, prior_returns_numpy = process_prior(prior)
    assert num_parameters == D and not prior_returns_numpy
    simulator = process_simulator(_simulator, prior, prior_returns_numpy)
    theta, x = simulate_for_sbi(
        simulator, prior, num_simulations=300, show_progress_bar=False,
        key=jax.random.PRNGKey(0),
    )
    inference = NPE(prior=prior)
    inference.append_simulations(theta, x).train(**TRAIN_KW)
    posterior = inference.build_posterior()
    x_o = jnp.zeros(D)
    samples = posterior.sample((200,), x=x_o, key=jax.random.PRNGKey(1))
    log_probability = posterior.log_prob(samples, x=x_o)
    assert samples.shape == (200, D)
    assert bool(jnp.isfinite(log_probability).all())
    fig, axes = pairplot(samples, figsize=(4, 4))
    plt.close(fig)


def test_02_multiround_inference():
    """02_multiround_inference: 2-round SNPE focused on one observation."""
    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(D), 2 * jnp.ones(D))
    x_o = jnp.zeros(D)
    inference = NPE(prior=prior)
    proposal = prior
    for r in range(2):
        theta, x = simulate_for_sbi(
            _simulator, proposal, num_simulations=200,
            show_progress_bar=False, key=jax.random.PRNGKey(r),
        )
        inference.append_simulations(theta, x, proposal=proposal).train(
            **TRAIN_KW
        )
        posterior = inference.build_posterior().set_default_x(x_o)
        proposal = posterior
    samples = posterior.sample((100,), key=jax.random.PRNGKey(9))
    assert samples.shape == (100, D) and bool(jnp.isfinite(samples).all())


@pytest.mark.parametrize("model", ["maf", "nsf"])
def test_03_density_estimators(model):
    """03_density_estimators: string shorthand and the posterior_nn builder
    with custom hyperparameters."""
    from sbi_tpu.neural_nets.factory import posterior_nn

    est = posterior_nn(model=model, hidden_features=20, num_transforms=2)
    prior, inference, theta, x = _quick_npe(density_estimator=est)
    posterior = inference.build_posterior()
    s = posterior.sample((50,), x=jnp.zeros(D), key=jax.random.PRNGKey(2))
    assert bool(jnp.isfinite(s).all())


def test_04_embedding_networks():
    """04_embedding_networks: NPE over a raw time series with a CNN
    embedding passed to posterior_nn."""
    from sbi_tpu.neural_nets.embedding_nets import CNNEmbedding
    from sbi_tpu.neural_nets.factory import posterior_nn

    seed_all_backends(0)
    prior = BoxUniform(-1 * jnp.ones(D), jnp.ones(D))
    T = 16

    def sim_ts(theta, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        t = jnp.linspace(0, 1, T)
        signal = theta[:, :1] * jnp.sin(8 * t)[None] + theta[:, 1:2] * t[None]
        return signal + 0.1 * jax.random.normal(key, (theta.shape[0], T))

    theta, x = simulate_for_sbi(
        sim_ts, prior, num_simulations=200, show_progress_bar=False,
        key=jax.random.PRNGKey(0),
    )
    embedding = CNNEmbedding(input_shape=(T,), output_dim=8)
    est = posterior_nn(model="mdn", embedding_net=embedding)
    inference = NPE(prior=prior, density_estimator=est)
    inference.append_simulations(theta, x).train(**TRAIN_KW)
    posterior = inference.build_posterior()
    s = posterior.sample((50,), x=x[0], key=jax.random.PRNGKey(3))
    assert s.shape == (50, D)


def test_05_conditional_distributions():
    """05_conditional_distributions: conditional correlation matrix and
    conditional pairplot of a trained posterior."""
    from sbi_tpu.analysis import conditional_corrcoeff, conditional_pairplot

    prior, inference, theta, x = _quick_npe()
    posterior = inference.build_posterior().set_default_x(jnp.zeros((1, D)))
    limits = jnp.array([[-2.0, 2.0]] * D)
    condition = posterior.sample((1,), key=jax.random.PRNGKey(4))[0]
    corr = conditional_corrcoeff(
        density=posterior, limits=limits, condition=condition, resolution=20
    )
    assert corr.shape == (D, D) and bool(jnp.isfinite(corr).all())
    fig, axes = conditional_pairplot(
        density=posterior, condition=condition, limits=limits, resolution=20,
        figsize=(4, 4),
    )
    plt.close(fig)


def test_06_restriction_estimator():
    """06_restriction_estimator: learn the valid-simulation region, restrict
    the prior, and simulate from the restricted prior."""
    from sbi_tpu.utils.restriction_estimator import RestrictionEstimator

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(D), 2 * jnp.ones(D))

    def sim_invalid(theta, key=None):
        x = _simulator(theta, key)
        bad = theta[:, 0] < 0.0  # half the prior produces NaNs
        return jnp.where(bad[:, None], jnp.nan, x)

    restriction_estimator = RestrictionEstimator(prior=prior)
    theta, x = simulate_for_sbi(
        sim_invalid, prior, num_simulations=400, show_progress_bar=False,
        key=jax.random.PRNGKey(0),
    )
    restriction_estimator.append_simulations(theta, x)
    restriction_estimator.train(max_num_epochs=30)
    restricted_prior = restriction_estimator.restrict_prior()
    new_theta = restricted_prior.sample(
        key=jax.random.PRNGKey(5), sample_shape=(200,)
    )
    # most draws from the restricted prior must land in the valid half
    assert float((new_theta[:, 0] > 0).mean()) > 0.7


def test_07_sensitivity_analysis():
    """07_sensitivity_analysis: ActiveSubspace over a trained posterior."""
    from sbi_tpu.analysis import ActiveSubspace

    prior, inference, theta, x = _quick_npe()
    posterior = inference.build_posterior().set_default_x(jnp.zeros((1, D)))
    sensitivity = ActiveSubspace(posterior)
    prop = (theta[:, 0] > 0).astype(jnp.float32)  # emergent property
    sensitivity.add_property(theta, prop, hidden_features=20, num_layers=2)
    sensitivity.train(max_num_epochs=20)
    eigvals, eigvecs = sensitivity.find_directions(
        num_monte_carlo_samples=100, key=jax.random.PRNGKey(6)
    )
    assert eigvals.shape == (D,) and eigvecs.shape == (D, D)
    assert bool(jnp.isfinite(eigvals).all())


def test_11_sbc():
    """11_diagnostics_simulation_based_calibration: run_sbc + check_sbc +
    the rank histogram plot."""
    from sbi_tpu.analysis import sbc_rank_plot
    from sbi_tpu.diagnostics.sbc import check_sbc, run_sbc

    prior, inference, theta, x = _quick_npe()
    posterior = inference.build_posterior()
    num_sbc = 30
    thetas = prior.sample(jax.random.PRNGKey(7), (num_sbc,))
    xs = _simulator(thetas, jax.random.PRNGKey(8))
    ranks, dap_samples = run_sbc(
        thetas, xs, posterior, num_posterior_samples=100,
        key=jax.random.PRNGKey(9),
    )
    checks = check_sbc(
        ranks, thetas, dap_samples, num_posterior_samples=100
    )
    assert set(checks) >= {"ks_pvals", "c2st_ranks", "c2st_dap"}
    fig, ax = sbc_rank_plot(
        ranks=ranks, num_posterior_samples=100, plot_type="hist",
        num_bins=10,
    )
    plt.close(fig)


def test_12_iid_data():
    """12_iid_data_and_permutation_invariant_embeddings: NLE scores multiple
    iid trials via the trial-summing potential; NPE handles fixed trial
    counts with a permutation-invariant embedding."""
    from sbi_tpu.inference import NLE_A
    from sbi_tpu.neural_nets.embedding_nets import (
        PermutationInvariantEmbedding,
    )
    from sbi_tpu.neural_nets.factory import posterior_nn

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(D), 2 * jnp.ones(D))
    theta, x = simulate_for_sbi(
        _simulator, prior, num_simulations=300, show_progress_bar=False,
        key=jax.random.PRNGKey(0),
    )
    # --- NLE: iid trials enter as leading axis of x_o
    nle = NLE_A(prior=prior)
    nle.append_simulations(theta, x).train(**TRAIN_KW)
    posterior = nle.build_posterior()
    theta_o = jnp.array([[0.5, -0.5]])
    x_o_iid = _simulator(jnp.repeat(theta_o, 4, axis=0), jax.random.PRNGKey(1))
    s = posterior.sample(
        (100,), x=x_o_iid, key=jax.random.PRNGKey(2),
        num_chains=20, warmup_steps=30,
    )
    assert s.shape == (100, D)
    # iid evidence tightens the posterior vs a single trial
    s1 = posterior.sample(
        (100,), x=x_o_iid[:1], key=jax.random.PRNGKey(3),
        num_chains=20, warmup_steps=30,
    )
    assert float(s.std(0).mean()) < float(s1.std(0).mean())

    # --- NPE: fixed trial count with permutation-invariant embedding
    n_trials = 4
    theta_npe = prior.sample(jax.random.PRNGKey(4), (200,))
    x_trials = jnp.stack(
        [
            _simulator(theta_npe, jax.random.fold_in(jax.random.PRNGKey(5), i))
            for i in range(n_trials)
        ],
        axis=1,
    )  # (N, trials, D)
    embedding = PermutationInvariantEmbedding(output_dim=8)
    est = posterior_nn(model="mdn", embedding_net=embedding)
    npe = NPE(prior=prior, density_estimator=est)
    npe.append_simulations(theta_npe, x_trials).train(**TRAIN_KW)
    post_npe = npe.build_posterior()
    s2 = post_npe.sample(
        (50,),
        x=x_trials[0],
        key=jax.random.PRNGKey(6),
    )
    assert s2.shape == (50, D)


def test_15_importance_sampled_posteriors():
    """15_importance_sampled_posteriors: correct a (possibly leaky) NPE
    posterior by importance sampling against the NLE potential."""
    from sbi_tpu.inference import ImportanceSamplingPosterior, NLE_A
    from sbi_tpu.inference.potentials.likelihood_based_potential import (
        likelihood_estimator_based_potential,
    )

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(D), 2 * jnp.ones(D))
    theta, x = simulate_for_sbi(
        _simulator, prior, num_simulations=300, show_progress_bar=False,
        key=jax.random.PRNGKey(0),
    )
    npe = NPE(prior=prior)
    npe.append_simulations(theta, x).train(**TRAIN_KW)
    proposal = npe.build_posterior().set_default_x(jnp.zeros(D))
    nle = NLE_A(prior=prior)
    nle.append_simulations(theta, x).train(**TRAIN_KW)
    potential_fn, _ = likelihood_estimator_based_potential(
        nle._neural_net.snapshot(), prior, x_o=jnp.zeros((1, D))
    )
    posterior = ImportanceSamplingPosterior(
        potential_fn=potential_fn, proposal=proposal, method="sir"
    )
    s = posterior.sample((100,), key=jax.random.PRNGKey(1))
    assert s.shape == (100, D) and bool(jnp.isfinite(s).all())


def test_17_plotting_functionality():
    """17_plotting_functionality: pairplot modes and option dataclasses."""
    from sbi_tpu.analysis import marginal_plot, pairplot

    samples = np.random.RandomState(0).randn(400, 3)
    fig, axes = pairplot(
        samples,
        limits=[[-3, 3]] * 3,
        figsize=(5, 5),
        diag="kde",
        upper="contour",
        labels=[r"$\theta_1$", r"$\theta_2$", r"$\theta_3$"],
    )
    plt.close(fig)
    fig, axes = pairplot(
        [samples, samples + 0.5],
        diag=["hist", "kde"],
        upper=["hist", "scatter"],
        figsize=(5, 5),
    )
    plt.close(fig)
    fig, axes = marginal_plot(samples, figsize=(5, 2))
    plt.close(fig)


def test_19_vector_field_methods():
    """19_vector_field_methods: FMPE trains, samples via SDE-default and
    ODE, and evaluates log-probs through the CNF."""
    from sbi_tpu.inference import FMPE

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(D), 2 * jnp.ones(D))
    theta, x = simulate_for_sbi(
        _simulator, prior, num_simulations=300, show_progress_bar=False,
        key=jax.random.PRNGKey(0),
    )
    inference = FMPE(prior=prior)
    inference.append_simulations(theta, x).train(**TRAIN_KW)
    posterior = inference.build_posterior()
    x_o = jnp.zeros(D)
    s = posterior.sample((100,), x=x_o, key=jax.random.PRNGKey(1))
    s_ode = posterior.sample_via_ode((100,), x=x_o, key=jax.random.PRNGKey(2))
    lp = posterior.log_prob(s[:20], x=x_o)
    assert s.shape == s_ode.shape == (100, D)
    assert bool(jnp.isfinite(lp).all())


def test_21_misspecification_checks():
    """21_diagnostics_misspecification_checks: permutation MMD test flags a
    shifted observation, passes a typical one."""
    from sbi_tpu.diagnostics.misspecification import calc_misspecification_mmd

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(D), 2 * jnp.ones(D))
    theta = prior.sample(jax.random.PRNGKey(0), (300,))
    x = _simulator(theta, jax.random.PRNGKey(1))
    # held-out typical observation vs a grossly shifted one
    x_typical = _simulator(prior.sample(jax.random.PRNGKey(7), (1,)),
                           jax.random.PRNGKey(8))
    x_shifted = x_typical + 20.0
    p_ok, _ = calc_misspecification_mmd(
        x=x, x_obs=x_typical, mode="raw", num_permutations=200,
        key=jax.random.PRNGKey(2),
    )
    p_bad, _ = calc_misspecification_mmd(
        x=x, x_obs=x_shifted, mode="raw", num_permutations=200,
        key=jax.random.PRNGKey(3),
    )
    assert float(p_bad) <= 0.05
    assert float(p_ok) > float(p_bad)
    assert float(p_ok) > 0.05


def test_00_simple_interface_infer():
    """00_getting_started's one-liner: infer(simulator, prior, method, n)."""
    from sbi_tpu.inference import infer

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(D), 2 * jnp.ones(D))
    posterior = infer(
        _simulator, prior, method="NPE", num_simulations=200,
        train_kwargs=TRAIN_KW, key=jax.random.PRNGKey(0),
    )
    s = posterior.sample((50,), x=jnp.zeros(D), key=jax.random.PRNGKey(1))
    assert s.shape == (50, D) and bool(jnp.isfinite(s).all())


def test_22_ensembles_on_tpu():
    """22 — Ensembles: vmapped train_ensemble -> build_ensemble_posterior
    (PoE) -> MCMC sample with bounded programs -> evidence weighting."""
    from sbi_tpu.inference import NLE_A

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(D), 2 * jnp.ones(D))
    theta, x = simulate_for_sbi(
        _simulator, prior, num_simulations=300,
        show_progress_bar=False, key=jax.random.PRNGKey(0),
    )
    inference = NLE_A(prior=prior)
    inference.append_simulations(theta, x)
    inference.train_ensemble(
        num_members=2, max_num_epochs=12, stop_after_epochs=12,
        training_batch_size=50,
    )
    ens = inference.build_ensemble_posterior(potential_combination="product")
    x_o = jnp.zeros(D)
    ens.set_default_x(x_o)
    samples = ens.sample(
        (200,), key=jax.random.PRNGKey(1), num_chains=20, warmup_steps=50,
        max_sweeps_per_program=8,
    )
    assert samples.shape == (200, D)
    assert bool(jnp.isfinite(samples).all())
    logz = ens.weight_by_evidence(x=x_o, num_samples=2000,
                                  key=jax.random.PRNGKey(2))
    assert logz.shape == (2,) and bool(jnp.isfinite(logz).all())
    # the weights must actually be the evidence softmax (sum-to-1 alone is
    # vacuous — the property normalizes by construction)
    assert jnp.allclose(ens.weights, jax.nn.softmax(logz), atol=1e-5)


def test_01_bayesian_workflow():
    """01_Bayesian_workflow: prior predictive -> inference -> calibration
    (SBC + TARP) -> posterior predictive, the full loop in miniature."""
    from sbi_tpu.analysis import pairplot
    from sbi_tpu.diagnostics.sbc import run_sbc
    from sbi_tpu.diagnostics.tarp import check_tarp, run_tarp

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(D), 2 * jnp.ones(D))
    x_o = jnp.zeros(D)
    # 1. prior predictive: observation inside the simulated cloud
    theta_pp = prior.sample(jax.random.PRNGKey(0), (300,))
    x_pp = _simulator(theta_pp, jax.random.PRNGKey(1))
    assert bool((x_pp.min(0) < x_o).all() and (x_o < x_pp.max(0)).all())
    fig, _ = pairplot(x_pp, points=x_o, figsize=(4, 4))
    plt.close(fig)
    # 2. inference
    inference = NPE(prior=prior)
    inference.append_simulations(theta_pp, x_pp).train(**TRAIN_KW)
    posterior = inference.build_posterior()
    # 3. calibration on held-out pairs
    theta_t = prior.sample(jax.random.PRNGKey(2), (20,))
    x_t = _simulator(theta_t, jax.random.PRNGKey(3))
    ranks, _ = run_sbc(theta_t, x_t, posterior, num_posterior_samples=50,
                       key=jax.random.PRNGKey(4))
    assert ranks.shape == (20, D)
    ecp, alpha = run_tarp(theta_t, x_t, posterior,
                          num_posterior_samples=50,
                          key=jax.random.PRNGKey(5))
    atc, ks_pval = check_tarp(ecp, alpha)
    assert bool(jnp.isfinite(ecp).all())
    # 4. posterior predictive at the observation
    theta_post = posterior.sample((200,), x=x_o, key=jax.random.PRNGKey(6))
    x_ppc = _simulator(theta_post, jax.random.PRNGKey(7))
    # x_o must be typical under the predictive (well inside 3 sigma)
    z = jnp.abs((x_o - x_ppc.mean(0)) / x_ppc.std(0))
    assert float(z.max()) < 3.0


def test_08_summary_statistics():
    """08 — crafted summary statistics: wrap a raw-output simulator in a
    jittable reduction and run standard NPE on the summaries."""
    seed_all_backends(0)
    prior = BoxUniform(jnp.array([0.5, -1.0]), jnp.array([2.0, 1.0]))
    T = 50

    def simulator_raw(theta, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        t = jnp.linspace(0, 1, T)
        base = theta[:, :1] * jnp.exp(-3 * t)[None] + theta[:, 1:2]
        return base + 0.05 * jax.random.normal(key, (theta.shape[0], T))

    def summarize(x_raw):
        return jnp.stack(
            [x_raw.mean(-1), x_raw.std(-1),
             jnp.quantile(x_raw, 0.1, axis=-1),
             jnp.quantile(x_raw, 0.9, axis=-1)], axis=-1)

    def simulator_summ(theta, key=None):
        return summarize(simulator_raw(theta, key))

    theta, x = simulate_for_sbi(
        simulator_summ, prior, num_simulations=300,
        show_progress_bar=False, key=jax.random.PRNGKey(0),
    )
    assert x.shape == (300, 4)
    inference = NPE(prior=prior)
    inference.append_simulations(theta, x).train(**TRAIN_KW)
    posterior = inference.build_posterior()
    s = posterior.sample((50,), x=x[0], key=jax.random.PRNGKey(1))
    assert s.shape == (50, 2) and bool(jnp.isfinite(s).all())


def test_09_sampler_interface():
    """09 — sampler choice on an NLE posterior: sample_with strings, MCMC
    method names, and the typed posterior_parameters dataclasses."""
    from sbi_tpu.inference import NLE_A
    from sbi_tpu.inference.posteriors import (
        ImportanceSamplingPosteriorParameters,
        MCMCPosteriorParameters,
    )

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(D), 2 * jnp.ones(D))
    theta, x = simulate_for_sbi(
        _simulator, prior, num_simulations=300, show_progress_bar=False,
        key=jax.random.PRNGKey(0),
    )
    nle = NLE_A(prior=prior)
    nle.append_simulations(theta, x).train(**TRAIN_KW)
    x_o = jnp.zeros(D)
    # string interface
    post_mcmc = nle.build_posterior(sample_with="mcmc", mcmc_method="nuts")
    s = post_mcmc.sample((50,), x=x_o, key=jax.random.PRNGKey(1),
                         num_chains=10, warmup_steps=20)
    assert s.shape == (50, D)
    # typed dataclasses
    post_typed = nle.build_posterior(
        posterior_parameters=MCMCPosteriorParameters(
            method="slice_jax_vectorized", num_chains=10, warmup_steps=20)
    )
    s = post_typed.sample((50,), x=x_o, key=jax.random.PRNGKey(2))
    assert s.shape == (50, D)
    post_is = nle.build_posterior(
        posterior_parameters=ImportanceSamplingPosteriorParameters(
            method="sir", oversampling_factor=8)
    )
    s = post_is.sample((50,), x=x_o, key=jax.random.PRNGKey(3))
    assert s.shape == (50, D) and bool(jnp.isfinite(s).all())


def test_10_posterior_predictive_checks():
    """10_diagnostics_posterior_predictive_checks: re-simulate at posterior
    draws; the observation must be typical under the predictive."""
    prior, inference, theta, x = _quick_npe()
    x_o = jnp.zeros(D)
    posterior = inference.build_posterior()
    theta_post = posterior.sample((200,), x=x_o, key=jax.random.PRNGKey(1))
    x_pred = _simulator(theta_post, jax.random.PRNGKey(2))
    z = jnp.abs((x_o - x_pred.mean(0)) / x_pred.std(0))
    assert float(z.max()) < 3.0
    # a grossly shifted pseudo-observation fails the same check
    z_bad = jnp.abs((x_o + 10.0 - x_pred.mean(0)) / x_pred.std(0))
    assert float(z_bad.min()) > 3.0


def test_14_tarp():
    """14 (TARP) — run_tarp/check_tarp/plot_tarp on held-out pairs."""
    from sbi_tpu.analysis import plot_tarp
    from sbi_tpu.diagnostics.tarp import check_tarp, run_tarp

    prior, inference, theta, x = _quick_npe()
    posterior = inference.build_posterior()
    theta_t = prior.sample(jax.random.PRNGKey(11), (30,))
    x_t = _simulator(theta_t, jax.random.PRNGKey(12))
    ecp, alpha = run_tarp(theta_t, x_t, posterior,
                          num_posterior_samples=100,
                          key=jax.random.PRNGKey(13))
    atc, ks_pval = check_tarp(ecp, alpha)
    assert ecp.shape == alpha.shape and bool(jnp.isfinite(ecp).all())
    assert 0.0 <= float(ks_pval) <= 1.0
    fig, ax = plot_tarp(ecp, alpha)
    plt.close(fig)


def test_16_implemented_methods():
    """16_implemented_methods: every documented trainer class imports from
    sbi_tpu.inference and constructs against a prior."""
    from sbi_tpu import inference as inf

    prior = BoxUniform(-jnp.ones(D), jnp.ones(D))
    trainers = ["NPE", "NPE_A", "NPE_B", "NPE_C", "MNPE",
                "NLE", "NLE_A", "MNLE", "NRE", "NRE_A", "NRE_B", "NRE_C",
                "BNRE", "FMPE", "NPSE", "MarginalTrainer"]
    for name in trainers:
        cls = getattr(inf, name)
        obj = cls(prior=prior)
        assert hasattr(obj, "append_simulations") and hasattr(obj, "train")
    # NPE_PFN needs the optional tabpfn dep or an injected adapter
    assert hasattr(inf, "NPE_PFN")
    with pytest.raises(ImportError, match="tabpfn"):
        inf.NPE_PFN(prior=prior)
    for name in ["MCABC", "SMCABC"]:
        assert hasattr(inf, name)


def test_18_low_level_training_interface():
    """18_training_interface: hand-written optax loop over the estimator's
    pure loss_fn, then wrap in DirectPosterior."""
    import optax

    from sbi_tpu.inference import DirectPosterior
    from sbi_tpu.neural_nets.factory import posterior_nn

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(D), 2 * jnp.ones(D))
    theta, x = simulate_for_sbi(
        _simulator, prior, num_simulations=300, show_progress_bar=False,
        key=jax.random.PRNGKey(0),
    )
    estimator = posterior_nn(model="maf", hidden_features=20,
                             num_transforms=2)(theta, x)
    opt = optax.adam(5e-4)
    opt_state = opt.init(estimator.params)

    @jax.jit
    def step(params, opt_state, theta_b, x_b):
        loss, grads = jax.value_and_grad(
            lambda p: estimator.loss_fn(p, theta_b, x_b).mean())(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first_loss = None
    for epoch in range(20):
        estimator.params, opt_state, loss = step(
            estimator.params, opt_state, theta, x)
        if first_loss is None:
            first_loss = float(loss)
    assert float(loss) < first_loss  # the loop actually trains
    posterior = DirectPosterior(posterior_estimator=estimator, prior=prior)
    s = posterior.sample((50,), x=jnp.zeros(D), key=jax.random.PRNGKey(1))
    assert s.shape == (50, D) and bool(jnp.isfinite(s).all())


def test_20_custom_potentials():
    """20 (custom potentials): an analytic potential drives MCMCPosterior
    through CustomPotentialWrapper; moments match the analytic target."""
    from sbi_tpu.inference import MCMCPosterior
    from sbi_tpu.inference.potentials.base_potential import (
        CustomPotentialWrapper,
    )
    from sbi_tpu.utils.distributions import MultivariateNormal

    seed_all_backends(0)
    prior = MultivariateNormal(jnp.zeros(D), 4.0 * jnp.eye(D))
    x_o = 0.5 * jnp.ones((1, D))

    def potential(theta, x_o):  # exact Gaussian likelihood * prior
        ll = -0.5 * jnp.sum((x_o - theta) ** 2 / 0.25, axis=-1)
        return ll + prior.log_prob(theta)

    posterior = MCMCPosterior(
        CustomPotentialWrapper(potential, prior=prior, x_o=x_o),
        proposal=prior, num_chains=50, warmup_steps=100,
    )
    s = posterior.sample((2000,), key=jax.random.PRNGKey(1))
    # analytic posterior: mean = x_o * 4/(4+0.25), var = 1/(1/4+1/0.25)
    post_mean = 0.5 * 4.0 / 4.25
    post_std = (1.0 / (1.0 / 4.0 + 1.0 / 0.25)) ** 0.5
    assert jnp.allclose(s.mean(0), post_mean, atol=0.1)
    assert jnp.allclose(s.std(0), post_std, atol=0.1)


def test_example_hodgkin_huxley():
    """Example_00_HodgkinHuxleyModel: on-device HH simulator -> summaries
    -> NPE -> posterior around the classic conductances."""
    from sbi_tpu.simulators.hodgkin_huxley import hh_prior, hodgkin_huxley

    seed_all_backends(0)
    prior = hh_prior()
    theta = prior.sample(jax.random.PRNGKey(0), (100,))
    x = hodgkin_huxley(theta, key=jax.random.PRNGKey(1))
    assert x.shape == (100, 7) and bool(jnp.isfinite(x).all())
    v = hodgkin_huxley(theta[:4], key=jax.random.PRNGKey(2),
                       return_trace=True)
    assert v.ndim == 2 and v.shape[0] == 4
    inference = NPE(prior=prior, density_estimator="mdn")
    inference.append_simulations(theta, x).train(
        training_batch_size=50, max_num_epochs=5, stop_after_epochs=5)
    posterior = inference.build_posterior()
    x_o = hodgkin_huxley(jnp.array([[120.0, 36.0]]),
                         key=jax.random.PRNGKey(3))
    s = posterior.sample((50,), x=x_o[0], key=jax.random.PRNGKey(4))
    assert s.shape == (50, 2) and bool(jnp.isfinite(s).all())


def test_example_decision_making_mnle():
    """Example_01_DecisionMakingModel: MNLE over mixed (rt, choice) data."""
    from sbi_tpu.inference import MNLE

    seed_all_backends(0)
    prior = BoxUniform(jnp.array([-2.0, -2.0]), jnp.array([2.0, 2.0]))
    theta = prior.sample(jax.random.PRNGKey(0), (500,))
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    rt = theta[:, :1] + 0.3 * jax.random.normal(k1, (500, 1))
    choice = jax.random.bernoulli(
        k2, jax.nn.sigmoid(2.0 * theta[:, 1:2])).astype(jnp.float32)
    x = jnp.concatenate([rt, choice], axis=1)
    inference = MNLE(prior=prior, num_discrete=1)
    inference.append_simulations(theta, x)
    inference.train(max_num_epochs=15, training_batch_size=100)
    posterior = inference.build_posterior()
    x_o = jnp.array([[0.5, 1.0]])
    s = posterior.sample((50,), x=x_o, key=jax.random.PRNGKey(2),
                         num_chains=10, warmup_steps=30)
    assert s.shape == (50, 2) and bool(jnp.isfinite(s).all())


def test_19b_score_guidance_and_iid_log_prob():
    """19 extension: NPSE guidance (interval / tempering / prior swap) and
    iid-composed log_prob run as documented."""
    from sbi_tpu.inference import NPSE
    from sbi_tpu.utils.distributions import MultivariateNormal

    seed_all_backends(0)
    prior = MultivariateNormal(jnp.zeros(D), covariance_matrix=jnp.eye(D))
    theta = prior.sample(jax.random.PRNGKey(0), (300,))
    x = _simulator(theta, jax.random.PRNGKey(1))
    inference = NPSE(prior=prior, sde_type="vp")
    inference.append_simulations(theta, x).train(**TRAIN_KW)
    npse_posterior = inference.build_posterior()
    x_o = jnp.zeros((1, D))
    s = npse_posterior.sample(
        (50,), x=x_o, key=jax.random.PRNGKey(2), steps=60,
        guidance_method="interval",
        guidance_params={"lower_bound": -1.0, "upper_bound": 1.0},
    )
    assert s.shape == (50, D) and bool(jnp.isfinite(s).all())
    s = npse_posterior.sample(
        (50,), x=x_o, key=jax.random.PRNGKey(3), steps=60,
        guidance_method="affine_classifier_free",
        guidance_params={"likelihood_scale": 1.5},
    )
    assert bool(jnp.isfinite(s).all())
    new_prior = MultivariateNormal(0.2 + jnp.zeros(D),
                                   covariance_matrix=0.5 * jnp.eye(D))
    s = npse_posterior.sample(
        (50,), x=x_o, key=jax.random.PRNGKey(4), steps=60,
        guidance_method="prior_guide",
        guidance_params={"test_prior": new_prior},
    )
    assert bool(jnp.isfinite(s).all())
    x_iid = _simulator(jnp.zeros((3, D)), jax.random.PRNGKey(5))
    lp = npse_posterior.log_prob(s[:10], x=x_iid)
    assert lp.shape == (10,) and bool(jnp.isfinite(lp).all())
