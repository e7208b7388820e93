"""Tutorial workflows: each test runs the user-facing code path of one
reference tutorial notebook (`docs/tutorials/`, `docs/advanced_tutorials/`)
at miniature scale — the documented API sequences must keep working verbatim.

Cited notebooks: 00_getting_started, 02_multiround_inference,
03_density_estimators, 04_embedding_networks, 05_conditional_distributions,
06_restriction_estimator, 07_sensitivity_analysis,
11_diagnostics_simulation_based_calibration, 12_iid_data_and_permutation_
invariant_embeddings, 15_importance_sampled_posteriors,
17_plotting_functionality, 19_vector_field_methods,
21_diagnostics_misspecification_checks.
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
