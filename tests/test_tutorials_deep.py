"""The deep walkthroughs (docs/tutorials/*.md) run end-to-end.

Every ```python block of each walkthrough is exec'd as one program, with
budget-shrinking substitutions (each must hit — docs drift fails the test)
and FIG_DIR redirected to tmp. The full-budget run that generates the
committed figures is `scripts/run_deep_tutorials.py`.
"""

import importlib.util
import os

import matplotlib
import pytest

matplotlib.use("Agg")

_SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
_spec = importlib.util.spec_from_file_location(
    "tutorial_blocks", os.path.join(_SCRIPTS, "tutorial_blocks.py")
)
tutorial_blocks = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(tutorial_blocks)


def _run(md_name, tmp_path, subs):
    import matplotlib.pyplot as plt

    subs = [('FIG_DIR = "docs/figures"', f'FIG_DIR = "{tmp_path}"')] + list(subs)
    try:
        ns = tutorial_blocks.run_tutorial(md_name, substitutions=subs)
    finally:
        plt.close("all")
    return ns


def test_deep_tutorial_inventory():
    for name in tutorial_blocks.DEEP_TUTORIALS:
        path = os.path.join(tutorial_blocks.TUTORIAL_DIR, name)
        assert os.path.exists(path), name
        assert len(tutorial_blocks.extract_blocks(path)) >= 4, name


@pytest.mark.slow
def test_00_getting_started_deep(tmp_path):
    ns = _run(
        "00_getting_started.md",
        tmp_path,
        [
            ("NUM_SIMULATIONS = 2000", "NUM_SIMULATIONS = 600"),
            ("NUM_POSTERIOR_SAMPLES = 10_000", "NUM_POSTERIOR_SAMPLES = 500"),
            ("inference.train(training_batch_size=200)",
             "inference.train(training_batch_size=100, max_num_epochs=40)"),
            ("posterior.map(x=x_o, num_iter=200)",
             "posterior.map(x=x_o, num_iter=60)"),
            ("< 0.2)", "< 0.4)"),
            ("< 0.25)", "< 0.45)"),
        ],
    )
    assert ns["posterior_samples"].shape == (500, 3)
    assert ns["batched"].shape == (1000, 2, 3)


@pytest.mark.slow
def test_01_multiround_deep(tmp_path):
    ns = _run(
        "01_multiround_inference.md",
        tmp_path,
        [
            ("PER_ROUND = 500", "PER_ROUND = 200"),
            ("EVAL_SAMPLES = 1000", "EVAL_SAMPLES = 300"),
            ("num_samples_to_estimate_support=10_000",
             "num_samples_to_estimate_support=2_000"),
            ("c2st_rounds[-1] < 0.62", "c2st_rounds[-1] < 0.80"),
        ],
    )
    assert len(ns["round_samples"]) == ns["NUM_ROUNDS"]
    assert ns["theta_t"].shape == (200, 2)


@pytest.mark.slow
def test_02_embeddings_deep(tmp_path):
    ns = _run(
        "02_embedding_networks.md",
        tmp_path,
        [
            ("NUM_SIMULATIONS = 3000", "NUM_SIMULATIONS = 500"),
            ("MAX_EPOCHS = 80", "MAX_EPOCHS = 8"),
            ("posterior.sample((5000,)", "posterior.sample((400,)"),
            ("assert jnp.all(err < 0.15)", "assert jnp.all(err < 0.6)"),
            ("(jax.random.PRNGKey(5), (100,))",
             "(jax.random.PRNGKey(5), (20,))"),
        ],
    )
    assert ns["samples"].shape == (400, 2)


@pytest.mark.slow
def test_03_diagnostics_battery_deep(tmp_path):
    ns = _run(
        "03_diagnostics_battery.md",
        tmp_path,
        [
            ("NUM_SIMULATIONS = 4000", "NUM_SIMULATIONS = 800"),
            ("NUM_SBC_RUNS = 200", "NUM_SBC_RUNS = 40"),
            ("NUM_POSTERIOR_SAMPLES = 500", "NUM_POSTERIOR_SAMPLES = 120"),
            # 40 test runs x 120 samples is too little power for the
            # full-budget calibration bars; keep the checks directional.
            ("assert jnp.all(stats[\"ks_pvals\"] > 0.01)",
             "assert jnp.all(stats[\"ks_pvals\"] > 1e-4)"),
            ("assert abs(atc) < 0.1 and ks_pval > 0.01",
             "assert abs(atc) < 0.3 and ks_pval > 1e-4"),
            ("assert p_value > 0.01", "assert p_value > 1e-4"),
        ],
    )
    assert ns["ranks"].shape[0] == 40
    assert float(ns["p_value"]) >= 0.0


@pytest.mark.slow
def test_04_mcmc_potentials_deep(tmp_path):
    ns = _run(
        "04_mcmc_and_potentials.md",
        tmp_path,
        [
            ("NUM_SIMULATIONS = 2500", "NUM_SIMULATIONS = 500"),
            ("NUM_SAMPLES = 1000", "NUM_SAMPLES = 300"),
            ("num_chains=100, warmup_steps=150,",
             "num_chains=40, warmup_steps=60,"),
            ("method=method, num_chains=50, warmup_steps=150)",
             "method=method, num_chains=20, warmup_steps=50)"),
            ("p.sample((500,), x=x_o)", "p.sample((100,), x=x_o)"),
            ("c2st(s, target[:500])", "c2st(s, target[:100])"),
            ("assert score < 0.62", "assert score < 0.80"),
            ("banana.sample((2000,))", "banana.sample((300,))"),
        ],
    )
    assert ns["banana_samples"].shape == (300, 2)


@pytest.mark.slow
def test_05_hodgkin_huxley_deep(tmp_path):
    ns = _run(
        "05_hodgkin_huxley.md",
        tmp_path,
        [
            ("NUM_SIMULATIONS = 3000", "NUM_SIMULATIONS = 400"),
            ("NUM_POSTERIOR_SAMPLES = 2000", "NUM_POSTERIOR_SAMPLES = 300"),
            ("inference.train(training_batch_size=200)",
             "inference.train(training_batch_size=100, max_num_epochs=30)"),
            ("float(err[0]) < 20.0 and float(err[1]) < 6.0",
             "float(err[0]) < 40.0 and float(err[1]) < 12.0"),
            ("jnp.median(jnp.abs(sc_pp - sc_o)) <= 2",
             "jnp.median(jnp.abs(sc_pp - sc_o)) <= 4"),
        ],
    )
    assert ns["samples"].shape == (300, 2)


@pytest.mark.slow
def test_06_scaling_tpu_mesh_deep(tmp_path):
    ns = _run(
        "06_scaling_tpu_mesh.md",
        tmp_path,
        [
            ("NUM_SIMULATIONS = 8000", "NUM_SIMULATIONS = 1600"),
            ("stop_after_epochs=10, mesh=mesh,",
             "stop_after_epochs=5, mesh=mesh,"),
            ("stop_after_epochs=8,", "stop_after_epochs=4,"),
            ("NUM_CHAINS = 16 * N_DEV", "NUM_CHAINS = 4 * N_DEV"),
            ("warmup_steps=60", "warmup_steps=30"),
            ("mcmc_posterior.sample(\n    (2000,)",
             "mcmc_posterior.sample(\n    (400,)"),
            ("assert mcmc_samples.shape == (2000, NUM_DIM)",
             "assert mcmc_samples.shape == (400, NUM_DIM)"),
            ("(jax.random.PRNGKey(3), (2000,))",
             "(jax.random.PRNGKey(3), (400,))"),
            ("< 0.60", "< 0.80"),
            ("(500,), x=xs", "(150,), x=xs"),
            ("batched.shape == (500,", "batched.shape == (150,"),
            ("NUM_SBC_RUNS = 16 * N_DEV", "NUM_SBC_RUNS = 4 * N_DEV"),
            ("num_posterior_samples=250", "num_posterior_samples=120"),
            ("ensemble.sample((1000,)", "ensemble.sample((300,)"),
            ("ens_samples.shape == (1000,", "ens_samples.shape == (300,"),
        ],
    )
    import jax as _jax

    n_dev = len(_jax.devices())
    assert n_dev >= 2, "mesh tutorial needs the virtual-device conftest"
    assert ns["ranks"].shape == (4 * n_dev, ns["NUM_DIM"])
    assert ns["max_dev"] < 5e-3
