"""mini-sbibm benchmark harness (counterpart of `tests/bm_test.py` +
`tests/conftest.py:119-229` harvest in the reference).

Run with: pytest tests/test_bm.py --bm [--bm-mode=npe|nle|nre|fmpe|npse]
[--bm-num-simulations=2000]. Results land in .bm_results/results_all.csv and
a method x task C2ST table prints in the terminal summary.
"""

import csv
import os

import jax
import jax.numpy as jnp
import pytest

from sbi_tpu.utils.metrics import c2st
from sbi_tpu.utils.sbiutils import seed_all_backends

from tests.mini_sbibm import ALL_BENCH_TASKS, get_bench_task

RESULTS_DIR = ".bm_results"

def _make_fmpe(prior):
    from sbi_tpu.inference import FMPE
    from sbi_tpu.neural_nets.factory import posterior_flow_nn

    return FMPE(prior=prior,
                density_estimator=posterior_flow_nn("ada_mlp", hidden_features=256))


def _make_npse(prior):
    from sbi_tpu.inference import NPSE
    from sbi_tpu.neural_nets.factory import posterior_score_nn

    return NPSE(prior=prior, density_estimator=posterior_score_nn(
        "ada_mlp", sde_type="vp", hidden_features=256))


METHODS = {
    "npe": lambda prior: __import__("sbi_tpu.inference", fromlist=["NPE"]).NPE(
        prior=prior, density_estimator="nsf"
    ),
    "nle": lambda prior: __import__("sbi_tpu.inference", fromlist=["NLE_A"]).NLE_A(
        prior=prior
    ),
    "nre": lambda prior: __import__("sbi_tpu.inference", fromlist=["NRE_B"]).NRE_B(
        prior=prior
    ),
    "fmpe": _make_fmpe,
    "npse": _make_npse,
    # sequential: 3 rounds focused on each observation
    "snpe": lambda prior: __import__("sbi_tpu.inference", fromlist=["NPE_C"]).NPE_C(
        prior=prior, density_estimator="nsf"
    ),
    "snle": lambda prior: __import__("sbi_tpu.inference", fromlist=["NLE_A"]).NLE_A(
        prior=prior
    ),
}

SEQUENTIAL = {"snpe", "snle"}


def _bm_enabled(request):
    return request.config.getoption("--bm", default=False)


def pytest_generate_tests(metafunc):
    if "bm_method" in metafunc.fixturenames:
        mode = metafunc.config.getoption("--bm-mode", default=None)
        methods = [mode] if mode else list(METHODS)
        metafunc.parametrize("bm_method", methods)
    if "bm_task" in metafunc.fixturenames:
        metafunc.parametrize("bm_task", list(ALL_BENCH_TASKS))


@pytest.mark.benchmark
def test_benchmark(bm_method, bm_task, request):
    if not _bm_enabled(request):
        pytest.skip("benchmark tests require --bm")
    num_simulations = int(
        request.config.getoption("--bm-num-simulations", default=2000)
    )
    seed_all_backends(0)
    bench = get_bench_task(bm_task)
    prior = bench.prior

    scores = []
    if bm_method in SEQUENTIAL:
        # 3 rounds per observation, equal split of the simulation budget
        # (mirrors the reference's snpe bm mode).
        num_rounds = 3
        per_round = num_simulations // num_rounds
        for i in range(bench.observations.shape[0]):
            x_o = bench.get_observation(i)
            ref = bench.get_reference_posterior_samples(i)
            inference = METHODS[bm_method](prior)
            proposal = prior
            mcmc_kwargs = (
                dict(num_chains=100, warmup_steps=100)
                if bm_method == "snle"
                else {}
            )
            for r in range(num_rounds):
                if r == 0:
                    theta = proposal.sample(jax.random.PRNGKey(100 * i), (per_round,))
                else:
                    theta = proposal.sample(
                        (per_round,), key=jax.random.PRNGKey(100 * i + r),
                        **mcmc_kwargs,
                    )
                x = bench.simulator(theta, key=jax.random.PRNGKey(200 * i + r))
                inference.append_simulations(
                    theta, x, proposal=None if r == 0 else proposal
                )
                inference.train(training_batch_size=100)
                posterior = inference.build_posterior().set_default_x(x_o)
                proposal = posterior
            samples = posterior.sample(
                (ref.shape[0],), key=jax.random.PRNGKey(10 + i), **mcmc_kwargs
            )
            scores.append(float(c2st(samples, ref)))
    else:
        theta = prior.sample(jax.random.PRNGKey(0), (num_simulations,))
        x = bench.simulator(theta, key=jax.random.PRNGKey(1))

        inference = METHODS[bm_method](prior)
        inference.append_simulations(theta, x)
        inference.train(training_batch_size=100)

        for i in range(bench.observations.shape[0]):
            x_o = bench.get_observation(i)
            ref = bench.get_reference_posterior_samples(i)
            posterior = inference.build_posterior()
            sample_kwargs = {}
            if bm_method in ("nle", "nre"):
                sample_kwargs = dict(num_chains=100, warmup_steps=100)
            samples = posterior.sample(
                (ref.shape[0],), x=x_o, key=jax.random.PRNGKey(10 + i), **sample_kwargs
            )
            scores.append(float(c2st(samples, ref)))

    mean_score = sum(scores) / len(scores)
    os.makedirs(RESULTS_DIR, exist_ok=True)
    out = os.path.join(RESULTS_DIR, "results_all.csv")
    write_header = not os.path.exists(out)
    with open(out, "a", newline="") as f:
        w = csv.writer(f)
        if write_header:
            w.writerow(["method", "task", "num_simulations", "c2st_mean"] +
                       [f"c2st_obs{i}" for i in range(len(scores))])
        w.writerow([bm_method, bm_task, num_simulations, round(mean_score, 4)] +
                   [round(s, 4) for s in scores])
    print(f"\n[bm] {bm_method} x {bm_task}: mean C2ST = {mean_score:.3f} {scores}")
