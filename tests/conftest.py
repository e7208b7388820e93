"""Test config: force the CPU backend with 8 virtual devices (sharding tests
run on a virtual mesh, mirroring the driver's dryrun), deterministic seeds.

Mirrors the reference's `tests/conftest.py:26-33` (autouse seeding, float32).
"""

import os

# Must happen before jax initializes any backend.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize pins tpu otherwise

import pytest  # noqa: E402

from sbi_tpu.utils.sbiutils import seed_all_backends  # noqa: E402


def pytest_addoption(parser):
    """--bm harness flags (ref `tests/conftest.py:47-84`)."""
    parser.addoption("--bm", action="store_true", default=False,
                     help="run mini-sbibm benchmark tests")
    parser.addoption("--bm-mode", action="store", default=None,
                     help="restrict benchmark to one method (npe|nle|nre|fmpe|npse)")
    parser.addoption("--bm-num-simulations", action="store", default=2000,
                     help="simulation budget per benchmark run")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--bm"):
        # --bm: run ONLY benchmark-marked tests (ref conftest.py:47-60).
        skip = pytest.mark.skip(reason="running benchmarks only (--bm)")
        for item in items:
            if "benchmark" not in item.keywords:
                item.add_marker(skip)


@pytest.fixture(autouse=True)
def set_seed():
    seed_all_backends(1)


@pytest.fixture
def mcmc_params_fast() -> dict:
    """Fast-but-inaccurate MCMC settings (ref conftest.py:226-236)."""
    return dict(num_chains=1, thin=1, warmup_steps=1)


@pytest.fixture
def mcmc_params_accurate() -> dict:
    return dict(num_chains=20, thin=2, warmup_steps=50)
