"""Import hygiene — counterpart of the reference `tests/circular_import_test.py`:
every submodule must be importable FIRST (before the package root has pulled
in its siblings), which is how circular-import bugs surface for users doing
`from sbi_tpu.x.y import z` as their first import."""

import os
import pkgutil
import subprocess
import sys

import pytest

import sbi_tpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _all_modules():
    mods = []
    for info in pkgutil.walk_packages(sbi_tpu.__path__, prefix="sbi_tpu."):
        mods.append(info.name)
    return sorted(mods)


def test_every_submodule_enumerable_and_importable():
    """In-process: every submodule imports without error."""
    import importlib

    mods = _all_modules()
    assert len(mods) > 50, f"expected a full package tree, found {len(mods)}"
    for m in mods:
        importlib.import_module(m)


@pytest.mark.slow
@pytest.mark.parametrize(
    "entry",
    [
        "sbi_tpu.inference.trainers.npe.npe_c",
        "sbi_tpu.inference.posteriors.mcmc_posterior",
        "sbi_tpu.inference.potentials.vector_field_adaptor",
        "sbi_tpu.neural_nets.net_builders.flow",
        "sbi_tpu.analysis.plot",
        "sbi_tpu.diagnostics.lc2st",
        "sbi_tpu.samplers.mcmc.slice_fsm",
        "sbi_tpu.utils.restriction_estimator",
    ],
)
def test_deep_module_importable_first(entry):
    """Fresh interpreter imports a deep module before anything else."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"import {entry}; print('ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ok" in out.stdout
