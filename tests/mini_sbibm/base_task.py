"""BenchTask: task + golden observations/posterior-sample fixtures.

Counterpart of `tests/mini_sbibm/base_task.py:78-100` in the reference
(which loads committed .pt files). Fixtures here are .npz, generated once by
`generate_fixtures.py` (analytic inversion or long-run MCMC on the exact
likelihood) and committed.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from sbi_tpu.simulators.tasks import Task, get_task

FILES_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "files")


@dataclass
class BenchTask:
    name: str
    task: Task
    observations: jnp.ndarray  # (num_obs, x_dim)
    true_thetas: jnp.ndarray  # (num_obs, theta_dim)
    reference_samples: jnp.ndarray  # (num_obs, num_samples, theta_dim)

    @property
    def prior(self):
        return self.task.prior

    @property
    def simulator(self):
        return self.task.simulator

    def get_observation(self, idx: int):
        return self.observations[idx][None]

    def get_reference_posterior_samples(self, idx: int):
        return self.reference_samples[idx]


def get_bench_task(name: str, prefer_reference: bool = True) -> BenchTask:
    """Load a benchmark task with golden fixtures.

    If ``{name}_ref.npz`` exists (converted from the reference's committed
    `.pt` posterior samples by ``import_reference_fixtures.py`` — the
    reference's own loader contract is `tests/mini_sbibm/base_task.py:78-100`),
    it is preferred: benchmark C2ST numbers are then measured against the
    *reference's* posteriors, not self-generated ones.
    """
    ref_path = os.path.join(FILES_DIR, f"{name}_ref.npz")
    path = os.path.join(FILES_DIR, f"{name}.npz")
    if prefer_reference and os.path.exists(ref_path):
        path = ref_path
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Golden fixture {path} missing; run tests/mini_sbibm/"
            "generate_fixtures.py to regenerate."
        )
    data = np.load(path)
    return BenchTask(
        name=name,
        task=get_task(name),
        observations=jnp.asarray(data["observations"]),
        true_thetas=jnp.asarray(data["true_thetas"]),
        reference_samples=jnp.asarray(data["reference_samples"]),
    )
