"""Simulation orchestration.

JAX counterpart of `sbi/utils/simulation_utils.py:21` (`simulate_for_sbi`).
The reference parallelizes with joblib process pools; here the fast path is a
single batched (vmappable/jittable) simulator call on device, with a
joblib host pool retained only for black-box CPU simulators
(ref survey §2.7 parallelism table).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sbiutils import next_key

Array = jax.Array


def simulate_for_sbi(
    simulator: Callable,
    proposal,
    num_simulations: int,
    num_workers: int = 1,
    simulation_batch_size: Optional[int] = None,
    seed: Optional[int] = None,
    show_progress_bar: bool = True,
    key=None,
) -> Tuple[Array, Array]:
    """Sample theta ~ proposal, simulate x = sim(theta); returns (theta, x).

    ``proposal`` may be a prior Distribution (``sample(key, shape)``) or a
    trained posterior (``sample(shape, x=..., key=...)`` — the multiround
    workflow of ref tutorial 02 passes ``posterior.set_default_x(x_o)``)."""
    key = next_key(key if key is not None else (jax.random.PRNGKey(seed) if seed is not None else None))
    k_theta, k_sim = jax.random.split(key)
    from ..inference.posteriors.base_posterior import NeuralPosterior

    if isinstance(proposal, NeuralPosterior):
        theta = proposal.sample((num_simulations,), key=k_theta)
    else:
        theta = proposal.sample(k_theta, (num_simulations,))

    if num_workers > 1:
        # Host process pool for black-box CPU simulators.
        from joblib import Parallel, delayed

        theta_np = np.asarray(theta)
        batches = np.array_split(theta_np, num_workers)
        seeds = np.arange(num_workers)
        base_seed = int(jax.random.randint(k_sim, (), 0, 2**31 - 1))

        def run(batch, i):
            # Fresh worker interpreters must NOT initialize the default
            # (TPU) backend: the pool exists precisely for CPU-bound
            # simulators, and a worker touching the TPU tunnel couples
            # every host worker to device availability. Force CPU before
            # the first jax op in this process (no-op on reused workers).
            import jax as _jax

            try:
                _jax.config.update("jax_platforms", "cpu")
            except RuntimeError:
                pass
            k = _jax.random.fold_in(_jax.random.PRNGKey(base_seed), int(i))
            try:
                return np.asarray(simulator(batch, key=k))
            except TypeError:  # keyless black-box simulator, like the serial path
                return np.asarray(simulator(batch))

        outs = Parallel(n_jobs=num_workers)(
            delayed(run)(b, i) for b, i in zip(batches, seeds)
        )
        x = jnp.asarray(np.concatenate(outs), jnp.float32)
    else:
        try:
            x = simulator(theta, key=k_sim)
        except TypeError:
            x = simulator(theta)
        x = jnp.asarray(x, jnp.float32)
    return jnp.asarray(theta, jnp.float32), x


# Legacy alias (ref `sbi/simulators/simutils.py:17`).
def simulate_in_batches(simulator, theta, sim_batch_size=None, num_workers=1, key=None):
    theta = jnp.asarray(theta, jnp.float32)
    try:
        return simulator(theta, key=next_key(key))
    except TypeError:
        return simulator(theta)
