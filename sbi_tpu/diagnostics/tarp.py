"""TARP: Tests of Accuracy with Random Points (Lemos et al. 2023).

JAX counterpart of `sbi/diagnostics/tarp.py:27-246`: expected coverage
probability vs credibility via distances to random reference points;
KS / MSE checks. Fully vectorized — no per-observation python loop.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.sbiutils import next_key
from .sbc import get_posterior_samples_on_batch

Array = jax.Array


def _l2(a, b):
    return jnp.sqrt(jnp.sum((a - b) ** 2, axis=-1))


def run_tarp(
    thetas: Array,
    xs: Array,
    posterior,
    references: Optional[Array] = None,
    num_posterior_samples: int = 1000,
    num_bins: Optional[int] = 30,
    z_score_theta: bool = True,
    key=None,
    use_batched_sampling: bool = True,
    mesh=None,
) -> Tuple[Array, Array]:
    """Returns (ecp, alpha_grid): expected coverage probability at each
    credibility level. ``mesh`` shards the N observations over the device
    mesh (sampling + distance computations run n-way parallel)."""
    key = next_key(key)
    thetas = jnp.asarray(thetas, jnp.float32)
    xs = jnp.atleast_2d(jnp.asarray(xs, jnp.float32))
    N = thetas.shape[0]

    from ..parallel.mesh import resolve_mesh, shard_along

    mesh = resolve_mesh(mesh)
    if mesh is not None:
        thetas = jax.device_put(thetas, shard_along(mesh))
        xs = jax.device_put(xs, shard_along(mesh))

    k_samp, k_ref = jax.random.split(key)
    samples = get_posterior_samples_on_batch(
        posterior, (num_posterior_samples,), xs, key=k_samp,
        use_batched_sampling=use_batched_sampling, mesh=mesh,
    )  # (L, N, D)

    if num_bins is None:
        num_bins = N // 10

    if z_score_theta:
        lo = samples.min(axis=(0, 1))
        hi = samples.max(axis=(0, 1))
        scale = jnp.clip(hi - lo, 1e-9)
        samples = (samples - lo) / scale
        thetas_n = (thetas - lo) / scale
    else:
        thetas_n = thetas

    if references is None:
        references = jax.random.uniform(k_ref, thetas_n.shape)  # (N, D)

    # distances
    sample_dists = _l2(references[None, :, :], samples)  # (L, N)
    theta_dists = _l2(references, thetas_n)  # (N,)

    # fraction of posterior samples closer to reference than theta*
    f = (sample_dists < theta_dists[None, :]).mean(axis=0)  # (N,)

    alpha_grid = jnp.linspace(0.0, 1.0, num_bins)
    ecp = (f[None, :] < alpha_grid[:, None]).mean(axis=-1)
    return ecp, alpha_grid


def check_tarp(ecp: Array, alpha: Array) -> Tuple[float, float]:
    """Returns (atc, ks_pval) (ref `tarp.py:209`): area-to-curve deviation at
    the midpoint and a KS test between ecp and alpha."""
    import scipy.stats as st

    ecp_np = np.asarray(ecp)
    alpha_np = np.asarray(alpha)
    mid = len(alpha_np) // 2
    atc = float((ecp_np[mid:] - alpha_np[mid:]).sum())
    _, ks_pval = st.ks_2samp(ecp_np, alpha_np)
    return atc, float(ks_pval)
