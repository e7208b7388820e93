"""Simulation-based calibration (SBC).

JAX counterpart of `sbi/diagnostics/sbc.py:23-374`: rank statistics of
theta* among posterior samples — marginal ranks (`reduce_fns="marginals"`)
or log-prob ranks (= expected coverage); chi2/KS uniformity checks + C2ST.
The posterior sampling batches across observations (`sample_batched`)
instead of the reference's joblib worker pool
(`utils/diagnostics_utils.py:19`).
"""

from __future__ import annotations

import warnings
from typing import Callable, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.metrics import c2st
from ..utils.sbiutils import next_key

Array = jax.Array


def get_posterior_samples_on_batch(
    posterior,
    sample_shape: Tuple[int, ...],
    xs: Array,
    key=None,
    use_batched_sampling: bool = True,
    mesh=None,
) -> Array:
    """(num_samples, num_xs, dim_theta) — batched if the posterior supports
    it (ref `utils/diagnostics_utils.py:19`). ``mesh`` shards the
    observation axis across the device mesh (passed through to
    ``sample_batched``)."""
    key = next_key(key)
    if use_batched_sampling:
        try:
            kw = {"mesh": mesh} if mesh is not None else {}
            return posterior.sample_batched(sample_shape, xs, key=key, **kw)
        except (NotImplementedError, AttributeError):
            pass
    outs = []
    for i in range(xs.shape[0]):
        outs.append(
            posterior.sample(sample_shape, x=xs[i][None], key=jax.random.fold_in(key, i))
        )
    return jnp.stack(outs, axis=len(sample_shape))


def run_sbc(
    thetas: Array,
    xs: Array,
    posterior,
    num_posterior_samples: int = 1000,
    reduce_fns: Union[str, Callable, List[Callable]] = "marginals",
    key=None,
    use_batched_sampling: bool = True,
    mesh=None,
    **kwargs,
) -> Tuple[Array, Array]:
    """Returns (ranks (N, num_metrics), dap_samples (N, dim)).

    ranks[i, j] = #{posterior samples with metric_j < metric_j(theta*_i)}.

    ``mesh`` (``None``/``"auto"``/int/``jax.sharding.Mesh``) shards the N
    observations over the device mesh: posterior sampling and the marginal
    rank computation both run n-way parallel (this is BASELINE config 3's
    "diagnostics batch across the TPU mesh" path).
    """
    thetas = jnp.asarray(thetas, jnp.float32)
    xs = jnp.atleast_2d(jnp.asarray(xs, jnp.float32))
    N = thetas.shape[0]
    assert N == xs.shape[0], "Number of parameters must match number of observations."
    if N < 100:
        warnings.warn(
            "Number of SBC samples should be on the order of 100s to give "
            "reliable results."
        )
    if num_posterior_samples < 100:
        warnings.warn(
            "Number of posterior samples should be on the order of 100s."
        )

    key = next_key(key)
    from ..parallel.mesh import resolve_mesh, shard_along

    mesh = resolve_mesh(mesh)
    if mesh is not None:
        thetas = jax.device_put(thetas, shard_along(mesh))
        xs = jax.device_put(xs, shard_along(mesh))
    samples = get_posterior_samples_on_batch(
        posterior,
        (num_posterior_samples,),
        xs,
        key=key,
        use_batched_sampling=use_batched_sampling,
        mesh=mesh,
    )  # (L, N, D)
    dap_samples = samples[0]  # data-averaged posterior draws

    ranks = _run_sbc_ranks(thetas, xs, samples, posterior, reduce_fns)
    return ranks, dap_samples


def _run_sbc_ranks(thetas, xs, samples, posterior, reduce_fns) -> Array:
    L, N, D = samples.shape
    if isinstance(reduce_fns, str):
        if reduce_fns == "marginals":
            # rank per dimension: fully vectorized comparison
            ranks = (samples < thetas[None, :, :]).sum(axis=0)  # (N, D)
            return jnp.asarray(ranks, jnp.int32)
        elif reduce_fns == "log_prob":
            reduce_fns = [
                lambda theta, x: posterior.log_prob(theta, x=x)
            ]
    if callable(reduce_fns):
        reduce_fns = [reduce_fns]

    all_ranks = []
    for fn in reduce_fns:
        cols = []
        for i in range(N):
            t_val = fn(thetas[i][None], xs[i][None])
            s_val = fn(samples[:, i, :], xs[i][None])
            cols.append((s_val < t_val).sum())
        all_ranks.append(jnp.stack(cols))
    return jnp.stack(all_ranks, axis=-1).astype(jnp.int32)


def check_sbc(
    ranks: Array,
    prior_samples: Array,
    dap_samples: Array,
    num_posterior_samples: int = 1000,
    num_c2st_repetitions: int = 1,
) -> Dict[str, Array]:
    """Uniformity checks (ref sbc.py:275-374): KS p-values, chi2-uniformity
    c2st of ranks, and c2st(prior, data-averaged posterior)."""
    import scipy.stats as st

    ranks_np = np.asarray(ranks)
    N, num_metrics = ranks_np.shape

    # KS test of ranks vs uniform
    ks_pvals = np.array([
        st.kstest(ranks_np[:, i], st.uniform(0, num_posterior_samples).cdf)[1]
        for i in range(num_metrics)
    ], dtype=np.float32)

    # c2st between ranks and uniform samples
    uniform = np.random.uniform(0, num_posterior_samples, size=ranks_np.shape)
    c2st_ranks = np.array([
        float(c2st(ranks_np[:, i][:, None], uniform[:, i][:, None]))
        for i in range(num_metrics)
    ], dtype=np.float32)

    # data-averaged posterior should equal the prior
    c2st_dap = np.array([
        float(
            c2st(
                np.asarray(prior_samples)[:, i][:, None],
                np.asarray(dap_samples)[:, i][:, None],
            )
        )
        for i in range(np.asarray(dap_samples).shape[1])
    ], dtype=np.float32)

    return dict(
        ks_pvals=jnp.asarray(ks_pvals),
        c2st_ranks=jnp.asarray(c2st_ranks),
        c2st_dap=jnp.asarray(c2st_dap),
    )


def get_nltp(thetas: Array, xs: Array, posterior) -> Array:
    """Negative log prob of true parameters (ref diagnostics __init__)."""
    nltp = []
    for i in range(thetas.shape[0]):
        nltp.append(-posterior.log_prob(thetas[i][None], x=xs[i][None])[0])
    return jnp.stack(nltp)
