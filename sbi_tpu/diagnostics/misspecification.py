"""Model misspecification checks.

JAX counterpart of `sbi/diagnostics/misspecification.py:113,200`:
MMD-based test (x_o vs simulated x in embedding or raw space) and
marginal-log-prob based test (log p(x_o) under a trained marginal vs the
distribution of log p(x_sim)).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.metrics import biased_mmd, unbiased_mmd_squared
from ..utils.sbiutils import next_key

Array = jax.Array


def _mmd_stat(a: Array, b: Array, scale=None) -> Array:
    """Biased MMD: well-defined for single-observation a (the unbiased
    estimator divides by n(n-1) and NaNs at n=1)."""
    return biased_mmd(a, b, scale=scale)


def calc_misspecification_mmd(
    inference=None,
    x_obs: Array = None,
    x: Optional[Array] = None,
    mode: str = "embed",
    num_permutations: int = 100,
    key=None,
) -> Tuple[Array, Array]:
    """Permutation MMD test of x_o against the simulated x distribution.

    Returns (p_value, (mmd_obs, null_mmds)). Ref `:113`.
    """
    key = next_key(key)
    assert x is not None, "Provide training simulations x."
    x = jnp.asarray(x, jnp.float32).reshape(len(x), -1)
    x_obs = jnp.atleast_2d(jnp.asarray(x_obs, jnp.float32)).reshape(
        len(jnp.atleast_2d(x_obs)), -1
    )

    if mode == "embed" and inference is not None:
        est = getattr(inference, "_neural_net", None)
        if est is not None and hasattr(est, "_embed_condition"):
            # Use the estimator's condition z-scoring/embedding as summary.
            x = est._embed_condition(x)
            x_obs = est._embed_condition(x_obs)

    n_obs = x_obs.shape[0]
    # Fixed kernel scale from the simulated distribution (median heuristic),
    # shared between the observed statistic and every null trial.
    ref = x[: min(1000, x.shape[0])]
    d2 = jnp.sum((ref[:200, None, :] - ref[None, :200, :]) ** 2, axis=-1)
    sigma = jnp.sqrt(jnp.median(d2) / 2.0)
    mmd_obs = _mmd_stat(x_obs, ref, scale=sigma)

    # Null: MMD between random subsets of x of size n_obs and the rest.
    nulls = []
    for i in range(num_permutations):
        k = jax.random.fold_in(key, i)
        perm = jax.random.permutation(k, x.shape[0])
        a = x[perm[:n_obs]]
        b = x[perm[n_obs:n_obs + min(1000, x.shape[0] - n_obs)]]
        nulls.append(_mmd_stat(a, b, scale=sigma))
    null_mmds = jnp.stack(nulls)
    p_value = (null_mmds >= mmd_obs).mean()
    return p_value, (mmd_obs, null_mmds)


def calc_misspecification_logprob(
    marginal_estimator,
    x_obs: Array,
    x: Array,
) -> Tuple[Array, Tuple[Array, Array]]:
    """p-value of log p(x_o) under the distribution of log p(x_sim)
    (ref `:200`). Small p => x_o is atypical => misspecification."""
    x = jnp.asarray(x, jnp.float32)
    x_obs = jnp.atleast_2d(jnp.asarray(x_obs, jnp.float32))
    lp_sim = marginal_estimator.log_prob(x)
    lp_obs = marginal_estimator.log_prob(x_obs)
    p_value = (lp_sim[None, :] < lp_obs[:, None]).mean(axis=1)
    return p_value, (lp_obs, lp_sim)
