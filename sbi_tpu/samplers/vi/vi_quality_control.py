"""VI quality control (ref `sbi/samplers/vi/vi_quality_control.py`):
PSIS k-hat and proportionality checks for fitted variational posteriors."""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ...utils.sbiutils import next_key
from ..importance.importance_sampling import gpdfit, importance_sample

Array = jax.Array


def psis_diagnostics(potential_fn: Callable, q_sample_fn: Callable,
                     q_log_prob_fn: Callable, N: int = 1000, key=None) -> float:
    """k-hat of importance weights potential/q (< 0.5 good, > 0.7 bad)."""
    key = next_key(key)
    samples = q_sample_fn(key, N)
    logw = potential_fn(samples) - q_log_prob_fn(samples)
    logw = logw - jax.scipy.special.logsumexp(logw)
    w = jnp.exp(logw)
    M = int(min(N / 5, 3 * (N**0.5)))
    tail = jnp.sort(w)[-M:]
    k, _ = gpdfit(jnp.clip(tail - tail[0], 1e-12))
    return float(k)


def proportional_to_joint_diagnostics(
    potential_fn: Callable, q_sample_fn: Callable, q_log_prob_fn: Callable,
    N: int = 1000, key=None,
) -> float:
    """R^2 of a linear fit between log q and the potential on q samples —
    near 1 iff q is proportional to the (unnormalized) posterior."""
    key = next_key(key)
    samples = q_sample_fn(key, N)
    x = q_log_prob_fn(samples)
    y = potential_fn(samples)
    x_c = x - x.mean()
    y_c = y - y.mean()
    beta = jnp.sum(x_c * y_c) / jnp.clip(jnp.sum(x_c**2), 1e-12)
    resid = y_c - beta * x_c
    r2 = 1.0 - jnp.sum(resid**2) / jnp.clip(jnp.sum(y_c**2), 1e-12)
    return float(r2)
