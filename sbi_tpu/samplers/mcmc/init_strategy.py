"""MCMC chain initialization strategies.

JAX counterpart of `sbi/samplers/mcmc/init_strategy.py:13-67`
(proposal/sir/resample) — all batched, no joblib: one potential evaluation
over the whole candidate set.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ...utils.sbiutils import draw_from_proposal, next_key

Array = jax.Array


def proposal_init(proposal, num_chains: int, key=None) -> Array:
    """Draw chain inits from the proposal (usually the prior)."""
    return draw_from_proposal(proposal, next_key(key), num_chains)


def resample_given_potential_fn(
    proposal,
    potential_fn: Callable[[Array], Array],
    num_chains: int,
    num_candidate_samples: int = 10_000,
    key=None,
) -> Array:
    """Resample candidates with weights softmax(potential) (ref `:40-67`)."""
    key = next_key(key)
    k1, k2 = jax.random.split(key)
    cand = draw_from_proposal(proposal, k1, num_candidate_samples)
    logw = potential_fn(cand)
    logw = jnp.where(jnp.isfinite(logw), logw, -jnp.inf)
    idx = jax.random.categorical(k2, logw, shape=(num_chains,))
    return cand[idx]


def sir_init(
    proposal,
    potential_fn: Callable[[Array], Array],
    num_chains: int,
    sir_num_batches: int = 10,
    sir_batch_size: int = 1000,
    key=None,
) -> Array:
    """Sampling-importance-resampling init (ref `:13-39`): weights are
    potential - proposal.log_prob."""
    key = next_key(key)
    k1, k2 = jax.random.split(key)
    n = sir_num_batches * sir_batch_size
    cand = draw_from_proposal(proposal, k1, n)
    logw = potential_fn(cand) - proposal.log_prob(cand)
    logw = jnp.where(jnp.isfinite(logw), logw, -jnp.inf)
    idx = jax.random.categorical(k2, logw, shape=(num_chains,))
    return cand[idx]


class IterateParameters:
    """Iterate over given parameters (ref `:13` IterateParameters)."""

    def __init__(self, parameters: Array, **kwargs):
        self.iter = jnp.atleast_2d(jnp.asarray(parameters, jnp.float32))
        self._i = 0

    def __call__(self) -> Array:
        out = self.iter[self._i % self.iter.shape[0]]
        self._i += 1
        return out
