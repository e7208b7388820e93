"""Importance sampling + PSIS diagnostics.

JAX counterpart of `sbi/samplers/importance/importance_sampling.py:11,76`
(`importance_sample`, `gpdfit`) and `sir.py:13`.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ...utils.sbiutils import draw_from_proposal, next_key

Array = jax.Array


def importance_sample(
    potential_fn: Callable[[Array], Array],
    proposal,
    num_samples: int = 1,
    key: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Draw from proposal, return (samples, log importance weights)."""
    key = next_key(key)
    samples = draw_from_proposal(proposal, key, num_samples)
    potential_logprobs = potential_fn(samples)
    proposal_logprobs = proposal.log_prob(samples)
    log_weights = potential_logprobs - proposal_logprobs
    log_weights = jnp.where(jnp.isnan(log_weights), -jnp.inf, log_weights)
    return samples, log_weights


def sampling_importance_resampling(
    potential_fn: Callable[[Array], Array],
    proposal,
    num_samples: int = 1,
    oversampling_factor: int = 32,
    max_sampling_batch_size: int = 10_000,
    key: Optional[Array] = None,
) -> Array:
    """SIR (ref `sir.py:13`): oversample, then resample with softmax weights.

    The reference resamples one winner per K-candidate block; we do the same
    blockwise categorical draw, fully batched.
    """
    key = next_key(key)
    k1, k2 = jax.random.split(key)
    n_total = num_samples * oversampling_factor
    samples, log_weights = importance_sample(
        potential_fn, proposal, num_samples=n_total, key=k1
    )
    blocks = log_weights.reshape(num_samples, oversampling_factor)
    winners = jax.random.categorical(k2, blocks, axis=-1)  # (num_samples,)
    idx = jnp.arange(num_samples) * oversampling_factor + winners
    return samples[idx]


def gpdfit(x: Array, sorted: bool = True, eps: float = 1e-8, return_quadrature: bool = False):
    """Fit a Generalized Pareto Distribution to tail samples (Zhang & Stephens
    2009), used for the PSIS k-hat diagnostic (ref `:76`)."""
    x = jnp.sort(jnp.asarray(x, jnp.float32)) if not sorted else jnp.asarray(x, jnp.float32)
    N = x.shape[0]
    prior = 3.0
    M = 30 + int(N**0.5)

    bs = 1.0 - jnp.sqrt(M / (jnp.arange(1, M + 1) - 0.5))
    bs = bs / (prior * x[int(N / 4 + 0.5) - 1]) + 1.0 / x[-1]

    ks = jnp.mean(jnp.log1p(-bs[:, None] * x[None, :]), axis=1)
    Ls = N * (jnp.log(-bs / ks) - ks - 1.0)
    ws = 1.0 / jnp.sum(jnp.exp(Ls[None, :] - Ls[:, None]), axis=1)
    b = jnp.sum(bs * ws)

    k = jnp.mean(jnp.log1p(-b * x))
    sigma = -k / b
    # Zhang & Stephens bias correction
    k = k * N / (N + 10.0) + 5.0 / (N + 10.0) * 0.5
    if return_quadrature:
        return k, sigma, bs, ws
    return k, sigma


def psis_diagnostics(
    potential_fn: Callable[[Array], Array],
    q_dist,
    key=None,
    N: int = 1000,
) -> float:
    """PSIS k-hat for proposal quality (ref vi_quality_control / importance).
    k < 0.5 good, 0.5-0.7 ok, > 0.7 unreliable."""
    _, log_weights = importance_sample(potential_fn, q_dist, num_samples=N, key=key)
    logw = log_weights - jax.scipy.special.logsumexp(log_weights)
    w = jnp.exp(logw)
    M = int(min(N / 5, 3 * (N**0.5)))
    tail = jnp.sort(w)[-M:]
    tail = tail - tail[0]
    k, _ = gpdfit(jnp.clip(tail, 1e-12))
    return float(k)


def importance_resampling_weights_ess(log_weights: Array) -> Array:
    """Effective sample size of normalized importance weights."""
    logw = log_weights - jax.scipy.special.logsumexp(log_weights)
    return jnp.exp(-jax.scipy.special.logsumexp(2 * logw))
