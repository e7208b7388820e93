"""Rejection / accept-reject sampling.

JAX counterpart of `sbi/samplers/rejection/rejection.py:18,231`. The
data-dependent "sample until N accepted" loop cannot live inside one jitted
graph with static shapes, so the design is: one jitted *proposal batch*
function (sample + support mask) compiled once, driven by a tiny host loop
that only accumulates accepted samples — the same structure the reference
uses, minus its per-iteration torch<->python overhead.
"""

from __future__ import annotations

import logging
import warnings
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ...utils.sbiutils import draw_from_proposal, next_key, within_support

Array = jax.Array


def accept_reject_sample(
    proposal: Callable[[Array, int], Array],
    accept_reject_fn: Callable[[Array], Array],
    num_samples: int,
    key: Optional[Array] = None,
    show_progress_bars: bool = False,
    warn_acceptance: float = 0.01,
    sample_batch_size: int = 10_000,
    max_sampling_batches: int = 10_000,
    max_sampling_time: Optional[float] = None,
    proposal_sampling_kwargs: Optional[dict] = None,
    alternative_method: Optional[str] = None,
    **kwargs,
) -> Tuple[Array, Array]:
    """Sample until ``num_samples`` pass ``accept_reject_fn``.

    Args:
        proposal: fn(key, num) -> candidate batch (num, ...).
        accept_reject_fn: fn(samples) -> boolean mask.
    Returns:
        (samples (num_samples, ...), acceptance_rate scalar).

    Ref `rejection.py:231-457` (leakage warnings, batch resizing,
    `max_sampling_time` timeout with partial return `rejection.py:286-340`).
    """
    import time as _time

    t_start = _time.monotonic()
    key = next_key(key)
    proposal_sampling_kwargs = proposal_sampling_kwargs or {}

    accepted = []
    num_accepted = 0
    num_sampled_total = 0
    num_batches = 0
    leakage_warned = False

    while num_accepted < num_samples:
        key, sub = jax.random.split(key)
        candidates = proposal(sub, sample_batch_size, **proposal_sampling_kwargs)
        mask = accept_reject_fn(candidates)
        # Host sync point — one per batch, amortized over sample_batch_size.
        acc = candidates[jnp.asarray(mask)]
        accepted.append(acc)
        num_accepted += int(acc.shape[0])
        num_sampled_total += int(candidates.shape[0])
        num_batches += 1

        acceptance_rate = num_accepted / num_sampled_total
        if (
            not leakage_warned
            and num_sampled_total > 1000
            and acceptance_rate < warn_acceptance
        ):
            suggestion = (
                f" Consider sampling with `{alternative_method}`."
                if alternative_method
                else ""
            )
            warnings.warn(
                f"Only {acceptance_rate:.3%} proposal samples were accepted. It "
                f"may take a long time to collect the remaining "
                f"{num_samples - num_accepted} samples.{suggestion}"
            )
            leakage_warned = True
        if num_batches >= max_sampling_batches:
            warnings.warn(
                f"Reached max_sampling_batches={max_sampling_batches}; returning "
                f"{num_accepted} (<{num_samples}) samples."
            )
            break
        if (
            max_sampling_time is not None
            and _time.monotonic() - t_start > max_sampling_time
        ):
            warnings.warn(
                f"Stopped after max_sampling_time={max_sampling_time}s; "
                f"returning {min(num_accepted, num_samples)} "
                f"(<={num_samples}) samples."
            )
            break

    if num_accepted == 0:
        raise RuntimeError("accept_reject_sample: no samples accepted.")
    samples = jnp.concatenate(accepted, axis=0)[:num_samples]
    acceptance_rate = jnp.asarray(num_accepted / max(num_sampled_total, 1))
    return samples, acceptance_rate


def rejection_sample(
    potential_fn: Callable[[Array], Array],
    proposal: Any,
    key: Optional[Array] = None,
    num_samples: int = 1,
    show_progress_bars: bool = False,
    warn_acceptance: float = 0.01,
    sample_batch_size: int = 10_000,
    num_samples_to_find_max: int = 10_000,
    num_iter_to_find_max: int = 100,
    m: float = 1.2,
) -> Tuple[Array, Array]:
    """Exact rejection sampling with learned scaling constant M.

    Ref `rejection.py:18-230`: find max_{theta} [potential - proposal.log_prob]
    by sampling + gradient ascent, then accept with prob
    exp(potential - log_prob - logM).
    """
    import optax

    key = next_key(key)

    # --- find the maximum of the density ratio -----------------------------
    key, k1 = jax.random.split(key)
    cand = draw_from_proposal(proposal, k1, num_samples_to_find_max)
    ratio = potential_fn(cand) - proposal.log_prob(cand)
    best = cand[jnp.argmax(ratio)]

    def neg_ratio(theta):
        t = theta[None]
        return -(potential_fn(t) - proposal.log_prob(t)).sum()

    opt = optax.adam(0.01)
    grad_fn = jax.grad(neg_ratio)

    @jax.jit
    def ascent_step(carry, _):
        theta, state = carry
        g = grad_fn(theta)
        updates, state = opt.update(g, state)
        return (optax.apply_updates(theta, updates), state), None

    try:
        (best_opt, _), _ = jax.lax.scan(
            ascent_step, (best, opt.init(best)), None,
            length=num_iter_to_find_max,
        )
        log_m_candidates = jnp.stack(
            [
                (potential_fn(best[None]) - proposal.log_prob(best[None]))[0],
                (potential_fn(best_opt[None]) - proposal.log_prob(best_opt[None]))[0],
            ]
        )
        log_max = jnp.max(log_m_candidates) + jnp.log(m)
    except jax.errors.TracerArrayConversionError:
        # Host-side potential (e.g. TabPFN in-context estimator) cannot be
        # traced/differentiated; fall back to the sampled maximum with the
        # safety factor.
        log_max = jnp.max(ratio) + jnp.log(m)

    # --- accept-reject with the learned constant ----------------------------
    def accept_fn_with_key(samples, sub):
        u = jax.random.uniform(sub, (samples.shape[0],))
        log_alpha = potential_fn(samples) - proposal.log_prob(samples) - log_max
        return jnp.log(u) < log_alpha

    accepted = []
    num_accepted, num_total = 0, 0
    while num_accepted < num_samples:
        key, ks, ku = jax.random.split(key, 3)
        candidates = draw_from_proposal(proposal, ks, sample_batch_size)
        mask = accept_fn_with_key(candidates, ku)
        acc = candidates[mask]
        accepted.append(acc)
        num_accepted += int(acc.shape[0])
        num_total += sample_batch_size
        if num_total > 100 * sample_batch_size and num_accepted == 0:
            raise RuntimeError("rejection_sample: acceptance rate ~0.")

    samples = jnp.concatenate(accepted, axis=0)[:num_samples]
    return samples, jnp.asarray(num_accepted / num_total)
