"""Vectorized slice sampling, fully on-device.

TPU-native counterpart of `sbi/samplers/mcmc/slice_numpy.py:353-620`
(`SliceSamplerVectorized`): the reference advances all chains through a
per-chain *Python* finite-state machine (BEGIN/LOWER/UPPER/SAMPLE_SLICE),
crossing the torch<->numpy boundary once per iteration — its single biggest
inefficiency (survey §3.4). Here the whole sampler is ONE jitted XLA
program: an axis-cycling univariate slice sweep (stepping-out bracket +
shrinkage, Neal 2003) written with `lax.while_loop`, `vmap`ped over chains,
`lax.scan`ned over sweeps. Chains never leave the device; thousands of
chains ride the VPU in lockstep (a lane that finishes its bracket early
masks out, exactly like the reference's FSM, but without the host).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.sbiutils import next_key

Array = jax.Array


def _slice_update_dim(key, theta, cur_lp, log_y, dim, logp_fn, width,
                      max_steps_out, max_shrink):
    """Single-coordinate slice update for one chain. theta: (D,).

    Returns (new_theta, new_lp); if shrinkage caps out without accepting,
    the state (and its log-prob) is left unchanged."""
    k_pos, k_prop = jax.random.split(key)
    x0 = theta[dim]

    # --- bracket init ------------------------------------------------------
    u = jax.random.uniform(k_pos)
    lower = x0 - u * width
    upper = lower + width

    def logp_at(v):
        return logp_fn(theta.at[dim].set(v))

    # --- stepping out ------------------------------------------------------
    def step_lower(carry):
        low, i = carry
        return low - width, i + 1

    def cond_lower(carry):
        low, i = carry
        return (logp_at(low) > log_y) & (i < max_steps_out)

    lower, _ = jax.lax.while_loop(cond_lower, step_lower, (lower, 0))

    def step_upper(carry):
        up, i = carry
        return up + width, i + 1

    def cond_upper(carry):
        up, i = carry
        return (logp_at(up) > log_y) & (i < max_steps_out)

    upper, _ = jax.lax.while_loop(cond_upper, step_upper, (upper, 0))

    # --- shrinkage sampling --------------------------------------------------
    def shrink_cond(carry):
        x1, lo, up, lp, k, i, done = carry
        return (~done) & (i < max_shrink)

    def shrink_body(carry):
        x1, lo, up, lp, k, i, done = carry
        k, sub = jax.random.split(k)
        prop = lo + (up - lo) * jax.random.uniform(sub)
        lp_prop = logp_at(prop)
        accept = lp_prop > log_y
        lo = jnp.where(~accept & (prop < x0), prop, lo)
        up = jnp.where(~accept & (prop >= x0), prop, up)
        x1 = jnp.where(accept, prop, x1)
        lp = jnp.where(accept, lp_prop, lp)
        return (x1, lo, up, lp, k, i + 1, accept)

    x1, _, _, lp1, _, _, accepted = jax.lax.while_loop(
        shrink_cond,
        shrink_body,
        (x0, lower, upper, cur_lp, k_prop, 0, jnp.asarray(False)),
    )
    # If shrinkage hit the iteration cap without accepting, keep x0 AND its
    # original log-prob (lp1 already equals cur_lp in that case).
    new_theta = theta.at[dim].set(x1)
    return new_theta, lp1


def _slice_sweep(key, theta, logp_fn, widths, max_steps_out, max_shrink):
    """Full axis-cycling sweep over all D coordinates of one chain."""
    D = theta.shape[0]
    lp = logp_fn(theta)
    keys = jax.random.split(key, D)
    for dim in range(D):  # D is static — unrolled, each dim's loops fused
        k_y, k_dim = jax.random.split(keys[dim])
        log_y = lp - jax.random.exponential(k_y)
        theta, lp = _slice_update_dim(
            k_dim, theta, lp, log_y, dim, logp_fn,
            widths[dim], max_steps_out, max_shrink,
        )
    return theta, lp


def run_slice_vectorized(
    potential_fn: Callable[[Array], Array],
    inits: Array,
    num_samples: int,
    thin: int = 1,
    warmup_steps: int = 200,
    init_width: float | Array = 1.0,
    max_steps_out: int = 50,
    max_shrink: int = 100,
    tune_width: bool = True,
    key: Optional[Array] = None,
    max_sweeps_per_program: Optional[int] = None,
) -> Array:
    """Vectorized slice sampling; returns (num_samples_per_chain, C, D).

    Delegates to the batched-FSM implementation (`slice_fsm.py`): one
    potential eval per iteration for all chains, no phase barriers —
    measured 2.1x (cheap potentials) to 6x (flow potentials) over the
    sweep-structured variant below, with ~100x faster compiles.
    """
    from .slice_fsm import run_slice_vectorized_fsm

    return run_slice_vectorized_fsm(
        potential_fn, inits, num_samples, thin=thin, warmup_steps=warmup_steps,
        init_width=init_width, max_steps_out=max_steps_out,
        max_shrink=max_shrink, tune_width=tune_width, key=key,
        max_sweeps_per_program=max_sweeps_per_program,
    )


def run_slice_vectorized_sweep(
    potential_fn: Callable[[Array], Array],
    inits: Array,
    num_samples: int,
    thin: int = 1,
    warmup_steps: int = 200,
    init_width: float | Array = 1.0,
    max_steps_out: int = 50,
    max_shrink: int = 100,
    tune_width: bool = True,
    key: Optional[Array] = None,
) -> Array:
    """Sweep-structured variant (vmapped per-chain while_loops); kept for
    cross-validation of the FSM implementation.

    Args:
        potential_fn: batched log-density, (B, D) -> (B,). Must be pure/jittable.
        inits: (C, D) initial chain states (unconstrained space).
        num_samples: samples *per chain* after warmup/thinning.
    """
    key = next_key(key)
    inits = jnp.asarray(inits, jnp.float32)
    C, D = inits.shape

    def logp_single(theta_1d):
        return potential_fn(theta_1d[None])[0]

    widths0 = jnp.broadcast_to(jnp.asarray(init_width, jnp.float32), (D,))

    def sweep_all(carry, k):
        theta, widths = carry
        keys = jax.random.split(k, C)
        new_theta, _ = jax.vmap(
            lambda kk, th: _slice_sweep(
                kk, th, logp_single, widths, max_steps_out, max_shrink
            )
        )(keys, theta)
        return (new_theta, widths), new_theta

    @partial(jax.jit, static_argnums=(2,))
    def run_phase(carry, k, n_sweeps):
        keys = jax.random.split(k, n_sweeps)
        return jax.lax.scan(sweep_all, carry, keys)

    # Warmup phase with initial widths.
    key, k_warm, k_main = jax.random.split(key, 3)
    carry = (inits, widths0)
    if warmup_steps > 0:
        carry, warm_draws = run_phase(carry, k_warm, warmup_steps)
        if tune_width:
            # Tune per-dim bracket width from warmup spread (the reference's
            # SliceSampler tunes w from burn-in; ref slice_numpy.py:57-216).
            tail = warm_draws[warmup_steps // 2:]
            widths = 2.0 * jnp.std(tail.reshape(-1, D), axis=0) + 1e-3
            carry = (carry[0], widths)

    # Each sweep yields one draw per chain; collect num_samples per chain.
    n_sweeps = num_samples * thin
    carry, draws = run_phase(carry, k_main, n_sweeps)
    draws = draws[thin - 1::thin] if thin > 1 else draws
    return draws[:num_samples]  # (num_samples, C, D)


# ---------------------------------------------------------------------------
# API-parity wrappers (ref slice_numpy.py:219,353)
# ---------------------------------------------------------------------------


class SliceSamplerVectorized:
    """Drop-in-named counterpart of the reference class; all chains advance
    in one XLA program."""

    def __init__(
        self,
        log_prob_fn: Callable,
        init_params: Array,
        num_chains: int = 1,
        thin: Optional[int] = None,
        tuning: int = 50,
        verbose: bool = False,
        init_width: float = 1.0,
        max_width: float = float("inf"),
        num_workers: int = 1,
    ):
        self.log_prob_fn = log_prob_fn
        self.x = jnp.asarray(init_params, jnp.float32)
        self.num_chains = num_chains
        self.thin = 1 if thin is None or thin == -1 else thin
        self.tuning = tuning
        self.init_width = init_width
        self._key = None

    def run(self, num_samples: int, key=None) -> np.ndarray:
        """Return (num_chains, samples_per_chain, D) like the reference."""
        per_chain = int(np.ceil(num_samples / self.num_chains))
        draws = run_slice_vectorized(
            self.log_prob_fn,
            self.x,
            num_samples=per_chain,
            thin=self.thin,
            warmup_steps=self.tuning,
            init_width=self.init_width,
            key=next_key(key),
        )
        return np.asarray(jnp.swapaxes(draws, 0, 1))


# Serial variants are subsumed by vectorization; kept for API parity.
class SliceSamplerSerial(SliceSamplerVectorized):
    pass


class SliceSampler(SliceSamplerVectorized):
    def __init__(self, x, lp_f, max_width=float("inf"), init_width: float = 1.0,
                 thin=None, tuning: int = 50, verbose: bool = False):
        super().__init__(
            log_prob_fn=lp_f,
            init_params=jnp.atleast_2d(jnp.asarray(x, jnp.float32)),
            num_chains=1,
            thin=thin,
            tuning=tuning,
            verbose=verbose,
            init_width=init_width,
        )

    def gen(self, n_samples: int, key=None):
        return self.run(n_samples, key=key)[0]
