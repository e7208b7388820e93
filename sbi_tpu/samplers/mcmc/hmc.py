"""Hamiltonian Monte Carlo + NUTS, in-repo (replacing the reference's
Pyro/PyMC delegation, `sbi/inference/posteriors/mcmc_posterior.py:48-56`).

Everything runs as one XLA program: leapfrog via `lax.scan`, chains via
`vmap`, dual-averaging step-size adaptation and diagonal mass estimation in
the warmup scan. NUTS is real tree-based multinomial NUTS (iterative
doubling on fixed-shape buffers, see `run_nuts`); the jittered-trajectory
surrogate from round 1 survives as `run_nuts_jittered` for
cross-validation. Step functions are cached per potential identity so
repeated calls reuse compiled programs.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.sbiutils import next_key

Array = jax.Array


def _leapfrog(theta, mom, grad, step_size, inv_mass, logp_grad_fn, num_steps):
    """num_steps leapfrog steps; returns (theta, mom, logp, grad).

    num_steps may be a traced integer (jittered trajectories) — fori_loop
    lowers to a while_loop in that case."""

    def body(i, carry):
        th, m, g = carry
        m = m + 0.5 * step_size * g
        th = th + step_size * inv_mass * m
        lp, g = logp_grad_fn(th)
        m = m + 0.5 * step_size * g
        return (th, m, g)

    theta, mom, grad = jax.lax.fori_loop(0, num_steps, body, (theta, mom, grad))
    lp, grad = logp_grad_fn(theta)
    return theta, mom, lp, grad


def run_hmc(
    potential_fn: Callable[[Array], Array],
    inits: Array,
    num_samples: int,
    thin: int = 1,
    warmup_steps: int = 200,
    num_leapfrog: int = 16,
    target_accept: float = 0.8,
    jitter_steps: bool = False,
    key: Optional[Array] = None,
    max_sweeps_per_program: Optional[int] = None,
) -> Array:
    """Vectorized HMC; returns (num_samples, C, D).

    potential_fn: (B, D) -> (B,) batched log density.
    """
    key = next_key(key)
    inits = jnp.asarray(inits, jnp.float32)
    C, D = inits.shape
    hmc_step = _make_hmc_step(potential_fn, D, num_leapfrog, bool(jitter_steps))
    return _run_adaptive(
        hmc_step, inits, num_samples, thin, warmup_steps, target_accept, key,
        max_sweeps_per_program=max_sweeps_per_program,
    )


@lru_cache(maxsize=64)
def _make_hmc_step(potential_fn, D: int, num_leapfrog: int, jitter_steps: bool):
    """Per-chain HMC step, cached on the potential's identity so repeated
    run_hmc calls with the same potential reuse the jitted programs that
    close over it (same pattern as the FSM sampler's compile cache)."""

    def logp_single(th):
        return potential_fn(th[None])[0]

    logp_grad = jax.value_and_grad(logp_single)

    def hmc_step(theta, k, step_size, inv_mass):
        k_mom, k_acc, k_jit = jax.random.split(k, 3)
        mass = 1.0 / inv_mass
        mom = jax.random.normal(k_mom, (D,)) * jnp.sqrt(mass)
        lp0, g0 = logp_grad(theta)
        h0 = lp0 - 0.5 * jnp.sum(inv_mass * mom**2)
        if jitter_steps:
            # Jittered trajectory length in [1, num_leapfrog] —
            # randomized-HMC has the same stationary distribution and
            # breaks resonances.
            n_steps = jax.random.randint(k_jit, (), 1, num_leapfrog + 1)
        else:
            n_steps = num_leapfrog
        theta_new, mom_new, lp1, _ = _leapfrog(
            theta, mom, g0, step_size, inv_mass, logp_grad, n_steps
        )
        h1 = lp1 - 0.5 * jnp.sum(inv_mass * mom_new**2)
        log_alpha = jnp.minimum(0.0, h1 - h0)
        log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha)
        accept = jnp.log(jax.random.uniform(k_acc)) < log_alpha
        theta = jnp.where(accept, theta_new, theta)
        return theta, jnp.exp(log_alpha)

    return hmc_step


def _run_adaptive(
    step_fn: Callable,
    inits: Array,
    num_samples: int,
    thin: int,
    warmup_steps: int,
    target_accept: float,
    key: Array,
    max_sweeps_per_program: Optional[int] = None,
) -> Array:
    """Shared warmup (dual-averaging step size + diagonal mass EMA) and
    sampling phases. ``step_fn(theta, key, step_size, inv_mass) -> (theta,
    alpha)`` operates on a single chain; chains are vmapped. Both phases
    are module-level jits with step_fn static, so repeated calls with the
    same cached step function reuse the compiled programs.

    max_sweeps_per_program bounds EVERY device program (same contract as
    the slice FSM's resumable-state mode): warmup advances in equal-size
    chunks with the dual-averaging carry threaded between programs, then
    recording chunks carry the last recorded position — draws record EVERY
    step, so ``draws[-1]`` IS the chain state."""
    key, k_warm, k_main = jax.random.split(key, 3)
    theta, step_size, inv_mass = _adaptive_warmup(
        inits, k_warm, target_accept, step_fn=step_fn,
        warmup_steps=warmup_steps,
        max_sweeps_per_program=max_sweeps_per_program,
    )
    n_total = num_samples * thin
    if max_sweeps_per_program is not None and n_total > max_sweeps_per_program:
        chunk = max_sweeps_per_program
        parts = []
        for c in range(-(-n_total // chunk)):
            draws_c = _adaptive_sample(
                theta, jax.random.fold_in(k_main, c), step_size, inv_mass,
                step_fn=step_fn, n_steps=chunk,
            )
            theta = draws_c[-1]
            parts.append(draws_c)
        draws = jnp.concatenate(parts)[:n_total]
    else:
        draws = _adaptive_sample(
            theta, k_main, step_size, inv_mass, step_fn=step_fn,
            n_steps=n_total,
        )
    if thin > 1:
        draws = draws[thin - 1::thin]
    return draws[:num_samples]


@partial(jax.jit, static_argnames=("step_fn", "n_steps"))
def _adaptive_warmup_chunk(carry, k, target_accept, *, step_fn, n_steps):
    """Advance the dual-averaging warmup carry by ``n_steps`` (one device
    program). The full carry goes in and out so warmup can be split across
    bounded programs with identical adaptation dynamics."""
    C = carry[0].shape[0]
    mu = jnp.log(10.0 * 0.1)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def warm_body(carry, inp):
        theta, log_eps, log_eps_bar, h_bar, m2_mean, m2_var, t = carry
        keys = jax.random.split(inp, C)
        step_size = jnp.exp(log_eps)
        inv_mass = jnp.clip(m2_var, 1e-4)
        theta, alphas = jax.vmap(
            lambda th, kk: step_fn(th, kk, step_size, inv_mass)
        )(theta, keys)
        alpha = jnp.mean(alphas)
        # dual averaging
        t = t + 1.0
        eta = 1.0 / (t + t0)
        h_bar = (1 - eta) * h_bar + eta * (target_accept - alpha)
        log_eps = mu - jnp.sqrt(t) / gamma * h_bar
        w = t ** (-kappa)
        log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
        # online variance of positions (Welford-ish, simple EMA)
        batch_mean = theta.mean(axis=0)
        batch_var = theta.var(axis=0) + 1e-6
        m2_mean = 0.9 * m2_mean + 0.1 * batch_mean
        m2_var = 0.9 * m2_var + 0.1 * batch_var
        return (theta, log_eps, log_eps_bar, h_bar, m2_mean, m2_var, t), None

    keys = jax.random.split(k, n_steps)
    carry, _ = jax.lax.scan(warm_body, carry, keys)
    return carry


def _adaptive_warmup(
    inits, k, target_accept, *, step_fn, warmup_steps,
    max_sweeps_per_program=None,
):
    C, D = inits.shape
    carry = (
        inits,
        jnp.log(0.1),
        jnp.log(0.1),
        0.0,
        jnp.zeros(D),
        jnp.ones(D),
        0.0,
    )
    n = max(warmup_steps, 1)
    if max_sweeps_per_program is not None and n > max_sweeps_per_program:
        # Equal-size chunks (one compiled executable) with the adaptation
        # carry threaded between programs; extra steps beyond warmup_steps
        # only continue adaptation, which keeps chunks uniform and is
        # harmless (dual averaging is a converging recursion).
        chunk = max_sweeps_per_program
        for c in range(-(-n // chunk)):
            carry = _adaptive_warmup_chunk(
                carry, jax.random.fold_in(k, c), target_accept,
                step_fn=step_fn, n_steps=chunk,
            )
    else:
        carry = _adaptive_warmup_chunk(
            carry, k, target_accept, step_fn=step_fn, n_steps=n
        )
    theta, _, log_eps_bar, _, _, m2_var, _ = carry
    return theta, jnp.exp(log_eps_bar), jnp.clip(m2_var, 1e-4)


@partial(jax.jit, static_argnames=("step_fn", "n_steps"))
def _adaptive_sample(theta, k, step_size, inv_mass, *, step_fn, n_steps):
    C = theta.shape[0]

    def body(th, kk):
        keys = jax.random.split(kk, C)
        th, _ = jax.vmap(
            lambda t_, k_: step_fn(t_, k_, step_size, inv_mass)
        )(th, keys)
        return th, th

    keys = jax.random.split(k, n_steps)
    _, draws = jax.lax.scan(body, theta, keys)
    return draws


def _is_uturn(theta_later, theta_earlier, mom_later, mom_earlier, inv_mass):
    """Generalized U-turn criterion between the two ends of a trajectory
    segment (velocities v = M^{-1} m; Hoffman & Gelman 2014, Eq. 9)."""
    dtheta = theta_later - theta_earlier
    return (jnp.dot(dtheta, inv_mass * mom_earlier) < 0.0) | (
        jnp.dot(dtheta, inv_mass * mom_later) < 0.0
    )


def run_nuts(
    potential_fn: Callable[[Array], Array],
    inits: Array,
    num_samples: int,
    thin: int = 1,
    warmup_steps: int = 200,
    max_tree_depth: int = 6,
    target_accept: float = 0.8,
    key: Optional[Array] = None,
    max_sweeps_per_program: Optional[int] = None,
) -> Array:
    """Tree-based multinomial NUTS with iterative tree doubling on
    fixed-shape buffers (replacing the reference's Pyro/PyMC delegation,
    `sbi/inference/posteriors/mcmc_posterior.py:48-56`).

    Per step: doubling proceeds to ``max_tree_depth``; each subtree of
    2^depth leaves is built by an inner ``lax.while_loop`` of single
    leapfrog steps with progressive multinomial sampling. Sub-subtree
    U-turns are detected with the popcount-indexed checkpoint scheme
    (O(max_depth) state buffers, the standard accelerator-friendly
    formulation of iterative NUTS): leaf ``n`` (0-based, even) is stored at
    checkpoint slot ``popcount(n)``; at odd leaf ``n`` with ``j`` trailing
    one-bits, U-turns are checked against slots ``popcount(n)-j ..
    popcount(n)-1``, which hold exactly the left endpoints of every
    complete subtree ending at ``n``. All chains advance as one vmapped XLA
    while_loop; divergences (energy error > 1000) discard the subtree.
    """
    key = next_key(key)
    inits = jnp.asarray(inits, jnp.float32)
    _, D = inits.shape
    nuts_step = _make_nuts_step(potential_fn, D, int(max_tree_depth))
    return _run_adaptive(
        nuts_step, inits, num_samples, thin, warmup_steps, target_accept, key,
        max_sweeps_per_program=max_sweeps_per_program,
    )


@lru_cache(maxsize=64)
def _make_nuts_step(potential_fn, D: int, max_depth: int):
    """Per-chain NUTS step, cached on the potential's identity (see
    _make_hmc_step)."""

    def logp_single(th):
        return potential_fn(th[None])[0]

    logp_grad = jax.value_and_grad(logp_single)

    def leapfrog1(th, m, g, eps, inv_mass):
        m = m + 0.5 * eps * g
        th = th + eps * inv_mass * m
        lp, g = logp_grad(th)
        m = m + 0.5 * eps * g
        return th, m, lp, g

    def nuts_step(theta, k, step_size, inv_mass):
        k_mom, k_loop = jax.random.split(k)
        mom = jax.random.normal(k_mom, (D,)) * jnp.sqrt(1.0 / inv_mass)
        lp0, g0 = logp_grad(theta)
        h0 = lp0 - 0.5 * jnp.sum(inv_mass * mom**2)

        def build_subtree(edge, depth, direction, k_sub):
            """2^depth leapfrog steps from `edge` in `direction`. Returns
            (new_edge, prop_sub, log_w_sub, turning|diverging, sum_alpha,
            n_alpha)."""
            th_e, m_e, g_e = edge
            eps = direction * step_size
            n_leaves = jnp.left_shift(1, depth)
            ckpt_th = jnp.zeros((max_depth, D))
            ckpt_m = jnp.zeros((max_depth, D))

            def cond(c):
                n, *_ , bad = c
                return (n < n_leaves) & ~bad

            def body(c):
                (n, th, m, g, log_w, prop, kk, s_alpha, n_alpha,
                 c_th, c_m, bad) = c
                th, m, lp, g = leapfrog1(th, m, g, eps, inv_mass)
                h = lp - 0.5 * jnp.sum(inv_mass * m**2)
                w_leaf = h - h0
                diverging = (w_leaf < -1000.0) | jnp.isnan(w_leaf)
                s_alpha = s_alpha + jnp.exp(jnp.minimum(0.0, jnp.where(jnp.isnan(w_leaf), -jnp.inf, w_leaf)))
                n_alpha = n_alpha + 1.0
                # progressive multinomial sampling within the subtree
                new_log_w = jnp.logaddexp(log_w, w_leaf)
                kk, k_sel = jax.random.split(kk)
                take = jnp.log(jax.random.uniform(k_sel)) < (w_leaf - new_log_w)
                prop = jnp.where(take, th, prop)
                # checkpoint store (even leaf) / U-turn checks (odd leaf)
                n_u = n.astype(jnp.uint32)
                pc = jax.lax.population_count(n_u).astype(jnp.int32)
                is_even = (n % 2) == 0
                slot = jnp.clip(pc, 0, max_depth - 1)
                c_th = jnp.where(is_even, c_th.at[slot].set(th), c_th)
                c_m = jnp.where(is_even, c_m.at[slot].set(m), c_m)
                # trailing ones of n
                j = jax.lax.population_count(
                    (n_u & ~(n_u + 1))
                ).astype(jnp.int32)
                lo = pc - j
                hi = pc - 1
                slots = jnp.arange(max_depth)
                in_range = (~is_even) & (slots >= lo) & (slots <= hi)
                turns = jax.vmap(
                    lambda ct, cm: _is_uturn(th, ct, m, cm, inv_mass)
                )(c_th, c_m)
                turning = jnp.any(in_range & turns)
                bad = bad | diverging | turning
                return (n + 1, th, m, g, new_log_w, prop, kk, s_alpha,
                        n_alpha, c_th, c_m, bad)

            init = (jnp.int32(0), th_e, m_e, g_e, -jnp.inf, th_e, k_sub,
                    0.0, 0.0, ckpt_th, ckpt_m, False)
            (n, th, m, g, log_w, prop, _, s_alpha, n_alpha, _, _, bad) = (
                jax.lax.while_loop(cond, body, init)
            )
            return (th, m, g), prop, log_w, bad, s_alpha, n_alpha

        def cond(c):
            depth, done = c[0], c[-1]
            return (depth < max_depth) & ~done

        def body(c):
            (depth, minus, plus, prop, log_w, kk, s_alpha, n_alpha,
             done) = c
            kk, k_dir, k_sub, k_merge = jax.random.split(kk, 4)
            direction = jnp.where(jax.random.bernoulli(k_dir), 1.0, -1.0)
            edge = jax.tree.map(
                lambda a, b: jnp.where(direction > 0, a, b), plus, minus
            )
            new_edge, prop_sub, log_w_sub, bad, sa, na = build_subtree(
                edge, depth, direction, k_sub
            )
            s_alpha = s_alpha + sa
            n_alpha = n_alpha + na
            # On a bad (turning/diverging) subtree the whole subtree is
            # rejected and doubling stops.
            plus = jax.tree.map(
                lambda old, new: jnp.where((direction > 0) & ~bad, new, old),
                plus, new_edge,
            )
            minus = jax.tree.map(
                lambda old, new: jnp.where((direction < 0) & ~bad, new, old),
                minus, new_edge,
            )
            # biased progressive sampling across the doubling
            take = (
                jnp.log(jax.random.uniform(k_merge)) < (log_w_sub - log_w)
            ) & ~bad
            prop = jnp.where(take, prop_sub, prop)
            log_w = jnp.where(bad, log_w, jnp.logaddexp(log_w, log_w_sub))
            # U-turn across the full trajectory
            th_p, m_p, _ = plus
            th_m, m_m, _ = minus
            full_turn = _is_uturn(th_p, th_m, m_p, m_m, inv_mass)
            done = done | bad | full_turn
            return (depth + 1, minus, plus, prop, log_w, kk, s_alpha,
                    n_alpha, done)

        state0 = (
            jnp.int32(0),
            (theta, mom, g0),
            (theta, mom, g0),
            theta,
            0.0,  # log weight of the root leaf: h0 - h0
            k_loop,
            0.0,
            0.0,
            False,
        )
        (_, _, _, prop, _, _, s_alpha, n_alpha, _) = jax.lax.while_loop(
            cond, body, state0
        )
        alpha = s_alpha / jnp.maximum(n_alpha, 1.0)
        return prop, alpha

    return nuts_step


def run_nuts_jittered(
    potential_fn: Callable[[Array], Array],
    inits: Array,
    num_samples: int,
    thin: int = 1,
    warmup_steps: int = 200,
    max_tree_depth: int = 6,
    target_accept: float = 0.8,
    key: Optional[Array] = None,
) -> Array:
    """Jittered-trajectory multinomial HMC (the round-1 NUTS surrogate,
    kept for cross-validation): same stationary distribution, fixed
    trajectory budget, no per-sample tree adaptation."""
    key = next_key(key)
    num_leapfrog = int(2 ** (max_tree_depth - 1))
    return run_hmc(
        potential_fn,
        inits,
        num_samples,
        thin=thin,
        warmup_steps=warmup_steps,
        num_leapfrog=num_leapfrog,
        target_accept=target_accept,
        jitter_steps=True,
        key=key,
    )
