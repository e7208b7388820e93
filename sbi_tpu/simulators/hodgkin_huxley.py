"""Hodgkin-Huxley neuron simulator, fully on-device.

The reference's flagship application (tutorials; BASELINE config 5) uses a
cython/numpy HH simulator on a CPU worker pool. Here the membrane ODE is a
`lax.scan` over time with exponential-Euler gating updates, `vmap`pable over
parameter batches — thousands of neurons integrate in parallel on the TPU.

Parameters (theta): [g_Na, g_K] maximal conductances (mS/cm^2), the standard
2-parameter HH inference task (extendable to g_leak, etc.).
Output: summary statistics of the voltage trace (spike count, resting
potential moments, voltage mean/std during stimulus), following the
reference tutorial's summary-stats approach.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.distributions import BoxUniform
from ..utils.sbiutils import next_key

Array = jax.Array

# Fixed biophysics (squid axon at 6.3C)
C_M = 1.0  # uF/cm^2
G_LEAK = 0.3  # mS/cm^2
E_NA, E_K, E_LEAK = 50.0, -77.0, -54.387  # mV
DT = 0.02  # ms
T_TOTAL = 120.0  # ms
STIM_ON, STIM_OFF = 10.0, 110.0  # ms
I_STIM = 10.0  # uA/cm^2


def _vtrap(x, scale):
    """x / (1 - exp(-x/scale)), stable at the removable singularity x=0."""
    small = jnp.abs(x) < 1e-4
    safe_x = jnp.where(small, 1.0, x)
    val = safe_x / (1.0 - jnp.exp(-safe_x / scale))
    return jnp.where(small, scale + x / 2.0, val)


def _alpha_beta(v):
    an = 0.01 * _vtrap(v + 55.0, 10.0)
    bn = 0.125 * jnp.exp(-(v + 65.0) / 80.0)
    am = 0.1 * _vtrap(v + 40.0, 10.0)
    bm = 4.0 * jnp.exp(-(v + 65.0) / 18.0)
    ah = 0.07 * jnp.exp(-(v + 65.0) / 20.0)
    bh = 1.0 / (1.0 + jnp.exp(-(v + 35.0) / 10.0))
    return (an, bn), (am, bm), (ah, bh)


def _simulate_voltage(theta: Array, noise_std: float, key: Array) -> Array:
    """One neuron: theta (2,) -> voltage trace (T,). Exponential-Euler for
    the gates, forward Euler + current noise for V."""
    g_na, g_k = theta[0], theta[1]
    n_steps = int(T_TOTAL / DT)
    ts = jnp.arange(n_steps) * DT
    stim = jnp.where((ts >= STIM_ON) & (ts <= STIM_OFF), I_STIM, 0.0)
    noise = noise_std * jax.random.normal(key, (n_steps,)) / jnp.sqrt(DT)

    v0 = -65.0
    (an, bn), (am, bm), (ah, bh) = _alpha_beta(v0)
    state0 = (v0, an / (an + bn), am / (am + bm), ah / (ah + bh))

    def step(state, inp):
        v, n, m, h = state
        i_ext, xi = inp
        (an, bn), (am, bm), (ah, bh) = _alpha_beta(v)
        # exponential Euler for gates: x += (x_inf - x) * (1 - exp(-dt/tau))
        for_gates = []
        for x, a, b in ((n, an, bn), (m, am, bm), (h, ah, bh)):
            tau = 1.0 / (a + b)
            x_inf = a * tau
            for_gates.append(x_inf + (x - x_inf) * jnp.exp(-DT / tau))
        n, m, h = for_gates
        i_na = g_na * m**3 * h * (v - E_NA)
        i_k = g_k * n**4 * (v - E_K)
        i_l = G_LEAK * (v - E_LEAK)
        dv = (i_ext + xi - i_na - i_k - i_l) / C_M
        v = v + DT * dv
        return (v, n, m, h), v

    _, vs = jax.lax.scan(step, state0, (stim, noise))
    return vs


def summary_statistics(vs: Array) -> Array:
    """7 summary stats of a voltage trace (spike count, latencies, moments)."""
    n_steps = vs.shape[-1]
    ts = jnp.arange(n_steps) * DT
    stim_mask = (ts >= STIM_ON) & (ts <= STIM_OFF)
    # spikes: upward crossings of 0 mV
    above = vs > 0.0
    crossings = jnp.logical_and(~above[:-1], above[1:])
    n_spikes = crossings.sum().astype(jnp.float32)
    rest_mask = ts < STIM_ON
    v_rest = jnp.sum(vs * rest_mask) / jnp.clip(rest_mask.sum(), 1)
    v_mean = jnp.sum(vs * stim_mask) / jnp.clip(stim_mask.sum(), 1)
    v_var = jnp.sum((vs - v_mean) ** 2 * stim_mask) / jnp.clip(stim_mask.sum(), 1)
    v_std = jnp.sqrt(v_var)
    # moments 3, 4 (standardized)
    z = (vs - v_mean) / jnp.clip(v_std, 1e-3)
    m3 = jnp.sum(z**3 * stim_mask) / jnp.clip(stim_mask.sum(), 1)
    m4 = jnp.sum(z**4 * stim_mask) / jnp.clip(stim_mask.sum(), 1)
    v_max = vs.max()
    return jnp.stack([n_spikes, v_rest, v_mean, v_std, m3, m4, v_max])


@partial(jax.jit, static_argnums=(2,))
def _hh_batch(theta: Array, keys: Array, return_trace: bool) -> Array:
    vs = jax.vmap(lambda t, k: _simulate_voltage(t, 0.2, k))(theta, keys)
    if return_trace:
        return vs
    return jax.vmap(summary_statistics)(vs)


def hodgkin_huxley(theta: Array, key: Optional[Array] = None,
                   return_trace: bool = False) -> Array:
    """Batched HH simulator: theta (B, 2) = (g_Na, g_K) -> summaries (B, 7)
    (or raw traces (B, T) with return_trace)."""
    key = next_key(key)
    theta = jnp.atleast_2d(jnp.asarray(theta, jnp.float32))
    keys = jax.random.split(key, theta.shape[0])
    return _hh_batch(theta, keys, return_trace)


def hh_prior() -> BoxUniform:
    """Prior over (g_Na, g_K) covering the physiological range."""
    return BoxUniform(jnp.array([50.0, 20.0]), jnp.array([200.0, 60.0]))
