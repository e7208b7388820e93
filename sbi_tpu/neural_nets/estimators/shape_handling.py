"""(sample, batch, event) shape convention helpers.

Mirror of `sbi/neural_nets/estimators/shape_handling.py:8,60`. Every
estimator method takes inputs shaped (sample, batch, *event) and conditions
shaped (batch, *event).
"""

from __future__ import annotations

import jax.numpy as jnp


def reshape_to_batch_event(x, event_shape):
    """Return x with shape (batch, *event_shape)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    event_shape = tuple(event_shape)
    if x.shape == event_shape:
        return x.reshape((1, *event_shape))
    # Collapse all leading dims into batch.
    n_event = len(event_shape)
    assert x.shape[x.ndim - n_event:] == event_shape, (
        f"x shape {x.shape} incompatible with event shape {event_shape}"
    )
    return x.reshape((-1, *event_shape))


def reshape_to_sample_batch_event(theta, event_shape, leading_is_sample: bool = False):
    """Return theta with shape (sample, batch, *event_shape)."""
    theta = jnp.asarray(theta, dtype=jnp.float32)
    event_shape = tuple(event_shape)
    n_event = len(event_shape)
    if theta.shape == event_shape:
        return theta.reshape((1, 1, *event_shape))
    if theta.ndim == n_event + 1:
        if leading_is_sample:
            return theta.reshape((-1, 1, *event_shape))
        return theta.reshape((1, -1, *event_shape))
    assert theta.ndim == n_event + 2, (
        f"theta shape {theta.shape} incompatible with event shape {event_shape}"
    )
    return theta
