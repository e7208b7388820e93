"""Conditional estimator base classes.

JAX counterpart of `sbi/neural_nets/estimators/base.py:37,203,310,563`.

Design (TPU-first, functional core / stateful shell):
  - The network is a flax.linen module; its parameters live on the estimator
    as a pytree (`self.params`).
  - Every numeric method has a *pure* counterpart usable inside jit:
    ``estimator.loss_fn(params, input, condition)`` etc. Trainers jit and
    differentiate these; the stateful methods below are conveniences that
    close over ``self.params``.
  - Optional ``input_transform`` (z-scoring of theta as an invertible
    AffineTransform with log-det correction) and ``condition_transform``
    (z-scoring of x) are applied outside the module so flax modules stay
    free of array-valued attributes (cheap, jit-fused).
  - Shapes follow the reference's (sample, batch, *event) convention.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ...utils.sbiutils import next_key
from ...utils.transforms import IdentityTransform, Transform
from .shape_handling import reshape_to_batch_event, reshape_to_sample_batch_event

Array = jax.Array


class ConditionalEstimator:
    """Base: holds a flax module + params + shapes (ref base.py:37)."""

    def __init__(
        self,
        net: Any,
        params: Any,
        input_shape: Tuple[int, ...],
        condition_shape: Tuple[int, ...],
        input_transform: Optional[Transform] = None,
        condition_transform: Optional[Transform] = None,
    ) -> None:
        self.net = net
        self.params = params
        self.input_shape = tuple(input_shape)
        self.condition_shape = tuple(condition_shape)
        self.input_transform = input_transform or IdentityTransform()
        self.condition_transform = condition_transform or IdentityTransform()

    # -- functional core ----------------------------------------------------
    def _embed_condition(self, condition: Array) -> Array:
        """Apply the condition z-scoring (the module applies the embedding)."""
        return self.condition_transform.forward(condition)

    def loss_fn(self, params, input: Array, condition: Array) -> Array:
        """Pure per-sample loss, (batch,) -> differentiated by trainers."""
        raise NotImplementedError

    # -- stateful conveniences -----------------------------------------------
    def loss(self, input: Array, condition: Array) -> Array:
        return self.loss_fn(self.params, input, condition)

    def snapshot(self) -> "ConditionalEstimator":
        """Shallow copy with the current params pinned. Trainers keep
        mutating their estimator's params across rounds; posteriors must
        hold a frozen view (the reference deepcopies in build_posterior,
        `trainers/base.py:522-524`). Params are immutable jax arrays, so a
        shallow copy + rebinding suffices."""
        import copy

        snap = copy.copy(self)
        snap.params = self.params
        return snap

    def _check_condition_shape(self, condition: Array) -> None:
        n = len(self.condition_shape)
        if tuple(condition.shape[-n:]) != self.condition_shape:
            raise ValueError(
                f"Condition shape {condition.shape} does not end with expected "
                f"event shape {self.condition_shape}."
            )


class ConditionalDensityEstimator(ConditionalEstimator):
    """Adds log_prob / sample (ref base.py:203).

    Subclasses implement the pure fns ``_log_prob_fn(params, input_bt, cond_bt)``
    over flat batches and ``_sample_fn(params, key, num, cond_bt)``.
    """

    # --- to implement by subclasses (flat-batch, pure) ----------------------
    def _log_prob_fn(self, params, input: Array, condition: Array) -> Array:
        """input (B, *event_in) z-scored, condition (B, *event_cond) z-scored."""
        raise NotImplementedError

    def _sample_fn(self, params, key: Array, num_samples: int, condition: Array) -> Array:
        """Return (num_samples, B, *event_in) in z-scored space."""
        raise NotImplementedError

    # --- public (sample, batch, event) API -----------------------------------
    def log_prob_fn(self, params, input: Array, condition: Array) -> Array:
        """Pure log prob: input (S, B, *ev), condition (B, *cond) -> (S, B)."""
        input = reshape_to_sample_batch_event(input, self.input_shape)
        condition = reshape_to_batch_event(condition, self.condition_shape)
        S, B = input.shape[0], input.shape[1]
        z, ldj = jax.vmap(self.input_transform.forward_and_log_det)(input)
        zc = self._embed_condition(condition)
        flat = z.reshape((S * B,) + self.input_shape)
        cond_rep = jnp.broadcast_to(
            zc[None], (S,) + zc.shape
        ).reshape((S * B,) + zc.shape[1:])
        lp = self._log_prob_fn(params, flat, cond_rep).reshape(S, B)
        return lp + ldj

    def log_prob(self, input: Array, condition: Array) -> Array:
        return self.log_prob_fn(self.params, input, condition)

    def sample_fn(self, params, key: Array, sample_shape: Tuple[int, ...], condition: Array) -> Array:
        condition = reshape_to_batch_event(condition, self.condition_shape)
        B = condition.shape[0]
        num = 1
        for s in sample_shape:
            num *= int(s)
        zc = self._embed_condition(condition)
        z = self._sample_fn(params, key, num, zc)  # (num, B, *event)
        theta = jax.vmap(self.input_transform.inverse)(z)
        return theta.reshape(tuple(sample_shape) + (B,) + self.input_shape)

    def sample(self, sample_shape: Tuple[int, ...], condition: Array, key=None) -> Array:
        return self.sample_fn(self.params, next_key(key), sample_shape, condition)

    def loss_fn(self, params, input: Array, condition: Array) -> Array:
        """Default density-estimation loss: -log q(input | condition).

        input (B, *ev), condition (B, *cond) -> (B,). Mirrors nflows/zuko
        wrappers' loss in the reference (`nflows_flow.py:14-80`).
        """
        lp = self.log_prob_fn(params, input[None], condition)[0]
        return -lp

    def sample_and_log_prob(self, sample_shape, condition, key=None):
        samples = self.sample(sample_shape, condition, key=key)
        lp = self.log_prob(
            samples.reshape((-1,) + samples.shape[-len(self.input_shape) - 1:]),
            condition,
        )
        return samples, lp.reshape(sample_shape + (-1,))


class UnconditionalEstimator:
    """Unconditional density estimator (ref base.py:563), for MarginalTrainer."""

    def __init__(self, net, params, input_shape):
        self.net = net
        self.params = params
        self.input_shape = tuple(input_shape)

    def log_prob_fn(self, params, input: Array) -> Array:
        raise NotImplementedError

    def sample_fn(self, params, key, num: int) -> Array:
        raise NotImplementedError

    def log_prob(self, input: Array) -> Array:
        return self.log_prob_fn(self.params, input)

    def sample(self, sample_shape: Tuple[int, ...], key=None) -> Array:
        num = 1
        for s in sample_shape:
            num *= int(s)
        out = self.sample_fn(self.params, next_key(key), num)
        return out.reshape(tuple(sample_shape) + self.input_shape)

    def loss_fn(self, params, input: Array) -> Array:
        return -self.log_prob_fn(params, input)

    def loss(self, input: Array) -> Array:
        return self.loss_fn(self.params, input)


class ConditionalVectorFieldEstimator(ConditionalEstimator):
    """ABC for score / flow-matching estimators (ref base.py:310).

    Subclasses provide ``forward(params, input, condition, time)`` plus the
    SDE geometry (drift/diffusion/mean_t/std) and conversions (score, ode).
    """

    # Flags mirroring the reference API
    SCORE_DEFINED: bool = True
    SDE_DEFINED: bool = True
    MARGINALS_DEFINED: bool = True

    t_min: float = 0.0
    t_max: float = 1.0

    def forward_fn(self, params, input: Array, condition: Array, time: Array) -> Array:
        raise NotImplementedError

    def forward(self, input, condition, time):
        return self.forward_fn(self.params, input, condition, time)

    def __call__(self, input, condition, time):
        return self.forward(input, condition, time)

    # --- SDE geometry --------------------------------------------------------
    def mean_t_fn(self, times: Array) -> Array:
        raise NotImplementedError

    def std_fn(self, times: Array) -> Array:
        raise NotImplementedError

    def drift_fn(self, input: Array, times: Array) -> Array:
        raise NotImplementedError

    def diffusion_fn(self, input: Array, times: Array) -> Array:
        raise NotImplementedError

    def score_fn(self, params, input: Array, condition: Array, time: Array) -> Array:
        raise NotImplementedError

    def score(self, input, condition, time):
        return self.score_fn(self.params, input, condition, time)

    def ode_fn(self, params, input: Array, condition: Array, time: Array) -> Array:
        """Probability-flow ODE velocity d input / d t."""
        raise NotImplementedError

    def solve_schedule(self, num_steps: int) -> Array:
        """Time grid from t_max down to t_min (ref score_estimator.py:442)."""
        return jnp.linspace(self.t_max, self.t_min, num_steps)
