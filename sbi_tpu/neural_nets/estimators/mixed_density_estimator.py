"""Mixed discrete + continuous conditional density estimator.

JAX counterpart of `sbi/neural_nets/estimators/mixed_density_estimator.py:13`:
joins an autoregressive categorical net over the discrete dims with a
conditional flow over the continuous dims (conditioned on discrete values +
context). Layout convention matches the reference: for MNLE the *discrete
dims come last* in x; for MNPE theta is continuous-first (`mnpe.py:53-55`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .base import ConditionalDensityEstimator
from .categorical_net import CategoricalMassEstimator

Array = jax.Array


class MixedDensityEstimator(ConditionalDensityEstimator):
    def __init__(
        self,
        continuous_estimator: ConditionalDensityEstimator,
        categorical_estimator: CategoricalMassEstimator,
        input_shape: Tuple[int, ...],
        condition_shape: Tuple[int, ...],
        num_discrete: int,
    ):
        self.continuous_estimator = continuous_estimator
        self.categorical_estimator = categorical_estimator
        self.num_discrete = num_discrete
        self.input_shape = tuple(input_shape)
        self.condition_shape = tuple(condition_shape)
        # params as a joint pytree for the trainers
        self.params = {
            "continuous": continuous_estimator.params,
            "categorical": categorical_estimator.params,
        }

    def _split(self, input: Array) -> Tuple[Array, Array]:
        D = self.input_shape[0]
        d_cont = D - self.num_discrete
        return input[..., :d_cont], input[..., d_cont:]

    def log_prob_fn(self, params, input: Array, condition: Array) -> Array:
        """input (S, B, D) with discrete last; condition (B, F) -> (S, B)."""
        from .shape_handling import reshape_to_batch_event, reshape_to_sample_batch_event

        input = reshape_to_sample_batch_event(input, self.input_shape)
        condition = reshape_to_batch_event(condition, self.condition_shape)
        cont, disc = self._split(input)
        # categorical: p(disc | condition)
        lp_disc = self.categorical_estimator.log_prob_fn(
            params["categorical"], disc, condition
        )
        # continuous flow: p(cont | condition, disc)
        S, B = input.shape[0], input.shape[1]
        cond_flat = jnp.broadcast_to(
            condition[None], (S,) + condition.shape
        ).reshape((S * B,) + condition.shape[1:])
        aug_cond = jnp.concatenate(
            [cond_flat.reshape(S * B, -1), disc.reshape(S * B, -1)], axis=-1
        )
        lp_cont = self.continuous_estimator.log_prob_fn(
            params["continuous"],
            cont.reshape(S * B, 1, -1).swapaxes(0, 1),
            aug_cond,
        )[0].reshape(S, B)
        return lp_disc + lp_cont

    def log_prob(self, input, condition):
        return self.log_prob_fn(self.params, input, condition)

    def sample_fn(self, params, key, sample_shape, condition: Array) -> Array:
        from .shape_handling import reshape_to_batch_event

        condition = reshape_to_batch_event(condition, self.condition_shape)
        B = condition.shape[0]
        num = 1
        for s in sample_shape:
            num *= int(s)
        k1, k2 = jax.random.split(key)
        disc = self.categorical_estimator.sample_fn(
            params["categorical"], k1, num, condition
        )  # (num, B, d_disc)
        cond_rep = jnp.tile(condition.reshape(B, -1), (num, 1))
        aug_cond = jnp.concatenate([cond_rep, disc.reshape(num * B, -1)], axis=-1)
        cont = self.continuous_estimator.sample_fn(
            params["continuous"], k2, (1,), aug_cond
        )[0]  # (num*B, d_cont)
        out = jnp.concatenate([cont.reshape(num, B, -1), disc], axis=-1)
        return out.reshape(tuple(sample_shape) + (B,) + self.input_shape)

    def sample(self, sample_shape, condition, key=None):
        from ...utils.sbiutils import next_key

        return self.sample_fn(self.params, next_key(key), sample_shape, condition)

    def loss_fn(self, params, input: Array, condition: Array) -> Array:
        return -self.log_prob_fn(params, input[None], condition)[0]

    def loss(self, input, condition):
        return self.loss_fn(self.params, input, condition)

    def snapshot(self):
        import copy

        snap = copy.copy(self)
        snap.params = self.params
        return snap
