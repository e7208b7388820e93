"""Autoregressive categorical mass estimators for discrete dimensions.

JAX counterpart of `sbi/neural_nets/estimators/categorical_net.py:16,249`
(CategoricalMADE / CategoricalMassEstimator).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.transforms import IdentityTransform

Array = jax.Array


class CategoricalMADE(nn.Module):
    """Autoregressive categorical over D discrete dims: dim i's logits are
    conditioned on context and the previous dims' values (one-hot)."""

    num_categories: Tuple[int, ...]  # per-dim category counts
    hidden_features: int = 50
    num_layers: int = 2

    @nn.compact
    def _logits_for_dim(self, i: int, prev_onehot: Array, context: Array) -> Array:
        h = jnp.concatenate([prev_onehot, context], axis=-1)
        for _ in range(self.num_layers):
            h = nn.relu(nn.Dense(self.hidden_features)(h))
        return nn.Dense(int(self.num_categories[i]))(h)

    def _onehot_prev(self, x_disc: Array, upto: int) -> Array:
        parts = []
        for j in range(upto):
            parts.append(
                jax.nn.one_hot(x_disc[:, j].astype(jnp.int32), int(self.num_categories[j]))
            )
        if not parts:
            return jnp.zeros((x_disc.shape[0], 0))
        return jnp.concatenate(parts, axis=-1)

    def log_prob(self, x_disc: Array, context: Array) -> Array:
        """x_disc (B, D) integer-valued floats; context (B, F) -> (B,)."""
        B, D = x_disc.shape
        total = jnp.zeros(B)
        for i in range(D):
            prev = self._onehot_prev(x_disc, i)
            logits = self._logits_for_dim(i, prev, context)
            logp = jax.nn.log_softmax(logits, axis=-1)
            idx = x_disc[:, i].astype(jnp.int32)
            total = total + jnp.take_along_axis(logp, idx[:, None], axis=-1)[:, 0]
        return total

    def sample(self, key: Array, context: Array) -> Array:
        """One draw per context row -> (B, D)."""
        B = context.shape[0]
        D = len(self.num_categories)
        x = jnp.zeros((B, D))
        keys = jax.random.split(key, D)
        for i in range(D):
            prev = self._onehot_prev(x, i)
            logits = self._logits_for_dim(i, prev, context)
            xi = jax.random.categorical(keys[i], logits, axis=-1)
            x = x.at[:, i].set(xi.astype(jnp.float32))
        return x

    def __call__(self, x_disc, context):
        return self.log_prob(x_disc, context)


class CategoricalMassEstimator:
    """Stateful wrapper (ref `:249`) with the conditional-estimator protocol."""

    def __init__(self, net: CategoricalMADE, params, input_shape, condition_shape,
                 condition_transform=None):
        self.net = net
        self.params = params
        self.input_shape = tuple(input_shape)
        self.condition_shape = tuple(condition_shape)
        self.condition_transform = condition_transform or IdentityTransform()

    def log_prob_fn(self, params, input: Array, condition: Array) -> Array:
        """input (S, B, D), condition (B, F) -> (S, B)."""
        S, B = input.shape[0], input.shape[1]
        zc = self.condition_transform.forward(condition)
        cond_rep = jnp.broadcast_to(zc[None], (S,) + zc.shape).reshape(
            (S * B,) + zc.shape[1:]
        )
        flat = input.reshape(S * B, -1)
        return self.net.apply(params, flat, cond_rep, method="log_prob").reshape(S, B)

    def log_prob(self, input, condition):
        return self.log_prob_fn(self.params, input, condition)

    def sample_fn(self, params, key, num_samples: int, condition: Array) -> Array:
        zc = self.condition_transform.forward(condition)
        B = zc.shape[0]
        cond_rep = jnp.tile(zc, (num_samples, 1))
        keys = key
        out = self.net.apply(params, keys, cond_rep, method="sample")
        return out.reshape(num_samples, B, -1)

    def sample(self, sample_shape, condition, key=None):
        from ...utils.sbiutils import next_key

        num = 1
        for s in sample_shape:
            num *= int(s)
        out = self.sample_fn(self.params, next_key(key), num, jnp.atleast_2d(condition))
        return out.reshape(tuple(sample_shape) + out.shape[1:])

    def loss_fn(self, params, input, condition):
        return -self.log_prob_fn(params, input[None], condition)[0]

    def loss(self, input, condition):
        return self.loss_fn(self.params, input, condition)
