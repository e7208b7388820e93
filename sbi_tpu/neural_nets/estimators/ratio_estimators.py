"""Ratio estimator: classifier over (theta, x) pairs.

JAX counterpart of `sbi/neural_nets/ratio_estimators.py:12`. The classifier
outputs a single logit = log r(x, theta) (likelihood-to-marginal ratio after
training with the NRE losses).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.transforms import IdentityTransform

Array = jax.Array


class MLPClassifierModule(nn.Module):
    hidden_features: int = 50
    num_layers: int = 2
    embedding_net_theta: Optional[nn.Module] = None
    embedding_net_x: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, theta: Array, x: Array) -> Array:
        t = theta
        if self.embedding_net_theta is not None:
            t = self.embedding_net_theta(t)
        xe = x
        if self.embedding_net_x is not None:
            xe = self.embedding_net_x(xe)
        h = jnp.concatenate(
            [t.reshape(t.shape[0], -1), xe.reshape(xe.shape[0], -1)], axis=-1
        )
        for _ in range(self.num_layers):
            h = nn.relu(nn.Dense(self.hidden_features)(h))
        return nn.Dense(1)(h)[:, 0]


class ResNetClassifierModule(nn.Module):
    hidden_features: int = 50
    num_blocks: int = 2
    embedding_net_theta: Optional[nn.Module] = None
    embedding_net_x: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, theta: Array, x: Array) -> Array:
        t = theta
        if self.embedding_net_theta is not None:
            t = self.embedding_net_theta(t)
        xe = x
        if self.embedding_net_x is not None:
            xe = self.embedding_net_x(xe)
        h = jnp.concatenate(
            [t.reshape(t.shape[0], -1), xe.reshape(xe.shape[0], -1)], axis=-1
        )
        h = nn.Dense(self.hidden_features)(h)
        for _ in range(self.num_blocks):
            r = nn.relu(h)
            r = nn.Dense(self.hidden_features)(r)
            r = nn.relu(r)
            r = nn.Dense(self.hidden_features)(r)
            h = h + r
        return nn.Dense(1)(nn.relu(h))[:, 0]


class LinearClassifierModule(nn.Module):
    @nn.compact
    def __call__(self, theta: Array, x: Array) -> Array:
        h = jnp.concatenate(
            [theta.reshape(theta.shape[0], -1), x.reshape(x.shape[0], -1)], axis=-1
        )
        return nn.Dense(1)(h)[:, 0]


class RatioEstimator:
    """Stateful wrapper: log_ratio_fn(params, theta, x) -> (B,) logits."""

    def __init__(
        self,
        net,
        params,
        theta_shape: Tuple[int, ...],
        x_shape: Tuple[int, ...],
        theta_transform=None,
        x_transform=None,
    ):
        self.net = net
        self.params = params
        self.theta_shape = tuple(theta_shape)
        self.x_shape = tuple(x_shape)
        self.theta_transform = theta_transform or IdentityTransform()
        self.x_transform = x_transform or IdentityTransform()
        # reference-API compat
        self.input_shape = self.theta_shape
        self.condition_shape = self.x_shape

    def log_ratio_fn(self, params, theta: Array, x: Array) -> Array:
        zt = self.theta_transform.forward(theta)
        zx = self.x_transform.forward(x)
        return self.net.apply(params, zt, zx)

    def log_ratio(self, theta: Array, x: Array) -> Array:
        return self.log_ratio_fn(self.params, theta, x)

    def snapshot(self) -> "RatioEstimator":
        import copy

        snap = copy.copy(self)
        snap.params = self.params
        return snap

    # torch-API names
    def forward(self, theta, x):
        return self.log_ratio(theta, x)

    def __call__(self, theta, x):
        return self.log_ratio(theta, x)
