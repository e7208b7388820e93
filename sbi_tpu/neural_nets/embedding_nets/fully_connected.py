"""Fully-connected embedding net (ref `sbi/neural_nets/embedding_nets/
fully_connected.py:7`)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class IdentityEmbedding(nn.Module):
    """Flatten-only embedding (the reference's default nn.Identity)."""

    @nn.compact
    def __call__(self, x):
        return x.reshape((x.shape[0], -1))


class FCEmbedding(nn.Module):
    """MLP embedding: num_layers x (Dense + ReLU) -> output_dim."""

    output_dim: int = 20
    num_layers: int = 2
    num_hiddens: int = 40

    @nn.compact
    def __call__(self, x):
        h = x.reshape((x.shape[0], -1))
        for _ in range(self.num_layers):
            h = nn.relu(nn.Dense(self.num_hiddens)(h))
        return nn.Dense(self.output_dim)(h)
