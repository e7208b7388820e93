"""ResNet embedding nets (ref `sbi/neural_nets/embedding_nets/resnet.py:102,294`)."""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class _ResBlock(nn.Module):
    channels: int
    spatial_ndim: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        ks = (3,) * self.spatial_ndim
        st = (self.stride,) * self.spatial_ndim
        h = nn.Conv(self.channels, ks, strides=st, padding="SAME", use_bias=False)(x)
        h = nn.GroupNorm(num_groups=min(8, self.channels))(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, ks, padding="SAME", use_bias=False)(h)
        h = nn.GroupNorm(num_groups=min(8, self.channels))(h)
        if x.shape[-1] != self.channels or self.stride != 1:
            x = nn.Conv(self.channels, (1,) * self.spatial_ndim, strides=st)(x)
        return nn.relu(h + x)


class _ResNetEmbedding(nn.Module):
    input_shape: Tuple[int, ...]
    spatial_ndim: int
    in_channels: int = 1
    channels: Sequence[int] = (16, 32, 64)
    output_dim: int = 20

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        x = x.reshape((B,) + tuple(self.input_shape) + (self.in_channels,))
        h = nn.Conv(self.channels[0], (3,) * self.spatial_ndim, padding="SAME")(x)
        for i, c in enumerate(self.channels):
            stride = 1 if i == 0 else 2
            h = _ResBlock(c, self.spatial_ndim, stride)(h)
            h = _ResBlock(c, self.spatial_ndim, 1)(h)
        # Global average pool over spatial dims.
        h = h.mean(axis=tuple(range(1, 1 + self.spatial_ndim)))
        return nn.Dense(self.output_dim)(h)


class ResNetEmbedding1D(_ResNetEmbedding):
    spatial_ndim: int = 1


class ResNetEmbedding2D(_ResNetEmbedding):
    spatial_ndim: int = 2
