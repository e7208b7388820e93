"""CNN embedding nets, 1D and 2D (ref `sbi/neural_nets/embedding_nets/cnn.py:69`)."""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class CNNEmbedding(nn.Module):
    """Conv stack (1D or 2D inferred from input_shape) + MLP head.

    Input: (batch, *input_shape) where input_shape is (L,) / (L, C) for 1D
    or (H, W) / (H, W, C) for 2D.
    """

    input_shape: Tuple[int, ...]
    in_channels: int = 1
    out_channels_per_layer: Sequence[int] = (16, 32)
    num_conv_layers: int = 2
    num_linear_layers: int = 2
    num_linear_units: int = 50
    output_dim: int = 20
    kernel_size: int = 5
    pool_kernel_size: int = 2

    @nn.compact
    def __call__(self, x):
        spatial_ndim = len(self.input_shape)
        assert spatial_ndim in (1, 2), "CNNEmbedding supports 1D or 2D inputs."
        B = x.shape[0]
        x = x.reshape((B,) + tuple(self.input_shape) + (self.in_channels,))
        ks = (self.kernel_size,) * spatial_ndim
        pool = (self.pool_kernel_size,) * spatial_ndim
        h = x
        for i in range(self.num_conv_layers):
            h = nn.Conv(self.out_channels_per_layer[i], ks, padding="SAME")(h)
            h = nn.relu(h)
            h = nn.max_pool(h, window_shape=pool, strides=pool)
        h = h.reshape((B, -1))
        for _ in range(self.num_linear_layers - 1):
            h = nn.relu(nn.Dense(self.num_linear_units)(h))
        return nn.Dense(self.output_dim)(h)
