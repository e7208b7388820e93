"""WaveNet-style causal dilated CNN embedding
(ref `sbi/neural_nets/embedding_nets/causal_cnn.py:136`)."""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class _CausalConv1D(nn.Module):
    channels: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x):  # x: (B, L, C)
        pad = (self.kernel_size - 1) * self.dilation
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        return nn.Conv(
            self.channels,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
        )(x)


class CausalCNNEmbedding(nn.Module):
    """Stacked gated dilated causal convolutions + pooling head."""

    input_shape: Tuple[int, ...]
    in_channels: int = 1
    channels: int = 16
    num_layers: int = 4
    kernel_size: int = 2
    output_dim: int = 20

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        L = self.input_shape[0]
        x = x.reshape((B, L, self.in_channels))
        h = nn.Conv(self.channels, (1,))(x)
        skip = 0.0
        for i in range(self.num_layers):
            dilation = 2**i
            f = _CausalConv1D(self.channels, self.kernel_size, dilation)(h)
            g = _CausalConv1D(self.channels, self.kernel_size, dilation)(h)
            z = jnp.tanh(f) * nn.sigmoid(g)
            z = nn.Conv(self.channels, (1,))(z)
            skip = skip + z
            h = h + z
        out = nn.relu(skip).mean(axis=1)
        out = nn.relu(nn.Dense(2 * self.output_dim)(out))
        return nn.Dense(self.output_dim)(out)
