"""FNO-style spectral convolution embedding
(ref `sbi/neural_nets/embedding_nets/SC_embedding.py:207`)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _SpectralConv1D(nn.Module):
    channels: int
    modes: int

    @nn.compact
    def __call__(self, x):  # (B, L, C)
        C = x.shape[-1]
        w_re = self.param(
            "w_re", nn.initializers.normal(1.0 / np.sqrt(C)), (self.modes, C, self.channels)
        )
        w_im = self.param(
            "w_im", nn.initializers.normal(1.0 / np.sqrt(C)), (self.modes, C, self.channels)
        )
        xf = jnp.fft.rfft(x, axis=1)  # (B, L//2+1, C)
        modes = min(self.modes, xf.shape[1])
        w = (w_re + 1j * w_im)[:modes]
        yf_low = jnp.einsum("bmc,mco->bmo", xf[:, :modes], w)
        pad = xf.shape[1] - modes
        yf = jnp.concatenate(
            [yf_low, jnp.zeros((x.shape[0], pad, self.channels), dtype=yf_low.dtype)], axis=1
        )
        return jnp.fft.irfft(yf, n=x.shape[1], axis=1)


class SpectralConvEmbedding(nn.Module):
    """1D sequence -> spectral conv blocks -> (B, output_dim)."""

    input_shape: Tuple[int, ...]
    channels: int = 32
    modes: int = 16
    num_layers: int = 2
    output_dim: int = 20

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        if len(self.input_shape) == 1:
            x = x.reshape((B, self.input_shape[0], 1))
        else:
            x = x.reshape((B,) + tuple(self.input_shape))
        h = nn.Dense(self.channels)(x)
        for _ in range(self.num_layers):
            s = _SpectralConv1D(self.channels, self.modes)(h)
            w = nn.Dense(self.channels)(h)
            h = nn.gelu(s + w)
        h = h.mean(axis=1)
        return nn.Dense(self.output_dim)(h)
