"""Linear Recurrent Unit embedding with parallel associative scan.

Ref `sbi/neural_nets/embedding_nets/lru.py:14,458`. The recurrence
h_t = diag(lambda) h_{t-1} + B x_t is evaluated with
``jax.lax.associative_scan`` — the natural TPU formulation (log-depth,
all-MXU), vs. the reference's sequential torch scan.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _LRULayer(nn.Module):
    state_dim: int = 64
    r_min: float = 0.4
    r_max: float = 0.99

    @nn.compact
    def __call__(self, x):  # x: (B, T, D)
        D = x.shape[-1]
        N = self.state_dim

        def nu_init(key, shape):
            u = jax.random.uniform(key, shape)
            return jnp.log(-0.5 * jnp.log(u * (self.r_max**2 - self.r_min**2) + self.r_min**2))

        def theta_init(key, shape):
            return jnp.log(jax.random.uniform(key, shape) * 2 * np.pi)

        nu_log = self.param("nu_log", nu_init, (N,))
        theta_log = self.param("theta_log", theta_init, (N,))
        B_re = self.param("B_re", nn.initializers.normal(1.0 / np.sqrt(2 * D)), (D, N))
        B_im = self.param("B_im", nn.initializers.normal(1.0 / np.sqrt(2 * D)), (D, N))
        C_re = self.param("C_re", nn.initializers.normal(1.0 / np.sqrt(N)), (N, D))
        C_im = self.param("C_im", nn.initializers.normal(1.0 / np.sqrt(N)), (N, D))

        lam = jnp.exp(-jnp.exp(nu_log) + 1j * jnp.exp(theta_log))  # (N,)
        gamma = jnp.sqrt(1 - jnp.abs(lam) ** 2)
        Bu = (x.astype(jnp.complex64) @ (B_re + 1j * B_im)) * gamma  # (B, T, N)

        # Associative scan over the time axis: (a, b) elements compose as
        # (a2*a1, a2*b1 + b2); here a_t = lam (broadcast), b_t = Bu_t.
        T = x.shape[1]
        a = jnp.broadcast_to(lam, Bu.shape)

        def combine(e1, e2):
            a1, b1 = e1
            a2, b2 = e2
            return a1 * a2, a2 * b1 + b2

        _, h = jax.lax.associative_scan(combine, (a, Bu), axis=1)
        y = (h @ (C_re + 1j * C_im)).real
        return y + x  # residual


class LRUEmbedding(nn.Module):
    """Sequence (B, T) or (B, T, C) -> (B, output_dim)."""

    input_shape: Tuple[int, ...]
    hidden_dim: int = 64
    state_dim: int = 64
    num_layers: int = 2
    output_dim: int = 20

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        if len(self.input_shape) == 1:
            x = x.reshape((B, self.input_shape[0], 1))
        else:
            x = x.reshape((B,) + tuple(self.input_shape))
        h = nn.Dense(self.hidden_dim)(x)
        for _ in range(self.num_layers):
            h = _LRULayer(self.state_dim)(h)
            h = nn.LayerNorm()(h)
        h = h.mean(axis=1)
        return nn.Dense(self.output_dim)(h)
