"""Conditional continuous normalizing flow (CNF) density estimator.

Counterpart of the reference's zuko CNF density-estimator builder
(`sbi/neural_nets/net_builders/flow.py:459-1170` family, zuko `CNF`): a
time-dependent conditional vector field trained by exact maximum likelihood
through the instantaneous change-of-variables formula. Reuses the in-repo
fixed-grid RK4 + divergence machinery (`samplers/ode/ode_solvers.py`) — the
TPU-friendly formulation (static shapes, `lax.scan`) rather than an
adaptive adjoint solver.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...samplers.ode.ode_solvers import odeint_rk4, odeint_with_logdet
from .base import ConditionalDensityEstimator

Array = jax.Array


class CNFVectorField(nn.Module):
    """f(z, t | context): MLP with Fourier time features (zuko-CNF style)."""

    dim: int
    hidden_features: int = 64
    num_layers: int = 3
    time_features: int = 8
    embedding_net: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, z: Array, context: Optional[Array], t: Array) -> Array:
        # t: (B,) in [0, 1]; Fourier features keep the field smooth in t.
        freqs = 2.0 ** jnp.arange(self.time_features // 2)
        temb = jnp.concatenate(
            [jnp.sin(t[:, None] * freqs * jnp.pi),
             jnp.cos(t[:, None] * freqs * jnp.pi)],
            axis=-1,
        )
        parts = [z, temb]
        if context is not None:
            c = context
            if self.embedding_net is not None:
                c = self.embedding_net(c)
            parts.append(c.reshape(c.shape[0], -1))
        h = jnp.concatenate(parts, axis=-1)
        for _ in range(self.num_layers):
            h = nn.gelu(nn.Dense(self.hidden_features)(h))
        # Zero-init output: the flow starts at the identity map, so the
        # initial model is exactly the (z-scored) standard normal.
        return nn.Dense(
            self.dim, kernel_init=nn.initializers.zeros
        )(h)


class CNFEstimator(ConditionalDensityEstimator):
    """Conditional CNF: base N(0, I) at t=0, data at t=1.

    log_prob integrates the augmented (state, divergence) system backward
    with exact per-sample divergence (`jacfwd` trace — theta spaces in SBI
    are low-dim, where exact beats Hutchinson's variance).
    """

    def __init__(self, *args, num_steps: int = 32, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_steps = num_steps

    def _field(self, params, z, condition, t):
        tvec = jnp.broadcast_to(jnp.asarray(t), (z.shape[0],))
        return self.net.apply(params, z, condition, tvec)

    def _log_prob_fn(self, params, input: Array, condition: Array) -> Array:
        # Per-sample integration (vmapped): the exact-divergence trace needs
        # each state paired with ITS condition row, which the shared-batch
        # helper cannot express.
        def single_lp(xi, ci):
            def f(z, t):
                return self._field(params, z, ci[None], t)

            z0, logdet = odeint_with_logdet(
                f, xi[None], 1.0, 0.0, num_steps=self.num_steps
            )
            base_lp = jnp.sum(
                -0.5 * z0[0] ** 2 - 0.5 * jnp.log(2 * jnp.pi), axis=-1
            )
            # Backward integration accumulates +div f; change of variables
            # gives log p(x) = log N(z0) + \int_0^1 div f dt.
            return base_lp + logdet[0]

        return jax.vmap(single_lp)(input, condition)

    def _sample_fn(self, params, key, num_samples: int, condition: Array) -> Array:
        B = condition.shape[0]
        D = self.input_shape[0]
        z0 = jax.random.normal(key, (num_samples * B, D))
        cond_rep = jnp.broadcast_to(
            condition[None], (num_samples,) + condition.shape
        ).reshape((num_samples * B,) + condition.shape[1:])

        def f(z, t):
            return self._field(params, z, cond_rep, t)

        z1 = odeint_rk4(f, z0, 0.0, 1.0, num_steps=self.num_steps)
        return z1.reshape(num_samples, B, D)
