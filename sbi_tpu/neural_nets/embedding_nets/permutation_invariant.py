"""Permutation-invariant embedding for iid-trial sets.

Ref `sbi/neural_nets/embedding_nets/permutation_invariant.py:12`: embed each
trial with a shared net, then aggregate (mean + optional count channel) and
pass through an output MLP. Used for variable numbers of iid observations.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from .fully_connected import FCEmbedding


class PermutationInvariantEmbedding(nn.Module):
    """Input (batch, num_trials, *trial_event) -> (batch, output_dim)."""

    trial_net: Optional[nn.Module] = None
    trial_net_output_dim: int = 20
    combining_operation: str = "mean"  # "mean" | "sum" | "max"
    num_layers: int = 2
    num_hiddens: int = 40
    output_dim: int = 20
    add_count_channel: bool = True

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        if x.ndim == 2:
            x = x[:, :, None]
        T = x.shape[1]
        trial_net = self.trial_net or FCEmbedding(output_dim=self.trial_net_output_dim)
        flat = x.reshape((B * T,) + x.shape[2:])
        e = trial_net(flat).reshape(B, T, -1)
        if self.combining_operation == "mean":
            agg = e.mean(axis=1)
        elif self.combining_operation == "sum":
            agg = e.sum(axis=1)
        else:
            agg = e.max(axis=1)
        if self.add_count_channel:
            count = jnp.full((B, 1), float(T))
            agg = jnp.concatenate([agg, count], axis=-1)
        h = agg
        for _ in range(self.num_layers):
            h = nn.relu(nn.Dense(self.num_hiddens)(h))
        return nn.Dense(self.output_dim)(h)
