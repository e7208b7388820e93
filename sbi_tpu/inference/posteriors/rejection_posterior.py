"""RejectionPosterior: exact rejection sampling against a proposal
(ref `sbi/inference/posteriors/rejection_posterior.py:19,130`)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...samplers.rejection.rejection import rejection_sample
from ...utils.sbiutils import next_key
from .base_posterior import NeuralPosterior

Array = jax.Array


class RejectionPosterior(NeuralPosterior):
    def __init__(
        self,
        potential_fn,
        proposal=None,
        theta_transform=None,
        max_sampling_batch_size: int = 10_000,
        num_samples_to_find_max: int = 10_000,
        num_iter_to_find_max: int = 100,
        m: float = 1.2,
        device=None,
        x_shape=None,
    ):
        super().__init__(potential_fn, theta_transform, device, x_shape)
        self.proposal = proposal if proposal is not None else getattr(
            potential_fn, "prior", None
        )
        self.max_sampling_batch_size = max_sampling_batch_size
        self.num_samples_to_find_max = num_samples_to_find_max
        self.num_iter_to_find_max = num_iter_to_find_max
        self.m = m
        self._purpose = "It provides rejection sampling to .sample() from the posterior."

    def sample(self, sample_shape=(), x: Optional[Array] = None, key=None,
               show_progress_bars: bool = False, **kwargs) -> Array:
        key = next_key(key)
        self.potential_fn.set_x(self._x_else_default_x(x))
        num_samples = 1
        for s in sample_shape:
            num_samples *= int(s)
        samples, _ = rejection_sample(
            potential_fn=lambda t: self.potential_fn(t),
            proposal=self.proposal,
            key=key,
            num_samples=num_samples,
            sample_batch_size=self.max_sampling_batch_size,
            num_samples_to_find_max=self.num_samples_to_find_max,
            num_iter_to_find_max=self.num_iter_to_find_max,
            m=self.m,
        )
        return samples.reshape(tuple(sample_shape) + samples.shape[1:])

    def sample_batched(self, sample_shape, x: Array, key=None, **kwargs) -> Array:
        key = next_key(key)
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        outs = [
            self.sample(sample_shape, x=x[b][None], key=jax.random.fold_in(key, b), **kwargs)
            for b in range(x.shape[0])
        ]
        return jnp.stack(outs, axis=len(sample_shape))

    def log_prob(self, theta, x=None, **kwargs):
        return self.potential(theta, x)
