"""ImportanceSamplingPosterior: SIR ('oversample') or raw importance modes,
with PSIS diagnostics (ref `sbi/inference/posteriors/importance_posterior.py:18,186`)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...samplers.importance.importance_sampling import (
    gpdfit,
    importance_sample,
    sampling_importance_resampling,
)
from ...utils.sbiutils import next_key
from .base_posterior import NeuralPosterior

Array = jax.Array


class ImportanceSamplingPosterior(NeuralPosterior):
    def __init__(
        self,
        potential_fn,
        proposal=None,
        theta_transform=None,
        method: str = "sir",
        oversampling_factor: int = 32,
        max_sampling_batch_size: int = 10_000,
        device=None,
        x_shape=None,
    ):
        super().__init__(potential_fn, theta_transform, device, x_shape)
        assert method in ("sir", "importance"), f"Unknown method {method}"
        self.proposal = proposal if proposal is not None else getattr(
            potential_fn, "prior", None
        )
        self.method = method
        self.oversampling_factor = oversampling_factor
        self.max_sampling_batch_size = max_sampling_batch_size
        self._purpose = (
            "It provides sampling-importance resampling (SIR) to .sample() "
            "from the posterior."
        )

    def sample(self, sample_shape=(), x: Optional[Array] = None, key=None,
               oversampling_factor: Optional[int] = None,
               method: Optional[str] = None,
               show_progress_bars: bool = False, **kwargs) -> Array:
        key = next_key(key)
        self.potential_fn.set_x(self._x_else_default_x(x))
        method = method or self.method
        num_samples = 1
        for s in sample_shape:
            num_samples *= int(s)
        if method == "sir":
            samples = sampling_importance_resampling(
                lambda t: self.potential_fn(t),
                self.proposal,
                num_samples=num_samples,
                oversampling_factor=oversampling_factor or self.oversampling_factor,
                key=key,
            )
        else:
            samples, _ = importance_sample(
                lambda t: self.potential_fn(t),
                self.proposal,
                num_samples=num_samples,
                key=key,
            )
        return samples.reshape(tuple(sample_shape) + samples.shape[1:])

    def sample_with_weights(self, num_samples: int, x=None, key=None) -> Tuple[Array, Array]:
        self.potential_fn.set_x(self._x_else_default_x(x))
        return importance_sample(
            lambda t: self.potential_fn(t), self.proposal,
            num_samples=num_samples, key=next_key(key),
        )

    def sample_batched(self, sample_shape, x: Array, key=None, **kwargs) -> Array:
        key = next_key(key)
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        outs = [
            self.sample(sample_shape, x=x[b][None],
                        key=jax.random.fold_in(key, b), **kwargs)
            for b in range(x.shape[0])
        ]
        return jnp.stack(outs, axis=len(sample_shape))

    def log_prob(self, theta, x=None, **kwargs):
        return self.potential(theta, x)

    def evaluate(self, x=None, num_samples: int = 1000, key=None) -> float:
        """PSIS k-hat of proposal-vs-potential (ref `:186` diagnostics)."""
        _, log_weights = self.sample_with_weights(num_samples, x=x, key=key)
        logw = log_weights - jax.scipy.special.logsumexp(log_weights)
        w = jnp.exp(logw)
        M = int(min(num_samples / 5, 3 * (num_samples**0.5)))
        tail = jnp.sort(w)[-M:]
        k, _ = gpdfit(jnp.clip(tail - tail[0], 1e-12))
        return float(k)
