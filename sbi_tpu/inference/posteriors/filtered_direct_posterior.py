"""FilteredDirectPosterior: DirectPosterior + sample filtering.

JAX counterpart of `sbi/inference/posteriors/filtered_direct_posterior.py:20`
(used by the in-context PFN path): drop the lowest-density fraction of raw
draws before prior-support rejection.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.sbiutils import next_key, within_support
from .direct_posterior import DirectPosterior

Array = jax.Array


class FilteredDirectPosterior(DirectPosterior):
    def __init__(
        self,
        posterior_estimator,
        prior,
        filter_quantile: float = 0.0,
        max_sampling_batch_size: int = 10_000,
        device=None,
        x_shape=None,
        enable_transform: bool = True,
    ):
        super().__init__(
            posterior_estimator, prior, max_sampling_batch_size, device,
            x_shape, enable_transform,
        )
        self.filter_quantile = filter_quantile
        self._purpose = (
            "DirectPosterior with low-density sample filtering "
            f"(quantile={filter_quantile})."
        )

    def sample(self, sample_shape=(), x: Optional[Array] = None, key=None, **kwargs) -> Array:
        if self.filter_quantile <= 0.0:
            return super().sample(sample_shape, x=x, key=key, **kwargs)
        key = next_key(key)
        x = self._x_else_default_x(x)
        num = 1
        for s in sample_shape:
            num *= int(s)
        est = self.posterior_estimator
        # Oversample, keep the highest-density survivors.
        factor = 1.0 / (1.0 - self.filter_quantile)
        n_raw = int(jnp.ceil(num * factor * 1.5))
        raw = est.sample_fn(est.params, key, (n_raw,), x)[:, 0, :]
        lp = est.log_prob_fn(est.params, raw[:, None, :], x)[:, 0]
        thresh = jnp.quantile(lp, self.filter_quantile)
        ok = (lp >= thresh) & within_support(self.prior, raw)
        kept = raw[ok][:num]
        if kept.shape[0] < num:
            extra = super().sample((num - int(kept.shape[0]),), x=x,
                                   key=jax.random.fold_in(key, 1), **kwargs)
            kept = jnp.concatenate([kept, extra])
        return kept.reshape(tuple(sample_shape) + est.input_shape)
