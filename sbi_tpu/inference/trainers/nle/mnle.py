"""MNLE: mixed neural likelihood estimation for continuous+discrete x
(e.g. reaction-time + choice decision models). Ref `sbi/inference/trainers/
nle/mnle.py`."""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax.numpy as jnp

from .nle_base import LikelihoodEstimatorTrainer


class MNLE(LikelihoodEstimatorTrainer):
    def __init__(
        self,
        prior=None,
        density_estimator: Union[str, Callable] = "mnle",
        num_discrete: int = 1,
        device: str = "tpu",
        **kwargs,
    ):
        if isinstance(density_estimator, str):
            from ....neural_nets.net_builders.mixed_nets import build_mnle

            def builder(batch_theta, batch_x):
                return build_mnle(batch_x, batch_theta, num_discrete=num_discrete)

            density_estimator = builder
        super().__init__(
            prior=prior, density_estimator=density_estimator, device=device,
            **kwargs,
        )

    def build_posterior(self, *args, **kwargs):
        # Uses the mixed likelihood potential (same math; the estimator
        # handles the discrete dims internally).
        return super().build_posterior(*args, **kwargs)
