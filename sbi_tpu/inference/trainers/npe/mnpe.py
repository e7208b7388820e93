"""MNPE: mixed discrete+continuous posterior (continuous-first theta layout).
Ref `sbi/inference/trainers/npe/mnpe.py:24-80`."""

from __future__ import annotations

from typing import Callable, Union

from .npe_c import NPE_C


class MNPE(NPE_C):
    def __init__(
        self,
        prior=None,
        density_estimator: Union[str, Callable] = "mnpe",
        num_discrete: int = 1,
        device: str = "tpu",
        **kwargs,
    ):
        if isinstance(density_estimator, str):
            from ....neural_nets.net_builders.mixed_nets import build_mnpe

            def builder(batch_theta, batch_x):
                return build_mnpe(batch_theta, batch_x, num_discrete=num_discrete)

            density_estimator = builder
        super().__init__(
            prior=prior, density_estimator=density_estimator, device=device,
            **kwargs,
        )
