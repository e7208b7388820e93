"""ABC base (ref `sbi/inference/abc/abc_base.py:18`)."""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

from ..utils.metrics import Distance
from ..utils.sbiutils import next_key

Array = jax.Array


class ABCBASE:
    def __init__(
        self,
        simulator: Callable,
        prior,
        distance: Union[str, Callable] = "l2",
        requires_iid_data: Optional[bool] = None,
        distance_kwargs: Optional[dict] = None,
        num_workers: int = 1,
        simulation_batch_size: int = 1,
        show_progress_bars: bool = True,
    ) -> None:
        self.prior = prior
        self._simulator = simulator
        self._show_progress_bars = show_progress_bars
        self.distance = (
            distance
            if callable(distance) and not isinstance(distance, Distance)
            else Distance(distance if isinstance(distance, str) else "l2")
        )
        if callable(distance) and not isinstance(distance, Distance):
            self.distance = Distance(distance)

    def _simulate(self, theta: Array, key=None) -> Array:
        try:
            return self._simulator(theta, key=next_key(key))
        except TypeError:
            return self._simulator(theta)

    @staticmethod
    def get_sass_transform(theta: Array, x: Array, expansion_degree: int = 1):
        """Semi-automatic summary statistics (Fearnhead & Prangle 2012):
        linear regression from (expanded) x to theta; returns transform fn
        (ref `abc_base.py` sass helpers)."""
        x = jnp.asarray(x, jnp.float32).reshape(x.shape[0], -1)
        feats = [x]
        for d in range(2, expansion_degree + 1):
            feats.append(x**d)
        X = jnp.concatenate(
            [jnp.ones((x.shape[0], 1))] + feats, axis=1
        )
        coeffs, *_ = jnp.linalg.lstsq(X, jnp.asarray(theta, jnp.float32))

        def transform(x_new):
            x_new = jnp.asarray(x_new, jnp.float32).reshape(x_new.shape[0], -1)
            f = [x_new] + [x_new**d for d in range(2, expansion_degree + 1)]
            Xn = jnp.concatenate([jnp.ones((x_new.shape[0], 1))] + f, axis=1)
            return Xn @ coeffs

        return transform

    @staticmethod
    def run_lra(theta: Array, x: Array, observation: Array) -> Array:
        """Linear regression adjustment (Beaumont et al. 2002): correct
        accepted thetas toward the observation (ref `abc_base.py` lra)."""
        theta = jnp.asarray(theta, jnp.float32)
        x = jnp.asarray(x, jnp.float32).reshape(theta.shape[0], -1)
        obs = jnp.asarray(observation, jnp.float32).reshape(1, -1)
        X = jnp.concatenate([jnp.ones((x.shape[0], 1)), x], axis=1)
        coeffs, *_ = jnp.linalg.lstsq(X, theta)
        X_obs = jnp.concatenate([jnp.ones((1, 1)), obs], axis=1)
        return theta + (X_obs - X) @ coeffs
