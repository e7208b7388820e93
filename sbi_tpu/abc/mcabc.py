"""MCABC: Monte-Carlo rejection ABC (ref `sbi/inference/abc/mcabc.py:78`)."""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..utils.sbiutils import next_key
from .abc_base import ABCBASE

Array = jax.Array


class MCABC(ABCBASE):
    def __call__(
        self,
        x_o: Array,
        num_simulations: int,
        eps: Optional[float] = None,
        quantile: Optional[float] = None,
        lra: bool = False,
        sass: bool = False,
        sass_fraction: float = 0.25,
        sass_expansion_degree: int = 1,
        kde: bool = False,
        kde_kwargs: Optional[dict] = None,
        return_summary: bool = False,
        key=None,
    ):
        """Rejection ABC with eps- or quantile-based acceptance; optional
        SASS summary learning, LRA adjustment, KDE return."""
        assert (eps is not None) ^ (quantile is not None), (
            "Either eps or quantile must be passed (exactly one)."
        )
        key = next_key(key)
        k_theta, k_sim, k_sass = jax.random.split(key, 3)
        x_o = jnp.atleast_2d(jnp.asarray(x_o, jnp.float32))

        sass_transform = None
        if sass:
            n_pilot = int(sass_fraction * num_simulations)
            pilot_theta = self.prior.sample(k_sass, (n_pilot,))
            pilot_x = self._simulate(pilot_theta, key=jax.random.fold_in(k_sass, 1))
            sass_transform = self.get_sass_transform(
                pilot_theta, pilot_x, sass_expansion_degree
            )

        theta = self.prior.sample(k_theta, (num_simulations,))
        x = self._simulate(theta, key=k_sim)

        if sass_transform is not None:
            x_d = sass_transform(x)
            x_o_d = sass_transform(x_o)
        else:
            x_d, x_o_d = x, x_o

        distances = self.distance(x_o_d, x_d)

        if quantile is not None:
            num_accept = max(1, int(quantile * num_simulations))
            order = jnp.argsort(distances)
            accepted = order[:num_accept]
        else:
            accepted = jnp.where(distances < eps)[0]
            if accepted.shape[0] == 0:
                raise ValueError(
                    f"No parameters accepted with eps={eps}; min distance "
                    f"was {float(distances.min()):.4f}."
                )

        theta_acc = theta[accepted]
        x_acc = x[accepted]
        if lra:
            theta_acc = self.run_lra(theta_acc, x_acc, x_o)

        if kde:
            from ..utils.kde import get_kde

            dist = get_kde(theta_acc, **(kde_kwargs or {}))
        else:
            from ..utils.distributions import Empirical

            dist = Empirical(theta_acc)

        if return_summary:
            return dist, dict(
                distances=distances[accepted],
                x=x_acc,
                theta=theta_acc,
            )
        return dist


ABC = MCABC
