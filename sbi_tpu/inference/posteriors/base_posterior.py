"""NeuralPosterior base class.

JAX counterpart of `sbi/inference/posteriors/base_posterior.py:23-336`:
wraps a potential; `sample`/`sample_batched` abstract; `map()` via
multi-start gradient ascent (all starts advanced in one jitted scan);
`set_default_x`.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...utils.sbiutils import ensure_theta_batched, gradient_ascent, next_key
from ...utils.transforms import IdentityTransform
from ..potentials.base_potential import BasePotential, CustomPotentialWrapper

Array = jax.Array


class NeuralPosterior:
    def __init__(
        self,
        potential_fn: Union[BasePotential, Any],
        theta_transform=None,
        device=None,
        x_shape: Optional[Tuple[int, ...]] = None,
    ):
        if not isinstance(potential_fn, BasePotential) and callable(potential_fn):
            potential_fn = CustomPotentialWrapper(potential_fn, prior=None)
        self.potential_fn = potential_fn
        self.theta_transform = theta_transform or IdentityTransform()
        self._x_shape = x_shape
        # If the potential was built with x_o already (sampler interface,
        # ref base_posterior.py:77-80), the posterior inherits it as its
        # default observation.
        self.default_x: Optional[Array] = (
            potential_fn.return_x_o()
            if hasattr(potential_fn, "return_x_o")
            else None
        )
        self._map = None
        self._purpose = ""

    # ------------------------------------------------------------------ x_o
    def set_default_x(self, x: Array) -> "NeuralPosterior":
        self.default_x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        self.potential_fn.set_x(self.default_x)
        self._map = None
        return self

    def _x_else_default_x(self, x: Optional[Array]) -> Optional[Array]:
        if x is not None:
            return jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        if self.default_x is None:
            # A custom potential that closes over theta only (no x_o
            # parameter) is a complete log density — sampling it needs no
            # observation.
            if getattr(self.potential_fn, "requires_x", True) is False:
                return None
            raise ValueError(
                "Context x needed when a default has not been set. Use "
                "`.set_default_x(x)` or pass `x=...`."
            )
        return self.default_x

    # --------------------------------------------------------------- potential
    def potential(self, theta: Array, x: Optional[Array] = None, track_gradients: bool = True) -> Array:
        theta = ensure_theta_batched(theta)
        self.potential_fn.set_x(self._x_else_default_x(x))
        return self.potential_fn(theta)

    # ----------------------------------------------------------------- sample
    def sample(self, sample_shape=(), x: Optional[Array] = None, key=None, **kwargs) -> Array:
        raise NotImplementedError

    def sample_batched(self, sample_shape, x: Array, key=None, **kwargs) -> Array:
        raise NotImplementedError

    def log_prob(self, theta: Array, x: Optional[Array] = None, **kwargs) -> Array:
        return self.potential(theta, x)

    # -------------------------------------------------------------------- MAP
    def map(
        self,
        x: Optional[Array] = None,
        num_iter: int = 1000,
        num_to_optimize: int = 100,
        learning_rate: float = 0.01,
        init_method: Union[str, Array] = "posterior",
        num_init_samples: int = 1000,
        save_best_every: int = 10,
        show_progress_bars: bool = False,
        force_update: bool = False,
        key=None,
    ) -> Array:
        """MAP via multi-start Adam ascent (ref `base_posterior.py:200-307`;
        defaults match Appendix B: 1000 iters / 100 starts / lr 0.01)."""
        if x is None and self._map is not None and not force_update:
            return self._map
        self.potential_fn.set_x(self._x_else_default_x(x))
        key = next_key(key)

        if isinstance(init_method, (jnp.ndarray, jax.Array)):
            inits = init_method
        elif init_method == "posterior":
            inits = self.sample((num_init_samples,), x=x, key=key)
        elif init_method == "proposal":
            inits = self.potential_fn.prior.sample(key, (num_init_samples,))
        else:
            raise ValueError(f"Unknown init_method {init_method}")

        theta_map, _ = gradient_ascent(
            potential_fn=lambda t: self.potential_fn(t),
            inits=inits,
            theta_transform=self.theta_transform,
            num_iter=num_iter,
            num_to_optimize=num_to_optimize,
            learning_rate=learning_rate,
            save_best_every=save_best_every,
            show_progress_bars=show_progress_bars,
        )
        if x is None:
            self._map = theta_map
        return theta_map

    def __repr__(self):
        return f"{self.__class__.__name__}({self._purpose})"
