"""Potential protocol: unnormalized log-density over theta given x_o.

JAX counterpart of `sbi/inference/potentials/base_potential.py:15-156`.
Potentials are callables ``potential(theta) -> log prob`` with ``set_x`` and
an analytic ``gradient`` via jax.grad (the reference uses autograd).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ...utils.sbiutils import ensure_theta_batched

Array = jax.Array


class BasePotential:
    allow_iid_x: bool = False

    def __init__(self, prior: Optional[Any], x_o: Optional[Array] = None, device=None):
        self.prior = prior
        self._x_o = None
        self.x_is_iid = False
        if x_o is not None:
            self.set_x(x_o)

    def __call__(self, theta: Array, track_gradients: bool = True) -> Array:
        raise NotImplementedError

    def gradient(self, theta: Array) -> Array:
        theta = ensure_theta_batched(theta)

        def f(t):
            return self(t[None])[0]

        return jax.vmap(jax.grad(f))(theta)

    def set_x(self, x_o: Optional[Array], x_is_iid: Optional[bool] = False):
        if x_o is not None:
            x_o = jnp.atleast_2d(jnp.asarray(x_o, jnp.float32))
            if x_o.shape[0] > 1 and not self.allow_iid_x and not x_is_iid:
                # batch dim > 1 without iid flag: treated as iid by reference
                pass
        self._x_o = x_o
        self.x_is_iid = bool(x_is_iid)
        return self

    @property
    def x_o(self) -> Array:
        if self._x_o is None:
            raise ValueError("No observed data x_o; use `set_x`.")
        return self._x_o

    @x_o.setter
    def x_o(self, value):
        self.set_x(value)

    def return_x_o(self) -> Optional[Array]:
        return self._x_o

    def state_refs(self) -> tuple:
        """Objects whose replacement invalidates compiled programs that
        traced through this potential (observation + estimator params).
        Callers cache jitted samplers keyed on these refs BY IDENTITY and
        hold them strongly, so a changed x or retrained params forces a
        re-trace while repeated sampling reuses the compiled program."""
        refs = [self._x_o]
        for attr in (
            "likelihood_estimator",
            "posterior_estimator",
            "ratio_estimator",
            "vector_field_estimator",
            "estimator",
        ):
            est = getattr(self, attr, None)
            if est is not None and hasattr(est, "params"):
                refs.append(est.params)
        return tuple(refs)

    def to(self, device):  # torch-API compat; placement is a jax concern
        return self


class CustomPotential:
    """Protocol marker for user potentials fn(theta, x_o) -> log prob."""


class CustomPotentialWrapper(BasePotential):
    """Wrap a plain callable into the potential protocol (ref `:109-156`).

    A callable that takes only `theta` (no `x_o` parameter) is a fully
    self-contained log density: `requires_x` is False and posteriors built
    on it sample without `set_default_x`/`x=`.
    """

    allow_iid_x = True

    def __init__(self, potential_fn: Callable, prior, x_o=None, device=None):
        self._fn = potential_fn
        try:
            import inspect

            params = inspect.signature(potential_fn).parameters
            self.requires_x = len(params) >= 2 or any(
                p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD)
                for p in params.values()
            )
        except (TypeError, ValueError):  # builtins / odd callables
            self.requires_x = True
        super().__init__(prior, x_o, device)

    def __call__(self, theta, track_gradients: bool = True):
        theta = ensure_theta_batched(theta)
        try:
            return self._fn(theta, self._x_o)
        except TypeError:
            return self._fn(theta)
