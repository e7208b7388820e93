"""Vector-field based potential: CNF log-prob, gradient = score.

JAX counterpart of `sbi/inference/potentials/vector_field_potential.py:27-150`
(log-prob via neural ODE, gradient via the learned score; iid composition of
scores is handled by the adaptors in `vector_field_adaptor.py` — FNPE-style
factorized composition is implemented here).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...samplers.ode.ode_solvers import build_neural_ode
from ...utils.sbiutils import ensure_theta_batched, within_support
from ...utils.transforms import mcmc_transform
from .base_potential import BasePotential

Array = jax.Array


class VectorFieldBasedPotential(BasePotential):
    allow_iid_x = True

    def __init__(self, vector_field_estimator, prior, x_o=None, device=None,
                 ode_steps: int = 64):
        self.vector_field_estimator = vector_field_estimator
        self.ode_steps = ode_steps
        self._neural_ode = None
        super().__init__(prior, x_o, device)

    def set_x(self, x_o, x_is_iid=False, **kwargs):
        super().set_x(x_o, x_is_iid)
        self._neural_ode = None  # rebuilt lazily for the new observation
        return self

    @property
    def _node(self):
        if self._neural_ode is None:
            self._neural_ode = build_neural_ode(
                self.vector_field_estimator, self._x_o[:1], num_steps=self.ode_steps
            )
        return self._neural_ode

    def __getstate__(self):
        # The cached CNF holds jit closures; rebuild after unpickling.
        state = self.__dict__.copy()
        state["_neural_ode"] = None
        return state

    def __call__(self, theta, track_gradients: bool = True):
        theta = ensure_theta_batched(theta)
        lp = self._node.log_prob(theta)
        if self.prior is not None:
            lp = jnp.where(within_support(self.prior, theta), lp, -jnp.inf)
        return lp

    def gradient(self, theta: Array, time: Optional[Array] = None) -> Array:
        """Score at (approximately) data time; iid observations compose as a
        sum of individual scores (FNPE rule, ref vector_field_adaptor.py:725)."""
        est = self.vector_field_estimator
        theta = ensure_theta_batched(theta)
        t = jnp.asarray(
            est.t_min if est.SDE_DEFINED else est.t_max, jnp.float32
        ) if time is None else time
        x = self.x_o
        total = 0.0
        for i in range(x.shape[0]):
            total = total + est.score(theta, jnp.broadcast_to(x[i][None], (theta.shape[0],) + x.shape[1:]), t)
        return total

    def neural_ode(self, x_o):
        return build_neural_ode(
            self.vector_field_estimator, jnp.atleast_2d(x_o)[:1],
            num_steps=self.ode_steps,
        )


def vector_field_estimator_based_potential(
    vector_field_estimator, prior, x_o, enable_transform: bool = True, **kwargs
) -> Tuple[VectorFieldBasedPotential, object]:
    potential_fn = VectorFieldBasedPotential(
        vector_field_estimator, prior, x_o, **kwargs
    )
    theta_transform = mcmc_transform(prior, enable_transform=enable_transform)
    return potential_fn, theta_transform
