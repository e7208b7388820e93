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
                 ode_steps: int = 64, iid_method: str = "auto_gauss",
                 iid_params=None):
        self.vector_field_estimator = vector_field_estimator
        self.ode_steps = ode_steps
        self.iid_method = iid_method
        self.iid_params = iid_params
        self.guidance_method = None
        self.guidance_params = None
        self._neural_ode = None
        self._iid_nodes = None
        super().__init__(prior, x_o, device)

    def set_x(self, x_o, x_is_iid=False, iid_method=None, iid_params=None,
              guidance_method=None, guidance_params=None, **kwargs):
        """Ref `vector_field_potential.py:97-128`: set the observation(s) and
        the iid-composition / guidance configuration used by sampling and
        (for iid) log-prob evaluation."""
        super().set_x(x_o, x_is_iid)
        self.iid_method = iid_method or self.iid_method
        if iid_params is not None:
            self.iid_params = iid_params
        self.guidance_method = guidance_method
        self.guidance_params = guidance_params
        self._neural_ode = None  # rebuilt lazily for the new observation
        self._iid_nodes = None
        return self

    @property
    def _node(self):
        if self._neural_ode is None:
            self._neural_ode = build_neural_ode(
                self.vector_field_estimator, self._x_o[:1], num_steps=self.ode_steps
            )
        return self._neural_ode

    def _nodes_iid(self):
        """One CNF per iid observation (ref ``rebuild_flows_for_batch``)."""
        if self._iid_nodes is None:
            self._iid_nodes = [
                build_neural_ode(
                    self.vector_field_estimator, self._x_o[i : i + 1],
                    num_steps=self.ode_steps,
                )
                for i in range(self._x_o.shape[0])
            ]
        return self._iid_nodes

    def __getstate__(self):
        # The cached CNFs hold jit closures; rebuild after unpickling.
        state = self.__dict__.copy()
        state["_neural_ode"] = None
        state["_iid_nodes"] = None
        return state

    def __call__(self, theta, track_gradients: bool = True):
        if self.guidance_method is not None:
            raise NotImplementedError(
                "Potential evaluation under guidance is not supported "
                "(matches ref vector_field_potential.py:147-150); guidance "
                "applies to sampling only."
            )
        theta = ensure_theta_batched(theta)
        # Multiple observation rows on a VF potential mean iid trials — the
        # same convention VectorFieldPosterior.sample uses (set_x(x_is_iid=)
        # also forces it, matching the reference signature).
        if self._x_o is not None and self._x_o.shape[0] > 1:
            # iid factorization (ref `:168-182`):
            #   log p(theta | x_1..N) = sum_i log p(theta | x_i)
            #                           - (N - 1) log p(theta)  + const
            if self.prior is None:
                raise ValueError(
                    "Prior is required for evaluating log_prob with iid "
                    "observations."
                )
            n = self._x_o.shape[0]
            lp = sum(node.log_prob(theta) for node in self._nodes_iid())
            lp = lp - (n - 1) * self.prior.log_prob(theta)
        else:
            lp = self._node.log_prob(theta)
        if self.prior is not None:
            lp = jnp.where(within_support(self.prior, theta), lp, -jnp.inf)
        return lp

    def gradient(self, theta: Array, time: Optional[Array] = None) -> Array:
        """Score at (approximately) data time; iid observations compose via
        the configured ``iid_method`` adaptor (ref vector_field_adaptor.py;
        default auto_gauss, FNPE/gauss/jac_gauss selectable via ``set_x``)."""
        est = self.vector_field_estimator
        theta = ensure_theta_batched(theta)
        t = jnp.asarray(
            est.t_min if est.SDE_DEFINED else est.t_max, jnp.float32
        ) if time is None else time
        x = self.x_o
        if x.shape[0] > 1 and est.SDE_DEFINED:
            from .vector_field_adaptor import build_iid_score_fn

            try:
                score_fn = build_iid_score_fn(
                    est, self.prior, x, method=self.iid_method
                )
            except NotImplementedError:
                # Gauss-corrected composition needs Gaussian/Box prior
                # moments; FNPE only needs a differentiable prior log-prob.
                score_fn = build_iid_score_fn(est, self.prior, x,
                                              method="fnpe")
            z, _ = est.input_transform.forward_and_log_det(theta)
            score_z = score_fn(z, t)
            scale = getattr(est.input_transform, "scale",
                            jnp.ones(z.shape[-1]))
            return score_z / scale
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
