"""NPE_PFN: training-free in-context NPE via TabPFN.

JAX counterpart of `sbi/inference/trainers/npe/npe_pfn.py:43-374`:
simulations are stored as a context set, `train()` is a no-op, and
`build_posterior()` wraps a `TabPFNFlow` whose predictions condition on
the stored context — optionally filtered per observation ('knn'/'first'/
callable, ref FilteredDirectPosterior).

TabPFN is an optional torch-hosted dependency; the estimator runs
host-side (see `neural_nets/estimators/tabpfn_flow.py`). An
`adapter_factory` can be injected to back the in-context regression with
any model implementing the 2-method adapter protocol — this is also how
the committed tests exercise the full pipeline without tabpfn installed.
"""

from __future__ import annotations

import warnings
from typing import Callable, Optional

import jax.numpy as jnp

from ....neural_nets.estimators.tabpfn_flow import TabPFNFlow, tabpfn_available
from ...posteriors.direct_posterior import DirectPosterior
from ...posteriors.importance_posterior import ImportanceSamplingPosterior
from ...posteriors.rejection_posterior import RejectionPosterior
from ..base import NeuralInference


class _PFNFilteredPosterior(DirectPosterior):
    """DirectPosterior that re-filters the TabPFN context around each
    observation before sampling/evaluating (ref FilteredDirectPosterior:
    dynamic per-x context filtering)."""

    def __init__(self, estimator: TabPFNFlow, prior, filter_size=1000,
                 filter_type="knn", **kwargs):
        super().__init__(estimator, prior, **kwargs)
        self.filter_size = filter_size
        self.filter_type = filter_type
        self._full_estimator = estimator
        self._purpose = (
            "It samples a TabPFN in-context posterior with per-observation "
            f"context filtering ({filter_type}, size {filter_size})."
        )

    def _focus(self, x):
        est = self._full_estimator.filtered(
            x, filter_size=self.filter_size, filter_type=self.filter_type
        )
        self.posterior_estimator = est
        self.potential_fn.posterior_estimator = est
        self._jit_proposal = None

    def sample(self, sample_shape=(), x=None, key=None, **kwargs):
        self._focus(self._x_else_default_x(x))
        return super().sample(sample_shape, x=x, key=key, **kwargs)

    def log_prob(self, theta, x=None, **kwargs):
        self._focus(self._x_else_default_x(x))
        kwargs.setdefault("norm_posterior", False)
        return super().log_prob(theta, x=x, **kwargs)


class NPE_PFN(NeuralInference):
    """Training-free in-context NPE (single-round only)."""

    def __init__(
        self,
        prior=None,
        density_estimator: Optional[Callable[..., TabPFNFlow]] = None,
        adapter_factory: Optional[Callable[[], object]] = None,
        max_context_size: int = 10_000,
        **kwargs,
    ):
        if density_estimator is None and adapter_factory is None:
            if not tabpfn_available():
                raise ImportError(
                    "NPE_PFN requires the optional dependency `tabpfn` "
                    "(pip install tabpfn) or an injected adapter_factory; "
                    "all other sbi_tpu methods work without it."
                )
        super().__init__(prior=prior, **kwargs)
        self._density_estimator_builder = density_estimator
        self._adapter_factory = adapter_factory
        self._max_context_size = max_context_size
        self._neural_net: Optional[TabPFNFlow] = None

    def append_simulations(self, theta, x, proposal=None,
                           exclude_invalid_x: Optional[bool] = None,
                           **kwargs) -> "NPE_PFN":
        assert proposal is None, (
            "Multi-round NPE_PFN is not yet implemented (same restriction "
            "as the reference, npe_pfn.py:139)."
        )
        if exclude_invalid_x is None:
            exclude_invalid_x = True
        theta, x = self._validate_theta_and_x(
            theta, x, exclude_invalid_x=exclude_invalid_x, algorithm="NPE_PFN"
        )
        self._append_to_data_store(
            theta, x, jnp.ones(theta.shape[0], bool), data_round=0
        )
        return self

    def train(self, **kwargs) -> Optional[TabPFNFlow]:
        """NPE-PFN is training-free (ref npe_pfn.py:189): builds the
        estimator and stores the simulations as its context."""
        theta, x, _ = self.get_simulations()
        if theta.shape[0] > self._max_context_size:
            warnings.warn(
                f"{theta.shape[0]} simulations exceed max_context_size="
                f"{self._max_context_size}; keeping the first "
                f"{self._max_context_size} as context."
            )
            theta, x = theta[: self._max_context_size], x[: self._max_context_size]
        if self._density_estimator_builder is not None:
            est = self._density_estimator_builder(theta, x)
        else:
            est = TabPFNFlow(
                input_shape=tuple(theta.shape[1:]),
                condition_shape=tuple(x.shape[1:]),
                adapter_factory=self._adapter_factory,
                max_context_size=self._max_context_size,
            )
        est.set_context(theta, x)
        self._neural_net = est
        return est

    def build_posterior(
        self,
        density_estimator: Optional[TabPFNFlow] = None,
        prior=None,
        sample_with: str = "filtered_direct",
        filter_size: int = 1000,
        filter_type="knn",
        **kwargs,
    ):
        if self._neural_net is None and density_estimator is None:
            if not self._theta_roundwise:
                raise RuntimeError(
                    "No simulations found. Call append_simulations() before "
                    "building the NPE_PFN posterior."
                )
            self.train()
        est = density_estimator or self._neural_net
        prior = prior if prior is not None else self._prior
        if sample_with == "filtered_direct":
            return _PFNFilteredPosterior(
                est, prior, filter_size=filter_size, filter_type=filter_type
            )
        if sample_with == "direct":
            return DirectPosterior(est, prior)
        from ...potentials.posterior_based_potential import (
            posterior_estimator_based_potential,
        )

        potential_fn, theta_transform = posterior_estimator_based_potential(
            est, prior, x_o=None
        )
        if sample_with == "rejection":
            return RejectionPosterior(potential_fn, proposal=prior,
                                      theta_transform=theta_transform)
        if sample_with == "importance":
            return ImportanceSamplingPosterior(
                potential_fn, proposal=prior, theta_transform=theta_transform
            )
        raise NotImplementedError(
            f"sample_with={sample_with!r} not supported for NPE_PFN."
        )
