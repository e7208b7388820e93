"""TabPFN in-context estimator builder (ref `net_builders` build_tabpfn_flow;
optional dependency — see estimators/tabpfn_flow.py)."""

from __future__ import annotations

import jax.numpy as jnp

from ..estimators.tabpfn_flow import TabPFNFlow


def build_tabpfn_flow(batch_theta, batch_x, adapter_factory=None,
                      max_context_size: int = 10_000, **kwargs):
    theta = jnp.asarray(batch_theta)
    x = jnp.asarray(batch_x)
    est = TabPFNFlow(
        input_shape=tuple(theta.shape[1:]),
        condition_shape=tuple(x.shape[1:]),
        adapter_factory=adapter_factory,
        max_context_size=max_context_size,
    )
    est.set_context(theta, x)
    return est
