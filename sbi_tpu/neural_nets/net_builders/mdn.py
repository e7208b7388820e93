"""MDN builder (ref `sbi/neural_nets/net_builders/mdn.py:24`)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.sbiutils import next_key, standardizing_transform
from ..estimators.mdn import MDNModule, MixtureDensityEstimator


def build_mdn(
    batch_theta,
    batch_x,
    z_score_theta: str = "independent",
    z_score_x: str = "independent",
    hidden_features: int = 50,
    num_components: int = 10,
    num_layers: int = 2,
    embedding_net=None,
    scale_parameterization: str = "softplus",
    key=None,
    **kwargs,
) -> MixtureDensityEstimator:
    """Build an MDN shaped/z-scored from a data batch (defaults match
    `net_builders/mdn.py:29-30`: hidden 50, 10 components)."""
    batch_theta = jnp.asarray(batch_theta, jnp.float32)
    batch_x = jnp.asarray(batch_x, jnp.float32)
    theta_dim = batch_theta.shape[-1]

    from ...utils.sbiutils import assert_transform_to_unconstrained_supported
    from .flow import _transforms_for

    assert_transform_to_unconstrained_supported(
        z_score_x, "build_mdn condition", "Use 'independent' or 'structured' for x."
    )
    input_transform = _transforms_for(
        batch_theta, z_score_theta, kwargs.get("x_dist")
    )
    condition_transform = _transforms_for(batch_x, z_score_x)

    module = MDNModule(
        theta_dim=theta_dim,
        num_components=num_components,
        hidden_features=hidden_features,
        num_layers=num_layers,
        embedding_net=embedding_net,
        scale_parameterization=scale_parameterization,
    )
    key = next_key(key)
    params = module.init(key, batch_x[:2].reshape(2, -1) if batch_x.ndim == 2 else batch_x[:2])
    return MixtureDensityEstimator(
        net=module,
        params=params,
        input_shape=(theta_dim,),
        condition_shape=tuple(batch_x.shape[1:]),
        input_transform=input_transform,
        condition_transform=condition_transform,
    )
