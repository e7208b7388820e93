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

    input_transform = (
        standardizing_transform(batch_theta, structured=(z_score_theta == "structured"))
        if z_score_theta not in (None, "none", False)
        else None
    )
    condition_transform = (
        standardizing_transform(batch_x, structured=(z_score_x == "structured"))
        if z_score_x not in (None, "none", False)
        else None
    )

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
