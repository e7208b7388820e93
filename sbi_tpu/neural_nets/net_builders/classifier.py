"""Ratio-classifier builders (ref `sbi/neural_nets/net_builders/classifier.py`):
linear / MLP / ResNet over concatenated (theta, x), z-scored from data."""

from __future__ import annotations

import jax.numpy as jnp

from ...utils.sbiutils import next_key, standardizing_transform
from ..estimators.ratio_estimators import (
    LinearClassifierModule,
    MLPClassifierModule,
    RatioEstimator,
    ResNetClassifierModule,
)


def _build(module, batch_theta, batch_x, z_score_theta, z_score_x, key):
    from ...utils.sbiutils import assert_transform_to_unconstrained_supported

    for flag in (z_score_theta, z_score_x):
        assert_transform_to_unconstrained_supported(
            flag, "classifier builders", "Use 'independent' or 'structured'."
        )
    batch_theta = jnp.asarray(batch_theta, jnp.float32)
    batch_x = jnp.asarray(batch_x, jnp.float32)
    params = module.init(next_key(key), batch_theta[:2], batch_x[:2])
    tt = (
        standardizing_transform(batch_theta, structured=(z_score_theta == "structured"))
        if z_score_theta not in (None, "none", False)
        else None
    )
    xt = (
        standardizing_transform(batch_x, structured=(z_score_x == "structured"))
        if z_score_x not in (None, "none", False)
        else None
    )
    return RatioEstimator(
        net=module,
        params=params,
        theta_shape=tuple(batch_theta.shape[1:]),
        x_shape=tuple(batch_x.shape[1:]),
        theta_transform=tt,
        x_transform=xt,
    )


def build_linear_classifier(
    batch_theta, batch_x, z_score_theta="independent", z_score_x="independent",
    embedding_net_theta=None, embedding_net_x=None, key=None, **kwargs,
):
    return _build(
        LinearClassifierModule(), batch_theta, batch_x, z_score_theta, z_score_x, key
    )


def build_mlp_classifier(
    batch_theta, batch_x, z_score_theta="independent", z_score_x="independent",
    hidden_features: int = 50, embedding_net_theta=None, embedding_net_x=None,
    key=None, **kwargs,
):
    module = MLPClassifierModule(
        hidden_features=hidden_features,
        embedding_net_theta=embedding_net_theta,
        embedding_net_x=embedding_net_x,
    )
    return _build(module, batch_theta, batch_x, z_score_theta, z_score_x, key)


def build_resnet_classifier(
    batch_theta, batch_x, z_score_theta="independent", z_score_x="independent",
    hidden_features: int = 50, num_blocks: int = 2,
    embedding_net_theta=None, embedding_net_x=None, key=None, **kwargs,
):
    module = ResNetClassifierModule(
        hidden_features=hidden_features,
        num_blocks=num_blocks,
        embedding_net_theta=embedding_net_theta,
        embedding_net_x=embedding_net_x,
    )
    return _build(module, batch_theta, batch_x, z_score_theta, z_score_x, key)
