"""Builders for mixed discrete/continuous estimators and categorical mass
estimators (ref `sbi/neural_nets/net_builders/mixed_nets.py`,
`categorial.py:19`)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.sbiutils import next_key, standardizing_transform
from ..estimators.categorical_net import CategoricalMADE, CategoricalMassEstimator
from ..estimators.mixed_density_estimator import MixedDensityEstimator


def _infer_num_categories(batch_disc) -> Tuple[int, ...]:
    arr = np.asarray(batch_disc)
    return tuple(int(arr[:, i].max()) + 1 for i in range(arr.shape[1]))


def build_categoricalmassestimator(
    batch_input,
    batch_condition,
    z_score_x: str = "none",
    z_score_y: str = "independent",
    num_hidden: int = 50,
    num_layers: int = 2,
    num_categories: Optional[Tuple[int, ...]] = None,
    key=None,
    **kwargs,
) -> CategoricalMassEstimator:
    """Categorical mass estimator over discrete inputs (ref categorial.py:19)."""
    batch_input = jnp.asarray(batch_input, jnp.float32)
    batch_condition = jnp.asarray(batch_condition, jnp.float32)
    if num_categories is None:
        num_categories = _infer_num_categories(batch_input)
    module = CategoricalMADE(
        num_categories=tuple(num_categories),
        hidden_features=num_hidden,
        num_layers=num_layers,
    )
    cond_t = (
        standardizing_transform(batch_condition)
        if z_score_y not in (None, "none", False)
        else None
    )
    zc = cond_t.forward(batch_condition[:2]) if cond_t else batch_condition[:2]
    params = module.init(
        next_key(key), batch_input[:2], zc.reshape(2, -1), method="log_prob"
    )
    return CategoricalMassEstimator(
        net=module,
        params=params,
        input_shape=tuple(batch_input.shape[1:]),
        condition_shape=tuple(batch_condition.shape[1:]),
        condition_transform=cond_t,
    )


def _build_mixed(
    batch_input,
    batch_condition,
    num_discrete: int,
    flow_model: str = "nsf",
    z_score_x="none",
    z_score_theta="independent",
    hidden_features: int = 50,
    num_transforms: int = 2,
    num_bins: int = 10,
    num_categories=None,
    log_transform_x: bool = False,
    key=None,
    **kwargs,
) -> MixedDensityEstimator:
    from .flow import build_maf, build_nsf

    batch_input = jnp.asarray(batch_input, jnp.float32)
    batch_condition = jnp.asarray(batch_condition, jnp.float32)
    D = batch_input.shape[1]
    d_cont = D - num_discrete
    cont, disc = batch_input[:, :d_cont], batch_input[:, d_cont:]

    cat_est = build_categoricalmassestimator(
        disc, batch_condition, num_categories=num_categories,
        key=next_key(key),
    )
    # Continuous flow conditioned on (condition, discrete values).
    aug_cond = jnp.concatenate(
        [batch_condition.reshape(batch_condition.shape[0], -1), disc], axis=-1
    )
    builder = build_nsf if flow_model == "nsf" else build_maf
    cont_est = builder(
        cont,
        aug_cond,
        z_score_theta=z_score_theta,
        z_score_x="independent",
        hidden_features=hidden_features,
        num_transforms=num_transforms,
        num_bins=num_bins,
        key=next_key(key),
    )
    return MixedDensityEstimator(
        continuous_estimator=cont_est,
        categorical_estimator=cat_est,
        input_shape=(D,),
        condition_shape=tuple(batch_condition.shape[1:]),
        num_discrete=num_discrete,
    )


def build_mnle(
    batch_x,
    batch_theta,
    num_discrete: int = 1,
    **kwargs,
):
    """Mixed neural likelihood estimator: density over x = [cont, disc]
    conditioned on theta (ref mixed_nets.py build_mnle). NOTE argument order
    follows the estimator convention: input first."""
    return _build_mixed(batch_x, batch_theta, num_discrete, **kwargs)


def build_mnpe(
    batch_theta,
    batch_x,
    num_discrete: int = 1,
    **kwargs,
):
    """Mixed neural posterior estimator: density over theta = [cont, disc]
    conditioned on x (ref mixed_nets.py build_mnpe; continuous-first theta
    layout, `mnpe.py:53-55`)."""
    return _build_mixed(batch_theta, batch_x, num_discrete, **kwargs)
