"""Typed estimator factory configs (ref `sbi/neural_nets/net_builders/
estimator_configs.py:27-99`): dataclasses with `from_kwargs` that warn on
unknown keyword arguments instead of failing silently."""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field, fields
from typing import Any, Dict, Optional


class _FromKwargs:
    @classmethod
    def from_kwargs(cls, **kwargs):
        names = {f.name for f in fields(cls)}
        known = {k: v for k, v in kwargs.items() if k in names}
        unknown = sorted(set(kwargs) - names)
        if unknown:
            warnings.warn(
                f"{cls.__name__}: ignoring unknown kwargs {unknown}."
            )
        return cls(**known)


@dataclass
class FlowEstimatorConfig(_FromKwargs):
    model: str = "nsf"
    hidden_features: int = 50
    num_transforms: int = 5
    num_blocks: int = 2
    num_bins: int = 10
    tail_bound: float = 3.0
    z_score_theta: Optional[str] = "independent"
    z_score_x: Optional[str] = "independent"
    embedding_net: Any = None

    def build(self, batch_theta, batch_x):
        from ..factory import posterior_nn

        return posterior_nn(
            model=self.model,
            hidden_features=self.hidden_features,
            num_transforms=self.num_transforms,
            num_bins=self.num_bins,
            z_score_theta=self.z_score_theta,
            z_score_x=self.z_score_x,
            embedding_net=self.embedding_net,
        )(batch_theta, batch_x)


@dataclass
class ScoreEstimatorConfig(_FromKwargs):
    net: str = "mlp"
    sde_type: str = "ve"
    hidden_features: int = 100
    z_score_theta: Optional[str] = "independent"
    z_score_x: Optional[str] = "independent"
    embedding_net: Any = None

    def build(self, batch_theta, batch_x):
        from .vector_field_nets import build_score_estimator

        return build_score_estimator(
            batch_theta,
            batch_x,
            sde_type=self.sde_type,
            net=self.net,
            hidden_features=self.hidden_features,
            z_score_theta=self.z_score_theta,
            z_score_x=self.z_score_x,
            embedding_net=self.embedding_net,
        )


@dataclass
class MDNEstimatorConfig(_FromKwargs):
    hidden_features: int = 50
    num_components: int = 10
    num_layers: int = 2
    z_score_theta: Optional[str] = "independent"
    z_score_x: Optional[str] = "independent"
    embedding_net: Any = None

    def build(self, batch_theta, batch_x):
        from .mdn import build_mdn

        return build_mdn(
            batch_theta,
            batch_x,
            hidden_features=self.hidden_features,
            num_components=self.num_components,
            num_layers=self.num_layers,
            z_score_theta=self.z_score_theta,
            z_score_x=self.z_score_x,
            embedding_net=self.embedding_net,
        )
