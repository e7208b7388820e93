"""Estimator classes (ref `sbi/neural_nets/estimators/__init__.py`)."""

from .base import (
    ConditionalDensityEstimator,
    ConditionalEstimator,
    ConditionalVectorFieldEstimator,
    UnconditionalEstimator,
)
from .categorical_net import CategoricalMADE, CategoricalMassEstimator
from .flowmatching_estimator import FlowMatchingEstimator
from .flows import (
    FlowEstimator,
    FlowModule,
    UnconditionalFlowEstimator,
    circular_rational_quadratic_spline,
    rational_quadratic_spline,
)
from .mdn import MixtureDensityEstimator, MoG, MultivariateGaussianMDN
from .mixed_density_estimator import MixedDensityEstimator
from .ratio_estimators import RatioEstimator
from .score_estimator import (
    ConditionalScoreEstimator,
    SubVPScoreEstimator,
    VEScoreEstimator,
    VPScoreEstimator,
)

# reference-compat aliases: nflows/zuko-backed wrappers map to the in-repo flow
NFlowsFlow = FlowEstimator
ZukoFlow = FlowEstimator
ZukoUnconditionalFlow = UnconditionalFlowEstimator
UnconditionalDensityEstimator = UnconditionalEstimator

__all__ = [
    "ConditionalEstimator",
    "ConditionalDensityEstimator",
    "ConditionalVectorFieldEstimator",
    "UnconditionalDensityEstimator",
    "UnconditionalEstimator",
    "CategoricalMADE",
    "CategoricalMassEstimator",
    "FlowMatchingEstimator",
    "MixedDensityEstimator",
    "MixtureDensityEstimator",
    "MultivariateGaussianMDN",
    "MoG",
    "NFlowsFlow",
    "ZukoFlow",
    "ZukoUnconditionalFlow",
    "ConditionalScoreEstimator",
    "VPScoreEstimator",
    "SubVPScoreEstimator",
    "VEScoreEstimator",
    "FlowEstimator",
    "RatioEstimator",
    "rational_quadratic_spline",
    "circular_rational_quadratic_spline",
]
