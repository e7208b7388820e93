"""Posteriors (ref `sbi/inference/posteriors/__init__.py`)."""

from .base_posterior import NeuralPosterior
from .direct_posterior import DirectPosterior
from .ensemble_posterior import EnsemblePosterior
from .importance_posterior import ImportanceSamplingPosterior
from .mcmc_posterior import MCMCPosterior
from .npe_a_posterior import NPE_A_Posterior
from .rejection_posterior import RejectionPosterior
from .vector_field_posterior import VectorFieldPosterior
from .vi_posterior import VIPosterior
from .posterior_parameters import (
    DirectPosteriorParameters,
    FilteredDirectPosteriorParameters,
    ImportanceSamplingPosteriorParameters,
    MCMCPosteriorParameters,
    RejectionPosteriorParameters,
    VectorFieldPosteriorParameters,
    VIPosteriorParameters,
    build_posterior_from_parameters,
)
from .filtered_direct_posterior import FilteredDirectPosterior

__all__ = [
    "NeuralPosterior",
    "DirectPosterior",
    "FilteredDirectPosterior",
    "NPE_A_Posterior",
    "MCMCPosterior",
    "RejectionPosterior",
    "ImportanceSamplingPosterior",
    "VIPosterior",
    "VectorFieldPosterior",
    "EnsemblePosterior",
    "DirectPosteriorParameters",
    "FilteredDirectPosteriorParameters",
    "ImportanceSamplingPosteriorParameters",
    "MCMCPosteriorParameters",
    "RejectionPosteriorParameters",
    "VectorFieldPosteriorParameters",
    "VIPosteriorParameters",
    "build_posterior_from_parameters",
]
