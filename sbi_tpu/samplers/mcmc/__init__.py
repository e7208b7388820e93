"""MCMC samplers (ref `sbi/samplers/mcmc/__init__.py`)."""

from .hmc import run_hmc, run_nuts, run_nuts_jittered
from .init_strategy import (
    IterateParameters,
    proposal_init,
    resample_given_potential_fn,
    sir_init,
)
from .slice_jax import (
    SliceSampler,
    SliceSamplerSerial,
    SliceSamplerVectorized,
    run_slice_vectorized,
)

__all__ = [
    "SliceSampler",
    "SliceSamplerSerial",
    "SliceSamplerVectorized",
    "run_slice_vectorized",
    "run_hmc",
    "run_nuts",
    "run_nuts_jittered",
    "proposal_init",
    "sir_init",
    "resample_given_potential_fn",
    "IterateParameters",
]
