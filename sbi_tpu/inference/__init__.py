"""Top-level inference API (ref `sbi/inference/__init__.py:9-84`)."""

from ..utils.simulation_utils import simulate_for_sbi  # noqa: F401
from .trainers.base import NeuralInference, check_if_proposal_has_default_x, infer  # noqa: F401
from .trainers.npe.npe_base import PosteriorEstimatorTrainer  # noqa: F401
from .trainers.npe.npe_c import APT, NPE, NPE_C, SNPE, SNPE_C  # noqa: F401

from .posteriors.base_posterior import NeuralPosterior  # noqa: F401
from .posteriors.direct_posterior import DirectPosterior  # noqa: F401

from .potentials.base_potential import BasePotential, CustomPotentialWrapper  # noqa: F401
from .potentials.likelihood_based_potential import (  # noqa: F401
    LikelihoodBasedPotential,
    likelihood_estimator_based_potential,
    mixed_likelihood_estimator_based_potential,
)
from .potentials.posterior_based_potential import (  # noqa: F401
    PosteriorBasedPotential,
    posterior_estimator_based_potential,
)
from .potentials.ratio_based_potential import (  # noqa: F401
    RatioBasedPotential,
    ratio_estimator_based_potential,
)


def __getattr__(name):
    """Lazy imports for heavier subsystems, populated as they land."""
    lazy = {
        "NLE_A": ".trainers.nle.nle_a",
        "NLE": ".trainers.nle.nle_a",
        "SNLE": ".trainers.nle.nle_a",
        "SNLE_A": ".trainers.nle.nle_a",
        "SNL": ".trainers.nle.nle_a",
        "MNLE": ".trainers.nle.mnle",
        "NRE_A": ".trainers.nre.nre_a",
        "SNRE_A": ".trainers.nre.nre_a",
        "AALR": ".trainers.nre.nre_a",
        "NRE_B": ".trainers.nre.nre_b",
        "SNRE_B": ".trainers.nre.nre_b",
        "SNRE": ".trainers.nre.nre_b",
        "SRE": ".trainers.nre.nre_b",
        "NRE": ".trainers.nre.nre_b",
        "NRE_C": ".trainers.nre.nre_c",
        "SNRE_C": ".trainers.nre.nre_c",
        "CNRE": ".trainers.nre.nre_c",
        "BNRE": ".trainers.nre.bnre",
        "NPE_A": ".trainers.npe.npe_a",
        "SNPE_A": ".trainers.npe.npe_a",
        "NPE_B": ".trainers.npe.npe_b",
        "SNPE_B": ".trainers.npe.npe_b",
        "MNPE": ".trainers.npe.mnpe",
        "NPE_PFN": ".trainers.npe.npe_pfn",
        "FMPE": ".trainers.vfpe.fmpe",
        "NPSE": ".trainers.vfpe.npse",
        "VectorFieldTrainer": ".trainers.vfpe.base_vf_inference",
        "MarginalTrainer": ".trainers.marginal",
        "MCABC": "..abc.mcabc",
        "ABC": "..abc.mcabc",
        "SMCABC": "..abc.smcabc",
        "SMC": "..abc.smcabc",
        "MCMCPosterior": ".posteriors.mcmc_posterior",
        "RejectionPosterior": ".posteriors.rejection_posterior",
        "ImportanceSamplingPosterior": ".posteriors.importance_posterior",
        "VIPosterior": ".posteriors.vi_posterior",
        "VectorFieldPosterior": ".posteriors.vector_field_posterior",
        "EnsemblePosterior": ".posteriors.ensemble_posterior",
        "vector_field_estimator_based_potential": ".potentials.vector_field_potential",
    }
    alias_map = {
        "NLE": "NLE_A", "SNLE": "NLE_A", "SNLE_A": "NLE_A", "SNL": "NLE_A",
        "SNRE_A": "NRE_A", "AALR": "NRE_A",
        "SNRE_B": "NRE_B", "SNRE": "NRE_B", "SRE": "NRE_B", "NRE": "NRE_B",
        "SNRE_C": "NRE_C", "CNRE": "NRE_C",
        "SNPE_A": "NPE_A", "SNPE_B": "NPE_B",
        "ABC": "MCABC", "SMC": "SMCABC",
    }
    if name in lazy:
        import importlib

        module = importlib.import_module(lazy[name], __name__)
        target = alias_map.get(name, name)
        obj = getattr(module, target)
        globals()[name] = obj
        return obj
    raise AttributeError(f"module 'sbi_tpu.inference' has no attribute {name!r}")


def _build_method_registry():
    reg = {}
    for name in (
        "NPE", "NPE_A", "NPE_B", "NPE_C", "SNPE", "SNPE_A", "SNPE_B", "SNPE_C",
        "APT", "NLE", "NLE_A", "SNLE", "SNLE_A", "MNLE",
        "NRE", "NRE_A", "NRE_B", "NRE_C", "SNRE", "SNRE_A", "SNRE_B", "SNRE_C",
        "BNRE", "AALR", "CNRE", "FMPE", "NPSE",
    ):
        try:
            reg[name] = globals().get(name) or __getattr__(name)
        except (AttributeError, ImportError):
            pass
    return reg


class _LazyRegistry(dict):
    def __missing__(self, k):
        v = __getattr__(k)
        self[k] = v
        return v


METHOD_REGISTRY = _LazyRegistry(
    {"NPE": NPE, "NPE_C": NPE_C, "SNPE": SNPE, "SNPE_C": SNPE_C, "APT": APT}
)
