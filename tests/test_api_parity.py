"""Public-API parity: every name in SURVEY.md Appendix A must import from
the same module path as the reference (`sbi/inference/__init__.py:9-84`,
`sbi/neural_nets/__init__.py`, `sbi/utils/__init__.py`, ...), so reference
tutorials and user code work with `sbi` -> `sbi_tpu` as the only change."""

import importlib

import pytest

INFERENCE_NAMES = [
    # trainers
    "NPE_A", "NPE_B", "NPE_C", "MNPE", "NPE_PFN", "NLE_A", "MNLE",
    "NRE_A", "NRE_B", "NRE_C", "BNRE", "FMPE", "NPSE", "MarginalTrainer",
    "MCABC", "SMCABC",
    # aliases
    "SNPE_A", "SNPE_B", "SNPE", "APT", "SNPE_C", "NPE",
    "SNL", "SNLE", "SNLE_A", "NLE",
    "SRE", "SNRE", "SNRE_A", "SNRE_B", "SNRE_C", "NRE", "AALR", "CNRE",
    "ABC", "SMC",
    # posteriors
    "DirectPosterior", "EnsemblePosterior", "ImportanceSamplingPosterior",
    "MCMCPosterior", "RejectionPosterior", "VIPosterior",
    "VectorFieldPosterior",
    # potentials
    "likelihood_estimator_based_potential",
    "mixed_likelihood_estimator_based_potential",
    "posterior_estimator_based_potential",
    "ratio_estimator_based_potential",
    "vector_field_estimator_based_potential",
    # helpers
    "simulate_for_sbi", "infer", "NeuralInference",
    "check_if_proposal_has_default_x",
]

POSTERIORS_NAMES = [
    "NPE_A_Posterior", "FilteredDirectPosterior",
    "DirectPosteriorParameters", "MCMCPosteriorParameters",
    "RejectionPosteriorParameters", "ImportanceSamplingPosteriorParameters",
    "VIPosteriorParameters", "VectorFieldPosteriorParameters",
]

NEURAL_NETS_NAMES = [
    "classifier_nn", "likelihood_nn", "marginal_nn", "posterior_nn",
    "posterior_score_nn", "posterior_flow_nn",
]

ESTIMATORS_NAMES = [
    "ConditionalDensityEstimator", "ConditionalVectorFieldEstimator",
    "CategoricalMADE", "CategoricalMassEstimator", "FlowMatchingEstimator",
    "MixedDensityEstimator", "MixtureDensityEstimator",
    "MultivariateGaussianMDN", "MoG", "ConditionalScoreEstimator",
]

EMBEDDING_NAMES = [
    "CausalCNNEmbedding", "CNNEmbedding", "FCEmbedding", "LRUEmbedding",
    "PermutationInvariantEmbedding", "ResNetEmbedding1D", "ResNetEmbedding2D",
    "TransformerEmbedding", "SpectralConvEmbedding",
]

NET_BUILDER_NAMES = [
    "build_made", "build_maf", "build_maf_rqs", "build_nsf", "build_mdn",
    "build_zuko_nice", "build_zuko_maf", "build_zuko_nsf", "build_zuko_ncsf",
    "build_zuko_sospf", "build_zuko_naf", "build_zuko_unaf", "build_zuko_gf",
    "build_zuko_cnf",
    "build_zuko_bpf", "build_tabpfn_flow", "build_linear_classifier",
    "build_mlp_classifier", "build_resnet_classifier",
    "build_categoricalmassestimator", "build_mnle", "build_mnpe",
    "build_flow_matching_estimator", "build_score_matching_estimator",
]

UTILS_NAMES = [
    "process_prior", "process_simulator", "BoxUniform", "MultipleIndependent",
    "RestrictedPrior", "RestrictionEstimator", "get_density_thresholder",
    "transformed_potential", "mcmc_transform", "c2st", "check_c2st",
    "get_kde", "KDEWrapper", "gradient_ascent",
]

ANALYSIS_NAMES = [
    "pairplot", "marginal_plot", "conditional_pairplot",
    "conditional_marginal_plot", "conditional_corrcoeff",
    "conditional_potential", "eval_conditional_density", "ConditionedMDN",
    "sbc_rank_plot", "pp_plot", "pp_plot_lc2st", "plot_tarp",
    "marginal_plot_with_probs_intensity", "ActiveSubspace", "plot_summary",
    "list_all_logs",
    # OO plotting option classes (ref plotting_classes.py:1-306)
    "DiagOptions", "KdeDiagOptions", "HistDiagOptions", "ScatterDiagOptions",
    "BarDiagOptions", "OffDiagOptions", "KdeOffDiagOptions",
    "HistOffDiagOptions", "ScatterOffDiagOptions", "ContourOffDiagOptions",
    "PlotOffDiagOptions", "FigOptions", "get_default_diag_kwargs",
    "get_default_offdiag_kwargs",
]

DIAGNOSTICS_NAMES = [
    "run_sbc", "check_sbc", "get_nltp", "run_tarp", "check_tarp",
    "LC2ST", "LC2ST_NF", "LC2STScores", "LC2STState",
    "calc_misspecification_mmd", "calc_misspecification_logprob",
]

MCMC_NAMES = [
    "SliceSampler", "SliceSamplerSerial", "SliceSamplerVectorized",
    "proposal_init", "sir_init", "resample_given_potential_fn",
    "IterateParameters",
]


@pytest.mark.parametrize(
    "module,names",
    [
        ("sbi_tpu.inference", INFERENCE_NAMES),
        ("sbi_tpu.inference.posteriors", POSTERIORS_NAMES),
        ("sbi_tpu.neural_nets", NEURAL_NETS_NAMES),
        ("sbi_tpu.neural_nets.estimators", ESTIMATORS_NAMES),
        ("sbi_tpu.neural_nets.embedding_nets", EMBEDDING_NAMES),
        ("sbi_tpu.neural_nets.net_builders", NET_BUILDER_NAMES),
        ("sbi_tpu.utils", UTILS_NAMES),
        ("sbi_tpu.analysis", ANALYSIS_NAMES),
        ("sbi_tpu.diagnostics", DIAGNOSTICS_NAMES),
        ("sbi_tpu.samplers.mcmc", MCMC_NAMES),
    ],
    ids=lambda v: v if isinstance(v, str) else "",
)
def test_public_names_importable(module, names):
    mod = importlib.import_module(module)
    missing = [n for n in names if not hasattr(mod, n)]
    assert not missing, f"{module} missing: {missing}"


def test_examples_minimal():
    """The documented install smoke test (ref examples/minimal.py:14,32)."""
    from sbi_tpu.examples.minimal import flexible, simple

    posterior = simple()
    assert posterior is not None
    posterior2 = flexible()
    assert posterior2 is not None


def test_behavior_defining_defaults_match_reference():
    """SURVEY.md Appendix B: the defaults that define training/sampling
    behavior must equal the reference's (npe_base.py:244-250, flow.py:
    114-346, mdn.py:29-30, mcmc_posterior.py:57-121, direct_posterior.py:
    48, vector_field_posterior.py:311)."""
    import inspect

    from sbi_tpu.inference import NLE_A, NPE, NPSE, NRE_A
    from sbi_tpu.inference.posteriors.direct_posterior import DirectPosterior
    from sbi_tpu.inference.posteriors.mcmc_posterior import MCMCPosterior
    from sbi_tpu.inference.trainers.npe.npe_base import (
        PosteriorEstimatorTrainer,
    )
    from sbi_tpu.neural_nets.factory import posterior_nn
    from sbi_tpu.neural_nets.net_builders.flow import build_maf, build_nsf
    from sbi_tpu.neural_nets.net_builders.mdn import build_mdn

    def defaults(fn, *names):
        sig = inspect.signature(fn)
        return tuple(sig.parameters[n].default for n in names)

    assert defaults(
        PosteriorEstimatorTrainer.train, "training_batch_size",
        "learning_rate", "validation_fraction", "stop_after_epochs",
        "max_num_epochs", "clip_max_norm",
    ) == (200, 5e-4, 0.1, 20, 2**31 - 1, 5.0)
    assert defaults(NPE.__init__, "density_estimator") == ("maf",)
    assert defaults(NLE_A.__init__, "density_estimator") == ("maf",)
    assert defaults(NRE_A.__init__, "classifier") == ("resnet",)
    assert defaults(NPSE.__init__, "sde_type") == ("ve",)
    assert defaults(
        build_nsf, "hidden_features", "num_transforms", "num_bins",
        "tail_bound", "num_blocks",
    ) == (50, 5, 10, 3.0, 2)
    assert defaults(
        build_maf, "hidden_features", "num_transforms", "num_blocks"
    ) == (50, 5, 2)
    assert defaults(build_mdn, "hidden_features", "num_components") == (50, 10)
    assert defaults(
        MCMCPosterior.__init__, "thin", "warmup_steps", "num_chains",
        "init_strategy",
    ) == (-1, 200, 20, "resample")
    assert defaults(
        DirectPosterior.__init__, "max_sampling_batch_size"
    ) == (10_000,)
    assert defaults(posterior_nn, "z_score_theta", "z_score_x") == (
        "independent", "independent",
    )
