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
