"""Net builders (ref `sbi/neural_nets/net_builders/__init__.py:4-31`)."""

from .classifier import (
    build_linear_classifier,
    build_mlp_classifier,
    build_resnet_classifier,
)
from .flow import (
    build_made,
    build_maf,
    build_maf_rqs,
    build_nsf,
    build_unconditional_flow,
    build_zuko_bpf,
    build_zuko_cnf,
    build_zuko_gf,
    build_zuko_maf,
    build_zuko_naf,
    build_zuko_ncsf,
    build_zuko_nice,
    build_zuko_nsf,
    build_zuko_sospf,
    build_zuko_unaf,
)
from .mdn import build_mdn
from .tabpfn import build_tabpfn_flow
from .mixed_nets import build_categoricalmassestimator, build_mnle, build_mnpe
from .vector_field_nets import (
    build_flow_matching_estimator,
    build_score_estimator,
    build_score_matching_estimator,
)

__all__ = [
    "build_made",
    "build_maf",
    "build_maf_rqs",
    "build_nsf",
    "build_mdn",
    "build_tabpfn_flow",
    "build_zuko_nice",
    "build_zuko_maf",
    "build_zuko_nsf",
    "build_zuko_ncsf",
    "build_zuko_sospf",
    "build_zuko_naf",
    "build_zuko_unaf",
    "build_zuko_gf",
    "build_zuko_bpf",
    "build_zuko_cnf",
    "build_linear_classifier",
    "build_mlp_classifier",
    "build_resnet_classifier",
    "build_categoricalmassestimator",
    "build_mnle",
    "build_mnpe",
    "build_flow_matching_estimator",
    "build_score_matching_estimator",
    "build_score_estimator",
    "build_unconditional_flow",
]
