"""Neural-net factories (ref `sbi/neural_nets/__init__.py`)."""

from .factory import (
    classifier_nn,
    likelihood_nn,
    marginal_nn,
    posterior_flow_nn,
    posterior_nn,
    posterior_score_nn,
)

__all__ = [
    "classifier_nn",
    "likelihood_nn",
    "marginal_nn",
    "posterior_nn",
    "posterior_score_nn",
    "posterior_flow_nn",
]


def __getattr__(name):
    """Guided errors for moved names (mirrors the reference's __getattr__)."""
    moved = {
        "FCEmbedding": "sbi_tpu.neural_nets.embedding_nets",
        "CNNEmbedding": "sbi_tpu.neural_nets.embedding_nets",
        "PermutationInvariantEmbedding": "sbi_tpu.neural_nets.embedding_nets",
    }
    if name in moved:
        raise ImportError(
            f"`{name}` has moved; import it from `{moved[name]}` instead."
        )
    if name == "flowmatching_nn":
        raise ImportError(
            "`flowmatching_nn` was removed; use `posterior_flow_nn` instead."
        )
    raise AttributeError(f"module 'sbi_tpu.neural_nets' has no attribute {name!r}")
