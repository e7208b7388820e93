"""String -> builder factories, returning ``build_fn(batch_theta, batch_x)``
closures so nets are shaped and z-scored from the first data batch at
``train()`` time (ref `sbi/neural_nets/factory.py:87,167,241,344,429,509`).
"""

from __future__ import annotations

from typing import Any, Callable, Optional


def _flow_builders():
    from .net_builders import flow as flow_builders

    return {
        "mdn": None,  # handled separately
        "made": flow_builders.build_made,
        "maf": flow_builders.build_maf,
        "maf_rqs": flow_builders.build_maf_rqs,
        "nsf": flow_builders.build_nsf,
        "zuko_nice": flow_builders.build_zuko_nice,
        "zuko_maf": flow_builders.build_zuko_maf,
        "zuko_nsf": flow_builders.build_zuko_nsf,
        "zuko_ncsf": flow_builders.build_zuko_ncsf,
        "zuko_bpf": flow_builders.build_zuko_bpf,
        "zuko_gf": flow_builders.build_zuko_gf,
        "zuko_naf": flow_builders.build_zuko_naf,
        "zuko_unaf": flow_builders.build_zuko_unaf,
        "zuko_sospf": flow_builders.build_zuko_sospf,
        "zuko_cnf": flow_builders.build_zuko_cnf,
    }


def posterior_nn(
    model: str = "maf",
    z_score_theta: Optional[str] = "independent",
    z_score_x: Optional[str] = "independent",
    hidden_features: int = 50,
    num_transforms: int = 5,
    num_bins: int = 10,
    embedding_net=None,
    num_components: int = 10,
    **kwargs,
) -> Callable:
    """Density-estimator builder for NPE (ref factory.py:241).

    Returns ``build_fn(batch_theta, batch_x) -> ConditionalDensityEstimator``.
    """

    def build_fn(batch_theta, batch_x):
        common = dict(
            z_score_theta=z_score_theta,
            z_score_x=z_score_x,
            hidden_features=hidden_features,
            embedding_net=embedding_net,
            **kwargs,
        )
        if model == "mdn":
            from .net_builders.mdn import build_mdn

            return build_mdn(
                batch_theta, batch_x, num_components=num_components, **common
            )
        if model == "tabpfn":
            from .net_builders.tabpfn import build_tabpfn_flow

            return build_tabpfn_flow(batch_theta, batch_x, **kwargs)
        builders = _flow_builders()
        if model in builders and builders[model] is not None:
            return builders[model](
                batch_theta,
                batch_x,
                num_transforms=num_transforms,
                num_bins=num_bins,
                **common,
            )
        raise NotImplementedError(f"Unknown posterior model '{model}'.")

    return build_fn


def likelihood_nn(
    model: str = "maf",
    z_score_theta: Optional[str] = "independent",
    z_score_x: Optional[str] = "independent",
    hidden_features: int = 50,
    num_transforms: int = 5,
    num_bins: int = 10,
    embedding_net=None,
    num_components: int = 10,
    **kwargs,
) -> Callable:
    """Builder for NLE: density over x conditioned on theta (ref factory.py:87).

    Same estimators as posterior_nn with (input, condition) swapped.
    """
    inner = posterior_nn(
        model,
        z_score_theta=z_score_x,  # roles swapped: input is x
        z_score_x=z_score_theta,
        hidden_features=hidden_features,
        num_transforms=num_transforms,
        num_bins=num_bins,
        embedding_net=embedding_net,
        num_components=num_components,
        **kwargs,
    )

    def build_fn(batch_theta, batch_x):
        return inner(batch_x, batch_theta)

    return build_fn


def classifier_nn(
    model: str = "resnet",
    z_score_theta: Optional[str] = "independent",
    z_score_x: Optional[str] = "independent",
    hidden_features: int = 50,
    embedding_net_theta=None,
    embedding_net_x=None,
    **kwargs,
) -> Callable:
    """Ratio-classifier builder for NRE (ref factory.py:167)."""

    def build_fn(batch_theta, batch_x):
        from .net_builders.classifier import (
            build_linear_classifier,
            build_mlp_classifier,
            build_resnet_classifier,
        )

        builders = {
            "linear": build_linear_classifier,
            "mlp": build_mlp_classifier,
            "resnet": build_resnet_classifier,
        }
        if model not in builders:
            raise NotImplementedError(f"Unknown classifier model '{model}'.")
        return builders[model](
            batch_theta,
            batch_x,
            z_score_theta=z_score_theta,
            z_score_x=z_score_x,
            hidden_features=hidden_features,
            embedding_net_theta=embedding_net_theta,
            embedding_net_x=embedding_net_x,
            **kwargs,
        )

    return build_fn


def posterior_score_nn(
    model: str = "mlp",
    sde_type: str = "ve",
    z_score_theta: Optional[str] = "independent",
    z_score_x: Optional[str] = "independent",
    hidden_features: int = 100,
    embedding_net=None,
    **kwargs,
) -> Callable:
    """Score-estimator builder for NPSE (ref factory.py:344)."""

    def build_fn(batch_theta, batch_x):
        from .net_builders.vector_field_nets import build_score_estimator

        return build_score_estimator(
            batch_theta,
            batch_x,
            sde_type=sde_type,
            net=model,
            z_score_theta=z_score_theta,
            z_score_x=z_score_x,
            hidden_features=hidden_features,
            embedding_net=embedding_net,
            **kwargs,
        )

    return build_fn


def posterior_flow_nn(
    model: str = "mlp",
    z_score_theta: Optional[str] = "independent",
    z_score_x: Optional[str] = "independent",
    hidden_features: int = 100,
    embedding_net=None,
    **kwargs,
) -> Callable:
    """Flow-matching builder for FMPE (ref factory.py:429)."""

    def build_fn(batch_theta, batch_x):
        from .net_builders.vector_field_nets import build_flow_matching_estimator

        return build_flow_matching_estimator(
            batch_theta,
            batch_x,
            net=model,
            z_score_theta=z_score_theta,
            z_score_x=z_score_x,
            hidden_features=hidden_features,
            embedding_net=embedding_net,
            **kwargs,
        )

    return build_fn


def marginal_nn(
    model: str = "maf",
    z_score_x: Optional[str] = "independent",
    hidden_features: int = 50,
    num_transforms: int = 5,
    **kwargs,
) -> Callable:
    """Unconditional density builder (ref factory.py:509)."""

    def build_fn(batch_x):
        from .net_builders.flow import build_unconditional_flow

        return build_unconditional_flow(
            batch_x,
            model=model,
            z_score_x=z_score_x,
            hidden_features=hidden_features,
            num_transforms=num_transforms,
            **kwargs,
        )

    return build_fn
