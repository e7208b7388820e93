"""Device-mesh helpers backing the public ``mesh=`` argument of
``train`` / ``train_ensemble`` / ``sample`` / ``sample_batched`` /
``run_sbc`` / ``run_tarp``."""

from .mesh import (
    constrain_sharded,
    get_mesh,
    replicate,
    replicated,
    resolve_mesh,
    shard_along,
    shard_axis,
    shard_batch,
)

__all__ = [
    "constrain_sharded",
    "get_mesh",
    "replicate",
    "replicated",
    "resolve_mesh",
    "shard_along",
    "shard_axis",
    "shard_batch",
]
