"""Device mesh + sharding helpers — the communication backend.

The reference has NO distributed backend (survey §2.7: joblib process pools
only). The TPU-native equivalent is this thin module: `jax.sharding.Mesh`
over ICI, `NamedSharding` annotations, and jit's partitioner inserting the
collectives. Strategies that pay off for SBI (survey §2.7 table):

  - data parallelism over the simulation/training batch axis ('data')
  - MCMC chain sharding over the mesh ('data' again — chains are the batch)
  - observation sharding for amortized diagnostics (SBC/TARP)

Nets are small (<~1M params) so parameters are replicated; gradients are
all-reduced by XLA automatically when inputs are sharded.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
    devices=None,
) -> Mesh:
    """Build a mesh over all (or given) devices. 1D 'data' mesh by default."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_along(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding that splits the leading array axis across `axis_name`."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a pytree of arrays with the leading axis sharded over the mesh.

    Pads the leading axis to a multiple of the mesh size if needed (padding
    rows are repeats of the last element; callers that care mask them)."""
    n_dev = mesh.shape[axis_name]
    sharding = shard_along(mesh, axis_name)

    def place(x):
        x = jnp.asarray(x)
        rem = x.shape[0] % n_dev
        if rem:
            pad = n_dev - rem
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, batch)


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), sharding), tree)
