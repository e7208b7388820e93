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

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def resolve_mesh(mesh: Union[None, str, int, Mesh]) -> Optional[Mesh]:
    """Normalize the public ``mesh=`` argument accepted by trainers,
    posteriors, and diagnostics.

    - ``None`` -> ``None`` (single-device execution, the default);
    - ``"auto"`` -> a 1-D ``'data'`` mesh over ALL visible devices
      (``None`` when only one device is visible — nothing to shard over);
    - an ``int`` n -> a 1-D ``'data'`` mesh over the first n devices;
    - a ``jax.sharding.Mesh`` -> returned unchanged (its FIRST axis is used
      as the data/chain/observation/member axis).
    """
    if mesh is None:
        return None
    if isinstance(mesh, Mesh):
        return mesh
    if mesh == "auto":
        devices = jax.devices()
        if len(devices) < 2:
            return None
        return get_mesh(("data",), devices=devices)
    if isinstance(mesh, int):
        devices = jax.devices()
        if mesh > len(devices):
            raise ValueError(
                f"mesh={mesh} devices requested but only {len(devices)} "
                "are visible."
            )
        return get_mesh(("data",), devices=devices[:mesh])
    raise TypeError(
        f"mesh must be None, 'auto', an int, or a jax.sharding.Mesh; "
        f"got {type(mesh).__name__}."
    )


def shard_axis(mesh: Mesh, axis: int = 0, axis_name: Optional[str] = None) -> NamedSharding:
    """Sharding that splits array axis ``axis`` across the mesh's data axis
    (axes before it are replicated)."""
    axis_name = axis_name or mesh.axis_names[0]
    return NamedSharding(mesh, P(*((None,) * axis), axis_name))


def constrain_sharded(tree, mesh: Mesh, axis: int = 0):
    """``with_sharding_constraint``: split axis ``axis`` of every leaf over
    the mesh's data axis. For use INSIDE jit-traced code (the trainers'
    fused epoch programs); outside jit use :func:`shard_batch`."""
    sharding = shard_axis(mesh, axis)
    return jax.tree_util.tree_map(
        lambda t: jax.lax.with_sharding_constraint(t, sharding), tree
    )


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
