"""Orbax-backed checkpointing for estimator/trainer state.

`NeuralInference.save()`/`.load()` pickle the whole trainer (reference
parity, `trainers/base.py:1311-1346`). That breaks down exactly where TPU
runs need checkpoints most: sharded params on a multi-chip mesh (pickling
gathers to host), async saves during long trainings, and atomicity against
preemption. This module provides the TPU-native path: an Orbax
`StandardCheckpointer` over the (params, opt_state, metadata) pytree.
Restore is shape/sharding-aware — pass a target pytree with the desired
shardings and orbax places shards directly on the right devices.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

__all__ = ["save_pytree", "restore_pytree", "save_training_state",
           "restore_training_state"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_pytree(path: str, tree: Any) -> str:
    """Atomically write a pytree of arrays to ``path`` (a directory)."""
    path = os.path.abspath(os.path.expanduser(path))
    ckpt = _checkpointer()
    ckpt.save(path, tree, force=True)
    ckpt.wait_until_finished()
    return path


def restore_pytree(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree. ``like`` (a pytree of arrays or ShapeDtypeStructs,
    optionally with shardings) restores directly into that structure —
    required for sharded multi-chip params."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(path))
    ckpt = _checkpointer()
    if like is None:
        return ckpt.restore(path)
    target = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                       sharding=getattr(a, "sharding", None))
        if hasattr(a, "shape")
        else a,
        like,
    )
    try:
        return ckpt.restore(path, target)
    except ValueError as err:
        # Orbax shape/structure mismatches are opaque; the usual cause here
        # is an estimator whose parameter LAYOUT changed between saving and
        # restoring (e.g. the round-4 'sos' monotone flow grew from 3K+1 to
        # 3K+2 params/dim). Name that cause explicitly (ADVICE r4).
        raise ValueError(
            f"Checkpoint restore from '{path}' failed with a shape/structure "
            "mismatch against the target pytree. This usually means the "
            "estimator architecture (or its parameter layout) changed since "
            "the checkpoint was saved — e.g. 'sos' monotone flows saved "
            "before round 4 use an incompatible 3K+1 layout. Rebuild with "
            "the original architecture or retrain. Original error: "
            f"{err}"
        ) from err


def save_training_state(path: str, inference) -> str:
    """Checkpoint a trainer's resumable state: estimator params, optimizer
    state, and the round/epoch counters. Use with
    ``train(resume_training=True)`` after :func:`restore_training_state`.

    The checkpoint structure is constant — ``best_params`` is always
    present (falling back to the current params) so restores never face a
    tree-structure mismatch."""
    if inference._neural_net is None:
        raise RuntimeError(
            "save_training_state: the trainer has no built estimator yet — "
            "call train() (at least briefly) before checkpointing."
        )
    state = {
        "params": inference._neural_net.params,
        "opt_state": inference._opt_state,
        "counters": {
            "epoch": inference._epoch,
            "round": inference._round,
            "best_val_loss": inference._best_val_loss,
            "epochs_since_improvement": inference._epochs_since_last_improvement,
        },
        "best_params": (
            inference._best_params
            if inference._best_params is not None
            else inference._neural_net.params
        ),
    }
    return save_pytree(path, state)


def restore_training_state(path: str, inference) -> None:
    """Load a checkpoint written by :func:`save_training_state` into a
    trainer whose net has been built with the same architecture (e.g. by
    a short ``train(max_num_epochs=1)`` on the same data shapes — the net
    and optimizer state are shaped lazily from data)."""
    if inference._neural_net is None or inference._opt_state is None:
        raise RuntimeError(
            "restore_training_state: the target trainer's estimator/"
            "optimizer are not built yet. Build them with the same "
            "architecture first (append the simulations and run "
            "train(max_num_epochs=1)), then restore."
        )
    p_like = inference._neural_net.params
    like = {
        "params": p_like,
        "opt_state": inference._opt_state,
        "counters": {
            "epoch": 0,
            "round": 0,
            "best_val_loss": 0.0,
            "epochs_since_improvement": 0,
        },
        "best_params": p_like,
    }
    state = restore_pytree(path, like)
    inference._neural_net.params = state["params"]
    inference._opt_state = state["opt_state"]
    c = state["counters"]
    inference._epoch = int(c["epoch"])
    inference._round = int(c["round"])
    inference._best_val_loss = float(c["best_val_loss"])
    inference._epochs_since_last_improvement = int(c["epochs_since_improvement"])
    inference._best_params = state["best_params"]
