"""Re-plot TensorBoard event files written by TensorBoardTracker.

JAX counterpart of `sbi/analysis/tensorboard_output.py` (plot_summary over
TB logs). Uses tensorboard's event_accumulator (installed alongside
tensorboardX); falls back to the trainer's in-memory summary when given a
trainer object (see `analysis.plot.plot_summary`).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence


def _load_scalars(log_dir: str) -> Dict[str, list]:
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(log_dir)
    acc.Reload()
    out = {}
    for tag in acc.Tags().get("scalars", []):
        out[tag] = [(e.step, e.value) for e in acc.Scalars(tag)]
    return out


def list_all_logs(log_root: Optional[str] = None) -> List[str]:
    """All run directories under the log root (ref list_all_logs)."""
    from ..utils.io import get_log_root

    root = log_root or get_log_root()
    runs = []
    for dirpath, _, filenames in os.walk(root):
        if any(f.startswith("events.out") for f in filenames):
            runs.append(dirpath)
    return sorted(runs)


def plot_summary(
    inference_or_logdir,
    tags: Sequence[str] = ("validation_loss",),
    disable_tensorboard_prompt: bool = True,
    figsize=(6, 3),
    fontsize: int = 12,
):
    """Plot scalar curves from a trainer's tracker logs or a TB run dir."""
    import matplotlib.pyplot as plt

    if isinstance(inference_or_logdir, str):
        scalars = _load_scalars(inference_or_logdir)
        fig, axes = plt.subplots(1, len(tags), figsize=figsize, squeeze=False)
        for i, tag in enumerate(tags):
            pts = scalars.get(tag, [])
            if pts:
                steps, vals = zip(*pts)
                axes[0][i].plot(steps, vals)
            axes[0][i].set_title(tag, fontsize=fontsize)
            axes[0][i].set_xlabel("step")
        return fig, axes
    # trainer object: delegate to the in-memory summary plot
    from .plot import plot_summary as _mem_plot

    return _mem_plot(inference_or_logdir, tags=tags, figsize=figsize)
