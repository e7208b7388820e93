"""Profiling hooks: XLA trace capture + device-honest timing.

The reference ships no profiler integration (SURVEY §5 marks this slot
optional); on TPU the two things users actually need are (a) capturing an
XLA trace viewable in TensorBoard/Perfetto and (b) wall-timing that
accounts for JAX's async dispatch — a naive ``time.time()`` around a jitted
call measures dispatch, not execution. Both are provided here.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax

__all__ = [
    "trace",
    "annotate",
    "timed",
    "Timer",
    "training_summary",
]


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture an XLA profiler trace for the enclosed block.

    View with ``tensorboard --logdir <log_dir>`` (Profile tab) or the
    generated Perfetto link. Safe to nest arbitrary jitted/pmapped code.
    """
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the profiler timeline
    (``with annotate("mcmc-warmup"): ...``)."""
    return jax.profiler.TraceAnnotation(name)


def _block(tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda leaf: leaf.block_until_ready()
        if hasattr(leaf, "block_until_ready")
        else leaf,
        tree,
    )


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 3, **kwargs):
    """Device-honest timing of ``fn(*args, **kwargs)``.

    Runs ``warmup`` untimed calls (compile + cache), then ``iters`` timed
    calls with ``block_until_ready`` on every output leaf. Returns
    ``(last_result, seconds_per_call)``.
    """
    result = None
    for _ in range(max(warmup, 0)):
        result = _block(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(max(iters, 1)):
        result = _block(fn(*args, **kwargs))
    dt = (time.perf_counter() - t0) / max(iters, 1)
    return result, dt


@dataclass
class _PhaseHandle:
    """Set ``.value`` to the device output produced inside the phase; the
    timer blocks on it before stopping the clock."""

    value: Any = None


@dataclass
class Timer:
    """Accumulating phase timer for host-side orchestration code.

    Assign the phase's device output to the yielded handle so the clock
    stops only after the device work completes (JAX dispatch is async)::

        with timer.phase("train") as ph:
            ph.value = jitted_step(params, batch)

    Without an assigned value the phase measures dispatch time only.
    """

    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        handle = _PhaseHandle()
        try:
            yield handle
        finally:
            if handle.value is not None:
                _block(handle.value)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "calls": self.counts[name],
                "mean_s": self.totals[name] / self.counts[name],
            }
            for name in self.totals
        }


def training_summary(inference, batch_size: Optional[int] = None) -> Dict[str, float]:
    """Throughput digest of a trainer's last ``train()`` call, derived from
    the per-epoch durations the base loop already records."""
    s = inference._summary
    durs = s.get("epoch_durations_sec", [])
    epochs = s["epochs_trained"][-1] if s.get("epochs_trained") else len(durs)
    total = float(sum(durs))
    out = {
        "epochs": float(epochs),
        "total_train_s": total,
        "epochs_per_sec": (epochs / total) if total > 0 else float("nan"),
    }
    n_train = getattr(inference, "_train_indices", None)
    if n_train is not None and batch_size:
        steps_per_epoch = max(len(n_train) // batch_size, 1)
        out["steps_per_sec"] = (
            epochs * steps_per_epoch / total if total > 0 else float("nan")
        )
    return out
