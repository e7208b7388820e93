"""Metric tracking (ref `sbi/utils/tracking.py:13-40`, `sbi_types.py:59-80`).

`Tracker` protocol + TensorBoard adapter (tensorboardX) + in-memory tracker.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional, Protocol, runtime_checkable


@runtime_checkable
class Tracker(Protocol):
    def log_metric(self, name: str, value: float, step: Optional[int] = None) -> None: ...

    def flush(self) -> None: ...

    def close(self) -> None: ...


class InMemoryTracker:
    def __init__(self):
        self.metrics: Dict[str, list] = {}

    def log_metric(self, name, value, step=None):
        self.metrics.setdefault(name, []).append((step, float(value)))

    def flush(self):
        pass

    def close(self):
        pass


class TensorBoardTracker:
    """Writes to ~/.sbi_tpu/logs/<Method>/<timestamp> like the reference's
    `get_log_root` (`sbi/utils/io.py:14`)."""

    def __init__(self, log_dir: Optional[str] = None, method: str = "inference"):
        if log_dir is None:
            root = os.path.join(os.path.expanduser("~"), ".sbi_tpu", "logs")
            log_dir = os.path.join(root, method, time.strftime("%Y%m%d-%H%M%S"))
        try:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(log_dir)
        except Exception:  # pragma: no cover - tensorboardX optional
            self._writer = None
        self.log_dir = log_dir

    def log_metric(self, name, value, step=None):
        if self._writer is not None:
            self._writer.add_scalar(name, float(value), global_step=step)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
