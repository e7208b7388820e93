"""IO helpers (ref `sbi/utils/io.py:14`)."""

from __future__ import annotations

import os


def get_log_root() -> str:
    """Default log root: ~/.sbi_tpu/logs (ref get_log_root)."""
    root = os.path.join(os.path.expanduser("~"), ".sbi_tpu", "logs")
    os.makedirs(root, exist_ok=True)
    return root


def get_data_root() -> str:
    root = os.path.join(os.path.expanduser("~"), ".sbi_tpu", "data")
    os.makedirs(root, exist_ok=True)
    return root
