from .importance_sampling import (
    gpdfit,
    importance_sample,
    psis_diagnostics,
    sampling_importance_resampling,
)

__all__ = [
    "importance_sample",
    "sampling_importance_resampling",
    "gpdfit",
    "psis_diagnostics",
]
