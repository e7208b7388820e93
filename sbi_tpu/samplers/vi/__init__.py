from .vi_divergence_optimizers import (
    get_default_VI_method,
    get_VI_method,
    register_VI_method,
)

__all__ = ["get_VI_method", "get_default_VI_method", "register_VI_method"]
