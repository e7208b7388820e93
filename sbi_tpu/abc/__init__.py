from .abc_base import ABCBASE
from .mcabc import ABC, MCABC
from .smcabc import SMC, SMCABC

__all__ = ["ABCBASE", "MCABC", "ABC", "SMCABC", "SMC"]
