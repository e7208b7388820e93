"""Typed plotting options (counterpart of
`sbi/analysis/plotting_classes.py:1-306`).

Frozen dataclasses describing one plot mark each; ``pairplot`` /
``marginal_plot`` accept them (or plain dicts) through ``diag_kwargs`` /
``upper_kwargs`` / ``lower_kwargs`` / ``fig_kwargs``. Every class carries an
``mpl_kwargs`` dict that is forwarded verbatim to the underlying matplotlib
call after merging with the mark's defaults (user keys win).
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field
from typing import Any, Dict, List, Optional


def _merge_defaults(obj, attr: str, defaults: Dict[str, Any]) -> None:
    merged = {**defaults, **getattr(obj, attr)}
    object.__setattr__(obj, attr, merged)


# ---------------------------------------------------------------------------
# Diagonal (1-D marginal) marks
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DiagOptions:
    """Base options for diagonal (1-D marginal) subplots."""

    mpl_kwargs: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class KdeDiagOptions(DiagOptions):
    bw_method: str = "scott"
    bins: int = 50


@dataclass(frozen=True)
class HistDiagOptions(DiagOptions):
    bin_heuristic: str = "Freedman-Diaconis"

    def __post_init__(self):
        _merge_defaults(
            self, "mpl_kwargs", {"density": False, "histtype": "step"}
        )


@dataclass(frozen=True)
class ScatterDiagOptions(DiagOptions):
    pass


@dataclass(frozen=True)
class BarDiagOptions(DiagOptions):
    """Discrete bar marks on the diagonal (for integer-valued dims)."""

    width: float = 0.8

    def __post_init__(self):
        _merge_defaults(
            self, "mpl_kwargs", {"alpha": 0.7, "edgecolor": "white"}
        )


# ---------------------------------------------------------------------------
# Off-diagonal (2-D marginal) marks
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class OffDiagOptions:
    """Base options for off-diagonal (2-D marginal) subplots."""

    mpl_kwargs: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class KdeOffDiagOptions(OffDiagOptions):
    bw_method: str = "scott"
    bins: int = 50

    def __post_init__(self):
        _merge_defaults(
            self, "mpl_kwargs",
            {"cmap": "viridis", "origin": "lower", "aspect": "auto"},
        )


@dataclass(frozen=True)
class HistOffDiagOptions(OffDiagOptions):
    bin_heuristic: Optional[str] = None
    np_hist_kwargs: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        _merge_defaults(
            self, "mpl_kwargs",
            {"cmap": "viridis", "origin": "lower", "aspect": "auto"},
        )
        _merge_defaults(self, "np_hist_kwargs", {"bins": 50, "density": False})


@dataclass(frozen=True)
class ScatterOffDiagOptions(OffDiagOptions):
    def __post_init__(self):
        _merge_defaults(
            self, "mpl_kwargs",
            {"edgecolor": "white", "alpha": 0.5, "rasterized": False},
        )


@dataclass(frozen=True)
class ContourOffDiagOptions(OffDiagOptions):
    bw_method: str = "scott"
    bins: int = 50
    percentile: bool = True
    levels: list = field(default_factory=lambda: [0.68, 0.95, 0.99])


@dataclass(frozen=True)
class PlotOffDiagOptions(OffDiagOptions):
    def __post_init__(self):
        _merge_defaults(self, "mpl_kwargs", {"aspect": "auto"})


# ---------------------------------------------------------------------------
# Figure-level options
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FigOptions:
    """Figure-level knobs shared by the grid plotting entry points."""

    legend: bool = False
    legend_kwargs: Dict[str, Any] = field(default_factory=dict)

    points_labels: List[str] = field(
        default_factory=lambda: [f"points_{i}" for i in range(10)]
    )
    samples_labels: List[str] = field(
        default_factory=lambda: [f"samples_{i}" for i in range(10)]
    )
    samples_colors: List[str] = field(default_factory=lambda: _color_cycle(0))
    points_colors: List[str] = field(default_factory=lambda: _color_cycle(1))

    tickformatter: Any = None  # resolved lazily to FormatStrFormatter("%g")
    tick_labels: Optional[Any] = None

    points_diag: Dict[str, Any] = field(default_factory=dict)
    points_offdiag: Dict[str, Any] = field(default_factory=dict)

    fig_bg_colors: Dict[str, Any] = field(default_factory=dict)
    fig_subplots_adjust: Dict[str, Any] = field(default_factory=dict)
    subplots: Dict[str, Any] = field(default_factory=dict)
    despine: Dict[str, int] = field(default_factory=lambda: dict(offset=5))

    title: Optional[str] = None
    title_format: Dict[str, Any] = field(default_factory=dict)

    x_lim_add_eps: float = 1e-5
    square_subplots: bool = True

    def __post_init__(self):
        _merge_defaults(self, "title_format", {"fontsize": 16})
        _merge_defaults(self, "fig_subplots_adjust", {"top": 0.9})
        _merge_defaults(
            self, "points_offdiag", {"marker": ".", "markersize": 10}
        )
        _merge_defaults(
            self, "fig_bg_colors", {"upper": None, "diag": None, "lower": None}
        )
        if self.tickformatter is None:
            import matplotlib as mpl

            object.__setattr__(
                self, "tickformatter", mpl.ticker.FormatStrFormatter("%g")
            )


def _color_cycle(parity: int) -> List[str]:
    """Every-other color of the active mpl cycle: even for samples, odd for
    points, so overlaid sets stay distinguishable."""
    from matplotlib import pyplot as plt

    cycle = plt.rcParams["axes.prop_cycle"].by_key()["color"]
    return cycle[parity::2]


def _set_color(i: int) -> str:
    from matplotlib import pyplot as plt

    cycle = plt.rcParams["axes.prop_cycle"].by_key()["color"]
    return cycle[(i * 2) % len(cycle)]


def get_default_diag_kwargs(diag: Optional[str], i: int = 0) -> Dict[str, Any]:
    """Filled option dict for one sample set's diagonal mark."""
    table = {
        "kde": KdeDiagOptions,
        "hist": HistDiagOptions,
        "scatter": ScatterDiagOptions,
        "bar": BarDiagOptions,
    }
    cls = table.get(diag)
    if cls is None:
        return {}
    return asdict(cls(mpl_kwargs=dict(color=_set_color(i))))


def get_default_offdiag_kwargs(
    offdiag: Optional[str], i: int = 0
) -> Dict[str, Any]:
    """Filled option dict for one sample set's off-diagonal mark."""
    if offdiag in ("kde", "kde2d"):
        opts = KdeOffDiagOptions()
    elif offdiag in ("hist", "hist2d"):
        opts = HistOffDiagOptions()
    elif offdiag == "scatter":
        opts = ScatterOffDiagOptions(mpl_kwargs=dict(color=_set_color(i)))
    elif offdiag in ("contour", "contourf"):
        opts = ContourOffDiagOptions(mpl_kwargs=dict(colors=_set_color(i)))
    elif offdiag == "plot":
        opts = PlotOffDiagOptions(mpl_kwargs=dict(color=_set_color(i)))
    else:
        return {}
    return asdict(opts)
