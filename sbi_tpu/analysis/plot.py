"""Posterior visualization: pairplot, marginal_plot, conditional variants,
SBC rank plots, TARP plots.

JAX counterpart of `sbi/analysis/plot.py` (pairplot `:156`, marginal_plot
`:57`, conditional_pairplot `:1135`, sbc_rank_plot `:1627`). Pure
matplotlib over numpy — plotting is host-side by nature; samples arrive as
jax arrays and are converted once.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple, Union

import numpy as np


def _to_np_list(samples) -> List[np.ndarray]:
    if isinstance(samples, (list, tuple)):
        arrs = [np.asarray(s) for s in samples]
    else:
        arrs = [np.asarray(samples)]
    # Drop non-finite rows like the reference's ensure_numpy path does
    # (ref `tests/plot_test.py:35-45` feeds NaN/Inf samples) — one bad
    # simulation must not take down the whole corner plot.
    out = []
    for a in arrs:
        a2 = a.reshape(-1, 1) if a.ndim == 1 else a
        mask = np.isfinite(a2).all(axis=tuple(range(1, a2.ndim)))
        if not mask.all():
            import warnings

            warnings.warn(
                f"pairplot: dropping {int((~mask).sum())} non-finite sample "
                f"rows.",
                stacklevel=3,
            )
            a2 = a2[mask]
        out.append(a2)
    return out


def _to_np_points_list(points, dim: int) -> List[np.ndarray]:
    """`points` overlays (ADVICE r4): a 1-D array of length ``dim`` is ONE
    D-dimensional point (one row), not ``dim`` rows of a 1-D variable; and a
    non-finite coordinate is a caller bug that raises a clear error instead
    of being silently dropped (row-dropping is for sample arrays only)."""
    if isinstance(points, (list, tuple)):
        arrs = [np.asarray(p) for p in points]
    else:
        arrs = [np.asarray(points)]
    out = []
    for a in arrs:
        if a.ndim == 1:
            a2 = a.reshape(-1, 1) if dim == 1 else a.reshape(1, -1)
        else:
            a2 = a.reshape(-1, a.shape[-1])
        if a2.shape[-1] != dim:
            raise ValueError(
                f"pairplot: `points` has {a2.shape[-1]} coordinates per "
                f"point but the samples have {dim} dimensions."
            )
        if not np.isfinite(a2).all():
            raise ValueError(
                "pairplot: `points` contains non-finite values (shape "
                f"{tuple(a.shape)}). Fix or remove the bad point — unlike "
                "sample rows, overlay points are not silently dropped."
            )
        out.append(a2)
    return out


# ---------------------------------------------------------------------------
# Plotting-option dataclasses (ref `plotting_classes.py`)
# ---------------------------------------------------------------------------


@dataclass
class HistOptions:
    bins: int = 50
    density: bool = True
    histtype: str = "step"


@dataclass
class KdeOptions:
    bw_method: str = "scott"
    num_points: int = 100


@dataclass
class ScatterOptions:
    alpha: float = 0.5
    s: float = 2.0


@dataclass
class ContourOptions:
    levels: Sequence[float] = (0.68, 0.95)
    percentile: bool = True


def _kde_1d(vals, num_points=100, bw_method="scott"):
    import scipy.stats as st

    kde = st.gaussian_kde(vals, bw_method=bw_method)
    grid = np.linspace(vals.min(), vals.max(), num_points)
    return grid, kde(grid)


def _hist2d_contour(ax, xs, ys, levels=(0.68, 0.95), bins=50, color="C0",
                    percentile=True):
    """Credible-mass contours: levels are posterior-mass fractions when
    `percentile` (ref ContourOptions), else raw density levels."""
    H, xe, ye = np.histogram2d(xs, ys, bins=bins)
    H = H.T
    if percentile:
        Hs = np.sort(H.ravel())[::-1]
        cum = np.cumsum(Hs) / Hs.sum()
        cuts = [Hs[np.searchsorted(cum, l)] for l in sorted(levels)]
        cuts = sorted(set(cuts))
    else:
        cuts = sorted(set(levels))
    xc = 0.5 * (xe[:-1] + xe[1:])
    yc = 0.5 * (ye[:-1] + ye[1:])
    ax.contour(xc, yc, H, levels=cuts, colors=color)


def _kde2d_contour(ax, xs, ys, levels=(0.68, 0.95), num_points=60,
                   color="C0", bw_method="scott", percentile=True):
    import scipy.stats as st

    kde = st.gaussian_kde(np.vstack([xs, ys]), bw_method=bw_method)
    gx = np.linspace(xs.min(), xs.max(), num_points)
    gy = np.linspace(ys.min(), ys.max(), num_points)
    X, Y = np.meshgrid(gx, gy)
    Z = kde(np.vstack([X.ravel(), Y.ravel()])).reshape(X.shape)
    if percentile:
        Zs = np.sort(Z.ravel())[::-1]
        cum = np.cumsum(Zs) / Zs.sum()
        cuts = sorted(set(Zs[np.searchsorted(cum, l)] for l in sorted(levels)))
    else:
        cuts = sorted(set(levels))
    ax.contour(X, Y, Z, levels=cuts, colors=color)


def _mode_for(spec, k: int, default: Optional[str]):
    """Resolve a per-sample-set cell mode: None | str | list-of-str."""
    if spec is None:
        return None
    if isinstance(spec, str):
        return spec
    return spec[k] if k < len(spec) else (spec[-1] if spec else default)


# ---------------------------------------------------------------------------
# Option resolution (ref `plot.py:941-1010` _prepare_kwargs/_prepare_fig_kwargs)
# ---------------------------------------------------------------------------


def _as_option_dict(obj) -> dict:
    from dataclasses import asdict, is_dataclass

    if obj is None:
        return {}
    if is_dataclass(obj):
        return asdict(obj)
    return dict(obj)


def _deep_update(base: dict, update: dict) -> dict:
    out = dict(base)
    for k, v in update.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = {**out[k], **v}
        else:
            out[k] = v
    return out


def _prepare_cell_kwargs(plot_spec, num_sets, get_default, plot_kwargs):
    """Per-sample-set (mode, filled-kwargs) pairs for one grid position.

    ``plot_spec``: None | str | list of modes (one per sample set).
    ``plot_kwargs``: None | dict | Options dataclass | list thereof —
    merged over each set's defaults (user keys win, nested dicts merged).
    """
    modes, filled = [], []
    for k in range(num_sets):
        mode = _mode_for(plot_spec, k, None)
        defaults = get_default(mode, k)
        if isinstance(plot_kwargs, (list, tuple)):
            user = _as_option_dict(
                plot_kwargs[k] if k < len(plot_kwargs) else None
            )
        else:
            user = _as_option_dict(plot_kwargs)
        modes.append(mode)
        filled.append(_deep_update(defaults, user))
    return modes, filled


def _prepare_fig_options(fig_kwargs, legacy_subplot_kwargs=None):
    """dict | FigOptions -> FigOptions. Unknown dict keys are routed into
    ``subplots`` (passed to `plt.subplots`) for backward compatibility with
    the earlier flat fig_kwargs API."""
    from dataclasses import fields

    from .plotting_classes import FigOptions

    if isinstance(fig_kwargs, FigOptions):
        return fig_kwargs
    d = dict(fig_kwargs or {})
    if legacy_subplot_kwargs:
        d.setdefault("subplots", {}).update(legacy_subplot_kwargs)
    known = {f.name for f in fields(FigOptions)}
    subplot_extra = {k: d.pop(k) for k in list(d) if k not in known}
    if subplot_extra:
        d["subplots"] = {**subplot_extra, **d.get("subplots", {})}
    return FigOptions(**d)


# ---------------------------------------------------------------------------
# Mark renderers (ref `plot.py:311-503` plt_* functions)
# ---------------------------------------------------------------------------


def _fd_bins(vals: np.ndarray) -> int:
    """Freedman-Diaconis bin count (ref HistDiagOptions.bin_heuristic)."""
    iqr = np.subtract(*np.percentile(vals, [75, 25]))
    if iqr <= 0:
        return 50
    width = 2 * iqr / (len(vals) ** (1 / 3))
    span = vals.max() - vals.min()
    return max(int(np.ceil(span / width)), 10) if span > 0 else 10


def plt_hist_1d(ax, vals, opts):
    kw = dict(opts.get("mpl_kwargs", {}))
    if "bins" not in kw:
        if opts.get("bins") is not None:
            kw["bins"] = opts["bins"]
        elif opts.get("bin_heuristic") == "Freedman-Diaconis":
            kw["bins"] = _fd_bins(vals)
        else:
            kw["bins"] = 50
    ax.hist(vals, **kw)


def plt_kde_1d(ax, vals, opts):
    import scipy.stats as st

    kde = st.gaussian_kde(vals, bw_method=opts.get("bw_method", "scott"))
    grid = np.linspace(vals.min(), vals.max(), opts.get("bins", 50))
    ax.plot(grid, kde(grid), **opts.get("mpl_kwargs", {}))


def plt_scatter_1d(ax, vals, opts):
    ax.scatter(vals, np.zeros_like(vals), **opts.get("mpl_kwargs", {}))


def plt_bar_1d(ax, vals, opts):
    uniq, counts = np.unique(vals, return_counts=True)
    ax.bar(uniq, counts / counts.sum(), width=opts.get("width", 0.8),
           **opts.get("mpl_kwargs", {}))


def plt_hist_2d(ax, xs, ys, lim_x, lim_y, opts):
    H, xe, ye = np.histogram2d(
        xs, ys, range=[lim_x, lim_y], **opts.get("np_hist_kwargs", {})
    )
    ax.imshow(
        H.T, extent=(xe[0], xe[-1], ye[0], ye[-1]),
        **opts.get("mpl_kwargs", {}),
    )


def _kde_grid_2d(xs, ys, lim_x, lim_y, bins, bw_method):
    import scipy.stats as st

    kde = st.gaussian_kde(np.vstack([xs, ys]), bw_method=bw_method)
    gx = np.linspace(lim_x[0], lim_x[1], bins)
    gy = np.linspace(lim_y[0], lim_y[1], bins)
    X, Y = np.meshgrid(gx, gy)
    Z = kde(np.vstack([X.ravel(), Y.ravel()])).reshape(X.shape)
    return X, Y, Z


def plt_kde_2d(ax, xs, ys, lim_x, lim_y, opts):
    _, _, Z = _kde_grid_2d(
        xs, ys, lim_x, lim_y, opts.get("bins", 50),
        opts.get("bw_method", "scott"),
    )
    ax.imshow(
        Z, extent=(lim_x[0], lim_x[1], lim_y[0], lim_y[1]),
        **opts.get("mpl_kwargs", {}),
    )


def plt_contour_2d(ax, xs, ys, lim_x, lim_y, opts):
    X, Y, Z = _kde_grid_2d(
        xs, ys, lim_x, lim_y, opts.get("bins", 50),
        opts.get("bw_method", "scott"),
    )
    levels = list(opts.get("levels", [0.68, 0.95, 0.99]))
    if opts.get("percentile", True):
        Zs = np.sort(Z.ravel())[::-1]
        cum = np.cumsum(Zs) / Zs.sum()
        levels = sorted({
            float(Zs[np.searchsorted(cum, min(l, cum[-1]))])
            for l in sorted(levels)
        })
    ax.contour(X, Y, Z, levels=levels, **opts.get("mpl_kwargs", {}))


def plt_scatter_2d(ax, xs, ys, opts):
    ax.scatter(xs, ys, **opts.get("mpl_kwargs", {}))


def plt_plot_2d(ax, xs, ys, opts):
    kw = dict(opts.get("mpl_kwargs", {}))
    kw.pop("aspect", None)
    ax.plot(xs, ys, **kw)


def _draw_diag_cell(ax, vals, mode, opts):
    if mode in (None, "none"):
        return
    fn = {
        "hist": plt_hist_1d, "kde": plt_kde_1d,
        "scatter": plt_scatter_1d, "bar": plt_bar_1d,
    }.get(mode)
    if fn is None:
        raise ValueError(f"Unknown diagonal mode '{mode}'")
    fn(ax, vals, opts)


def _draw_offdiag_cell(ax, xs, ys, lim_x, lim_y, mode, opts):
    if mode in (None, "none"):
        return
    if mode in ("hist", "hist2d"):
        plt_hist_2d(ax, xs, ys, lim_x, lim_y, opts)
    elif mode in ("kde", "kde2d"):
        plt_kde_2d(ax, xs, ys, lim_x, lim_y, opts)
    elif mode in ("contour", "contourf"):
        plt_contour_2d(ax, xs, ys, lim_x, lim_y, opts)
    elif mode == "scatter":
        plt_scatter_2d(ax, xs, ys, opts)
    elif mode == "plot":
        plt_plot_2d(ax, xs, ys, opts)
    else:
        raise ValueError(f"Unknown off-diagonal mode '{mode}'")


def infer_limits(sample_list, D, eps: float = 0.0):
    """Per-dimension [min, max] over all sample sets (ref `plot.py:794`)."""
    lims = []
    for d in range(D):
        lo = min(float(s[:, d].min()) for s in sample_list)
        hi = max(float(s[:, d].max()) for s in sample_list)
        lims.append([lo - eps, hi + eps])
    return np.asarray(lims)


def _resolve_limits(limits, sample_list, D, eps=0.0):
    if limits is None:
        return infer_limits(sample_list, D, eps)
    lim = np.asarray(limits, dtype=float)
    if lim.ndim == 1:
        lim = np.tile(lim, (D, 1))
    elif lim.shape[0] == 1:
        lim = np.tile(lim[0], (D, 1))
    return lim


def pairplot(
    samples,
    points=None,
    limits=None,
    subset: Optional[Sequence[int]] = None,
    upper: Optional[object] = "hist",
    lower: Optional[object] = None,
    diag: Optional[object] = "hist",
    figsize: Tuple[int, int] = (10, 10),
    labels: Optional[Sequence[str]] = None,
    ticks=None,
    offdiag: Optional[object] = None,
    diag_kwargs=None,
    upper_kwargs=None,
    lower_kwargs=None,
    fig_kwargs=None,
    fig=None,
    axes=None,
    discrete_indices: Optional[Sequence[int]] = None,
    hist_options: Optional[HistOptions] = None,
    kde_options: Optional[KdeOptions] = None,
    scatter_options: Optional[ScatterOptions] = None,
    contour_options: Optional[ContourOptions] = None,
    **kwargs,
):
    """Corner plot of posterior samples (ref `plot.py:156-311`).

    ``upper``/``lower``/``diag`` accept a mode string or a per-sample-set
    list ({hist, kde, scatter, contour, plot, bar(diag), None}); ``lower``
    defaults to mirroring ``upper``. ``diag_kwargs``/``upper_kwargs``/
    ``lower_kwargs`` take a dict, an option dataclass from
    `analysis.plotting_classes`, or a per-set list of either; ``fig_kwargs``
    takes a dict or `FigOptions` (legend, colors, tick formatting, subplot
    kwargs, bg colors, title, despine...). ``discrete_indices`` switches the
    named dims to bar (diag) / jittered scatter (offdiag) automatically.
    Returns (fig, axes).
    """
    from .plotting_classes import (
        get_default_diag_kwargs,
        get_default_offdiag_kwargs,
    )

    import matplotlib.pyplot as plt

    # Legacy flat option objects (pre-round-3 API) become cell kwargs.
    # Top-level keys only: a shared legacy object may apply to several mark
    # types, and e.g. `bins` must not leak into a Line2D's mpl kwargs.
    if hist_options is not None and diag_kwargs is None:
        diag_kwargs = {"bins": hist_options.bins}
    if kde_options is not None and diag_kwargs is None:
        diag_kwargs = {"bins": kde_options.num_points}
    if contour_options is not None and upper_kwargs is None:
        upper_kwargs = {
            "levels": list(contour_options.levels),
            "percentile": contour_options.percentile,
        }

    if offdiag is not None and upper is None:
        upper = offdiag  # deprecated alias (ref `_prepare_upper`)

    sample_list = _to_np_list(samples)
    num_sets = len(sample_list)
    D = sample_list[0].shape[1]
    dims = list(subset) if subset is not None else list(range(D))
    n = len(dims)

    fig_opts = _prepare_fig_options(fig_kwargs)
    lim = _resolve_limits(limits, sample_list, D, fig_opts.x_lim_add_eps)

    lower_spec = lower if lower is not None else upper
    diag_modes, diag_opts = _prepare_cell_kwargs(
        diag, num_sets, get_default_diag_kwargs, diag_kwargs
    )
    upper_modes, upper_opts = _prepare_cell_kwargs(
        upper, num_sets, get_default_offdiag_kwargs, upper_kwargs
    )
    lower_modes, lower_opts = _prepare_cell_kwargs(
        lower_spec, num_sets, get_default_offdiag_kwargs,
        lower_kwargs if lower_kwargs is not None else upper_kwargs,
    )

    # Sample-set colors from FigOptions override the per-index defaults
    # (image-type off-diagonal marks are colored by their cmap instead).
    for k in range(num_sets):
        color = fig_opts.samples_colors[k % len(fig_opts.samples_colors)]
        mk = diag_opts[k].setdefault("mpl_kwargs", {})
        mk.setdefault("color", color)
        for opts, modes in (
            (upper_opts, upper_modes), (lower_opts, lower_modes),
        ):
            mk = opts[k].setdefault("mpl_kwargs", {})
            if modes[k] in ("contour", "contourf"):
                mk.setdefault("colors", color)
            elif modes[k] in ("scatter", "plot"):
                mk.setdefault("color", color)

    discrete = set(discrete_indices or [])

    if axes is None:
        fig, axes = plt.subplots(
            n, n, figsize=figsize, squeeze=False, **fig_opts.subplots
        )
    axes = np.atleast_2d(axes)

    legend_handles = {}
    for i, di in enumerate(dims):
        for j, dj in enumerate(dims):
            ax = axes[i][j]
            kind = "diag" if i == j else ("upper" if j > i else "lower")
            bg = fig_opts.fig_bg_colors.get(kind)
            if bg is not None:
                ax.set_facecolor(bg)
            if i == j:
                for k, s in enumerate(sample_list):
                    mode = "bar" if di in discrete else diag_modes[k]
                    opts = (
                        get_default_diag_kwargs("bar", k)
                        if di in discrete else diag_opts[k]
                    )
                    _draw_diag_cell(ax, s[:, di], mode, opts)
                    if mode is not None:
                        label = fig_opts.samples_labels[
                            k % len(fig_opts.samples_labels)
                        ]
                        legend_handles.setdefault(
                            label,
                            plt.Line2D(
                                [0], [0],
                                color=opts.get("mpl_kwargs", {}).get(
                                    "color", f"C{k}"
                                ),
                            ),
                        )
                if points is not None:
                    for pi, p in enumerate(_to_np_points_list(points, D)):
                        ax.axvline(
                            p.reshape(-1, D)[0, di],
                            color=fig_opts.points_colors[
                                pi % len(fig_opts.points_colors)
                            ],
                            **fig_opts.points_diag,
                        )
                ax.set_xlim(lim[di])
            else:
                modes = upper_modes if j > i else lower_modes
                opts_list = upper_opts if j > i else lower_opts
                if all(m is None for m in modes):
                    ax.axis("off")
                    continue
                for k, s in enumerate(sample_list):
                    mode = modes[k]
                    opts = opts_list[k]
                    xs, ys = s[:, dj], s[:, di]
                    if dj in discrete or di in discrete:
                        mode = "scatter" if mode is not None else None
                        opts = get_default_offdiag_kwargs("scatter", k)
                        rng = np.random.default_rng(0)
                        if dj in discrete:
                            xs = xs + rng.uniform(-0.2, 0.2, xs.shape)
                        if di in discrete:
                            ys = ys + rng.uniform(-0.2, 0.2, ys.shape)
                    _draw_offdiag_cell(
                        ax, xs, ys, tuple(lim[dj]), tuple(lim[di]), mode, opts
                    )
                if points is not None:
                    for pi, p in enumerate(_to_np_points_list(points, D)):
                        p2 = p.reshape(-1, D)
                        ax.plot(
                            p2[0, dj], p2[0, di],
                            color=fig_opts.points_colors[
                                pi % len(fig_opts.points_colors)
                            ],
                            **fig_opts.points_offdiag,
                        )
                ax.set_xlim(lim[dj])
                ax.set_ylim(lim[di])
            _format_grid_axis(
                ax, i, j, n, di, dj, dims, labels, ticks, fig_opts
            )

    if fig_opts.legend and legend_handles:
        fig.legend(
            legend_handles.values(), legend_handles.keys(),
            **fig_opts.legend_kwargs,
        )
    if fig_opts.title:
        fig.suptitle(fig_opts.title, **fig_opts.title_format)
    if fig_opts.fig_subplots_adjust:
        fig.subplots_adjust(**fig_opts.fig_subplots_adjust)
    return fig, axes


def _format_grid_axis(ax, i, j, n, di, dj, dims, labels, ticks, fig_opts):
    """Shared per-cell formatting (ref `plot.py:605-743` _format_subplot)."""
    if ticks is not None:
        t = np.asarray(ticks, dtype=object)
        tx = t[dj] if t.ndim > 1 else t
        ax.set_xticks(np.asarray(tx, dtype=float))
        if i != j:
            ty = t[di] if t.ndim > 1 else t
            ax.set_yticks(np.asarray(ty, dtype=float))
    if fig_opts.tickformatter is not None:
        ax.xaxis.set_major_formatter(fig_opts.tickformatter)
    if fig_opts.tick_labels is not None:
        ax.set_xticklabels(fig_opts.tick_labels)
    if labels is not None:
        if i == n - 1:
            ax.set_xlabel(labels[dj])
        if j == 0:
            ax.set_ylabel(labels[di])
    if fig_opts.square_subplots:
        ax.set_box_aspect(1)
    offset = fig_opts.despine.get("offset")
    if offset:
        ax.spines["bottom"].set_position(("outward", offset))
        ax.spines["top"].set_visible(False)
        ax.spines["right"].set_visible(False)


def marginal_plot(
    samples,
    points=None,
    limits=None,
    subset=None,
    diag: Optional[object] = "hist",
    figsize: Tuple[int, int] = (10, 2),
    labels=None,
    ticks=None,
    diag_kwargs=None,
    fig_kwargs=None,
    fig=None,
    axes=None,
    **kwargs,
):
    """1D marginals in a row (ref `plot.py:57-155`): the pairplot diagonal
    machinery (per-set modes, diag_kwargs, fig_kwargs) on a 1 x D grid."""
    from .plotting_classes import get_default_diag_kwargs

    import matplotlib.pyplot as plt

    sample_list = _to_np_list(samples)
    num_sets = len(sample_list)
    D = sample_list[0].shape[1]
    dims = list(subset) if subset is not None else list(range(D))
    n = len(dims)

    fig_opts = _prepare_fig_options(fig_kwargs)
    lim = _resolve_limits(limits, sample_list, D, fig_opts.x_lim_add_eps)
    diag_modes, diag_opts = _prepare_cell_kwargs(
        diag, num_sets, get_default_diag_kwargs, diag_kwargs
    )
    for k in range(num_sets):
        diag_opts[k].setdefault("mpl_kwargs", {}).setdefault(
            "color", fig_opts.samples_colors[k % len(fig_opts.samples_colors)]
        )

    if axes is None:
        fig, axes = plt.subplots(
            1, n, figsize=figsize, squeeze=False, **fig_opts.subplots
        )
        axes = axes[0]
    axes = np.ravel(np.asarray(axes, dtype=object))
    for j, dj in enumerate(dims):
        ax = axes[j]
        for k, s in enumerate(sample_list):
            _draw_diag_cell(ax, s[:, dj], diag_modes[k], diag_opts[k])
        if points is not None:
            for pi, p in enumerate(_to_np_points_list(points, D)):
                ax.axvline(
                    p.reshape(-1, D)[0, dj],
                    color=fig_opts.points_colors[
                        pi % len(fig_opts.points_colors)
                    ],
                    **fig_opts.points_diag,
                )
        if labels is not None:
            ax.set_xlabel(labels[dj])
        ax.set_xlim(lim[dj])
        if ticks is not None:
            t = np.asarray(ticks)
            ax.set_xticks(np.asarray(t[dj] if t.ndim > 1 else t, dtype=float))
    if fig_opts.title:
        fig.suptitle(fig_opts.title, **fig_opts.title_format)
    return fig, axes


def conditional_pairplot(
    density,
    condition,
    limits,
    points=None,
    subset=None,
    resolution: int = 50,
    figsize=(10, 10),
    labels=None,
    **kwargs,
):
    """Pairplot of 2D/1D conditionals of a density (ref plot.py:1135)."""
    import matplotlib.pyplot as plt

    from .conditional_density import eval_conditional_density

    condition = np.asarray(condition).reshape(1, -1)
    D = condition.shape[1]
    dims = list(subset) if subset is not None else list(range(D))
    n = len(dims)
    limits = np.asarray(limits)
    if limits.ndim == 1:
        limits = np.tile(limits, (D, 1))
    fig, axes = plt.subplots(n, n, figsize=figsize, squeeze=False)
    for i, di in enumerate(dims):
        for j, dj in enumerate(dims):
            ax = axes[i][j]
            if i == j:
                probs, grid = eval_conditional_density(
                    density, condition, limits, di, di, resolution=resolution
                )
                ax.plot(grid, np.asarray(probs))
                ax.set_xlim(limits[di])
            else:
                probs, (gx, gy) = eval_conditional_density(
                    density, condition, limits, di, dj, resolution=resolution,
                    return_grids=True,
                )
                ax.imshow(
                    np.asarray(probs),
                    origin="lower",
                    extent=(limits[dj][0], limits[dj][1], limits[di][0], limits[di][1]),
                    aspect="auto",
                )
            if labels is not None:
                if i == n - 1:
                    ax.set_xlabel(labels[dj])
                if j == 0:
                    ax.set_ylabel(labels[di])
    return fig, axes


def conditional_marginal_plot(density, condition, limits, resolution: int = 50,
                              figsize=(10, 2), labels=None, **kwargs):
    import matplotlib.pyplot as plt

    from .conditional_density import eval_conditional_density

    condition = np.asarray(condition).reshape(1, -1)
    D = condition.shape[1]
    limits = np.asarray(limits)
    if limits.ndim == 1:
        limits = np.tile(limits, (D, 1))
    fig, axes = plt.subplots(1, D, figsize=figsize, squeeze=False)
    for j in range(D):
        probs, grid = eval_conditional_density(
            density, condition, limits, j, j, resolution=resolution
        )
        axes[0][j].plot(grid, np.asarray(probs))
        if labels is not None:
            axes[0][j].set_xlabel(labels[j])
    return fig, axes


# ---------------------------------------------------------------------------
# Diagnostic plots
# ---------------------------------------------------------------------------


def sbc_rank_plot(
    ranks,
    num_posterior_samples: int,
    num_bins: Optional[int] = None,
    plot_type: str = "cdf",
    parameter_labels: Optional[Sequence[str]] = None,
    fig=None,
    ax=None,
    **kwargs,
):
    """SBC rank uniformity plot (ref plot.py:1627): histogram or ECDF with
    uniform confidence band."""
    import matplotlib.pyplot as plt
    import scipy.stats as st

    ranks = np.asarray(ranks)
    if ranks.ndim == 1:
        ranks = ranks[:, None]
    N, M = ranks.shape
    if fig is None or ax is None:
        fig, ax = plt.subplots(1, M, figsize=(3 * M, 3), squeeze=False)
        ax = ax[0]
    for m in range(M):
        a = ax[m]
        label = parameter_labels[m] if parameter_labels else f"dim {m}"
        if plot_type == "hist":
            nb = num_bins or max(N // 20, 10)
            a.hist(ranks[:, m], bins=nb, density=True, histtype="step")
            a.axhline(1.0 / (num_posterior_samples + 1) * nb / nb, ls="--", c="gray")
        else:
            sorted_r = np.sort(ranks[:, m]) / num_posterior_samples
            ecdf = np.arange(1, N + 1) / N
            a.plot(sorted_r, ecdf - sorted_r, label=label)
            # 95% band for uniform ECDF deviation
            eps = 1.36 / np.sqrt(N)
            a.fill_between([0, 1], -eps, eps, alpha=0.2, color="gray")
        a.set_title(label)
    return fig, ax


def plot_tarp(ecp, alpha, title: str = "TARP", fig=None, ax=None):
    import matplotlib.pyplot as plt

    if fig is None or ax is None:
        fig, ax = plt.subplots(figsize=(4, 4))
    ax.plot(np.asarray(alpha), np.asarray(ecp), label="TARP")
    ax.plot([0, 1], [0, 1], "k--", label="ideal")
    ax.set_xlabel("credibility level")
    ax.set_ylabel("expected coverage")
    ax.set_title(title)
    ax.legend()
    return fig, ax


def pp_plot(scores: Sequence, true_scores, ax=None, **kwargs):
    """Probability-probability plot of null vs observed score CDFs."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(4, 4))
    alphas = np.linspace(0, 1, 100)
    for i, s in enumerate(_to_np_list(scores)):
        quantiles = np.quantile(s, alphas)
        emp = np.mean(np.asarray(true_scores)[None, :] <= quantiles[:, None], axis=1)
        ax.plot(alphas, emp, alpha=0.5, color="gray" if i else "C0")
    ax.plot([0, 1], [0, 1], "k--")
    return ax


def pp_plot_lc2st(probs, probs_null, ax=None, **kwargs):
    """LC2ST pp-plot: predicted-probability CDFs vs null trials."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(4, 4))
    alphas = np.linspace(0, 1, 100)
    for p in _to_np_list(probs_null):
        ax.plot(alphas, [np.mean(p <= a) for a in alphas], color="gray", alpha=0.3)
    for p in _to_np_list(probs):
        ax.plot(alphas, [np.mean(p <= a) for a in alphas], color="C0")
    ax.plot([0, 1], [0, 1], "k--")
    return ax


def marginal_plot_with_probs_intensity(
    probs_per_marginal: dict,
    marginal_dim: int,
    ax=None,
    n_bins: int = 20,
    **kwargs,
):
    """Scatter/heat of classifier probabilities over marginals (LC2ST viz)."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    s = np.asarray(probs_per_marginal["s"])
    if marginal_dim == 1:
        t = np.asarray(probs_per_marginal["theta_1"])
        ax.scatter(t, s, c=s, cmap="coolwarm", vmin=0, vmax=1, s=4)
    else:
        t1 = np.asarray(probs_per_marginal["theta_1"])
        t2 = np.asarray(probs_per_marginal["theta_2"])
        ax.scatter(t1, t2, c=s, cmap="coolwarm", vmin=0, vmax=1, s=4)
    return ax


def plot_summary(inference, tags: Sequence[str] = ("validation_loss",), figsize=(6, 3)):
    """Plot training summary curves from a trainer (ref tensorboard_output)."""
    import matplotlib.pyplot as plt

    summary = inference.summary if hasattr(inference, "summary") else inference
    fig, axes = plt.subplots(1, len(tags), figsize=figsize, squeeze=False)
    for i, tag in enumerate(tags):
        axes[0][i].plot(summary[tag])
        axes[0][i].set_title(tag)
        axes[0][i].set_xlabel("epoch")
    return fig, axes


def list_all_logs(log_dir: Optional[str] = None):
    import os

    root = log_dir or os.path.join(os.path.expanduser("~"), ".sbi_tpu", "logs")
    out = []
    for dirpath, _, filenames in os.walk(root):
        out.extend(os.path.join(dirpath, f) for f in filenames)
    return out
