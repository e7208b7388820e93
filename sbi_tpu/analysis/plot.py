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
        return [np.asarray(s) for s in samples]
    return [np.asarray(samples)]


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


def _draw_diag(ax, vals, color, mode, hist_opts, kde_opts, scatter_opts):
    if mode in (None, "none"):
        return
    if mode == "kde":
        g, d = _kde_1d(vals, kde_opts.num_points, kde_opts.bw_method)
        ax.plot(g, d, color=color)
    elif mode == "scatter":
        ax.scatter(vals, np.zeros_like(vals), s=scatter_opts.s,
                   alpha=scatter_opts.alpha, color=color)
    else:  # hist
        ax.hist(vals, bins=hist_opts.bins, density=hist_opts.density,
                histtype=hist_opts.histtype, color=color)


def _draw_offdiag(ax, xs, ys, color, mode, hist_opts, kde_opts,
                  scatter_opts, contour_opts):
    if mode in (None, "none"):
        return
    if mode == "contour":
        _hist2d_contour(ax, xs, ys, levels=contour_opts.levels, color=color,
                        bins=hist_opts.bins,
                        percentile=contour_opts.percentile)
    elif mode == "kde":
        _kde2d_contour(ax, xs, ys, levels=contour_opts.levels, color=color,
                       bw_method=kde_opts.bw_method,
                       percentile=contour_opts.percentile)
    elif mode == "scatter":
        ax.scatter(xs, ys, s=scatter_opts.s, alpha=scatter_opts.alpha,
                   color=color)
    elif mode == "hist2d" or mode == "hist":
        ax.hist2d(xs, ys, bins=hist_opts.bins, cmap="Blues")
    else:
        raise ValueError(f"Unknown off-diagonal mode '{mode}'")


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
    fig=None,
    axes=None,
    hist_options: Optional[HistOptions] = None,
    kde_options: Optional[KdeOptions] = None,
    scatter_options: Optional[ScatterOptions] = None,
    contour_options: Optional[ContourOptions] = None,
    fig_kwargs: Optional[dict] = None,
    **kwargs,
):
    """Corner plot of posterior samples (ref plot.py:156). Returns (fig, axes).

    `upper`/`lower`/`diag` accept a mode string ("hist", "kde", "scatter",
    "contour", "hist2d", None) or a list of modes, one per sample set.
    `lower=None` mirrors `upper` into the lower triangle (the reference's
    corner layout uses lower cells; passing `lower` explicitly enables
    split upper/lower rendering). Option dataclasses control each mark;
    `fig_kwargs` is forwarded to `plt.subplots`.
    """
    import matplotlib.pyplot as plt

    hist_opts = hist_options or HistOptions(**kwargs.get("hist_kwargs", {}))
    kde_opts = kde_options or KdeOptions(**kwargs.get("kde_kwargs", {}))
    scatter_opts = scatter_options or ScatterOptions(**kwargs.get("scatter_kwargs", {}))
    contour_opts = contour_options or ContourOptions(**kwargs.get("contour_kwargs", {}))

    sample_list = _to_np_list(samples)
    D = sample_list[0].shape[1]
    dims = list(subset) if subset is not None else list(range(D))
    n = len(dims)
    if axes is None:
        fig, axes = plt.subplots(n, n, figsize=figsize, squeeze=False,
                                 **(fig_kwargs or {}))
    colors = [f"C{i}" for i in range(len(sample_list))]
    lower_spec = lower if lower is not None else upper

    for i, di in enumerate(dims):
        for j, dj in enumerate(dims):
            ax = axes[i][j]
            if i == j:
                for k, (s, c) in enumerate(zip(sample_list, colors)):
                    _draw_diag(ax, s[:, di], c, _mode_for(diag, k, "hist"),
                               hist_opts, kde_opts, scatter_opts)
                if points is not None:
                    for p in _to_np_list(points):
                        ax.axvline(p.reshape(-1, D)[0, di], color="k", ls="--")
            else:
                spec = upper if j > i else lower_spec
                if spec is None:
                    ax.axis("off")
                    continue
                for k, (s, c) in enumerate(zip(sample_list, colors)):
                    _draw_offdiag(ax, s[:, dj], s[:, di], c,
                                  _mode_for(spec, k, "hist"),
                                  hist_opts, kde_opts, scatter_opts,
                                  contour_opts)
                if points is not None:
                    for p in _to_np_list(points):
                        p2 = p.reshape(-1, D)
                        ax.plot(p2[0, dj], p2[0, di], "k*", markersize=8)
            if limits is not None:
                lim = np.asarray(limits)
                ax.set_xlim(lim[dj] if lim.ndim > 1 else lim)
                if i != j:
                    ax.set_ylim(lim[di] if lim.ndim > 1 else lim)
            if ticks is not None:
                t = np.asarray(ticks)
                ax.set_xticks(t[dj] if t.ndim > 1 else t)
                if i != j:
                    ax.set_yticks(t[di] if t.ndim > 1 else t)
            if labels is not None:
                if i == n - 1:
                    ax.set_xlabel(labels[dj])
                if j == 0:
                    ax.set_ylabel(labels[di])
    return fig, axes


def marginal_plot(
    samples,
    points=None,
    limits=None,
    subset=None,
    diag: str = "hist",
    figsize: Tuple[int, int] = (10, 2),
    labels=None,
    fig=None,
    axes=None,
    **kwargs,
):
    """1D marginals in a row (ref plot.py:57)."""
    import matplotlib.pyplot as plt

    sample_list = _to_np_list(samples)
    D = sample_list[0].shape[1]
    dims = list(subset) if subset is not None else list(range(D))
    n = len(dims)
    if axes is None:
        fig, axes = plt.subplots(1, n, figsize=figsize, squeeze=False)
        axes = axes[0]
    for j, dj in enumerate(dims):
        ax = axes[j]
        for k, s in enumerate(sample_list):
            if diag == "kde":
                g, d = _kde_1d(s[:, dj])
                ax.plot(g, d, color=f"C{k}")
            else:
                ax.hist(s[:, dj], bins=50, density=True, histtype="step",
                        color=f"C{k}")
        if points is not None:
            for p in _to_np_list(points):
                ax.axvline(p.reshape(-1, D)[0, dj], color="k", ls="--")
        if labels is not None:
            ax.set_xlabel(labels[dj])
        if limits is not None:
            lim = np.asarray(limits)
            ax.set_xlim(lim[dj if lim.ndim > 1 else 0])
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
