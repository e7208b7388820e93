"""Deep pairplot/marginal option grids — counterpart of the reference's
`tests/plot_test.py` (1-D inputs `:26-33`, NaN/Inf tolerance `:35-45`, the
big option product `:47-85`, multi-sample-set cells `:87-104`).
"""

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pytest

from sbi_tpu.analysis import marginal_plot, pairplot

RNG = np.random.RandomState(0)


@pytest.mark.parametrize("limits", [[(-1, 1)], None])
def test_pairplot_1d_samples(limits):
    """ref plot_test.py:26-33: a single-parameter posterior still renders."""
    fig, axes = pairplot(RNG.randn(100, 1), limits=limits, figsize=(3, 3))
    plt.close(fig)


@pytest.mark.parametrize("bad", [np.nan, np.inf])
def test_pairplot_tolerates_nan_inf(bad):
    """ref plot_test.py:35-45: non-finite rows must not crash plotting."""
    samples = RNG.randn(100, 2)
    samples[::17, 0] = bad
    fig, axes = pairplot(samples, figsize=(3, 3))
    plt.close(fig)


@pytest.mark.parametrize("samples", ["single", "list"])
@pytest.mark.parametrize("limits", [[(-3, 3)], None])
@pytest.mark.parametrize("subset", [None, [0, 1]])
@pytest.mark.parametrize("labels", [None, ["a", "b", "c"]])
@pytest.mark.parametrize("ticks", [None, [[-3, 0, 3]] * 3])
@pytest.mark.parametrize("diag_kwargs", [None, {"mpl_kwargs": {"bins": 10}}])
def test_pairplot_option_product(samples, limits, subset, labels, ticks,
                                 diag_kwargs):
    """ref plot_test.py:47-85: the full option product with points overlay
    and legend."""
    data = RNG.randn(100, 3)
    s = data if samples == "single" else [data, data + 0.3]
    fig, axes = pairplot(
        s,
        points=np.ones((1, 3)),
        limits=limits,
        subset=subset,
        upper="scatter",
        diag="hist",
        figsize=(4, 4),
        labels=labels,
        ticks=ticks,
        diag_kwargs=diag_kwargs,
        fig_kwargs={"points_labels": ["obs"], "legend": True},
    )
    n = 2 if subset else 3
    assert np.asarray(axes).shape == (n, n)
    plt.close(fig)


@pytest.mark.parametrize("upper", ["hist", "scatter", "contour", "kde"])
def test_pairplot_multiset_modes(upper):
    """ref plot_test.py:87-104: two sample sets, every off-diagonal mode."""
    a, b = RNG.randn(80, 2), RNG.randn(80, 2) + 1.0
    fig, axes = pairplot([a, b], upper=upper, figsize=(3, 3))
    plt.close(fig)


@pytest.mark.parametrize("diag", ["hist", "kde"])
@pytest.mark.parametrize("points", [None, np.ones(2)])
def test_marginal_plot_grid(diag, points):
    fig, axes = marginal_plot(
        [RNG.randn(80, 2), RNG.randn(80, 2) + 0.5],
        diag=diag, points=points, figsize=(4, 2),
        labels=["x", "y"],
    )
    plt.close(fig)


def test_pairplot_discrete_indices_bar_mode():
    """Mixed continuous/discrete posteriors render bar diagonals for the
    discrete dims (MNPE workflows)."""
    cont = RNG.randn(100, 1)
    disc = RNG.randint(0, 3, (100, 1)).astype(float)
    fig, axes = pairplot(np.concatenate([cont, disc], axis=1),
                         discrete_indices=[1], figsize=(3, 3))
    plt.close(fig)


def test_pairplot_existing_fig_axes_reuse():
    """Passing fig/axes draws into the caller's grid (overlay workflows)."""
    fig, axes = plt.subplots(2, 2, figsize=(3, 3))
    fig2, axes2 = pairplot(RNG.randn(60, 2), fig=fig, axes=axes)
    assert fig2 is fig
    plt.close(fig)
