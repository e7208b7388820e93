"""Deep SBC/TARP behavioral grids — counterpart of the reference's
`tests/sbc_test.py` (reduce_fns x prior grid `:68-150`, accuracy `:207-240`,
checks `:242-270`, plotting grid `:272-304`) and `tests/tarp_test.py`
(correct/overdispersed/underdispersed/biased detection `:132-232`).

Uses an ANALYTIC conjugate-Gaussian fake posterior (prior N(0, I),
likelihood x|theta ~ N(theta, I) => posterior N(x/2, I/2)) whose dispersion
and bias are controlled exactly — no training noise in the assertions.
"""

import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pytest

from sbi_tpu.analysis import sbc_rank_plot
from sbi_tpu.diagnostics.sbc import check_sbc, run_sbc
from sbi_tpu.diagnostics.tarp import check_tarp, run_tarp

D = 3
N = 120
L = 300  # posterior samples per observation


class _AnalyticPosterior:
    """Posterior N(bias + x/2 * 1, scale^2 * I/2) with exact log_prob."""

    def __init__(self, scale=1.0, bias=0.0):
        self.scale = scale
        self.bias = bias

    def _moments(self, x):
        mean = self.bias + x / 2.0
        std = self.scale * jnp.sqrt(0.5)
        return mean, std

    def sample(self, sample_shape, x, key=None, **kw):
        x = jnp.atleast_2d(x)[0]
        mean, std = self._moments(x)
        n = int(np.prod(sample_shape))
        s = mean + std * jax.random.normal(key, (n, D))
        return s.reshape(tuple(sample_shape) + (D,))

    def sample_batched(self, sample_shape, xs, key=None, **kw):
        xs = jnp.atleast_2d(xs)
        mean, std = self._moments(xs)  # (N, D)
        n = int(np.prod(sample_shape))
        s = mean[None] + std * jax.random.normal(key, (n, xs.shape[0], D))
        return s.reshape(tuple(sample_shape) + (xs.shape[0], D))

    def log_prob(self, theta, x=None, **kw):
        x = jnp.atleast_2d(x)
        mean, std = self._moments(x)
        z = (theta - mean) / std
        return (-0.5 * z**2 - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi)).sum(-1)


def _sbc_data(seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    thetas = jax.random.normal(k1, (N, D))
    xs = thetas + jax.random.normal(k2, (N, D))
    return thetas, xs


# ------------------------------------------------------------------ TARP ----
def test_tarp_calibrated_passes():
    """ref tarp_test.py:132-154: the exact posterior yields ecp ~ alpha."""
    thetas, xs = _sbc_data()
    ecp, alpha = run_tarp(thetas, xs, _AnalyticPosterior(),
                          num_posterior_samples=L,
                          key=jax.random.PRNGKey(1))
    atc, ks_pval = check_tarp(ecp, alpha)
    assert abs(atc) < 1.0, atc
    assert ks_pval > 0.05, ks_pval
    assert float(jnp.abs(ecp - alpha).max()) < 0.12


@pytest.mark.parametrize("scale,label", [(2.0, "overdispersed"),
                                         (0.4, "underdispersed")])
def test_tarp_detects_dispersion(scale, label):
    """ref tarp_test.py:188-216: wrong posterior width fails the KS check,
    with opposite-signed area deviation for the two directions."""
    thetas, xs = _sbc_data()
    ecp, alpha = run_tarp(thetas, xs, _AnalyticPosterior(scale=scale),
                          num_posterior_samples=L, num_bins=100,
                          key=jax.random.PRNGKey(2))
    atc, ks_pval = check_tarp(ecp, alpha)
    assert ks_pval < 0.05, (label, ks_pval)
    assert abs(atc) > 3.0, (label, atc)
    assert float(jnp.abs(ecp - alpha).max()) > 0.15
    # overdispersed: every credible region over-covers => ecp above alpha
    if scale > 1:
        assert atc > 0
    else:
        assert atc < 0


def test_tarp_detects_bias():
    """ref tarp_test.py:218-232."""
    thetas, xs = _sbc_data()
    ecp, alpha = run_tarp(thetas, xs, _AnalyticPosterior(bias=2.0),
                          num_posterior_samples=L, num_bins=100,
                          key=jax.random.PRNGKey(3))
    atc, ks_pval = check_tarp(ecp, alpha)
    assert ks_pval < 0.05
    assert abs(atc) > 3.0


def test_tarp_custom_references_and_bins():
    thetas, xs = _sbc_data()
    refs = jax.random.uniform(jax.random.PRNGKey(4), thetas.shape)
    ecp, alpha = run_tarp(thetas, xs, _AnalyticPosterior(),
                          references=refs, num_posterior_samples=L,
                          num_bins=None, z_score_theta=False,
                          key=jax.random.PRNGKey(5))
    assert ecp.shape == alpha.shape == (N // 10,)


# ------------------------------------------------------------------- SBC ----
def test_sbc_calibrated_marginal_ranks_uniform():
    """ref sbc_test.py:207-240: exact posterior => uniform ranks, passing
    KS p-values and dap ~ prior (c2st ~ 0.5)."""
    thetas, xs = _sbc_data()
    ranks, dap = run_sbc(thetas, xs, _AnalyticPosterior(),
                         num_posterior_samples=L,
                         key=jax.random.PRNGKey(6))
    assert ranks.shape == (N, D) and dap.shape == (N, D)
    checks = check_sbc(ranks, thetas, dap, num_posterior_samples=L)
    assert (np.asarray(checks["ks_pvals"]) > 0.05).all(), checks["ks_pvals"]
    assert (np.asarray(checks["c2st_dap"]) < 0.62).all()


def test_sbc_detects_underdispersion():
    """Overconfident posterior => U-shaped ranks => KS rejects."""
    thetas, xs = _sbc_data()
    ranks, dap = run_sbc(thetas, xs, _AnalyticPosterior(scale=0.4),
                         num_posterior_samples=L,
                         key=jax.random.PRNGKey(7))
    checks = check_sbc(ranks, thetas, dap, num_posterior_samples=L)
    assert (np.asarray(checks["ks_pvals"]) < 0.05).all()


@pytest.mark.parametrize("reduce_fns", ["log_prob", "callable"])
def test_sbc_reduce_fns(reduce_fns):
    """ref sbc_test.py:68-150: log-prob ranks (expected coverage) and a
    user-supplied reduction both give one rank column per metric."""
    thetas, xs = _sbc_data()
    post = _AnalyticPosterior()
    if reduce_fns == "callable":
        fns = lambda theta, x: theta.sum(-1)  # noqa: E731
    else:
        fns = "log_prob"
    ranks, _ = run_sbc(thetas, xs, post, num_posterior_samples=L,
                       reduce_fns=fns, key=jax.random.PRNGKey(8))
    assert ranks.shape == (N, 1)
    # calibrated posterior: these ranks are uniform too
    checks = check_sbc(ranks, thetas, thetas, num_posterior_samples=L)
    assert (np.asarray(checks["ks_pvals"]) > 0.01).all()


@pytest.mark.parametrize("plot_type", ["cdf", "hist"])
@pytest.mark.parametrize("num_bins", [None, 20])
def test_sbc_plotting_grid(plot_type, num_bins):
    """ref sbc_test.py:272-304."""
    ranks = np.random.RandomState(0).randint(0, L, (N, D))
    fig, ax = sbc_rank_plot(ranks=ranks, num_posterior_samples=L,
                            plot_type=plot_type, num_bins=num_bins,
                            parameter_labels=[f"$p_{i}$" for i in range(D)])
    plt.close(fig)


def test_sbc_unbatched_sampling_fallback():
    """use_batched_sampling=False exercises the per-observation loop (ref
    sbc_test.py:341-370) and must agree with the batched path's contract."""
    thetas, xs = _sbc_data()
    ranks, dap = run_sbc(thetas[:30], xs[:30], _AnalyticPosterior(),
                         num_posterior_samples=150,
                         use_batched_sampling=False,
                         key=jax.random.PRNGKey(9))
    assert ranks.shape == (30, D)
    assert bool((ranks >= 0).all()) and bool((ranks <= 150).all())
