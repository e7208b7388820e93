"""Deep sbiutils grids — counterpart of `tests/sbiutils_test.py` cells not
already pinned elsewhere (z-scoring semantics `:369-546`, handle_invalid_x
`:~`, mog_log_prob vs scipy `:~`, within_support, standardizing transform
round trips). z_score_parser + outlier warnings live in
tests/test_nan_simulator.py; KDE + mcmc_transform in tests/test_utils_extra.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.utils import BoxUniform
from sbi_tpu.utils.distributions import Gamma, MultivariateNormal
from sbi_tpu.utils.sbiutils import (
    handle_invalid_x,
    mog_log_prob,
    standardizing_transform,
    within_support,
    z_score_stats,
)


# ------------------------------------------------------------- z-scoring ----
def test_z_score_stats_independent_vs_structured():
    """structured = ONE scalar mean/std across event dims (images);
    independent = per-dim (ref sbiutils.py z_score semantics)."""
    x = jnp.stack([jnp.zeros(4), jnp.arange(4.0) * 10]).T + jnp.array([0.0, 5.0])
    m_i, s_i = z_score_stats(x, structured=False)
    assert m_i.shape == (2,) and not bool(jnp.allclose(m_i[0], m_i[1]))
    m_s, s_s = z_score_stats(x, structured=True)
    assert bool(jnp.allclose(m_s, m_s[0])) and bool(jnp.allclose(s_s, s_s[0]))


def test_z_score_stats_constant_feature_clipped():
    """A constant column must not produce std=0 (division guard)."""
    x = jnp.concatenate([jnp.ones((50, 1)),
                         jnp.linspace(0, 1, 50)[:, None]], axis=1)
    _, s = z_score_stats(x)
    assert float(s[0]) > 0


@pytest.mark.parametrize("structured", [False, True])
def test_standardizing_transform_round_trip(structured):
    x = jax.random.normal(jax.random.PRNGKey(0), (100, 3)) * 5 + 2
    tf = standardizing_transform(x, structured=structured)
    z = tf.forward(x)
    if not structured:
        assert bool(jnp.allclose(z.mean(0), 0.0, atol=1e-4))
        assert bool(jnp.allclose(z.std(0), 1.0, atol=1e-3))
    back = tf.inv(z)
    assert bool(jnp.allclose(back, x, atol=1e-4))


def test_builders_share_structured_stats():
    """posterior_nn(z_score_x='structured') must standardize the condition
    with scalar stats — per-pixel stats would destroy image structure
    (ref sbiutils_test.py:444-546)."""
    from sbi_tpu.neural_nets.factory import posterior_nn

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    theta = jax.random.normal(k1, (64, 2))
    # x with wildly different per-dim scales
    x = jax.random.normal(k2, (64, 4)) * jnp.array([1.0, 10.0, 100.0, 0.1])
    est = posterior_nn("mdn", z_score_x="structured")(theta, x)
    tf = est.condition_transform
    z = tf.forward(x)
    # structured: one shared scale => relative per-dim spread preserved
    ratios = z.std(0) / x.std(0)
    assert bool(jnp.allclose(ratios, ratios[0], rtol=1e-3))


# ------------------------------------------------------- invalid-x masks ----
@pytest.mark.parametrize("exclude", [True, False])
def test_handle_invalid_x_counts_and_mask(exclude):
    x = jnp.array([[1.0, 2.0], [jnp.nan, 0.0], [jnp.inf, 1.0], [3.0, 4.0]])
    is_valid, n_nan, n_inf = handle_invalid_x(x, exclude_invalid_x=exclude)
    assert (n_nan, n_inf) == (1, 1)
    if exclude:
        assert is_valid.tolist() == [True, False, False, True]
    else:
        assert bool(is_valid.all())


def test_handle_invalid_x_multidim_events():
    x = jnp.zeros((3, 2, 2)).at[1, 1, 1].set(jnp.nan)
    is_valid, n_nan, n_inf = handle_invalid_x(x)
    assert is_valid.tolist() == [True, False, True]


# --------------------------------------------------------- within_support ----
def test_within_support_box_and_unbounded():
    box = BoxUniform(-jnp.ones(2), jnp.ones(2))
    s = jnp.array([[0.0, 0.0], [2.0, 0.0], [-0.5, 0.99]])
    assert within_support(box, s).tolist() == [True, False, True]
    mvn = MultivariateNormal(jnp.zeros(2), jnp.eye(2))
    assert bool(within_support(mvn, s).all())
    # a batched (non-joint) distribution keeps per-dim masks, like the
    # reference's torch batch semantics
    gamma = Gamma(jnp.ones(2), jnp.ones(2))
    s2 = jnp.array([[0.5, 0.5], [-0.1, 0.5]])
    assert within_support(gamma, s2).tolist() == [[True, True], [False, True]]


# ------------------------------------------------------------ mog_log_prob ----
def test_mog_log_prob_matches_dense_computation():
    """ref sbiutils_test mog tests: the precision-factor parameterization
    agrees with an explicit mixture computed via scipy."""
    from scipy import stats

    rng = np.random.RandomState(0)
    D, K, B = 3, 2, 5
    logits_row = rng.randn(K)
    means_row = rng.randn(K, D)
    precs = []
    for _ in range(K):
        A = rng.randn(D, D) * 0.3
        L = np.tril(A, -1) + np.diag(np.exp(A.diagonal()))
        precs.append(L @ L.T)  # SPD precision
    precs_row = np.stack(precs)  # (K, D, D)
    theta = rng.randn(B, D)

    lp = mog_log_prob(
        jnp.asarray(theta),
        jnp.asarray(np.tile(logits_row, (B, 1))),
        jnp.asarray(np.tile(means_row, (B, 1, 1))),
        jnp.asarray(np.tile(precs_row, (B, 1, 1, 1))),
    )

    w = np.exp(logits_row)
    w = w / w.sum()
    expected = []
    for t in theta:
        p = 0.0
        for k in range(K):
            cov = np.linalg.inv(precs_row[k])
            p += w[k] * stats.multivariate_normal.pdf(t, means_row[k], cov)
        expected.append(np.log(p))
    assert np.allclose(np.asarray(lp), expected, atol=1e-4)
