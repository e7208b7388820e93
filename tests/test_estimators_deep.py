"""Deep shape/broadcast/correctness grids for density estimators —
counterpart of the reference's `tests/density_estimator_test.py`
combinatorial cells (loss shapes `:148-177`, embedding+2-D condition events
`:179-203`, sample shapes incl. multi-dim `:205-232`, batched-vs-separate
correctness `:343-380`, mixed estimator `:530-560`).
"""

import jax
import jax.numpy as jnp
import pytest

from sbi_tpu.neural_nets.embedding_nets import CNNEmbedding, FCEmbedding
from sbi_tpu.neural_nets.factory import posterior_nn

MODELS = ["mdn", "maf", "nsf"]


def _fit_data(dt, dx, n=64, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    theta = jax.random.normal(k1, (n, dt))
    x = jax.random.normal(k2, (n, dx))
    return theta, x


@pytest.mark.parametrize("model", MODELS)
@pytest.mark.parametrize("input_event", [1, 4])
@pytest.mark.parametrize("condition_event", [1, 7])
@pytest.mark.parametrize("batch_dim", [1, 10])
def test_loss_shapes_grid(model, input_event, condition_event, batch_dim):
    """ref density_estimator_test.py:148-177: loss returns (batch,) for
    every event-dim x batch-dim combination."""
    theta, x = _fit_data(input_event, condition_event)
    est = posterior_nn(model, hidden_features=16, num_transforms=2)(theta, x)
    loss = est.loss(theta[:batch_dim], x[:batch_dim])
    assert loss.shape == (batch_dim,)
    assert bool(jnp.isfinite(loss).all())


@pytest.mark.parametrize("model", MODELS)
@pytest.mark.parametrize("condition_event_shape",
                         [(2, 1), (2, 7), (7, 2), (7, 7)])
def test_log_prob_shapes_with_embedding(model, condition_event_shape):
    """ref density_estimator_test.py:179-203: 2-D condition events require
    an embedding; log_prob keeps the (sample, batch) contract."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    theta = jax.random.normal(k1, (64, 3))
    x = jax.random.normal(k2, (64,) + condition_event_shape)
    emb = FCEmbedding(output_dim=8)
    est = posterior_nn(model, hidden_features=16, num_transforms=2,
                       embedding_net=emb)(theta, x)
    lp = est.log_prob(theta[:6].reshape(2, 3, 3), x[:3])
    assert lp.shape == (2, 3) and bool(jnp.isfinite(lp).all())


@pytest.mark.parametrize("model", MODELS)
@pytest.mark.parametrize("sample_shape", [(), (1,), (2, 3)])
@pytest.mark.parametrize("batch_dim", [1, 10])
def test_sample_shapes_grid(model, sample_shape, batch_dim):
    """ref density_estimator_test.py:205-232: sample() returns
    sample_shape + (batch,) + event for scalar, single and multi-dim
    sample shapes."""
    theta, x = _fit_data(3, 4)
    est = posterior_nn(model, hidden_features=16, num_transforms=2)(theta, x)
    s = est.sample(sample_shape, x[:batch_dim], key=jax.random.PRNGKey(1))
    assert s.shape == tuple(sample_shape) + (batch_dim, 3)
    assert bool(jnp.isfinite(s).all())


@pytest.mark.parametrize("model", MODELS)
def test_sample_and_log_prob_match_separate_calls(model):
    """ref density_estimator_test.py:343-380: sample_and_log_prob's log
    probs equal log_prob evaluated on the returned samples."""
    theta, x = _fit_data(2, 3)
    est = posterior_nn(model, hidden_features=16, num_transforms=2)(theta, x)
    s, lp = est.sample_and_log_prob((5,), x[:4], key=jax.random.PRNGKey(2))
    assert s.shape == (5, 4, 2) and lp.shape == (5, 4)
    lp_sep = est.log_prob(s, x[:4])
    assert jnp.allclose(lp, lp_sep, atol=1e-4)


@pytest.mark.parametrize("model", MODELS)
def test_log_prob_rejects_condition_shape_mismatch(model):
    """Condition trailing shape must match condition_shape — a clear error,
    not silent broadcasting (ref raises in shape-handling utils)."""
    theta, x = _fit_data(2, 3)
    est = posterior_nn(model, hidden_features=16, num_transforms=2)(theta, x)
    with pytest.raises((ValueError, AssertionError, TypeError)):
        est.log_prob(theta[:4][None], x[:4, :2])  # wrong condition event dim


@pytest.mark.parametrize("model", MODELS)
def test_loss_differentiable_everywhere(model):
    """grad of the mean loss is finite for every model — guards against
    non-differentiable kinks (spline knot boundaries, MoG logsumexp)."""
    theta, x = _fit_data(3, 4)
    est = posterior_nn(model, hidden_features=16, num_transforms=2)(theta, x)
    g = jax.grad(lambda p: est.loss_fn(p, theta, x).mean())(est.params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert bool(jnp.isfinite(leaf).all())


@pytest.mark.parametrize("model", ["mdn", "maf", "nsf", "zuko_gf",
                                   "zuko_naf", "zuko_sospf"])
def test_log_prob_integrates_to_one_1d(model):
    """Correctness (ref density_estimator_test.py:238-255): for a 1-D
    input, exp(log_prob) must integrate to ~1 over a wide grid — the
    estimator is a normalized density, not just a score."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    theta = 0.5 * jax.random.normal(k1, (256, 1))
    x = jax.random.normal(k2, (256, 2))
    est = posterior_nn(model, hidden_features=16, num_transforms=2)(theta, x)
    grid = jnp.linspace(-6.0, 6.0, 801).reshape(-1, 1)
    cond = jnp.zeros((1, 2))
    lp = est.log_prob(grid[:, None, :], cond)[:, 0]
    integral = float(jnp.trapezoid(jnp.exp(lp), grid[:, 0]))
    assert abs(integral - 1.0) < 0.05, integral


@pytest.mark.parametrize("sample_shape", [(10,), (1,)])
def test_mixed_density_estimator_shapes(sample_shape):
    """ref density_estimator_test.py:530-560: the mixed (continuous +
    categorical) estimator keeps the same shape contracts."""
    from sbi_tpu.neural_nets.net_builders.mixed_nets import (
        build_categoricalmassestimator,
        build_mnle,
    )

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    theta = jax.random.normal(k1, (128, 2))
    rt = jnp.exp(jax.random.normal(k2, (128, 1)))
    choice = jax.random.bernoulli(k3, 0.5, (128, 1)).astype(jnp.float32)
    x = jnp.concatenate([rt, choice], axis=1)
    est = build_mnle(x, theta)  # input = x (mixed), condition = theta
    lp = est.log_prob(x[:6].reshape(2, 3, 2), theta[:3])
    assert lp.shape == (2, 3) and bool(jnp.isfinite(lp).all())
    s = est.sample(sample_shape, theta[:3], key=jax.random.PRNGKey(1))
    assert s.shape == tuple(sample_shape) + (3, 2)
    # the discrete column stays in {0, 1}
    disc = s[..., 1]
    assert bool(jnp.isin(disc, jnp.array([0.0, 1.0])).all())
    # categorical-only estimator
    cat = build_categoricalmassestimator(choice, theta)
    lp_c = cat.log_prob(choice[:4][None], theta[:4])
    assert lp_c.shape == (1, 4) and bool(jnp.isfinite(lp_c).all())
