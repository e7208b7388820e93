"""Deep mixed-density (MNLE/MNPE) grids — counterpart of the reference's
`tests/mnle_test.py` (flow-model grid, log-prob factorization/normalization,
iid-trial mixed potentials, log-transformed continuous parts) and
`tests/mnpe_test.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.neural_nets.net_builders.mixed_nets import build_mnle
from sbi_tpu.utils import BoxUniform
from sbi_tpu.utils.sbiutils import seed_all_backends


def _mixed_data(n=400, seed=0, p_choice=None):
    """theta (n,2); x = [rt, choice]: rt ~ N(theta0, 0.3), choice ~
    Bern(sigmoid(2 theta1))."""
    prior = BoxUniform(jnp.array([-2.0, -2.0]), jnp.array([2.0, 2.0]))
    theta = prior.sample(jax.random.PRNGKey(seed), (n,))
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 1))
    rt = theta[:, :1] + 0.3 * jax.random.normal(k1, (n, 1))
    pr = jax.nn.sigmoid(2.0 * theta[:, 1:2]) if p_choice is None else p_choice
    choice = jax.random.bernoulli(k2, pr, (n, 1)).astype(jnp.float32)
    return prior, theta, jnp.concatenate([rt, choice], axis=1)


@pytest.mark.parametrize("flow_model", ["nsf", "maf"])
def test_mnle_flow_model_grid(flow_model):
    """ref mnle_test.py flow grid: the continuous head is swappable."""
    prior, theta, x = _mixed_data()
    est = build_mnle(x, theta, flow_model=flow_model, hidden_features=16,
                     num_transforms=2)
    lp = est.log_prob(x[:6].reshape(2, 3, 2), theta[:3])
    assert lp.shape == (2, 3) and bool(jnp.isfinite(lp).all())
    s = est.sample((5,), theta[:3], key=jax.random.PRNGKey(0))
    assert s.shape == (5, 3, 2)


def test_mnle_log_prob_is_normalized_over_mixed_domain():
    """sum over the discrete values of the integral over the continuous
    part must be ~1 — the mixed density is a proper density, categorical
    and flow parts correctly composed."""
    prior, theta, x = _mixed_data()
    est = build_mnle(x, theta, hidden_features=16, num_transforms=2)
    cond = theta[:1]
    grid = jnp.linspace(-8.0, 8.0, 601)
    total = 0.0
    for d in (0.0, 1.0):
        pts = jnp.stack([grid, jnp.full_like(grid, d)], axis=-1)  # (G, 2)
        lp = est.log_prob(pts[:, None, :], cond)[:, 0]
        total += float(jnp.trapezoid(jnp.exp(lp), grid))
    assert abs(total - 1.0) < 0.05, total


def test_mnle_factorization_matches_components():
    """log p(x) = log P(disc | theta) + log p(cont | theta, disc) exactly,
    evaluated through the component estimators."""
    prior, theta, x = _mixed_data()
    est = build_mnle(x, theta, hidden_features=16, num_transforms=2)
    q = x[:4]
    cond = theta[:4]
    lp_mixed = est.log_prob(q[None], cond)[0]  # (4,)
    cont, disc = q[:, :1], q[:, 1:]
    lp_disc = est.categorical_estimator.log_prob(disc[None], cond)[0]
    aug = jnp.concatenate([cond, disc], axis=-1)
    lp_cont = est.continuous_estimator.log_prob(cont[None], aug)[0]
    assert jnp.allclose(lp_mixed, lp_disc + lp_cont, atol=1e-4)


def test_mnle_samples_respect_discrete_support():
    prior, theta, x = _mixed_data()
    est = build_mnle(x, theta, hidden_features=16, num_transforms=2)
    s = est.sample((200,), theta[:2], key=jax.random.PRNGKey(1))
    disc = s[..., 1]
    assert bool(jnp.isin(disc, jnp.array([0.0, 1.0])).all())


def test_mnle_iid_trials_tighten_posterior():
    """ref mnle_test.py iid-trial MNLE: conditioning on more mixed trials
    shrinks the posterior around the true parameters."""
    from sbi_tpu.inference import MNLE

    seed_all_backends(0)
    prior, theta, x = _mixed_data(n=2000)
    inf = MNLE(prior=prior, num_discrete=1)
    inf.append_simulations(theta, x)
    inf.train(max_num_epochs=40, training_batch_size=200, epoch_chunk=10)
    posterior = inf.build_posterior()
    truth = jnp.array([[0.5, 1.0]])
    k = jax.random.PRNGKey(5)
    # 8 iid trials at the true parameters
    _, _, x_o8 = _mixed_data(n=8, seed=9)
    rt = truth[:, :1] + 0.3 * jax.random.normal(k, (8, 1))
    ch = jax.random.bernoulli(jax.random.fold_in(k, 1),
                              jax.nn.sigmoid(2.0 * truth[:, 1:2]),
                              (8, 1)).astype(jnp.float32)
    x_o8 = jnp.concatenate([rt, ch], axis=1)
    s8 = posterior.sample((300,), x=x_o8, key=jax.random.PRNGKey(6),
                          num_chains=30, warmup_steps=60)
    s1 = posterior.sample((300,), x=x_o8[:1], key=jax.random.PRNGKey(7),
                          num_chains=30, warmup_steps=60)
    assert float(s8[:, 0].std()) < float(s1[:, 0].std())
    # rt mean identifies theta0
    assert abs(float(s8[:, 0].mean()) - 0.5) < 0.4


def test_mnpe_binary_posterior_dimension():
    """MNPE: mixed PARAMETER space (ref mnpe_test.py) — the posterior
    samples keep the discrete theta column in support."""
    from sbi_tpu.inference import MNPE

    seed_all_backends(0)
    n = 1500
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    # theta = [continuous, binary]; x ~ N(theta_c + theta_b, 0.3)
    theta_c = jax.random.uniform(k1, (n, 1), minval=-1.0, maxval=1.0)
    theta_b = jax.random.bernoulli(k2, 0.5, (n, 1)).astype(jnp.float32)
    theta = jnp.concatenate([theta_c, theta_b], axis=1)
    x = theta_c + theta_b + 0.3 * jax.random.normal(k3, (n, 1))
    prior = BoxUniform(jnp.array([-1.0, 0.0]), jnp.array([1.0, 1.0]))
    inf = MNPE(prior=prior, num_discrete=1)
    inf.append_simulations(theta, x)
    inf.train(max_num_epochs=40, training_batch_size=200, epoch_chunk=10)
    posterior = inf.build_posterior()
    s = posterior.sample((300,), x=jnp.array([1.2]),
                         key=jax.random.PRNGKey(8))
    assert s.shape == (300, 2)
    assert bool(jnp.isin(s[:, 1], jnp.array([0.0, 1.0])).all())
    # x=1.2 is most consistent with theta_b=1 mixed with theta_c>0 or
    # theta_b=0, theta_c near cap; the discrete marginal must not collapse
    # to the wrong value
    assert float(s[:, 1].mean()) > 0.3
