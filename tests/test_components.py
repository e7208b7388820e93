"""Component tests for round-1 'implemented but unexercised' paths:
MNLE/MNPE mixed estimation, EnsemblePosterior, Rejection/Importance
posteriors, RestrictionEstimator, MarginalTrainer (refs: tests/mnle_test.py,
ensemble_test.py, rejection tests, restriction tests in the reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.simulators.linear_gaussian import (
    linear_gaussian,
    true_posterior_linear_gaussian_mvn_prior,
)
from sbi_tpu.utils.distributions import BoxUniform, MultivariateNormal
from sbi_tpu.utils.metrics import c2st
from sbi_tpu.utils.sbiutils import seed_all_backends

D = 2
SHIFT = -1.0 * jnp.ones(D)


def _analytic_samples(x_o, n=800, key=5):
    return true_posterior_linear_gaussian_mvn_prior(
        x_o, SHIFT, jnp.eye(D), jnp.zeros(D), jnp.eye(D)
    ).sample(jax.random.PRNGKey(key), (n,))


@pytest.fixture(scope="module")
def lg_data():
    seed_all_backends(0)
    prior = MultivariateNormal(jnp.zeros(D), jnp.eye(D))
    theta = prior.sample(jax.random.PRNGKey(0), (2500,))
    x = linear_gaussian(theta, SHIFT, jnp.eye(D), key=jax.random.PRNGKey(1))
    return prior, theta, x


def test_mnle_mixed_roundtrip():
    """MNLE on a decision-model-like simulator: continuous rt + binary
    choice (ref tests/mnle_test.py)."""
    from sbi_tpu.inference import MNLE

    seed_all_backends(0)
    prior = BoxUniform(jnp.array([-2.0, -2.0]), jnp.array([2.0, 2.0]))
    theta = prior.sample(jax.random.PRNGKey(0), (3000,))
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    rt = theta[:, :1] + 0.3 * jax.random.normal(k1, (3000, 1))
    choice = jax.random.bernoulli(
        k2, jax.nn.sigmoid(2.0 * theta[:, 1:2])
    ).astype(jnp.float32)
    x = jnp.concatenate([rt, choice], axis=1)  # [continuous, discrete]

    inf = MNLE(prior=prior, num_discrete=1)
    inf.append_simulations(theta, x)
    inf.train(max_num_epochs=60, training_batch_size=200)
    # likelihood sanity: P(choice=1 | theta2 large) >> P(choice=1 | small)
    est = inf._neural_net
    xq = jnp.array([[0.0, 1.0]])
    t_hi = jnp.array([[0.0, 1.5]])
    t_lo = jnp.array([[0.0, -1.5]])
    lp_hi = float(est.log_prob(xq[None], t_hi)[0, 0])
    lp_lo = float(est.log_prob(xq[None], t_lo)[0, 0])
    assert lp_hi > lp_lo
    # posterior recovery around the true parameters
    truth = jnp.array([0.5, 1.0])
    x_o = jnp.array([[0.5, 1.0]])
    posterior = inf.build_posterior().set_default_x(x_o)
    samples = posterior.sample(
        (400,), key=jax.random.PRNGKey(3), num_chains=50, warmup_steps=100
    )
    mean = np.asarray(samples.mean(0))
    assert abs(mean[0] - float(truth[0])) < 0.5
    assert mean[1] > 0.0  # choice=1 pulls theta2 positive


def test_mnpe_mixed_posterior():
    """MNPE with mixed theta = [continuous, binary] (continuous-first
    layout, ref mnpe.py:53-55)."""
    from sbi_tpu.inference import MNPE

    seed_all_backends(0)
    n = 3000
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    theta_c = jax.random.uniform(k1, (n, 1), minval=-1, maxval=1)
    theta_d = jax.random.bernoulli(k2, 0.5, (n, 1)).astype(jnp.float32)
    theta = jnp.concatenate([theta_c, theta_d], axis=1)
    x = theta_c + 2.0 * theta_d + 0.1 * jax.random.normal(k3, (n, 1))

    prior = BoxUniform(jnp.array([-1.0, 0.0]), jnp.array([1.0, 1.0]))
    inf = MNPE(prior=prior, num_discrete=1)
    inf.append_simulations(theta, x)
    inf.train(max_num_epochs=60, training_batch_size=200)
    posterior = inf.build_posterior().set_default_x(jnp.array([[2.2]]))
    s = posterior.sample((300,), key=jax.random.PRNGKey(4))
    s = np.asarray(s)
    # x=2.2 is only reachable with theta_d=1 (theta_c in [-1,1])
    assert set(np.unique(s[:, 1].round(3))).issubset({0.0, 1.0})
    assert s[:, 1].mean() > 0.8
    assert abs(s[s[:, 1] > 0.5][:, 0].mean() - 0.2) < 0.35


def test_ensemble_posterior(lg_data):
    from sbi_tpu.inference import NPE, EnsemblePosterior

    prior, theta, x = lg_data
    posteriors = []
    for seed in (0, 1):
        seed_all_backends(seed)
        inf = NPE(prior=prior, density_estimator="mdn")
        inf.append_simulations(theta, x)
        inf.train(max_num_epochs=40, training_batch_size=200)
        posteriors.append(inf.build_posterior())
    ens = EnsemblePosterior(posteriors, weights=[0.5, 0.5])
    x_o = jnp.zeros(D)
    ens.set_default_x(x_o)
    samples = ens.sample((800,), key=jax.random.PRNGKey(2))
    assert float(c2st(samples, _analytic_samples(x_o))) <= 0.6
    lp = ens.log_prob(samples[:16])
    assert lp.shape == (16,) and bool(jnp.isfinite(lp).all())


def test_rejection_and_importance_posteriors(lg_data):
    """Rejection/ImportanceSampling posteriors over an NLE potential
    recover the analytic posterior."""
    from sbi_tpu.inference import (
        NLE,
        ImportanceSamplingPosterior,
        RejectionPosterior,
        likelihood_estimator_based_potential,
    )

    prior, theta, x = lg_data
    seed_all_backends(0)
    inf = NLE(prior=prior)
    inf.append_simulations(theta, x)
    inf.train(max_num_epochs=60, training_batch_size=200)
    x_o = jnp.zeros((1, D))
    potential_fn, theta_transform = likelihood_estimator_based_potential(
        inf._neural_net, prior, x_o
    )
    ref = _analytic_samples(jnp.zeros(D))

    rej = RejectionPosterior(potential_fn, proposal=prior,
                             theta_transform=theta_transform)
    rej.set_default_x(x_o)
    s = rej.sample((800,), key=jax.random.PRNGKey(1))
    assert float(c2st(s, ref)) <= 0.62

    imp = ImportanceSamplingPosterior(
        potential_fn, proposal=prior, theta_transform=theta_transform,
        method="sir", oversampling_factor=32,
    )
    imp.set_default_x(x_o)
    s2 = imp.sample((800,), key=jax.random.PRNGKey(2))
    assert float(c2st(s2, ref)) <= 0.62


def test_restriction_estimator_excludes_invalid_region():
    """RestrictionEstimator learns the invalid-theta region and
    RestrictedPrior avoids it (ref restriction_estimator.py:66,613)."""
    from sbi_tpu.utils.restriction_estimator import RestrictionEstimator

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(2), 2 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (2000,))
    # simulations fail (NaN) whenever theta_0 > 0.5
    x = jnp.where(
        (theta[:, :1] > 0.5), jnp.nan, theta.sum(axis=1, keepdims=True)
    )
    restr = RestrictionEstimator(prior=prior)
    restr.append_simulations(theta, x)
    restr.train(max_num_epochs=80)
    restricted = restr.restrict_prior()
    s = restricted.sample(jax.random.PRNGKey(1), (500,))
    frac_invalid = float((s[:, 0] > 0.6).mean())
    assert frac_invalid < 0.1, f"{frac_invalid} of samples in invalid region"


def test_marginal_trainer_fits_density():
    from sbi_tpu.inference import MarginalTrainer

    seed_all_backends(0)
    mean = jnp.array([1.0, -1.0])
    x = mean + jax.random.normal(jax.random.PRNGKey(0), (3000, 2)) * jnp.array(
        [0.5, 1.5]
    )
    trainer = MarginalTrainer()
    trainer.append_simulations(x)
    trainer.train(max_num_epochs=80, training_batch_size=200)
    est = trainer.build_estimator()
    samples = est.sample((2000,), key=jax.random.PRNGKey(1))
    m = np.asarray(samples.reshape(-1, 2).mean(0))
    sd = np.asarray(samples.reshape(-1, 2).std(0))
    assert np.allclose(m, np.asarray(mean), atol=0.25)
    assert np.allclose(sd, [0.5, 1.5], atol=0.35)
    lp = est.log_prob(x[:10])
    assert bool(jnp.isfinite(lp).all())


def test_ensemble_product_of_experts(lg_data):
    """'product' potential combination averages member log-potentials
    (product of experts); sampling it via MCMC recovers the analytic
    posterior at least as well as either NLE member alone."""
    from sbi_tpu.inference import NLE_A, EnsemblePosterior, MCMCPosterior

    prior, theta, x = lg_data
    posteriors = []
    for seed in (3, 4):
        seed_all_backends(seed)
        inf = NLE_A(prior=prior)
        inf.append_simulations(theta, x)
        inf.train(max_num_epochs=40, training_batch_size=200)
        posteriors.append(inf.build_posterior())
    x_o = jnp.zeros(D)
    ens = EnsemblePosterior(posteriors, potential_combination="product")
    ens.set_default_x(x_o)
    # PoE sampling routes through MCMC on the combined potential
    # automatically (pass-through mixing would give mixture samples).
    samples = ens.sample(
        (800,), key=jax.random.PRNGKey(9), num_chains=40, warmup_steps=100
    )
    score = float(c2st(samples, _analytic_samples(x_o)))
    assert score <= 0.6, score
    # product potential == mean of member potentials
    th = samples[:32]
    lp = ens.potential_fn(th)
    member = jnp.stack([p.potential_fn(th) for p in posteriors]).mean(0)
    assert jnp.allclose(lp, member, atol=1e-4)


def test_ensemble_weight_by_evidence(lg_data):
    """`weight_by_evidence` (no reference counterpart — the reference only
    takes static user weights, `ensemble_posterior.py:19`): with one member
    trained on the true simulator and one on a misspecified (shifted)
    simulator, the Monte-Carlo model evidence at x_o must route the mixture
    weight to the well-specified member. (An *undertrained* member is NOT
    punished — a net that learns only the marginal p(x) has the same
    evidence as the true model — so the test uses miscalibration.)"""
    from sbi_tpu.inference import NLE_A, EnsemblePosterior
    from sbi_tpu.simulators.linear_gaussian import linear_gaussian as lg_sim

    prior, theta, x = lg_data
    x_bad = lg_sim(
        theta, SHIFT + 3.0, jnp.eye(D), key=jax.random.PRNGKey(11)
    )
    posteriors = []
    for seed, xs in ((3, x), (4, x_bad)):
        seed_all_backends(seed)
        inf = NLE_A(prior=prior)
        inf.append_simulations(theta, xs)
        inf.train(max_num_epochs=40, training_batch_size=200)
        posteriors.append(inf.build_posterior())
    ens = EnsemblePosterior(posteriors)
    logz = ens.weight_by_evidence(
        x=jnp.zeros(D), num_samples=4000, key=jax.random.PRNGKey(0)
    )
    assert logz.shape == (2,)
    assert bool(jnp.isfinite(logz).all())
    w = np.asarray(ens.weights)
    # analytic evidence gap for a 3-sigma shift in 2-D is ~1.5 nats
    # => softmax weight ~0.82 for the well-specified member
    assert w[0] > 0.7, w
    # the combined potential sees the same weights
    assert np.allclose(np.asarray(ens.potential_fn._weights), w)


@pytest.mark.slow
def test_mnle_c2st_vs_grid_analytic_posterior():
    """MNLE C2ST integration test vs an ANALYTIC posterior (round-2 VERDICT
    item 8; ref tests/mnle_test.py protocol): mixed likelihood with
    tractable density — rt ~ N(theta1, 0.3^2), choice ~ Bern(sigmoid(2
    theta2)) — whose 2-D posterior we grid-integrate exactly."""
    from sbi_tpu.inference import MNLE
    from sbi_tpu.utils.metrics import c2st

    seed_all_backends(0)
    prior = BoxUniform(jnp.array([-2.0, -2.0]), jnp.array([2.0, 2.0]))
    n = 8000
    theta = prior.sample(jax.random.PRNGKey(0), (n,))
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    rt = theta[:, :1] + 0.3 * jax.random.normal(k1, (n, 1))
    choice = jax.random.bernoulli(
        k2, jax.nn.sigmoid(2.0 * theta[:, 1:2])
    ).astype(jnp.float32)
    x = jnp.concatenate([rt, choice], axis=1)

    inf = MNLE(prior=prior, num_discrete=1)
    inf.append_simulations(theta, x)
    inf.train(training_batch_size=200, epoch_chunk=5, stop_after_epochs=30)

    x_o = jnp.array([[0.5, 1.0]])
    posterior = inf.build_posterior().set_default_x(x_o)
    samples = posterior.sample(
        (1000,), key=jax.random.PRNGKey(3), num_chains=100, warmup_steps=200,
        thin=2,
    )

    # Exact posterior on a grid (likelihood factorizes over dims).
    g = np.linspace(-2.0, 2.0, 401)
    lp1 = -0.5 * ((0.5 - g) / 0.3) ** 2  # rt likelihood in theta1
    p2 = 1.0 / (1.0 + np.exp(-2.0 * g))  # P(choice=1 | theta2)
    w1 = np.exp(lp1 - lp1.max()); w1 /= w1.sum()
    w2 = p2 / p2.sum()
    rng = np.random.default_rng(0)
    dx = g[1] - g[0]
    t1 = rng.choice(g, size=1000, p=w1) + rng.uniform(-dx/2, dx/2, 1000)
    t2 = rng.choice(g, size=1000, p=w2) + rng.uniform(-dx/2, dx/2, 1000)
    ref = np.column_stack([t1, t2])

    score = float(c2st(samples, jnp.asarray(ref, jnp.float32)))
    assert 0.5 - 0.1 < score < 0.5 + 0.12, score


@pytest.mark.slow
def test_mnpe_c2st_vs_grid_analytic_posterior():
    """MNPE C2ST vs the same tractable mixed-parameter posterior class
    (binary theta_d mixture over two Gaussian branches, grid-exact)."""
    from sbi_tpu.inference import MNPE
    from sbi_tpu.utils.metrics import c2st

    seed_all_backends(0)
    n = 8000
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    theta_c = jax.random.uniform(k1, (n, 1), minval=-1, maxval=1)
    theta_d = jax.random.bernoulli(k2, 0.5, (n, 1)).astype(jnp.float32)
    theta = jnp.concatenate([theta_c, theta_d], axis=1)
    sigma = 0.3
    x = theta_c + 1.0 * theta_d + sigma * jax.random.normal(k3, (n, 1))

    prior = BoxUniform(jnp.array([-1.0, 0.0]), jnp.array([1.0, 1.0]))
    inf = MNPE(prior=prior, num_discrete=1)
    inf.append_simulations(theta, x)
    inf.train(training_batch_size=200, epoch_chunk=5, stop_after_epochs=30)
    x_o = jnp.array([[0.6]])
    posterior = inf.build_posterior().set_default_x(x_o)
    samples = np.asarray(posterior.sample((1000,), key=jax.random.PRNGKey(4)))

    # Exact: p(theta_c, d | x) ∝ N(x; theta_c + d, sigma^2) on the box.
    g = np.linspace(-1.0, 1.0, 401)
    rng = np.random.default_rng(1)
    w = []
    for d in (0.0, 1.0):
        w.append(np.exp(-0.5 * ((0.6 - g - d) / sigma) ** 2))
    W = np.stack(w)  # (2, G)
    pd = W.sum(axis=1) / W.sum()
    ref_d = rng.choice([0.0, 1.0], size=1000, p=pd)
    dx = g[1] - g[0]
    ref_c = np.empty(1000)
    for i, d in enumerate(ref_d):
        row = W[int(d)] / W[int(d)].sum()
        ref_c[i] = rng.choice(g, p=row) + rng.uniform(-dx/2, dx/2)
    ref = np.column_stack([ref_c, ref_d]).astype(np.float32)

    score = float(c2st(jnp.asarray(samples), jnp.asarray(ref)))
    assert 0.5 - 0.1 < score < 0.5 + 0.12, score
