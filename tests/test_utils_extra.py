"""Utility-layer unit tests: transforms, KDE, gradient ascent / MAP,
tracking, and the shipped minimal examples (counterparts of
`tests/transforms_test.py`, `tests/kde_test.py`, `tests/torchutils_test.py`,
reference `examples/minimal.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.utils.distributions import (
    BoxUniform,
    MultipleIndependent,
    MultivariateNormal,
)
from sbi_tpu.utils.kde import get_kde
from sbi_tpu.utils.sbiutils import gradient_ascent, seed_all_backends
from sbi_tpu.utils.transforms import mcmc_transform


@pytest.mark.parametrize(
    "prior",
    [
        BoxUniform(-2 * jnp.ones(3), 2 * jnp.ones(3)),
        MultivariateNormal(jnp.zeros(3), covariance_matrix=jnp.eye(3)),
        MultipleIndependent(
            [
                BoxUniform(jnp.zeros(1), jnp.ones(1)),
                MultivariateNormal(jnp.zeros(2), covariance_matrix=jnp.eye(2)),
            ]
        ),
    ],
    ids=["box", "mvn", "multiple_independent"],
)
def test_mcmc_transform_round_trip(prior):
    """forward/inverse must be mutually inverse on prior samples, and the
    unconstrained image must be finite (ref sbiutils.py:814-930)."""
    seed_all_backends(0)
    theta = prior.sample(jax.random.PRNGKey(0), (100,))
    tt = mcmc_transform(prior)
    u = tt.forward(theta)
    assert bool(jnp.isfinite(u).all())
    back = tt.inverse(u)
    assert jnp.allclose(back, theta, atol=1e-4), float(
        jnp.abs(back - theta).max()
    )
    # extreme unconstrained values map INTO the support
    extreme = 20.0 * jnp.ones_like(u[:2])
    inside = tt.inverse(extreme)
    assert bool(jnp.isfinite(prior.log_prob(inside)).all())


def test_kde_matches_gaussian():
    """KDE on N(1, 0.5^2 I) samples: log_prob close to analytic, resampling
    reproduces the moments (ref utils/kde.py:16-48)."""
    seed_all_backends(0)
    mean, std = 1.0, 0.5
    samples = mean + std * jax.random.normal(jax.random.PRNGKey(0), (2000, 2))
    kde = get_kde(samples, bandwidth="scott")
    grid = jnp.array([[1.0, 1.0], [0.0, 0.0], [2.0, 2.0]])
    analytic = jnp.sum(
        -0.5 * ((grid - mean) / std) ** 2
        - jnp.log(std)
        - 0.5 * jnp.log(2 * jnp.pi),
        axis=1,
    )
    lp = kde.log_prob(grid)
    # KDE smoothing biases tail densities upward; 0.6 nats covers it
    assert jnp.allclose(lp, analytic, atol=0.6), (lp, analytic)
    draws = kde.sample(jax.random.PRNGKey(1), (4000,))
    assert jnp.allclose(draws.mean(0), mean, atol=0.1)
    assert jnp.allclose(draws.std(0), std, atol=0.12)


def test_kde_cv_bandwidth_and_transform():
    seed_all_backends(0)
    prior = BoxUniform(jnp.zeros(2), jnp.ones(2))
    samples = 0.5 + 0.1 * jax.random.normal(jax.random.PRNGKey(2), (500, 2))
    samples = jnp.clip(samples, 1e-3, 1 - 1e-3)
    kde = get_kde(samples, bandwidth="cv", transform=mcmc_transform(prior))
    draws = kde.sample(jax.random.PRNGKey(3), (1000,))
    # transformed KDE respects the support
    assert bool((draws >= 0).all() and (draws <= 1).all())
    assert bool(jnp.isfinite(kde.log_prob(samples[:10])).all())


def test_gradient_ascent_finds_map():
    """Multi-start ascent on a quadratic potential must find its argmax
    (ref sbiutils.py:1104-1231)."""
    mode = jnp.array([0.7, -1.3])

    def potential(theta):
        return -jnp.sum((theta - mode) ** 2, axis=-1)

    inits = jax.random.normal(jax.random.PRNGKey(0), (50, 2)) * 3
    argmax, maxval = gradient_ascent(potential, inits, num_iter=300)
    assert jnp.allclose(argmax.squeeze(), mode, atol=1e-2)
    assert float(maxval) > -1e-3


def test_posterior_map():
    """posterior.map() on an analytic potential recovers the mode."""
    from sbi_tpu.inference.posteriors.mcmc_posterior import MCMCPosterior
    from sbi_tpu.inference.potentials.base_potential import (
        CustomPotentialWrapper,
    )

    prior = BoxUniform(-3 * jnp.ones(2), 3 * jnp.ones(2))
    mode = jnp.array([0.4, -0.9])

    def potential(theta, x_o=None):
        return -jnp.sum((theta - mode) ** 2, axis=-1)

    post = MCMCPosterior(
        CustomPotentialWrapper(potential, prior=prior),
        proposal=prior,
        num_chains=10,
        warmup_steps=20,
    ).set_default_x(jnp.zeros(2))
    m = post.map(num_iter=300, num_init_samples=100, init_method="proposal")
    assert jnp.allclose(m.squeeze(), mode, atol=5e-2), m


def test_trackers_record_training():
    """InMemoryTracker receives train/val metrics from the Adam loop; the
    TensorBoard adapter degrades gracefully without tensorboardX
    (ref sbi_types.py:59-80, utils/tracking.py:13-40)."""
    from sbi_tpu.inference import NPE
    from sbi_tpu.utils.tracking import InMemoryTracker

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(2), 2 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (300,))
    x = theta + 0.3 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    tracker = InMemoryTracker()
    inf = NPE(prior=prior, tracker=tracker)
    inf.append_simulations(theta, x).train(
        training_batch_size=50, max_num_epochs=3, stop_after_epochs=3
    )
    assert {"train_loss", "validation_loss"} <= set(tracker.metrics), (
        tracker.metrics
    )


@pytest.mark.slow
def test_examples_minimal():
    """The shipped examples must run end to end (ref examples/minimal.py)."""
    from sbi_tpu.examples.minimal import flexible, simple

    seed_all_backends(0)
    for fn in (simple, flexible):
        s = fn()
        assert s.shape[0] == 100 and bool(jnp.isfinite(s).all()), fn.__name__


def test_profiling_helpers(tmp_path):
    """Profiling hooks: trace context writes a capture, timed() blocks on
    device work, Timer phases accumulate (utils/profiling.py)."""
    from sbi_tpu.utils.profiling import Timer, annotate, timed, trace

    @jax.jit
    def f(a):
        return (a @ a.T).sum()

    a = jax.random.normal(jax.random.PRNGKey(0), (64, 64))
    out, dt = timed(f, a, warmup=1, iters=2)
    assert jnp.isfinite(out) and dt > 0

    timer = Timer()
    with timer.phase("matmul") as ph:
        ph.value = f(a)  # timer blocks on device output before stopping
    assert timer.summary()["matmul"]["calls"] == 1

    logdir = str(tmp_path / "prof")
    with trace(logdir):
        with annotate("traced-matmul"):
            f(a).block_until_ready()
    import os

    assert any(os.scandir(logdir)), "no profiler capture written"


def test_training_summary():
    from sbi_tpu.inference import NPE
    from sbi_tpu.utils.profiling import training_summary

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(2), 2 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (300,))
    x = theta + 0.3 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    inf = NPE(prior=prior)
    inf.append_simulations(theta, x).train(
        training_batch_size=50, max_num_epochs=4, stop_after_epochs=4
    )
    digest = training_summary(inf, batch_size=50)
    assert digest["epochs"] == 4 and digest["total_train_s"] > 0
    assert digest["steps_per_sec"] > 0


def test_orbax_checkpointing(tmp_path):
    """Orbax training-state checkpoint round-trips params/opt state and
    counters; training resumes from the restored state
    (utils/checkpointing.py)."""
    from sbi_tpu.inference import NPE
    from sbi_tpu.utils.checkpointing import (
        restore_training_state,
        save_training_state,
    )

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(2), 2 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (300,))
    x = theta + 0.3 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    inf = NPE(prior=prior)
    inf.append_simulations(theta, x).train(
        training_batch_size=50, max_num_epochs=3, stop_after_epochs=10
    )
    path = str(tmp_path / "ckpt")
    save_training_state(path, inf)

    inf2 = NPE(prior=prior)
    inf2.append_simulations(theta, x).train(
        training_batch_size=50, max_num_epochs=1, stop_after_epochs=10
    )
    restore_training_state(path, inf2)
    assert inf2._epoch == inf._epoch
    p1 = jax.tree_util.tree_leaves(inf._neural_net.params)
    p2 = jax.tree_util.tree_leaves(inf2._neural_net.params)
    assert all(jnp.allclose(a, b) for a, b in zip(p1, p2))
    # resumes and keeps training from the restored epoch counter
    inf2.train(training_batch_size=50, max_num_epochs=5, stop_after_epochs=10,
               resume_training=True)
    assert inf2._epoch >= inf._epoch
