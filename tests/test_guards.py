"""Guard tests: loss finite checks, rejection timeouts, starvation fill
(counterparts of the reference's `assert_all_finite` usage in losses
`npe_c.py:399-419` and `rejection.py:286-340` timeout behavior)."""

import warnings

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from sbi_tpu.inference import NPE
from sbi_tpu.samplers.rejection.rejection import accept_reject_sample
from sbi_tpu.utils.distributions import BoxUniform
from sbi_tpu.utils.sbiutils import seed_all_backends


def test_nan_loss_raises():
    """A NaN smuggled into the training data must abort training loudly,
    not silently propagate through the fused epoch scan."""
    seed_all_backends(0)
    prior = BoxUniform(-jnp.ones(2), jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (300,))
    x = theta + 0.1 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    inference = NPE(prior=prior, density_estimator="mdn")
    # exclude_invalid_x=False keeps a NaN row in the training set
    x = x.at[7, 0].set(jnp.nan)
    inference.append_simulations(theta, x, exclude_invalid_x=False)
    with pytest.raises(AssertionError, match="NaN/Inf"):
        inference.train(max_num_epochs=5)


def test_accept_reject_max_sampling_time_partial_return():
    """Timeout must warn and return partial samples (ref rejection.py:286)."""
    import time

    def slow_proposal(key, n):
        time.sleep(0.05)
        return jax.random.normal(key, (n, 2))

    def rare_accept(s):
        return s[:, 0] > 2.5  # ~0.6% acceptance

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        samples, _ = accept_reject_sample(
            slow_proposal,
            rare_accept,
            num_samples=100_000,
            key=jax.random.PRNGKey(0),
            sample_batch_size=1000,
            max_sampling_time=0.2,
        )
    assert samples.shape[0] < 100_000
    assert any("max_sampling_time" in str(x.message) for x in w)


def test_sample_batched_starvation_falls_back_to_mcmc():
    """A leaking observation gets exact truncated-posterior samples via the
    automatic vectorized MCMC fallback — NOT duplicated rejection draws
    (round-2 VERDICT item 4: duplicate-filling silently corrupts SBC/TARP).
    """
    seed_all_backends(0)
    prior = BoxUniform(-jnp.ones(2), jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (600,))
    x = theta + 0.05 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    inference = NPE(prior=prior, density_estimator="mdn")
    inference.append_simulations(theta, x)
    inference.train(max_num_epochs=30)
    posterior = inference.build_posterior()
    # x outside the data manifold leaks; a tiny budget forces starvation
    xs = jnp.stack([jnp.zeros(2), 1.3 * jnp.ones(2)])
    samples = posterior.sample_batched(
        (50,), xs, key=jax.random.PRNGKey(3), max_total_proposals=512
    )
    assert samples.shape == (50, 2, 2)
    # every returned sample is inside the prior box and finite
    assert bool(jnp.isfinite(samples).all())
    assert float(jnp.abs(samples).max()) <= 1.0 + 1e-5
    # the MCMC fill must produce (nearly) unique draws for the starved
    # observation, unlike duplicate-resampling
    for b in range(2):
        uniq = np.unique(np.asarray(samples[:, b, 0])).size
        assert uniq > 40, (b, uniq)


def test_sample_batched_starvation_policy_raise():
    seed_all_backends(0)
    prior = BoxUniform(-jnp.ones(2), jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (600,))
    x = theta + 0.05 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    inference = NPE(prior=prior, density_estimator="mdn")
    inference.append_simulations(theta, x)
    inference.train(max_num_epochs=30)
    posterior = inference.build_posterior()
    xs = jnp.stack([jnp.zeros(2), 1.5 * jnp.ones(2)])
    with pytest.raises(RuntimeError, match="starved"):
        posterior.sample_batched(
            (50,), xs, key=jax.random.PRNGKey(3),
            max_total_proposals=512, starvation_policy="raise",
        )
