"""Guard tests: loss finite checks, rejection timeouts, starvation fill
(counterparts of the reference's `assert_all_finite` usage in losses
`npe_c.py:399-419` and `rejection.py:286-340` timeout behavior)."""

import warnings

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


def test_sample_batched_starvation_fills_by_resampling():
    """A leaking observation warns and fills rows with accepted draws."""
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
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        samples = posterior.sample_batched(
            (50,), xs, key=jax.random.PRNGKey(3), max_rejection_rounds=2
        )
    assert any("resampling accepted draws" in str(x.message) for x in w)
    assert samples.shape == (50, 2, 2)
    # every returned sample is inside the prior box (no zero-padding rows
    # pretending to be draws -- zero IS inside the box, so check spread)
    assert bool(jnp.isfinite(samples).all())
    assert float(jnp.abs(samples).max()) <= 1.0 + 1e-5
