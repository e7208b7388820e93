"""Minimal smoke pipelines (ref `sbi/examples/minimal.py:14-53`): the
documented install test."""

import jax
import jax.numpy as jnp


def simple():
    """Simple interface: one-call infer()."""
    from sbi_tpu.inference import infer
    from sbi_tpu.utils import BoxUniform
    from sbi_tpu.utils.sbiutils import next_key

    num_dim = 3
    prior = BoxUniform(low=-2 * jnp.ones(num_dim), high=2 * jnp.ones(num_dim))

    def simulator(theta, key=None):
        return theta + 1.0 + 0.1 * jax.random.normal(next_key(key), theta.shape)

    posterior = infer(simulator, prior, method="NPE", num_simulations=500,
                      train_kwargs=dict(max_num_epochs=40))
    observation = jnp.zeros(3)
    posterior_samples = posterior.sample((100,), x=observation)
    return posterior_samples


def flexible():
    """Flexible interface: explicit simulate/append/train/build."""
    from sbi_tpu.inference import NPE, simulate_for_sbi
    from sbi_tpu.utils import BoxUniform
    from sbi_tpu.utils.sbiutils import next_key
    from sbi_tpu.utils.user_input_checks import (
        check_sbi_inputs,
        process_prior,
        process_simulator,
    )

    num_dim = 3
    prior = BoxUniform(low=-2 * jnp.ones(num_dim), high=2 * jnp.ones(num_dim))

    def simulator(theta, key=None):
        return theta + 1.0 + 0.1 * jax.random.normal(next_key(key), theta.shape)

    prior, num_parameters, prior_returns_numpy = process_prior(prior)
    simulator = process_simulator(simulator, prior, prior_returns_numpy)
    check_sbi_inputs(simulator, prior)

    inference = NPE(prior=prior)
    theta, x = simulate_for_sbi(simulator, proposal=prior, num_simulations=500)
    inference = inference.append_simulations(theta, x)
    density_estimator = inference.train(max_num_epochs=40)
    posterior = inference.build_posterior(density_estimator)

    observation = jnp.zeros(3)
    posterior_samples = posterior.sample((100,), x=observation)
    return posterior_samples
