"""User-input processing tests (counterpart of
`tests/user_input_checks_test.py` + `multiprocessing_test.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from sbi_tpu.utils import BoxUniform, MultipleIndependent
from sbi_tpu.utils.distributions import Gamma
from sbi_tpu.utils.simulation_utils import simulate_for_sbi
from sbi_tpu.utils.user_input_checks import (
    check_sbi_inputs,
    process_prior,
    process_simulator,
    process_x,
)


def test_process_prior_native():
    prior, dim, is_np = process_prior(BoxUniform(-jnp.ones(3), jnp.ones(3)))
    assert dim == 3 and not is_np


def test_process_prior_sequence():
    prior, dim, _ = process_prior([Gamma(2.0, 1.0), BoxUniform(-jnp.ones(2), jnp.ones(2))])
    assert isinstance(prior, MultipleIndependent)
    assert dim == 3


def test_process_prior_scipy():
    prior, dim, is_np = process_prior(st.multivariate_normal(np.zeros(2), np.eye(2)))
    assert dim == 2 and is_np
    s = prior.sample(jax.random.PRNGKey(0), (5,))
    assert s.shape == (5, 2)
    assert bool(jnp.isfinite(prior.log_prob(s)).all())


def test_process_prior_rejects_unbatched():
    from sbi_tpu.utils.distributions import Normal

    with pytest.raises(ValueError):
        process_prior(Normal(0.0, 1.0))


def test_process_simulator_batched_and_unbatched():
    prior, _, _ = process_prior(BoxUniform(-jnp.ones(2), jnp.ones(2)))

    def batched(theta, key=None):
        return theta * 2.0

    sim = process_simulator(batched, prior, False)
    out = sim(prior.sample(jax.random.PRNGKey(0), (7,)))
    assert out.shape == (7, 2)

    def unbatched(theta):  # numpy, single-sample simulator
        assert np.asarray(theta).ndim == 1
        return np.asarray(theta) + 1.0

    sim2 = process_simulator(unbatched, prior, True)
    out2 = sim2(prior.sample(jax.random.PRNGKey(1), (5,)))
    assert out2.shape == (5, 2)
    check_sbi_inputs(sim2, prior)


def test_simulate_for_sbi_workers():
    """num_workers>1 exercises the joblib host-pool path (ref
    `tests/multiprocessing_test.py:31`)."""
    prior = BoxUniform(-jnp.ones(2), jnp.ones(2))

    def sim(theta, key=None):
        return np.asarray(theta) + 0.1

    theta, x = simulate_for_sbi(sim, prior, 64, num_workers=2)
    assert theta.shape == (64, 2) and x.shape == (64, 2)
    assert np.allclose(np.asarray(x), np.asarray(theta) + 0.1, atol=1e-6)


def test_process_x():
    assert process_x(jnp.zeros(3)).shape == (1, 3)
    assert process_x(jnp.zeros((4, 3))).shape == (4, 3)
    assert process_x(jnp.zeros((2, 2)), x_event_shape=(2, 2)).shape == (1, 2, 2)
