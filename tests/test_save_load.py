"""Serialization + resume tests (counterpart of
`tests/save_and_load_test.py:33-70`): pickle trainer and posterior
mid-workflow, reload, continue."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.inference import NPE
from sbi_tpu.simulators.linear_gaussian import linear_gaussian
from sbi_tpu.utils.distributions import MultivariateNormal
from sbi_tpu.utils.sbiutils import seed_all_backends


def _setup():
    seed_all_backends(0)
    D = 2
    prior = MultivariateNormal(jnp.zeros(D), covariance_matrix=jnp.eye(D))
    theta = prior.sample(jax.random.PRNGKey(0), (600,))
    x = linear_gaussian(theta, -jnp.ones(D), 0.3 * jnp.eye(D),
                        key=jax.random.PRNGKey(1))
    return prior, theta, x


def test_pickle_trainer_and_resume(tmp_path):
    prior, theta, x = _setup()
    inf = NPE(prior=prior, density_estimator="mdn")
    inf.append_simulations(theta, x)
    inf.train(max_num_epochs=5, training_batch_size=100)
    epochs_before = inf._epoch

    path = tmp_path / "trainer.pkl"
    inf.save(str(path))
    inf2 = NPE.load(str(path))

    # state preserved
    assert inf2._epoch == epochs_before
    assert len(inf2._theta_roundwise) == 1
    # resume training continues from stored epoch + optimizer state
    inf2.train(max_num_epochs=8, resume_training=True, training_batch_size=100)
    assert inf2._epoch > epochs_before
    posterior = inf2.build_posterior()
    s = posterior.sample((50,), x=jnp.zeros((1, 2)), key=jax.random.PRNGKey(2))
    assert s.shape == (50, 2)


def test_pickle_posterior(tmp_path):
    prior, theta, x = _setup()
    inf = NPE(prior=prior, density_estimator="mdn")
    inf.append_simulations(theta, x).train(max_num_epochs=10, training_batch_size=100)
    posterior = inf.build_posterior().set_default_x(jnp.zeros((1, 2)))
    s1 = posterior.sample((100,), key=jax.random.PRNGKey(3))

    path = tmp_path / "posterior.pkl"
    with open(path, "wb") as f:
        pickle.dump(posterior, f)
    with open(path, "rb") as f:
        posterior2 = pickle.load(f)

    s2 = posterior2.sample((100,), key=jax.random.PRNGKey(3))
    assert np.allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    lp1 = posterior.log_prob(s1[:10])
    lp2 = posterior2.log_prob(s1[:10])
    assert np.allclose(np.asarray(lp1), np.asarray(lp2), atol=1e-4)


def test_best_params_restored_after_training():
    """Early stopping must restore the best-validation params."""
    prior, theta, x = _setup()
    inf = NPE(prior=prior, density_estimator="mdn")
    inf.append_simulations(theta, x)
    inf.train(training_batch_size=100, stop_after_epochs=5, max_num_epochs=60)
    assert inf._best_val_loss <= min(inf._summary["validation_loss"]) + 1e-6
