"""Pickle round-trip for EVERY posterior type (ref
`tests/save_and_load_test.py:33-70` covers the same contract)."""

import pickle

import jax
import jax.numpy as jnp
import pytest

from sbi_tpu.simulators.linear_gaussian import linear_gaussian
from sbi_tpu.utils.distributions import MultivariateNormal
from sbi_tpu.utils.sbiutils import seed_all_backends

D = 2


@pytest.fixture(scope="module")
def trained():
    seed_all_backends(0)
    prior = MultivariateNormal(jnp.zeros(D), jnp.eye(D))
    theta = prior.sample(jax.random.PRNGKey(0), (800,))
    x = linear_gaussian(
        theta, jnp.zeros(D), jnp.eye(D), key=jax.random.PRNGKey(1)
    )
    return prior, theta, x


def _roundtrip_and_sample(posterior, x_o, n=32, **kwargs):
    blob = pickle.dumps(posterior)
    loaded = pickle.loads(blob)
    if x_o is not None:
        loaded.set_default_x(x_o)
    s = loaded.sample((n,), key=jax.random.PRNGKey(9), **kwargs)
    assert s.shape[0] == n
    assert bool(jnp.isfinite(s).all())
    return loaded


def _npe(trained, estimator="mdn"):
    from sbi_tpu.inference import NPE

    prior, theta, x = trained
    inf = NPE(prior=prior, density_estimator=estimator)
    inf.append_simulations(theta, x)
    inf.train(max_num_epochs=15, training_batch_size=200)
    return inf


def test_direct_posterior_pickle(trained):
    post = _npe(trained).build_posterior()
    _roundtrip_and_sample(post, jnp.zeros(D))


def test_mcmc_posterior_pickle(trained):
    from sbi_tpu.inference import NLE

    prior, theta, x = trained
    inf = NLE(prior=prior)
    inf.append_simulations(theta, x)
    inf.train(max_num_epochs=15, training_batch_size=200)
    post = inf.build_posterior(sample_with="mcmc")
    _roundtrip_and_sample(post, jnp.zeros(D), num_chains=16, warmup_steps=30)


def test_rejection_posterior_pickle(trained):
    from sbi_tpu.inference import NLE

    prior, theta, x = trained
    inf = NLE(prior=prior)
    inf.append_simulations(theta, x)
    inf.train(max_num_epochs=15, training_batch_size=200)
    post = inf.build_posterior(sample_with="rejection")
    _roundtrip_and_sample(post, jnp.zeros(D))


def test_importance_posterior_pickle(trained):
    from sbi_tpu.inference import NLE

    prior, theta, x = trained
    inf = NLE(prior=prior)
    inf.append_simulations(theta, x)
    inf.train(max_num_epochs=15, training_batch_size=200)
    post = inf.build_posterior(sample_with="importance")
    _roundtrip_and_sample(post, jnp.zeros(D))


def test_vi_posterior_pickle(trained):
    from sbi_tpu.inference import NLE

    prior, theta, x = trained
    inf = NLE(prior=prior)
    inf.append_simulations(theta, x)
    inf.train(max_num_epochs=15, training_batch_size=200)
    post = inf.build_posterior(sample_with="vi")
    post.set_default_x(jnp.zeros(D))
    post.train(max_num_iters=200, key=jax.random.PRNGKey(0))
    _roundtrip_and_sample(post, None)


def test_ensemble_posterior_pickle(trained):
    from sbi_tpu.inference import EnsemblePosterior

    p1 = _npe(trained).build_posterior()
    p2 = _npe(trained).build_posterior()
    ens = EnsemblePosterior([p1, p2])
    _roundtrip_and_sample(ens, jnp.zeros(D))


def test_vector_field_posterior_pickle(trained):
    from sbi_tpu.inference import FMPE

    prior, theta, x = trained
    inf = FMPE(prior=prior)
    inf.append_simulations(theta, x)
    inf.train(max_num_epochs=15, training_batch_size=200)
    post = inf.build_posterior()
    _roundtrip_and_sample(post, jnp.zeros(D), steps=40)


def test_npe_a_posterior_pickle(trained):
    from sbi_tpu.inference import NPE_A

    prior, theta, x = trained
    inf = NPE_A(prior=prior)
    inf.append_simulations(theta, x)
    inf.train(max_num_epochs=15, training_batch_size=200, final_round=True)
    post = inf.build_posterior()
    _roundtrip_and_sample(post, jnp.zeros(D))


def test_filtered_direct_posterior_pickle(trained):
    from sbi_tpu.inference.posteriors.filtered_direct_posterior import (
        FilteredDirectPosterior,
    )

    prior, theta, x = trained
    inf = _npe(trained)
    post = FilteredDirectPosterior(
        inf._neural_net.snapshot_estimator()
        if hasattr(inf._neural_net, "snapshot_estimator")
        else inf._neural_net,
        prior,
        filter_quantile=0.1,
    )
    _roundtrip_and_sample(post, jnp.zeros(D))
