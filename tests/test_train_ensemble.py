"""Vmapped ensemble training (`NeuralInference.train_ensemble`).

TPU-first redesign with no reference counterpart: the reference trains
ensemble members serially (`sbi/inference/posteriors/ensemble_posterior.py:19`
only wraps already-trained posteriors); here K members train as ONE vmapped
XLA program over stacked params.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from sbi_tpu.inference import NLE_A, NPE
from sbi_tpu.simulators.linear_gaussian import (
    diagonal_linear_gaussian,
    true_posterior_linear_gaussian_mvn_prior,
)
from sbi_tpu.utils.distributions import MultivariateNormal
from sbi_tpu.utils.metrics import c2st
from sbi_tpu.utils.sbiutils import seed_all_backends


@pytest.fixture(scope="module")
def lg_data():
    seed_all_backends(0)
    dim = 2
    prior = MultivariateNormal(jnp.zeros(dim), jnp.eye(dim))
    theta = prior.sample(jr.PRNGKey(0), (2500,))
    x = diagonal_linear_gaussian(theta, key=jr.PRNGKey(1))
    return prior, theta, x


def test_train_ensemble_members_differ_and_learn(lg_data):
    prior, theta, x = lg_data
    inf = NPE(prior=prior, density_estimator="mdn")
    inf.append_simulations(theta, x)
    members = inf.train_ensemble(
        num_members=3, max_num_epochs=60, stop_after_epochs=10, epoch_chunk=10
    )
    assert len(members) == 3
    # Members are genuinely different functions (different inits).
    x_test = x[:16]
    t_test = theta[:16]
    lps = [np.asarray(m.log_prob(t_test[None], x_test)[0]) for m in members]
    assert not np.allclose(lps[0], lps[1])
    assert not np.allclose(lps[1], lps[2])
    # All members learned: average NLL well below the prior's entropy rate.
    for lp in lps:
        assert lp.mean() > -3.0
    # Stacked best params recorded for vmapped evaluation.
    stacked = inf._ensemble_stacked_params
    leaves = jax.tree_util.tree_leaves(stacked)
    assert all(leaf.shape[0] == 3 for leaf in leaves)


def test_train_ensemble_posterior_recovers_analytic(lg_data):
    prior, theta, x = lg_data
    inf = NPE(prior=prior)
    inf.append_simulations(theta, x)
    inf.train_ensemble(
        num_members=2, max_num_epochs=150, stop_after_epochs=15, epoch_chunk=10
    )
    posterior = inf.build_ensemble_posterior()
    x_o = jnp.full((1, 2), 1.0)
    samples = posterior.sample((1000,), x=x_o, key=jr.PRNGKey(2))
    ref = true_posterior_linear_gaussian_mvn_prior(
        x_o[0],
        likelihood_shift=jnp.zeros(2),
        likelihood_cov=jnp.eye(2),  # diagonal_linear_gaussian std=1
        prior_mean=jnp.zeros(2),
        prior_cov=jnp.eye(2),
    ).sample(jr.PRNGKey(3), (1000,))
    score = c2st(samples, ref)
    assert 0.5 - 0.1 < float(score) < 0.5 + 0.12, score


def test_train_ensemble_bootstrap_and_nle(lg_data):
    prior, theta, x = lg_data
    inf = NLE_A(prior=prior)
    inf.append_simulations(theta[:600], x[:600])
    members = inf.train_ensemble(
        num_members=2, bootstrap=True, max_num_epochs=30,
        stop_after_epochs=8, epoch_chunk=5,
    )
    assert len(members) == 2
    # summary recorded
    assert inf.summary["epochs_trained"][-1] <= 30
    assert np.isfinite(inf.summary["best_validation_loss"][-1])

@pytest.mark.parametrize("cls_name", ["NRE_A", "NRE_B", "NRE_C", "BNRE"])
def test_train_ensemble_nre_family(lg_data, cls_name):
    """VERDICT r3 item 2: vmapped ensembles cover the NRE family (the
    contrastive atom loss of ref `nre_base.py:375-395`, per member)."""
    import sbi_tpu.inference as inf_mod

    prior, theta, x = lg_data
    inf = getattr(inf_mod, cls_name)(prior=prior)
    inf.append_simulations(theta[:800], x[:800])
    members = inf.train_ensemble(
        num_members=2, max_num_epochs=20, stop_after_epochs=6, epoch_chunk=5
    )
    assert len(members) == 2
    # Members are different functions of (theta, x).
    lr = [
        np.asarray(m.log_ratio_fn(m.params, theta[:8], x[:8])) for m in members
    ]
    assert lr[0].shape == lr[1].shape
    assert not np.allclose(lr[0], lr[1])
    assert np.isfinite(inf.summary["best_validation_loss"][-1])


def test_train_ensemble_nre_posterior_end_to_end(lg_data):
    prior, theta, x = lg_data
    from sbi_tpu.inference import NRE_B

    inf = NRE_B(prior=prior)
    inf.append_simulations(theta, x)
    inf.train_ensemble(
        num_members=2, max_num_epochs=40, stop_after_epochs=10, epoch_chunk=10
    )
    post = inf.build_ensemble_posterior(
        mcmc_parameters={"num_chains": 10, "warmup_steps": 50, "thin": 2}
    )
    s = post.sample((100,), x=jnp.full((1, 2), 1.0), key=jr.PRNGKey(5))
    assert s.shape == (100, 2)
    assert bool(jnp.isfinite(s).all())


def test_train_ensemble_marginal():
    from sbi_tpu.inference.trainers.marginal import MarginalTrainer

    seed_all_backends(0)
    x = 0.5 * jr.normal(jr.PRNGKey(0), (1500, 2)) + 1.0
    inf = MarginalTrainer(density_estimator="maf")
    inf.append_simulations(x)
    members = inf.train_ensemble(
        num_members=2, max_num_epochs=30, stop_after_epochs=8, epoch_chunk=5
    )
    assert len(members) == 2
    lps = [np.asarray(m.log_prob(x[:16])) for m in members]
    assert not np.allclose(lps[0], lps[1])
    # Both members learned the marginal: mean log-prob beats a unit-normal
    # baseline evaluated on the same (shifted, scale-0.5) data.
    for lp in lps:
        assert lp.mean() > -2.0


def test_vf_ensemble_val_loss_is_key_independent(lg_data):
    """Regression: VF train_ensemble member snapshots must use the
    fixed-time-grid validation objective, not the raw random-time loss
    (whose variance made 'best val' a random draw and poisoned members).
    The contract pinned here: the ensemble val loss is deterministic in
    the PRNG key while the training loss is not."""
    from sbi_tpu.inference import NPSE

    prior, theta, x = lg_data
    inf = NPSE(prior=prior)
    inf.append_simulations(theta, x)
    inf.train_ensemble(num_members=2, max_num_epochs=2, epoch_chunk=1)

    train_loss = inf._ensemble_loss_fn()
    val_loss = inf._ensemble_val_loss_fn()
    params = inf._neural_net.params
    masks = jnp.ones((64,), dtype=bool)
    args = (theta[:64], x[:64], masks)

    v1 = float(val_loss(params, jr.PRNGKey(0), *args).mean())
    v2 = float(val_loss(params, jr.PRNGKey(123), *args).mean())
    assert v1 == v2, "ensemble val loss must not depend on the PRNG key"

    t1 = float(train_loss(params, jr.PRNGKey(0), *args).mean())
    t2 = float(train_loss(params, jr.PRNGKey(123), *args).mean())
    assert t1 != t2, "sanity: the raw VF training loss is stochastic"
