"""Trainer-flag semantics vs the reference (ref npe_base.py:572-614,
base.py:413-477,1056-1190): discard_prior_samples, force_first_round_loss,
retrain_from_scratch, resume_training index/opt-state reuse."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from sbi_tpu.inference import NPE, NPE_C
from sbi_tpu.utils.distributions import BoxUniform
from sbi_tpu.utils.sbiutils import seed_all_backends


def _two_round_trainer(n=300):
    seed_all_backends(0)
    prior = BoxUniform(-jnp.ones(2), jnp.ones(2))
    inf = NPE_C(prior=prior)
    th0 = prior.sample(jr.PRNGKey(0), (n,))
    inf.append_simulations(th0, th0 + 0.1)
    inf.train(max_num_epochs=2, training_batch_size=100)
    post = inf.build_posterior().set_default_x(jnp.zeros(2))
    th1 = prior.sample(jr.PRNGKey(1), (n,))
    inf.append_simulations(th1, th1 + 0.1, proposal=post)
    return inf, prior


def test_discard_prior_samples_start_index():
    """discard_prior_samples trains on rounds >= 1 only (ref :572-614)."""
    inf, _ = _two_round_trainer()
    assert inf._round == 1
    assert inf._get_start_index(False, False) == 0
    assert inf._get_start_index(True, False) == 1
    th_all, _, _ = inf.get_simulations(0)
    th_r1, _, _ = inf.get_simulations(1)
    assert th_all.shape[0] == 2 * th_r1.shape[0]


def test_non_atomic_loss_trains_on_latest_round_only():
    """use_non_atomic_loss=True -> start index pinned to the latest round
    regardless of discard_prior_samples (ref npe_base.py:588-596)."""
    inf, _ = _two_round_trainer()
    inf.use_non_atomic_loss = True
    assert inf._get_start_index(False, False) == 1
    assert inf._get_start_index(True, False) == 1


def test_force_first_round_loss_is_plain_mle():
    """force_first_round_loss=True uses -log q(theta|x) even in round > 0
    (ref npe_base.py:483-516)."""
    inf, prior = _two_round_trainer()
    est = inf._neural_net
    forced = inf._make_loss_fn(
        proposal=inf._proposal_roundwise[-1],
        calibration_kernel=None,
        force_first_round_loss=True,
    )
    th = prior.sample(jr.PRNGKey(2), (20,))
    x = th + 0.1
    masks = jnp.ones((20,))
    got = forced(est.params, jr.PRNGKey(3), th, x, masks)
    want = -est.log_prob_fn(est.params, th[None], x)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
    # The atomic round-1 loss is a different objective on the same batch.
    atomic = inf._make_loss_fn(
        proposal=inf._proposal_roundwise[-1],
        calibration_kernel=None,
        force_first_round_loss=False,
    )
    got_atomic = atomic(est.params, jr.PRNGKey(3), th, x, masks)
    assert not np.allclose(np.asarray(got_atomic), np.asarray(got), atol=1e-3)


def test_retrain_from_scratch_reinitializes():
    """retrain_from_scratch rebuilds the net: post-training params differ
    from a continued run's (ref base.py:1005-1012)."""
    seed_all_backends(0)
    prior = BoxUniform(-jnp.ones(2), jnp.ones(2))
    th = prior.sample(jr.PRNGKey(0), (300,))
    inf = NPE(prior=prior)
    inf.append_simulations(th, th + 0.1)
    inf.train(max_num_epochs=3, training_batch_size=100)
    trained_leaf = np.asarray(
        jax.tree_util.tree_leaves(inf._neural_net.params)[0]
    ).copy()
    old_net = inf._neural_net
    inf.train(max_num_epochs=1, training_batch_size=100,
              retrain_from_scratch=True)
    assert inf._neural_net is not old_net
    fresh_leaf = np.asarray(jax.tree_util.tree_leaves(inf._neural_net.params)[0])
    assert not np.allclose(trained_leaf, fresh_leaf)


def test_resume_training_reuses_split_and_opt_state():
    """resume_training=True keeps the train/val split and the optimizer
    state (ref base.py:997-1004, 413-477)."""
    seed_all_backends(0)
    prior = BoxUniform(-jnp.ones(2), jnp.ones(2))
    th = prior.sample(jr.PRNGKey(0), (300,))
    inf = NPE(prior=prior)
    inf.append_simulations(th, th + 0.1)
    inf.train(max_num_epochs=2, training_batch_size=100)
    idx_before = np.asarray(inf._train_indices).copy()
    epoch_before = inf._epoch
    opt_before = inf._opt_state
    inf.train(max_num_epochs=2, training_batch_size=100, resume_training=True)
    np.testing.assert_array_equal(idx_before, np.asarray(inf._train_indices))
    assert inf._epoch == epoch_before + 2  # epoch counter continues
    assert inf._opt_state is not opt_before  # state advanced, not re-init


def test_fresh_train_resets_epoch_counter():
    seed_all_backends(0)
    prior = BoxUniform(-jnp.ones(2), jnp.ones(2))
    th = prior.sample(jr.PRNGKey(0), (300,))
    inf = NPE(prior=prior)
    inf.append_simulations(th, th + 0.1)
    inf.train(max_num_epochs=2, training_batch_size=100)
    inf.train(max_num_epochs=2, training_batch_size=100)  # fresh call
    assert inf._epoch == 2


def test_lr_schedule_cosine_anneals_and_validates():
    """Cosine LR schedule (beyond-reference TrainConfig.lr_schedule): the
    optimizer's effective step size decays over the horizon, an infinite
    horizon raises, and train(lr_schedule=...) runs end-to-end."""
    import optax

    from sbi_tpu.inference.trainers._contracts import TrainConfig
    from sbi_tpu.inference import NPE
    from sbi_tpu.utils import BoxUniform

    # contract: schedule without a finite horizon is rejected
    with pytest.raises(ValueError, match="finite horizon"):
        TrainConfig(lr_schedule="cosine")
    with pytest.raises(ValueError, match="lr_schedule"):
        TrainConfig(lr_schedule="linear", lr_decay_epochs=10)

    # the built optimizer anneals: update magnitude shrinks over steps
    cfg = TrainConfig(lr_schedule="cosine", lr_decay_epochs=10,
                      learning_rate=1e-2, clip_max_norm=None,
                      lr_final_factor=0.0)
    inf = NPE(prior=BoxUniform(-jnp.ones(1), jnp.ones(1)))
    tx = inf._make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    grads = {"w": jnp.ones(3)}
    sizes = []
    for _ in range(100):
        updates, state = tx.update(grads, state, params)
        sizes.append(float(jnp.abs(updates["w"]).max()))
    assert sizes[-1] < 1e-4 < sizes[30], sizes[::20]

    # end-to-end: every trainer accepts the kwargs (spot-check NPE)
    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(2), 2 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (300,))
    x = theta + 0.3 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    inf = NPE(prior=prior, density_estimator="mdn")
    inf.append_simulations(theta, x)
    inf.train(training_batch_size=100, max_num_epochs=10,
              stop_after_epochs=10, epoch_chunk=5,
              lr_schedule="cosine", lr_decay_epochs=10)
    assert inf._neural_net is not None
