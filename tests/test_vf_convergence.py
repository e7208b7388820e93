"""VF trainer convergence semantics (ref
`sbi/inference/trainers/vfpe/base_vf_inference.py:202-239,339-407,597-623`):
EMA loss summarization, fixed validation times, statistical 2-sigma test.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from sbi_tpu.inference import FMPE, NPSE
from sbi_tpu.utils.distributions import BoxUniform
from sbi_tpu.utils.sbiutils import seed_all_backends


@pytest.fixture(scope="module")
def trained_fmpe():
    seed_all_backends(0)
    prior = BoxUniform(-jnp.ones(2), jnp.ones(2))
    theta = prior.sample(jr.PRNGKey(0), (600,))
    x = theta + 0.1 * jr.normal(jr.PRNGKey(1), theta.shape)
    inf = FMPE(prior=prior)
    inf.append_simulations(theta, x)
    inf.train(max_num_epochs=40, stop_after_epochs=8, epoch_chunk=5,
              ema_loss_decay=0.1)
    return inf


def test_summary_losses_are_ema_smoothed(trained_fmpe):
    """Recorded val-loss curve must be the EMA, i.e. much smoother than the
    raw DSM/FM loss: consecutive diffs bounded by decay * running range."""
    vl = np.asarray(trained_fmpe.summary["validation_loss"])
    assert len(vl) >= 10
    diffs = np.abs(np.diff(vl))
    # EMA with decay d moves at most d * |v_t - prev| per step; raw FM loss
    # hops around by O(loss) between epochs, the EMA must not.
    assert np.median(diffs) < 0.1 * np.abs(vl).mean()


def test_ema_chains_across_chunks(trained_fmpe):
    """The EMA must be continuous at chunk boundaries (chunk=5): no resets
    to the raw loss value mid-curve (a reset shows as an outlier diff)."""
    vl = np.asarray(trained_fmpe.summary["validation_loss"])
    diffs = np.abs(np.diff(vl))
    med = np.median(diffs) + 1e-9
    # Boundary epochs (every 5th) should not be systematically larger.
    boundary = diffs[4::5]
    assert np.median(boundary) < 10 * med


def test_statistical_convergence_resets_patience():
    """An epoch within 2 sigma of the best must RESET the patience counter
    (base behavior would increment it)."""
    seed_all_backends(0)
    prior = BoxUniform(-jnp.ones(2), jnp.ones(2))
    inf = NPSE(prior=prior)
    theta = prior.sample(jr.PRNGKey(0), (400,))
    x = theta + 0.1 * jr.normal(jr.PRNGKey(1), theta.shape)
    inf.append_simulations(theta, x)
    inf._neural_net = inf._build_neural_net(theta, x)
    inf._best_val_loss = 1.0
    inf._epochs_since_last_improvement = 3
    inf._summary["validation_loss"] = list(1.0 + 0.05 * np.sin(np.arange(20)))
    # 1.02 is worse than best=1.0 but well within 2 sigma of the recent
    # history's std (~0.035) -> reset, not increment.
    converged = inf._converged_chunk(np.array([1.02]), None, stop_after_epochs=5)
    assert not converged
    assert inf._epochs_since_last_improvement == 0
    # 3 sigma above best -> increments.
    inf._epochs_since_last_improvement = 0
    inf._converged_chunk(np.array([1.0 + 5 * 0.035]), None, stop_after_epochs=5)
    assert inf._epochs_since_last_improvement == 1


def test_validation_times_accepted():
    """validation_times / nugget / ema_loss_decay are real knobs."""
    seed_all_backends(0)
    prior = BoxUniform(-jnp.ones(2), jnp.ones(2))
    inf = FMPE(prior=prior)
    theta = prior.sample(jr.PRNGKey(0), (300,))
    x = theta
    inf.append_simulations(theta, x)
    inf.train(max_num_epochs=6, stop_after_epochs=3, epoch_chunk=3,
              validation_times=4, validation_times_nugget=0.1,
              ema_loss_decay=0.3)
    assert len(inf.summary["validation_loss"]) >= 3


def test_param_ema_snapshot_and_optout():
    """With ema_params_decay set (VF default), the trained estimator's
    params are the on-device EMA pytree, not the raw final iterates; with
    None the chain carries no EMA state."""
    from sbi_tpu.inference.trainers.base import extract_ema_params

    seed_all_backends(0)
    prior = BoxUniform(-jnp.ones(2), jnp.ones(2))
    theta = prior.sample(jr.PRNGKey(0), (400,))
    x = theta + 0.1 * jr.normal(jr.PRNGKey(1), theta.shape)

    inf = FMPE(prior=prior)
    inf.append_simulations(theta, x)
    inf.train(max_num_epochs=8, stop_after_epochs=8, epoch_chunk=4,
              ema_params_decay=0.9)
    ema = extract_ema_params(inf._opt_state)
    assert ema is not None
    # val improved every epoch here, so the best snapshot IS the final EMA.
    for a, b in zip(
        jax.tree_util.tree_leaves(inf._neural_net.params),
        jax.tree_util.tree_leaves(ema),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    inf2 = FMPE(prior=prior)
    inf2.append_simulations(theta, x)
    inf2.train(max_num_epochs=2, ema_params_decay=None)
    assert extract_ema_params(inf2._opt_state) is None
