"""LC2ST calibration tests (counterpart of reference `tests/lc2st_test.py`),
including the CV-fold path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.diagnostics import LC2ST, LC2ST_NF
from sbi_tpu.utils.sbiutils import seed_all_backends


def _joint(n=400, d=2, seed=0, shift=0.0):
    """Calibration set: theta ~ N(x, I) posterior draws; `shift` biases q."""
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    theta = x + rng.randn(n, d).astype(np.float32)
    post = x + rng.randn(n, d).astype(np.float32) + shift
    return theta, x, post


@pytest.mark.parametrize("num_folds", [1, 3])
def test_lc2st_calibrated_accepts(num_folds):
    seed_all_backends(0)
    theta, x, post = _joint()
    lc = LC2ST(theta, x, post, num_trials_null=20, num_folds=num_folds)
    lc.train_on_observed_data()
    lc.train_under_null_hypothesis()
    if num_folds > 1:
        assert len(lc.state.clfs) == num_folds
        assert len(lc.state.clfs_null[0]) == num_folds
    theta_o = np.random.RandomState(7).randn(200, 2)
    p = lc.p_value(theta_o, np.zeros(2))
    assert p > 0.05, f"calibrated posterior rejected (p={p})"


def test_lc2st_detects_bias():
    seed_all_backends(0)
    theta, x, post = _joint(shift=1.5)
    lc = LC2ST(theta, x, post, num_trials_null=20, num_folds=2)
    lc.train_on_observed_data()
    lc.train_under_null_hypothesis()
    theta_o = np.random.RandomState(7).randn(200, 2) + 1.5
    assert lc.reject_test(theta_o, np.zeros(2)), "biased posterior accepted"


def test_lc2st_nf_null_and_folds():
    seed_all_backends(0)
    theta, x, post = _joint()
    # identity "flow": z = theta - x is standard normal under calibration
    lc = LC2ST_NF(
        theta,
        x,
        post,
        flow_inverse_transform=lambda t, xx: np.asarray(t) - np.asarray(xx),
        num_trials_null=15,
        num_folds=2,
    )
    lc.train_on_observed_data()
    lc.train_under_null_hypothesis()
    z_o = np.random.RandomState(3).randn(200, 2)
    p = lc.p_value(z_o, np.zeros(2))
    assert p > 0.05, f"calibrated NF posterior rejected (p={p})"
