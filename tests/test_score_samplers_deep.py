"""Analytic score-SDE sampling grids — counterpart of the reference's
`tests/score_samplers_test.py:172-230` test_gaussian_score_sampling: drive
the Diffuser with the EXACT score of a known Gaussian target (no training)
across sde_type x corrector x target-moment cells and check the sampled
moments. Pins predictor/corrector correctness independent of any net.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.neural_nets.estimators.score_estimator import (
    SubVPScoreEstimator,
    VEScoreEstimator,
    VPScoreEstimator,
)
from sbi_tpu.samplers.score.diffuser import Diffuser

D = 2
N = 4000

_SDE = {"vp": VPScoreEstimator, "subvp": SubVPScoreEstimator,
        "ve": VEScoreEstimator}


class _AnalyticGaussianNet:
    """Fake flax module: apply() returns eps_hat for the diffused marginal
    of a target N(mu, std^2 I). Under any of the three SDEs the marginal is
    N(m_t mu, m_t^2 std^2 + s_t^2), so the exact score is
    -(z - m_t mu) / (m_t^2 std^2 + s_t^2) and eps_hat = -score * s_t."""

    def __init__(self, est_ref, mu, std):
        self._est = est_ref  # list holder to break init cycle
        self.mu = mu
        self.std = std

    def apply(self, params, z, zc, time):
        est = self._est[0]
        m_t = est.mean_t_fn(time)[:, None]
        s_t = est.std_fn(time)[:, None]
        var = m_t**2 * self.std**2 + s_t**2
        score = -(z - m_t * self.mu) / var
        return -score * s_t


def _make_estimator(sde_type, mu, std):
    holder = []
    net = _AnalyticGaussianNet(holder, mu, std)
    est = _SDE[sde_type](net, params={}, input_shape=(D,),
                         condition_shape=(1,))
    holder.append(est)
    return est


@pytest.mark.parametrize("sde_type", ["vp", "subvp", "ve"])
@pytest.mark.parametrize("corrector", [None, "langevin", "gibbs"])
def test_gaussian_score_sampling_grid(sde_type, corrector):
    """Euler-Maruyama (+ optional corrector) recovers the target moments
    from the exact score (ref score_samplers_test.py:172-230)."""
    mu, std = 1.0, 0.5
    est = _make_estimator(sde_type, mu, std)
    diffuser = Diffuser(est, predictor="euler_maruyama", corrector=corrector)
    samples = diffuser.run(N, x=jnp.zeros((1, 1)), steps=400,
                           key=jax.random.PRNGKey(0))
    s = samples.reshape(N, D)
    assert bool(jnp.isfinite(s).all())
    assert np.allclose(np.asarray(s.mean(0)), mu, atol=0.1), (
        sde_type, corrector, s.mean(0))
    assert np.allclose(np.asarray(s.std(0)), std, atol=0.1), (
        sde_type, corrector, s.std(0))


@pytest.mark.parametrize("mu,std", [(-1.0, 1.0), (0.0, 0.1), (2.0, 0.3)])
def test_gaussian_score_sampling_target_moments(mu, std):
    """Moment grid at fixed sde/corrector (ref :176-177 mu/std cells)."""
    est = _make_estimator("vp", mu, std)
    diffuser = Diffuser(est, predictor="euler_maruyama",
                        corrector="langevin")
    samples = diffuser.run(N, x=jnp.zeros((1, 1)), steps=400,
                           key=jax.random.PRNGKey(1))
    s = samples.reshape(N, D)
    assert np.allclose(np.asarray(s.mean(0)), mu, atol=max(0.1, 0.1 * abs(mu)))
    assert np.allclose(np.asarray(s.std(0)), std, atol=0.12)


def test_score_fn_override_matches_estimator_path():
    """run(score_fn=...) (the iid-composition path) agrees with the
    estimator path for the same analytic score."""
    mu, std = 0.5, 0.7
    est = _make_estimator("vp", mu, std)

    def score_fn(z, t):
        tb = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (z.shape[0],))
        m_t = est.mean_t_fn(tb)[:, None]
        s_t = est.std_fn(tb)[:, None]
        return -(z - m_t * mu) / (m_t**2 * std**2 + s_t**2)

    diffuser = Diffuser(est, predictor="euler_maruyama")
    s_est = diffuser.run(N, x=jnp.zeros((1, 1)), steps=300,
                         key=jax.random.PRNGKey(2)).reshape(N, D)
    s_ovr = diffuser.run(N, x=jnp.zeros((1, 1)), steps=300,
                         key=jax.random.PRNGKey(2),
                         score_fn=score_fn).reshape(N, D)
    assert np.allclose(np.asarray(s_est.mean(0)), np.asarray(s_ovr.mean(0)),
                       atol=0.08)
    assert np.allclose(np.asarray(s_est.std(0)), np.asarray(s_ovr.std(0)),
                       atol=0.08)
