"""Deep VIPosterior grids — counterpart of the reference's `tests/vi_test.py`
(vi_method x sampling_method grid `:162-198`, q-family zoo incl.
gaussian_diag `:199-239`, interface errors `:346-403`, MultipleIndependent
prior `:404-434`, map `:616-640`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.inference.posteriors.vi_posterior import VIPosterior
from sbi_tpu.inference.potentials.base_potential import CustomPotentialWrapper
from sbi_tpu.utils.distributions import (
    MultipleIndependent,
    MultivariateNormal,
    Uniform,
)
from sbi_tpu.utils.sbiutils import seed_all_backends

MEAN = jnp.array([0.8, -1.2])
COV = jnp.array([[1.0, 0.6], [0.6, 1.5]])
PREC = jnp.linalg.inv(COV)


def _gauss_potential(theta, x_o=None):
    d = theta - MEAN
    return -0.5 * jnp.einsum("bi,ij,bj->b", d, PREC, d)


def _make_vi(vi_method="rKL", q="maf"):
    prior = MultivariateNormal(jnp.zeros(2), covariance_matrix=9.0 * jnp.eye(2))
    pot = CustomPotentialWrapper(_gauss_potential, prior=prior)
    return VIPosterior(pot, prior=prior, q=q, vi_method=vi_method).set_default_x(
        jnp.zeros((1, 2))
    )


@pytest.mark.parametrize("vi_method", ["rKL", "fKL"])
@pytest.mark.parametrize("sampling_method", ["naive", "sir"])
def test_vi_method_x_sampling_method_grid(vi_method, sampling_method):
    """ref vi_test.py:162-198: every (divergence, sampler) cell recovers the
    correlated Gaussian; SIR must not be worse than naive."""
    seed_all_backends(0)
    vi = _make_vi(vi_method)
    vi.train(max_num_iters=1500, learning_rate=2e-3,
             key=jax.random.PRNGKey(0))
    s = vi.sample((3000,), key=jax.random.PRNGKey(1),
                  method=sampling_method)
    assert s.shape == (3000, 2)
    mean = np.asarray(s.mean(0))
    cov = np.cov(np.asarray(s).T)
    assert np.allclose(mean, np.asarray(MEAN), atol=0.2), (vi_method, mean)
    assert np.allclose(cov, np.asarray(COV), atol=0.45), (vi_method, cov)


def test_vi_sir_corrects_imperfect_q():
    """SIR reweighting against the exact potential must shrink the moment
    error of a deliberately under-trained q."""
    seed_all_backends(0)
    vi = _make_vi("rKL")
    vi.train(max_num_iters=120, learning_rate=2e-3, key=jax.random.PRNGKey(0))
    s_naive = vi.sample((4000,), key=jax.random.PRNGKey(1))
    s_sir = vi.sample((4000,), key=jax.random.PRNGKey(1), method="sir",
                      oversampling_factor=32)
    err_naive = float(jnp.abs(s_naive.mean(0) - MEAN).sum())
    err_sir = float(jnp.abs(s_sir.mean(0) - MEAN).sum())
    assert err_sir < err_naive + 0.05, (err_naive, err_sir)


def test_vi_gaussian_diag_family():
    """ref vi_test.py:199-239 ('gaussian_diag'): mean-field q nails the
    marginals but CANNOT represent the correlation."""
    seed_all_backends(0)
    vi = _make_vi("rKL", q="gaussian_diag")
    vi.train(max_num_iters=1500, learning_rate=5e-3,
             key=jax.random.PRNGKey(0))
    s = vi.sample((4000,), key=jax.random.PRNGKey(1))
    assert np.allclose(np.asarray(s.mean(0)), np.asarray(MEAN), atol=0.15)
    corr = np.corrcoef(np.asarray(s).T)[0, 1]
    true_corr = float(COV[0, 1] / jnp.sqrt(COV[0, 0] * COV[1, 1]))
    assert abs(corr) < 0.15 < true_corr  # mean-field: no correlation


def test_vi_untrained_raises():
    """ref vi_test.py:346-403 + :601-615: sample/log_prob before train()
    must raise, not return garbage."""
    vi = _make_vi()
    with pytest.raises(RuntimeError, match="train"):
        vi.sample((10,), key=jax.random.PRNGKey(0))
    with pytest.raises(RuntimeError, match="train"):
        vi.log_prob(jnp.zeros((3, 2)))


def test_vi_set_vi_method_switch():
    """Switching the divergence between fits retrains cleanly."""
    seed_all_backends(0)
    vi = _make_vi("rKL")
    vi.train(max_num_iters=300, key=jax.random.PRNGKey(0))
    vi.set_vi_method("fKL")
    assert vi.vi_method == "fKL"
    vi.train(max_num_iters=300, key=jax.random.PRNGKey(1))
    s = vi.sample((500,), key=jax.random.PRNGKey(2))
    assert bool(jnp.isfinite(s).all())


def test_vi_with_multiple_independent_prior():
    """ref vi_test.py:404-434: a MultipleIndependent prior with bounded
    components — the transform maps to unconstrained space and samples land
    inside the joint support."""
    seed_all_backends(0)
    prior = MultipleIndependent(
        [Uniform(-2 * jnp.ones(1), 2 * jnp.ones(1)),
         Uniform(-2 * jnp.ones(1), 2 * jnp.ones(1))]
    )
    target_mean = jnp.array([0.5, -0.5])

    def pot(theta, x_o=None):
        return -0.5 * jnp.sum((theta - target_mean) ** 2 / 0.25, axis=-1)

    from sbi_tpu.utils.transforms import mcmc_transform

    vi = VIPosterior(
        CustomPotentialWrapper(pot, prior=prior), prior=prior,
        theta_transform=mcmc_transform(prior), q="gaussian",
    ).set_default_x(jnp.zeros((1, 2)))
    vi.train(max_num_iters=800, key=jax.random.PRNGKey(0))
    s = vi.sample((2000,), key=jax.random.PRNGKey(1))
    assert bool((jnp.abs(s) <= 2.0).all()), "samples escaped the prior box"
    assert np.allclose(np.asarray(s.mean(0)), np.asarray(target_mean),
                       atol=0.2)


def test_vi_map():
    """ref vi_test.py:616-640: MAP on the trained q lands at the potential's
    mode."""
    seed_all_backends(0)
    vi = _make_vi("rKL")
    vi.train(max_num_iters=1500, learning_rate=2e-3,
             key=jax.random.PRNGKey(0))
    m = vi.map(num_iter=200, key=jax.random.PRNGKey(1))
    assert np.allclose(np.asarray(m).squeeze(), np.asarray(MEAN), atol=0.25)
