"""Deep user-input-processing grids — counterpart of the reference's
`tests/user_input_checks_test.py` (MultipleIndependent shapes/validation
`:373-475`, process_prior variants `:153-205`, process_simulator grid
`:236-317`, end-to-end inference with user problems `:319-371`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.utils import BoxUniform
from sbi_tpu.utils.distributions import (
    Beta,
    Exponential,
    Gamma,
    MultipleIndependent,
    MultivariateNormal,
    Uniform,
)
from sbi_tpu.utils.sbiutils import seed_all_backends, within_support
from sbi_tpu.utils.transforms import mcmc_transform
from sbi_tpu.utils.user_input_checks import (
    process_prior,
    process_simulator,
    process_x,
)

ones = jnp.ones
zeros = jnp.zeros


DIST_LISTS = [
    [Uniform(zeros(1), ones(1)), Uniform(zeros(1), ones(1))],
    [Gamma(ones(1), ones(1)), Uniform(zeros(1), ones(1)),
     Beta(ones(1), 2 * ones(1))],
    [MultivariateNormal(zeros(3), jnp.eye(3)), Gamma(ones(1), ones(1))],
    [Exponential(3 * ones(1)), BoxUniform(zeros(2), ones(2))],
]


@pytest.mark.parametrize("dists", DIST_LISTS)
def test_multiple_independent_shapes_and_factorization(dists):
    """ref user_input_checks_test.py:373-454: the joint's samples and
    log_prob factorize over the component columns."""
    joint = MultipleIndependent(dists)
    D = joint.event_shape[0]
    n = 10
    s = joint.sample(jax.random.PRNGKey(0), (n,))
    assert s.shape == (n, D)
    lp = joint.log_prob(s)
    assert lp.shape == (n,)
    # hand-computed: sum of per-component log probs on the split columns
    i, total = 0, 0.0
    for d, dim in zip(joint.dists, joint._dims):
        cols = s[:, i:i + dim]
        if len(d.event_shape) >= 1:
            part = d.log_prob(cols)
        else:
            part = d.log_prob(cols.squeeze(-1))
        total = total + part
        i += dim
    assert jnp.allclose(lp, total, atol=1e-5)
    # support check and MCMC transform round trip
    assert bool(within_support(joint, s).all())
    tf = mcmc_transform(joint)
    u = tf.forward(s)
    back = tf.inv(u)
    assert jnp.allclose(back, s, atol=1e-4)
    assert bool(jnp.isfinite(u).all())


def test_multiple_independent_rejects_single_dist():
    with pytest.raises(ValueError, match="at least two"):
        MultipleIndependent([Beta(ones(1), 2 * ones(1))])


def test_multiple_independent_rejects_nested():
    inner = MultipleIndependent(
        [Uniform(zeros(1), ones(1)), Uniform(zeros(1), ones(1))]
    )
    with pytest.raises(TypeError, match="Nested"):
        MultipleIndependent([Gamma(ones(1), ones(1)), inner])


def test_multiple_independent_rejects_non_distribution():
    with pytest.raises(TypeError, match="Distribution"):
        MultipleIndependent([Uniform(zeros(1), ones(1)), "not a dist"])


def test_multiple_independent_mean_variance():
    joint = MultipleIndependent(
        [Uniform(zeros(1), ones(1)), MultivariateNormal(2 * ones(2), jnp.eye(2))]
    )
    assert joint.mean.shape == (3,)
    assert jnp.allclose(joint.mean, jnp.array([0.5, 2.0, 2.0]), atol=1e-6)
    assert joint.variance.shape == (3,)


def test_process_prior_on_sequence_builds_joint():
    """ref user_input_checks_test.py:153-205: a list of distributions is
    accepted as a prior and becomes the independent joint."""
    prior, theta_dim, returns_numpy = process_prior(
        [Gamma(ones(1), ones(1)), Uniform(zeros(1), ones(1))]
    )
    assert isinstance(prior, MultipleIndependent)
    assert theta_dim == 2 and not returns_numpy
    s = prior.sample(jax.random.PRNGKey(0), (4,))
    assert s.shape == (4, 2)


@pytest.mark.parametrize(
    "x,expected_shape",
    [
        (np.zeros(3), (1, 3)),
        (np.zeros((1, 3)), (1, 3)),
        (np.zeros((2, 3)), (2, 3)),
        (jnp.zeros(3), (1, 3)),
    ],
)
def test_process_x_shapes(x, expected_shape):
    """ref user_input_checks_test.py:207-234."""
    out = process_x(x)
    assert out.shape == expected_shape
    assert out.dtype == jnp.float32


def _np_unbatched_sim(theta):
    return np.asarray(theta) + 1.0


def _np_batched_sim(theta):
    theta = np.atleast_2d(np.asarray(theta))
    return theta + 1.0


def _jax_keyed_sim(theta, key=None):
    return theta + 0.1 * jax.random.normal(key, jnp.shape(theta))


@pytest.mark.parametrize(
    "simulator,is_numpy",
    [
        (_np_unbatched_sim, True),
        (_np_batched_sim, True),
        (_jax_keyed_sim, False),
        (lambda theta: theta * 2.0, False),
    ],
)
def test_process_simulator_grid(simulator, is_numpy):
    """ref user_input_checks_test.py:236-317: numpy/jax, batched/unbatched,
    keyed/key-free simulators all normalize to sim(theta, key) -> (B, ...)."""
    prior = BoxUniform(-ones(2), ones(2))
    sim = process_simulator(simulator, prior, is_numpy)
    theta = prior.sample(jax.random.PRNGKey(0), (5,))
    x = sim(theta, key=jax.random.PRNGKey(1))
    assert x.shape[0] == 5
    assert isinstance(x, jnp.ndarray) and x.dtype == jnp.float32


@pytest.mark.parametrize("prior_kind", ["scipy", "sequence", "native"])
def test_inference_with_user_sbi_problems(prior_kind):
    """ref user_input_checks_test.py:319-371: NPE end-to-end with priors
    and simulators in every user-facing format."""
    from sbi_tpu.inference import NPE, simulate_for_sbi

    seed_all_backends(0)
    if prior_kind == "scipy":
        from scipy import stats

        user_prior = stats.multivariate_normal(np.zeros(2), np.eye(2))
    elif prior_kind == "sequence":
        user_prior = [Uniform(-2 * ones(1), 2 * ones(1)),
                      Uniform(-2 * ones(1), 2 * ones(1))]
    else:
        user_prior = BoxUniform(-2 * ones(2), 2 * ones(2))

    prior, theta_dim, returns_numpy = process_prior(user_prior)
    assert theta_dim == 2
    simulator = process_simulator(_np_unbatched_sim, prior, returns_numpy)
    theta, x = simulate_for_sbi(simulator, prior, num_simulations=150,
                                show_progress_bar=False,
                                key=jax.random.PRNGKey(0))
    npe = NPE(prior=prior)
    npe.append_simulations(theta, x).train(
        training_batch_size=50, max_num_epochs=3, stop_after_epochs=3)
    posterior = npe.build_posterior()
    s = posterior.sample((20,), x=jnp.ones(2), key=jax.random.PRNGKey(1))
    assert s.shape == (20, 2) and bool(jnp.isfinite(s).all())
