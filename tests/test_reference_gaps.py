"""Functional tests for components that previously had import-only
coverage: the different-dims linear-Gaussian variant (ref
`tests/linearGaussian_snpe_test.py` different-dims case, simulator at
`sbi/simulators/linear_gaussian.py:155`), `get_density_thresholder`
(ref `sbi/utils/restriction_estimator.py:484`), `conditional_potential`
(ref `sbi/analysis/__init__.py` export), and `ImproperEmpirical`
(ref `sbi/utils/sbiutils.py:956`)."""

import jax
import jax.numpy as jnp
import pytest

from sbi_tpu.analysis import conditional_potential
from sbi_tpu.inference import NPE
from sbi_tpu.simulators.linear_gaussian import (
    linear_gaussian,
    samples_true_posterior_linear_gaussian_mvn_prior_different_dims,
)
from sbi_tpu.utils import ImproperEmpirical, get_density_thresholder
from sbi_tpu.utils.distributions import MultivariateNormal
from sbi_tpu.utils.metrics import check_c2st
from sbi_tpu.utils.sbiutils import seed_all_backends


@pytest.mark.slow
def test_c2st_npe_different_dims():
    """theta 2-D, x 3-D (last dim pure noise): NPE must learn to ignore
    the uninformative dim; C2ST vs the analytic posterior conditioned on
    the informative dims only."""
    seed_all_backends(0)
    num_dim, num_discarded = 2, 1
    num_samples, num_simulations = 1000, 2600
    likelihood_shift = -1.0 * jnp.ones(num_dim)
    likelihood_cov = 0.3 * jnp.eye(num_dim)
    prior = MultivariateNormal(
        jnp.zeros(num_dim), covariance_matrix=jnp.eye(num_dim)
    )

    def simulator(theta, key):
        k1, k2 = jax.random.split(key)
        x_inf = linear_gaussian(theta, likelihood_shift, likelihood_cov, key=k1)
        noise = jax.random.normal(k2, (theta.shape[0], num_discarded))
        return jnp.concatenate([x_inf, noise], axis=1)

    x_o = jnp.zeros((1, num_dim + num_discarded))
    target_samples = samples_true_posterior_linear_gaussian_mvn_prior_different_dims(
        x_o, likelihood_shift, likelihood_cov, jnp.zeros(num_dim),
        jnp.eye(num_dim), num_discarded, num_samples,
        key=jax.random.PRNGKey(3),
    )

    theta = prior.sample(jax.random.PRNGKey(0), (num_simulations,))
    x = simulator(theta, jax.random.PRNGKey(1))
    assert x.shape == (num_simulations, num_dim + num_discarded)

    inference = NPE(prior=prior)
    inference.append_simulations(theta, x).train(training_batch_size=100)
    posterior = inference.build_posterior().set_default_x(x_o)
    samples = posterior.sample((num_samples,), key=jax.random.PRNGKey(2))
    check_c2st(samples, target_samples, alg="npe-different-dims")


def test_get_density_thresholder():
    """accept_fn keeps the high-density region: bulk samples accepted,
    far-tail points rejected."""
    seed_all_backends(0)
    dist = MultivariateNormal(jnp.zeros(2), covariance_matrix=jnp.eye(2))

    class _Posterior:
        def sample(self, shape, key=None):
            return dist.sample(key, shape)

        def log_prob(self, theta):
            return dist.log_prob(theta)

    accept_fn = get_density_thresholder(
        _Posterior(), quantile=1e-2, num_samples_to_estimate_support=20_000,
        key=jax.random.PRNGKey(0),
    )
    bulk = dist.sample(jax.random.PRNGKey(1), (500,))
    accepted = accept_fn(bulk)
    assert accepted.shape == (500,)
    # By construction ~1% of posterior mass falls below the threshold.
    assert float(accepted.mean()) > 0.95
    far = 10.0 * jnp.ones((3, 2))
    assert float(accept_fn(far).sum()) == 0.0


def test_conditional_potential_matches_fixed_slice():
    """Conditioning a potential on fixed dims equals evaluating the full
    potential with those dims pinned to the condition."""
    cov = jnp.array([[1.0, 0.6, 0.0], [0.6, 2.0, 0.3], [0.0, 0.3, 0.5]])
    dist = MultivariateNormal(jnp.arange(3.0), covariance_matrix=cov)

    def potential_fn(theta):
        return dist.log_prob(theta)

    condition = jnp.array([0.5, -1.0, 2.0])
    cond_pot = conditional_potential(
        potential_fn, theta_transform=None, prior=dist,
        condition=condition, dims_to_sample=[0, 2],
    )
    theta_sub = jnp.array([[0.1, 0.2], [1.5, -0.7]])
    got = cond_pot(theta_sub)
    full = jnp.stack([
        jnp.array([0.1, -1.0, 0.2]), jnp.array([1.5, -1.0, -0.7])
    ])
    expected = potential_fn(full)
    assert jnp.allclose(got, expected, atol=1e-5)


def test_improper_empirical():
    """ImproperEmpirical: uniform log-prob (zeros), weighted resampling,
    weighted mean/variance."""
    samples = jnp.array([[0.0, 0.0], [1.0, 1.0], [2.0, 4.0]])
    log_w = jnp.log(jnp.array([0.2, 0.3, 0.5]))
    emp = ImproperEmpirical(samples, log_weights=log_w)

    lp = emp.log_prob(jnp.ones((7, 2)))
    assert lp.shape == (7,)
    assert bool((lp == 0.0).all())

    draws = emp.sample(jax.random.PRNGKey(0), (5000,))
    assert draws.shape == (5000, 2)
    # Every draw is one of the particles; frequencies match the weights.
    frac_third = float((draws[:, 1] == 4.0).mean())
    assert abs(frac_third - 0.5) < 0.03

    assert jnp.allclose(emp.mean, jnp.array([1.3, 2.3]), atol=1e-5)
    expected_var = jnp.array(
        [0.2 * 1.3**2 + 0.3 * 0.3**2 + 0.5 * 0.7**2,
         0.2 * 2.3**2 + 0.3 * 1.3**2 + 0.5 * 1.7**2]
    )
    assert jnp.allclose(emp.variance, expected_var, atol=1e-4)


def test_embedding_net_sees_raw_condition_when_zscore_off():
    """Contract: with condition z-scoring disabled, a user embedding_net
    is applied to the RAW condition — so symmetry-enforcing embeddings
    (e.g. squaring dims whose sign the likelihood ignores, as in SLCP)
    are exactly invariant. Guards the poe16_sym SLCP pipeline."""
    import flax.linen as nn

    from sbi_tpu.inference import NLE_A
    from sbi_tpu.neural_nets.factory import likelihood_nn
    from sbi_tpu.utils.distributions import BoxUniform

    class _Square(nn.Module):
        @nn.compact
        def __call__(self, theta):
            return theta**2

    seed_all_backends(0)
    prior = BoxUniform(-3.0 * jnp.ones(3), 3.0 * jnp.ones(3))
    theta = prior.sample(jax.random.PRNGKey(0), (200,))
    x = jax.random.normal(jax.random.PRNGKey(1), (200, 2))
    inf = NLE_A(prior=prior, density_estimator=likelihood_nn(
        "mdn", num_components=2, hidden_features=32, num_layers=2,
        embedding_net=_Square(), z_score_theta=None,
    ))
    inf.append_simulations(theta, x).train(
        max_num_epochs=2, training_batch_size=100
    )
    est = inf._neural_net
    lp = est.log_prob(x[:8], theta[:8])
    lp_flip = est.log_prob(x[:8], -theta[:8])
    assert bool(jnp.isfinite(lp).all())
    assert jnp.allclose(lp, lp_flip, atol=1e-5)


def test_posterior_parameters_validation_and_dispatch():
    """PosteriorParameters dataclasses validate in __post_init__ and
    build_posterior(posterior_parameters=...) dispatches on the instance
    type (ref `posterior_parameters.py:112-363`, `trainers/base.py:668-725`)."""
    from sbi_tpu.inference.posteriors.posterior_parameters import (
        DirectPosteriorParameters,
        ImportanceSamplingPosteriorParameters,
        MCMCPosteriorParameters,
        RejectionPosteriorParameters,
        VectorFieldPosteriorParameters,
    )
    from sbi_tpu.inference.posteriors.direct_posterior import DirectPosterior
    from sbi_tpu.utils.distributions import BoxUniform

    with pytest.raises(ValueError):
        DirectPosteriorParameters(max_sampling_batch_size=0)
    with pytest.raises(ValueError):
        MCMCPosteriorParameters(num_chains=0)
    with pytest.raises(ValueError):
        MCMCPosteriorParameters(thin=0)
    with pytest.raises(ValueError):
        RejectionPosteriorParameters(m=0.5)
    with pytest.raises(ValueError):
        ImportanceSamplingPosteriorParameters(method="nope")
    with pytest.raises(ValueError):
        VectorFieldPosteriorParameters(sample_with="mcmc")

    from sbi_tpu.inference import NPE

    seed_all_backends(0)
    prior = BoxUniform(-2.0 * jnp.ones(2), 2.0 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (300,))
    x = theta + 0.1 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    inf = NPE(prior=prior)
    inf.append_simulations(theta, x).train(
        max_num_epochs=2, training_batch_size=100
    )
    post = inf.build_posterior(
        posterior_parameters=DirectPosteriorParameters(
            max_sampling_batch_size=1234
        )
    )
    assert isinstance(post, DirectPosterior)
    s = post.sample((50,), x=jnp.zeros(2), key=jax.random.PRNGKey(2))
    assert s.shape == (50, 2)


def test_mcmc_posterior_parameters_dispatch_via_nle():
    """MCMCPosteriorParameters flows through NLE build_posterior into an
    MCMCPosterior with the configured chains/warmup (ref
    `trainers/base.py:668-725` dispatch)."""
    from sbi_tpu.inference import NLE_A
    from sbi_tpu.inference.posteriors.mcmc_posterior import MCMCPosterior
    from sbi_tpu.inference.posteriors.posterior_parameters import (
        MCMCPosteriorParameters,
    )
    from sbi_tpu.utils.distributions import BoxUniform

    seed_all_backends(0)
    prior = BoxUniform(-2.0 * jnp.ones(2), 2.0 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (300,))
    x = theta + 0.1 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    inf = NLE_A(prior=prior)
    inf.append_simulations(theta, x).train(
        max_num_epochs=2, training_batch_size=100
    )
    post = inf.build_posterior(
        posterior_parameters=MCMCPosteriorParameters(
            num_chains=7, warmup_steps=20, thin=1
        )
    )
    assert isinstance(post, MCMCPosterior)
    assert post.num_chains == 7
    s = post.sample((30,), x=jnp.zeros(2), key=jax.random.PRNGKey(2))
    assert s.shape == (30, 2)
    assert bool(jnp.isfinite(s).all())


def test_vf_posterior_parameters_dispatch():
    """VectorFieldPosteriorParameters flows through the VF trainer's
    build_posterior into a VectorFieldPosterior with the configured
    sampling route."""
    from sbi_tpu.inference import FMPE
    from sbi_tpu.inference.posteriors.posterior_parameters import (
        VectorFieldPosteriorParameters,
    )
    from sbi_tpu.inference.posteriors.vector_field_posterior import (
        VectorFieldPosterior,
    )
    from sbi_tpu.utils.distributions import BoxUniform

    seed_all_backends(0)
    prior = BoxUniform(-2.0 * jnp.ones(2), 2.0 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (300,))
    x = theta + 0.1 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    inf = FMPE(prior=prior)
    inf.append_simulations(theta, x).train(
        max_num_epochs=2, training_batch_size=100
    )
    post = inf.build_posterior(
        posterior_parameters=VectorFieldPosteriorParameters(sample_with="ode")
    )
    assert isinstance(post, VectorFieldPosterior)
    assert post.sample_with == "ode"
    s = post.sample((10,), x=jnp.zeros(2), key=jax.random.PRNGKey(2))
    assert s.shape == (10, 2)
    assert bool(jnp.isfinite(s).all())


def test_estimator_config_from_kwargs_warns_on_unknown():
    """Typed factory configs warn (not silently drop) on unknown kwargs
    and build a working estimator (ref `estimator_configs.py:27-99`)."""
    import warnings as _warnings

    from sbi_tpu.neural_nets.net_builders.estimator_configs import (
        FlowEstimatorConfig,
        ScoreEstimatorConfig,
    )

    with pytest.warns(UserWarning, match="unknown kwargs.*not_an_option"):
        cfg = FlowEstimatorConfig.from_kwargs(
            model="maf", hidden_features=32, not_an_option=3
        )
    assert cfg.model == "maf" and cfg.hidden_features == 32

    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        ScoreEstimatorConfig.from_kwargs(net="mlp", sde_type="vp")

    theta = jax.random.normal(jax.random.PRNGKey(0), (64, 2))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    est = cfg.build(theta, x)
    lp = est.log_prob(theta[:4], x[:4])
    # (sample, batch) convention: a 2-D input broadcasts to sample=1.
    assert lp.shape == (1, 4)
    assert bool(jnp.isfinite(lp).all())


def test_npe_mcmc_posterior_parameters_dispatch():
    """NPE + MCMCPosteriorParameters: the potential-based branch of the
    dispatch builds an MCMCPosterior over the posterior-based potential."""
    from sbi_tpu.inference import NPE
    from sbi_tpu.inference.posteriors.mcmc_posterior import MCMCPosterior
    from sbi_tpu.inference.posteriors.posterior_parameters import (
        MCMCPosteriorParameters,
    )
    from sbi_tpu.utils.distributions import BoxUniform

    seed_all_backends(0)
    prior = BoxUniform(-2.0 * jnp.ones(2), 2.0 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (300,))
    x = theta + 0.1 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    inf = NPE(prior=prior)
    inf.append_simulations(theta, x).train(
        max_num_epochs=2, training_batch_size=100
    )
    post = inf.build_posterior(
        posterior_parameters=MCMCPosteriorParameters(
            num_chains=6, warmup_steps=15, thin=1
        )
    )
    assert isinstance(post, MCMCPosterior)
    assert post.num_chains == 6
    s = post.sample((20,), x=jnp.zeros(2), key=jax.random.PRNGKey(2))
    assert s.shape == (20, 2)
    assert bool(jnp.isfinite(s).all())


def test_vf_mcmc_posterior_parameters_dispatch():
    """FMPE + MCMCPosteriorParameters must route through the vector-field
    potential (the estimator has no log_prob; ref supports MCMC from VF
    trainers via `vector_field_estimator_based_potential`)."""
    from sbi_tpu.inference import FMPE
    from sbi_tpu.inference.posteriors.mcmc_posterior import MCMCPosterior
    from sbi_tpu.inference.posteriors.posterior_parameters import (
        MCMCPosteriorParameters,
    )
    from sbi_tpu.utils.distributions import BoxUniform

    seed_all_backends(0)
    prior = BoxUniform(-2.0 * jnp.ones(2), 2.0 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (300,))
    x = theta + 0.1 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    inf = FMPE(prior=prior)
    inf.append_simulations(theta, x).train(max_num_epochs=2, training_batch_size=100)
    post = inf.build_posterior(
        posterior_parameters=MCMCPosteriorParameters(
            num_chains=5, warmup_steps=10, thin=1
        )
    )
    assert isinstance(post, MCMCPosterior)
    s = post.sample((20,), x=jnp.zeros(2), key=jax.random.PRNGKey(2))
    assert s.shape == (20, 2)
    assert bool(jnp.isfinite(s).all())


def test_posterior_parameters_kind_mismatch_raises():
    """Direct-family parameters require a posterior estimator; VF parameters
    require a vector-field estimator. Wrong trainer kind must raise, not
    silently wrap the wrong density (ref restricts these per trainer)."""
    from sbi_tpu.inference import NLE_A, NRE_B
    from sbi_tpu.inference.posteriors.posterior_parameters import (
        DirectPosteriorParameters,
        VectorFieldPosteriorParameters,
    )
    from sbi_tpu.utils.distributions import BoxUniform

    seed_all_backends(0)
    prior = BoxUniform(-2.0 * jnp.ones(2), 2.0 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (200,))
    x = theta + 0.1 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)

    nle = NLE_A(prior=prior)
    nle.append_simulations(theta, x).train(max_num_epochs=1, training_batch_size=100)
    with pytest.raises(TypeError, match="posterior estimator"):
        nle.build_posterior(posterior_parameters=DirectPosteriorParameters())
    with pytest.raises(TypeError, match="vector-field"):
        nle.build_posterior(posterior_parameters=VectorFieldPosteriorParameters())

    nre = NRE_B(prior=prior)
    nre.append_simulations(theta, x).train(max_num_epochs=1, training_batch_size=100)
    with pytest.raises(TypeError, match="posterior estimator"):
        nre.build_posterior(posterior_parameters=DirectPosteriorParameters())


def test_legacy_kwargs_conflict_with_posterior_parameters():
    """Mixing legacy sampler kwargs with typed `posterior_parameters` raises
    (explicit dicts) or warns (method strings), per the reference trainers."""
    from sbi_tpu.inference import NLE_A
    from sbi_tpu.inference.posteriors.posterior_parameters import (
        MCMCPosteriorParameters,
    )
    from sbi_tpu.utils.distributions import BoxUniform

    seed_all_backends(0)
    prior = BoxUniform(-2.0 * jnp.ones(2), 2.0 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (200,))
    x = theta + 0.1 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    nle = NLE_A(prior=prior)
    nle.append_simulations(theta, x).train(max_num_epochs=1, training_batch_size=100)

    with pytest.raises(ValueError, match="mcmc_parameters"):
        nle.build_posterior(
            posterior_parameters=MCMCPosteriorParameters(),
            mcmc_parameters={"num_chains": 3},
        )
    with pytest.warns(UserWarning, match="mcmc_method"):
        nle.build_posterior(
            posterior_parameters=MCMCPosteriorParameters(num_chains=3),
            mcmc_method="hmc",
        )
