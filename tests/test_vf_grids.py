"""Vector-field posterior grids ported from the reference's
`tests/linearGaussian_vector_field_test.py`: guidance methods
(interval / affine classifier-free / prior replacement, ref `:690-835`),
SDE/ODE sampling equivalence (`:370`), VF MAP (`:476`), and iid-composed
log-prob (`:638`).

One NPSE-vp model is trained once (module scope) and shared by every cell.
"""

import jax
import jax.numpy as jnp
import pytest

from sbi_tpu.inference import NPSE
from sbi_tpu.simulators.linear_gaussian import (
    linear_gaussian,
    true_posterior_linear_gaussian_mvn_prior,
)
from sbi_tpu.utils.distributions import MultivariateNormal
from sbi_tpu.utils.sbiutils import seed_all_backends

D = 2
SHIFT = -1.0 * jnp.ones(D)
COV = 0.3 * jnp.eye(D)
X_O = jnp.zeros((1, D))


@pytest.fixture(scope="module")
def npse_posterior():
    seed_all_backends(0)
    prior = MultivariateNormal(jnp.zeros(D), covariance_matrix=jnp.eye(D))
    theta = prior.sample(jax.random.PRNGKey(0), (2500,))
    x = linear_gaussian(theta, SHIFT, COV, key=jax.random.PRNGKey(1))
    inf = NPSE(prior=prior, sde_type="vp")
    inf.append_simulations(theta, x).train(
        training_batch_size=100, stop_after_epochs=12
    )
    return inf.build_posterior(), prior


@pytest.mark.parametrize(
    "bounds",
    [
        {"lower_bound": 0.0, "upper_bound": 1.0},
        {"lower_bound": None, "upper_bound": 1.5},
        {"lower_bound": 1.0, "upper_bound": None},
    ],
    ids=["both", "only_upper", "only_lower"],
)
def test_interval_guidance_bounds(npse_posterior, bounds):
    """Ref `test_npse_interval_guidance` (`:749-773`): samples respect the
    box up to a 0.1 soft margin."""
    post, _ = npse_posterior
    s = post.sample(
        (400,), x=X_O, key=jax.random.PRNGKey(2), guidance_method="interval",
        guidance_params=bounds, steps=150,
    )
    assert s.shape == (400, D) and bool(jnp.isfinite(s).all())
    soft_lower = s.min(axis=0) + 1e-1
    soft_upper = s.max(axis=0) - 1e-1
    if bounds["lower_bound"] is not None:
        assert bool((soft_lower >= bounds["lower_bound"]).all()), soft_lower
    if bounds["upper_bound"] is not None:
        assert bool((soft_upper <= bounds["upper_bound"]).all()), soft_upper


def _tempered_posterior_moments(c: float):
    """Analytic posterior when the linear-Gaussian likelihood is tempered by
    exponent c: precision I + c Cov^-1, mean shrinks (x_o - shift)."""
    prec = jnp.eye(D) + c * jnp.linalg.inv(COV)
    cov = jnp.linalg.inv(prec)
    mean = cov @ (c * jnp.linalg.inv(COV) @ (X_O[0] - SHIFT))
    return mean, jnp.sqrt(jnp.diag(cov))


def test_affine_classifier_free_guidance(npse_posterior):
    """Ref `test_npse_affine_classifier_free` (`:784-835`): likelihood_scale
    tempers the posterior. scale=1 reproduces the plain posterior; scale=1.5
    lands near the analytic tempered posterior and is strictly tighter."""
    post, _ = npse_posterior
    key = jax.random.PRNGKey(3)
    plain = post.sample((400,), x=X_O, key=key, steps=150)
    s1 = post.sample(
        (400,), x=X_O, key=key, guidance_method="affine_classifier_free",
        guidance_params={"likelihood_scale": 1.0}, steps=150,
    )
    assert float(jnp.abs(s1.mean(0) - plain.mean(0)).max()) < 0.15
    s15 = post.sample(
        (400,), x=X_O, key=key, guidance_method="affine_classifier_free",
        guidance_params={"likelihood_scale": 1.5}, steps=150,
    )
    mean_t, std_t = _tempered_posterior_moments(1.5)
    assert float(jnp.abs(s15.mean(0) - mean_t).max()) < 0.2
    assert float(jnp.abs(s15.std(0) - std_t).max()) < 0.15
    # sharpened likelihood => tighter posterior than untempered
    assert float(s15.std(0).mean()) < float(s1.std(0).mean()) + 0.02


def test_prior_guide_replaces_training_prior(npse_posterior):
    """Ref `test_prior_guide` (`:690-735`): sampling under a test prior
    matches the analytic posterior computed WITH that test prior."""
    post, _ = npse_posterior
    test_prior = MultivariateNormal(
        0.1 + jnp.zeros(D), covariance_matrix=0.4 * jnp.eye(D)
    )
    s = post.sample(
        (500,), x=X_O, key=jax.random.PRNGKey(4),
        guidance_method="prior_guide",
        guidance_params={"test_prior": test_prior}, steps=150,
    )
    ref = true_posterior_linear_gaussian_mvn_prior(
        X_O, SHIFT, COV, 0.1 + jnp.zeros(D), 0.4 * jnp.eye(D)
    )
    assert float(jnp.abs(s.mean(0) - ref.loc).max()) < 0.15
    assert float(
        jnp.abs(s.std(0) - jnp.sqrt(jnp.diag(ref.covariance_matrix))).max()
    ) < 0.12


def test_guidance_error_paths(npse_posterior):
    post, _ = npse_posterior
    with pytest.raises(NotImplementedError, match="not registered"):
        post.sample((8,), x=X_O, key=jax.random.PRNGKey(0),
                    guidance_method="nope", steps=20)
    with pytest.raises(NotImplementedError, match="SDE"):
        post.sample((8,), x=X_O, key=jax.random.PRNGKey(0),
                    guidance_method="interval",
                    guidance_params={"lower_bound": 0.0},
                    sample_with="ode")
    # potential evaluation under guidance is unsupported (ref `:147-150`)
    post.potential_fn.set_x(X_O, guidance_method="interval",
                            guidance_params={"lower_bound": 0.0})
    with pytest.raises(NotImplementedError, match="guidance"):
        post.potential_fn(jnp.zeros((1, D)))
    post.potential_fn.set_x(X_O)  # reset for the other cells


def test_sde_ode_sampling_equivalence(npse_posterior):
    """Ref `test_vector_field_sde_ode_sampling_equivalence` (`:370-405`):
    the reverse SDE and the probability-flow ODE sample the same posterior."""
    post, _ = npse_posterior
    s_sde = post.sample((600,), x=X_O, key=jax.random.PRNGKey(5), steps=150)
    s_ode = post.sample(
        (600,), x=X_O, key=jax.random.PRNGKey(6), sample_with="ode"
    )
    assert float(jnp.abs(s_sde.mean(0) - s_ode.mean(0)).max()) < 0.15
    assert float(jnp.abs(s_sde.std(0) - s_ode.std(0)).max()) < 0.15


def test_vf_map_close_to_analytic_mode(npse_posterior):
    """Ref `test_vector_field_map` (`:476-509`): MAP of the Gaussian task is
    the analytic posterior mean."""
    post, _ = npse_posterior
    ref = true_posterior_linear_gaussian_mvn_prior(
        X_O, SHIFT, COV, jnp.zeros(D), jnp.eye(D)
    )
    m = post.map(x=X_O, num_iter=120, num_init_samples=200,
                 num_to_optimize=50)
    assert float(jnp.abs(m - ref.loc).max()) < 0.25, (m, ref.loc)


def test_iid_log_prob_composition(npse_posterior):
    """Ref `test_iid_log_prob` (`:638-688`): log-prob under N iid trials is
    sum_i log p(theta|x_i) - (N-1) log p(theta); it is finite, matches the
    potential, and concentrates around the generating theta."""
    post, prior = npse_posterior
    theta_o = jnp.array([[0.5, -0.3]])
    x_iid = linear_gaussian(
        jnp.repeat(theta_o, 5, axis=0), SHIFT, COV, key=jax.random.PRNGKey(7)
    )
    thetas = jnp.array([[0.5, -0.3], [3.0, 3.0]])
    lp = post.log_prob(thetas, x=x_iid)
    assert lp.shape == (2,) and bool(jnp.isfinite(lp).all())
    assert float(lp[0]) > float(lp[1])
    # matches the manual factorization through the potential's per-obs CNFs
    manual = sum(
        post.potential_fn.neural_ode(x_iid[i : i + 1]).log_prob(thetas)
        for i in range(5)
    ) - 4 * prior.log_prob(thetas)
    assert float(jnp.abs(lp - manual).max()) < 1e-4
    # the potential itself composes identically (ref `:168-182`)
    post.potential_fn.set_x(x_iid, x_is_iid=True)
    pot = post.potential_fn(thetas)
    assert float(jnp.abs(pot - lp).max()) < 1e-4
    post.potential_fn.set_x(X_O)


def test_iid_gradient_uses_composed_score(npse_posterior):
    """The potential gradient under iid observations composes via the
    configured adaptor and is tighter-pulling than the single-obs score."""
    post, _ = npse_posterior
    theta = jnp.array([[2.0, 2.0]])  # far from the iid posterior mass
    x_iid = linear_gaussian(
        jnp.repeat(jnp.array([[0.5, -0.3]]), 5, axis=0), SHIFT, COV,
        key=jax.random.PRNGKey(8),
    )
    post.potential_fn.set_x(x_iid, x_is_iid=True, iid_method="auto_gauss")
    g_iid = post.potential_fn.gradient(theta)
    post.potential_fn.set_x(x_iid[:1])
    g_one = post.potential_fn.gradient(theta)
    assert g_iid.shape == g_one.shape == (1, D)
    assert bool(jnp.isfinite(g_iid).all())
    # 5 iid trials pull harder toward the mass than one
    assert float(jnp.linalg.norm(g_iid)) > float(jnp.linalg.norm(g_one))
    post.potential_fn.set_x(X_O)


def test_fmpe_untrained_gaussian_baseline_samples_data_gaussian():
    """Ref `test_fmpe_untrained_gaussian_baseline_samples_prior` (`:872-918`):
    with gaussian_baseline=True a ZERO network already transports noise to
    the data's Gaussian fit — far from 0, near the data mean ~100."""
    import flax.linen as nn

    from sbi_tpu.inference.posteriors.vector_field_posterior import (
        VectorFieldPosterior,
    )
    from sbi_tpu.neural_nets.estimators.flowmatching_estimator import (
        FlowMatchingEstimator,
    )
    from sbi_tpu.neural_nets.net_builders.vector_field_nets import _transforms
    from sbi_tpu.utils.distributions import BoxUniform

    class ZeroNet(nn.Module):
        @nn.compact
        def __call__(self, z, zc, t):
            w = self.param("w", nn.initializers.zeros, (1,))
            return jnp.zeros_like(z) * w

    prior = BoxUniform(jnp.array([90.0, 90.0]), jnp.array([110.0, 110.0]))
    theta = prior.sample(jax.random.PRNGKey(0), (500,))
    x = theta + jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    net = ZeroNet()
    params = net.init(jax.random.PRNGKey(2), theta[:2], x[:2], jnp.zeros(2))
    est = FlowMatchingEstimator(
        net=net, params=params, input_shape=(2,), condition_shape=(2,),
        input_transform=_transforms(theta, "independent"),
        condition_transform=_transforms(x, "independent"),
        gaussian_baseline=True,
    )
    post = VectorFieldPosterior(est, prior, sample_with="ode")
    s = post.sample((800,), x=jnp.full((1, 2), 100.0),
                    key=jax.random.PRNGKey(3))
    m = s.mean(0)
    assert bool((m > 95.0).all()) and bool((m < 105.0).all()), m
    # spread tracks the data Gaussian, not a unit normal
    assert float(s.std(0).min()) > 2.0


@pytest.mark.slow
def test_fmpe_gaussian_baseline_trains():
    """FMPE with gaussian_baseline=True (residual learning) still solves the
    linear-Gaussian task."""
    from sbi_tpu.inference import FMPE
    from sbi_tpu.neural_nets.factory import posterior_flow_nn
    from sbi_tpu.utils.metrics import c2st

    seed_all_backends(0)
    prior = MultivariateNormal(jnp.zeros(D), covariance_matrix=jnp.eye(D))
    theta = prior.sample(jax.random.PRNGKey(0), (2500,))
    x = linear_gaussian(theta, SHIFT, COV, key=jax.random.PRNGKey(1))
    inf = FMPE(prior=prior,
               density_estimator=posterior_flow_nn("mlp",
                                                   gaussian_baseline=True))
    inf.append_simulations(theta, x).train(
        training_batch_size=100, stop_after_epochs=12
    )
    post = inf.build_posterior()
    s = post.sample((500,), x=X_O, key=jax.random.PRNGKey(2))
    ref = true_posterior_linear_gaussian_mvn_prior(
        X_O, SHIFT, COV, jnp.zeros(D), jnp.eye(D)
    ).sample(jax.random.PRNGKey(3), (500,))
    assert float(c2st(s, ref)) < 0.65


@pytest.mark.parametrize("trainer_kind", ["fmpe", "npse"])
@pytest.mark.parametrize("net", ["mlp", "ada_mlp", "transformer"])
def test_vf_inference_with_different_models(trainer_kind, net):
    """Ref `test_vfinference_with_different_models` (`:216-252`): every VF
    net architecture trains and samples through both trainer families."""
    from sbi_tpu.inference import FMPE, NPSE
    from sbi_tpu.neural_nets.factory import posterior_flow_nn, posterior_score_nn

    seed_all_backends(0)
    prior = MultivariateNormal(jnp.zeros(D), covariance_matrix=jnp.eye(D))
    theta = prior.sample(jax.random.PRNGKey(0), (600,))
    x = linear_gaussian(theta, SHIFT, COV, key=jax.random.PRNGKey(1))
    if trainer_kind == "fmpe":
        inf = FMPE(prior=prior,
                   density_estimator=posterior_flow_nn(net, hidden_features=32))
    else:
        inf = NPSE(prior=prior,
                   density_estimator=posterior_score_nn(net, sde_type="vp",
                                                        hidden_features=32))
    inf.append_simulations(theta, x).train(
        training_batch_size=100, max_num_epochs=8, stop_after_epochs=8
    )
    post = inf.build_posterior()
    s = post.sample((64,), x=X_O, key=jax.random.PRNGKey(2), steps=60)
    assert s.shape == (64, D) and bool(jnp.isfinite(s).all())
    lp = post.log_prob(s[:8], x=X_O)
    assert bool(jnp.isfinite(lp).all())
