"""Multi-chip sharding tests on the 8-virtual-device CPU mesh, exercised
ENTIRELY through the public API (``mesh=`` arguments on train /
train_ensemble / sample / sample_batched / run_sbc / run_tarp) — no
hand-rolled ``device_put`` in the harness. Conftest provides
``xla_force_host_platform_device_count=8``.

These commit the paths the driver's dryrun probes (SURVEY §2.7): data-
parallel training, member-sharded ensembles, chain-sharded MCMC, and
observation-sharded amortized sampling + diagnostics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.parallel.mesh import get_mesh, resolve_mesh
from sbi_tpu.utils.sbiutils import seed_all_backends


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return get_mesh(("data",), devices=jax.devices()[:8])


def test_resolve_mesh_forms(mesh):
    from jax.sharding import Mesh

    assert resolve_mesh(None) is None
    assert isinstance(resolve_mesh("auto"), Mesh)
    assert resolve_mesh(4).devices.size == 4
    assert resolve_mesh(mesh) is mesh
    with pytest.raises(ValueError):
        resolve_mesh(10_000)
    with pytest.raises(TypeError):
        resolve_mesh(3.5)


def _train_npe(mesh_arg, key, max_num_epochs=5):
    """One NPE training run through the public API, fully seeded."""
    from sbi_tpu.inference import NPE
    from sbi_tpu.utils.distributions import BoxUniform

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(2), 2 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (512,))
    x = theta + 0.1 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    inf = NPE(prior=prior, density_estimator="mdn")
    inf.append_simulations(theta, x).train(
        training_batch_size=64, max_num_epochs=max_num_epochs,
        mesh=mesh_arg, key=key,
    )
    return inf


def test_train_mesh_matches_single_device(mesh):
    """`train(mesh=mesh)` must reproduce single-device numerics: the batch is
    sharded over the mesh and the partitioner all-reduces the gradients —
    same math, n-way compute."""
    key = jax.random.PRNGKey(42)
    inf_single = _train_npe(None, key)
    inf_mesh = _train_npe(mesh, key)

    vl_s = np.asarray(inf_single.summary["validation_loss"])
    vl_m = np.asarray(inf_mesh.summary["validation_loss"])
    np.testing.assert_allclose(vl_m, vl_s, rtol=1e-4, atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(inf_single._neural_net.params),
        jax.tree_util.tree_leaves(inf_mesh._neural_net.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_train_mesh_auto_and_int_forms():
    """mesh='auto' and mesh=<int> are accepted by the public train()."""
    inf = _train_npe("auto", jax.random.PRNGKey(0))
    assert np.isfinite(inf.summary["validation_loss"][-1])
    inf = _train_npe(4, jax.random.PRNGKey(0))
    assert np.isfinite(inf.summary["validation_loss"][-1])


def test_train_ensemble_mesh_matches_unsharded(mesh):
    """`train_ensemble(mesh=mesh)` shards the member axis; per-member val
    losses and best params must match the unsharded vmapped program."""
    from sbi_tpu.inference import NLE
    from sbi_tpu.utils.distributions import BoxUniform

    def run(mesh_arg):
        seed_all_backends(0)
        prior = BoxUniform(-2 * jnp.ones(2), 2 * jnp.ones(2))
        theta = prior.sample(jax.random.PRNGKey(0), (256,))
        x = theta + 0.2 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
        inf = NLE(prior=prior, density_estimator="mdn")
        inf.append_simulations(theta, x)
        members = inf.train_ensemble(
            num_members=8, training_batch_size=64, max_num_epochs=4,
            epoch_chunk=2, mesh=mesh_arg, key=jax.random.PRNGKey(7),
        )
        return inf, members

    inf_ref, _ = run(None)
    inf_sh, members = run(mesh)
    np.testing.assert_allclose(
        np.asarray(inf_sh.summary["validation_loss"]),
        np.asarray(inf_ref.summary["validation_loss"]),
        rtol=1e-4, atol=1e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(inf_ref._ensemble_stacked_params),
        jax.tree_util.tree_leaves(inf_sh._ensemble_stacked_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    # the member axis really is distributed across all 8 devices
    leaf = jax.tree_util.tree_leaves(inf_sh._ensemble_stacked_params)[0]
    assert len(leaf.sharding.device_set) == 8
    assert len(members) == 8


def test_chain_sharded_mcmc_public_api(mesh):
    """MCMCPosterior.sample(mesh=...) shards the chain axis and still samples
    the target distribution."""
    from sbi_tpu.inference import CustomPotentialWrapper
    from sbi_tpu.inference.posteriors import MCMCPosterior
    from sbi_tpu.utils.distributions import MultivariateNormal

    cov = jnp.array([[1.0, 0.6], [0.6, 1.5]])
    prec = jnp.linalg.inv(cov)

    def potential(theta):
        return -0.5 * jnp.einsum("bi,ij,bj->b", theta, prec, theta)

    prior = MultivariateNormal(jnp.zeros(2), 4.0 * jnp.eye(2))
    pot = CustomPotentialWrapper(potential, prior)
    posterior = MCMCPosterior(
        pot, proposal=prior, num_chains=64, warmup_steps=100, thin=2,
        init_strategy="proposal",
    )
    samples = posterior.sample(
        (2000,), x=jnp.zeros(1), key=jax.random.PRNGKey(3), mesh=mesh
    )
    flat = np.asarray(samples)
    assert np.allclose(flat.mean(0), 0.0, atol=0.15)
    assert np.allclose(np.cov(flat.T), np.asarray(cov), atol=0.35)


def test_observation_sharded_amortized_sampling(mesh):
    """DirectPosterior.sample_batched(mesh=...) shards observations over the
    mesh and returns per-observation posteriors."""
    inf = _train_npe(None, jax.random.PRNGKey(0), max_num_epochs=40)
    posterior = inf.build_posterior()

    xs = jnp.linspace(-1.0, 1.0, 16)[:, None] * jnp.ones((1, 2))
    samples = posterior.sample_batched(
        (64,), xs, key=jax.random.PRNGKey(2), mesh=mesh
    )
    assert samples.shape == (64, 16, 2)
    means = np.asarray(samples.mean(axis=0))
    assert np.corrcoef(means[:, 0], np.asarray(xs[:, 0]))[0, 1] > 0.9


def test_mcmc_sample_batched_mesh(mesh):
    """MCMCPosterior.sample_batched(mesh=...) shards the (obs, chain) axis."""
    from sbi_tpu.inference import NLE

    from sbi_tpu.utils.distributions import BoxUniform

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(2), 2 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (400,))
    x = theta + 0.2 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    inf = NLE(prior=prior, density_estimator="mdn")
    inf.append_simulations(theta, x).train(max_num_epochs=30)
    posterior = inf.build_posterior(mcmc_parameters=dict(
        num_chains=16, warmup_steps=50, thin=1,
    ))
    xs = jnp.array([[0.5, 0.5], [-0.5, -0.5], [1.0, -1.0], [0.0, 0.0]])
    samples = posterior.sample_batched(
        (50,), xs, key=jax.random.PRNGKey(5), mesh=mesh
    )
    assert samples.shape == (50, 4, 2)
    means = np.asarray(samples.mean(axis=0))
    # posterior means should track the observations (x = theta + noise)
    assert np.corrcoef(means[:, 0], np.asarray(xs[:, 0]))[0, 1] > 0.9


def test_run_sbc_mesh_matches_unsharded(mesh):
    """run_sbc(mesh=...) shards observations; ranks must match the unsharded
    run bit-for-bit (same keys, same math)."""
    from sbi_tpu.diagnostics import run_sbc

    inf = _train_npe(None, jax.random.PRNGKey(1))
    posterior = inf.build_posterior()

    seed_all_backends(0)
    prior = inf._prior
    thetas = prior.sample(jax.random.PRNGKey(10), (32,))
    xs = thetas + 0.1 * jax.random.normal(jax.random.PRNGKey(11), thetas.shape)

    ranks_ref, dap_ref = run_sbc(
        thetas, xs, posterior, num_posterior_samples=100,
        key=jax.random.PRNGKey(12),
    )
    ranks_sh, dap_sh = run_sbc(
        thetas, xs, posterior, num_posterior_samples=100,
        key=jax.random.PRNGKey(12), mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(ranks_sh), np.asarray(ranks_ref))
    np.testing.assert_allclose(
        np.asarray(dap_sh), np.asarray(dap_ref), atol=1e-5
    )


def test_run_tarp_mesh(mesh):
    """run_tarp(mesh=...) executes observation-sharded and returns a sane
    coverage curve."""
    from sbi_tpu.diagnostics import run_tarp

    inf = _train_npe(None, jax.random.PRNGKey(2))
    posterior = inf.build_posterior()

    seed_all_backends(0)
    prior = inf._prior
    thetas = prior.sample(jax.random.PRNGKey(20), (32,))
    xs = thetas + 0.1 * jax.random.normal(jax.random.PRNGKey(21), thetas.shape)
    ecp, alpha = run_tarp(
        thetas, xs, posterior, num_posterior_samples=100,
        key=jax.random.PRNGKey(22), mesh=mesh,
    )
    ecp = np.asarray(ecp)
    assert ecp.shape == np.asarray(alpha).shape
    assert np.isfinite(ecp).all()
    assert ecp[0] == 0.0 and ecp[-1] <= 1.0


def test_vf_sample_batched_mesh(mesh):
    """VectorFieldPosterior.sample_batched(mesh=...) runs the observation-
    sharded reverse-SDE path."""
    from sbi_tpu.inference import NPSE
    from sbi_tpu.utils.distributions import BoxUniform

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(2), 2 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (300,))
    x = theta + 0.1 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    inf = NPSE(prior=prior)
    inf.append_simulations(theta, x).train(max_num_epochs=10)
    posterior = inf.build_posterior()
    xs = jnp.array([[0.5, 0.5], [-0.5, -0.5], [1.0, -1.0], [0.0, 0.0]] * 2)
    samples = posterior.sample_batched(
        (16,), xs, key=jax.random.PRNGKey(2), steps=40, mesh=mesh
    )
    assert samples.shape == (16, 8, 2)
    assert np.isfinite(np.asarray(samples)).all()
