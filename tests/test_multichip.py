"""Multi-chip sharding regression tests on the 8-virtual-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8).

These commit the paths the driver's dryrun probes (SURVEY §2.7): data-
parallel training, chain-sharded MCMC, and observation-sharded diagnostics
with a psum'd reduction — so the parallel design is protected by the suite,
not just the external dryrun.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sbi_tpu.parallel.mesh import get_mesh, replicate, shard_along, shard_batch
from sbi_tpu.utils.sbiutils import seed_all_backends


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return get_mesh(("data",), devices=jax.devices()[:8])


def test_dp_train_step_matches_single_device(mesh):
    """A sharded-batch train step must produce the same update as the
    unsharded one (gradients all-reduced by the partitioner)."""
    import optax

    from sbi_tpu.neural_nets.net_builders.mdn import build_mdn

    seed_all_backends(0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    theta = jax.random.normal(k1, (64, 3))
    x = jax.random.normal(k2, (64, 4))
    est = build_mdn(theta, x, key=jax.random.PRNGKey(1))
    tx = optax.adam(1e-3)

    @jax.jit
    def step(params, opt_state, tb, xb):
        loss, g = jax.value_and_grad(
            lambda p: est.loss_fn(p, tb, xb).mean()
        )(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), loss

    # single device
    p0 = est.params
    s0 = tx.init(p0)
    p_single, l_single = step(p0, s0, theta, x)

    # sharded
    p_rep = replicate(p0, mesh)
    s_rep = tx.init(p_rep)
    tb, xb = shard_batch((theta, x), mesh)
    p_shard, l_shard = step(p_rep, s_rep, tb, xb)

    assert np.allclose(float(l_single), float(l_shard), rtol=1e-5)
    flat_s = jax.tree.leaves(p_single)
    flat_p = jax.tree.leaves(p_shard)
    for a, b in zip(flat_s, flat_p):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_chain_sharded_mcmc_moments(mesh):
    """FSM slice chains sharded over the mesh still sample the target."""
    from sbi_tpu.samplers.mcmc.slice_fsm import run_slice_vectorized_fsm

    cov = jnp.array([[1.0, 0.6], [0.6, 1.5]])
    prec = jnp.linalg.inv(cov)

    def potential(t):
        return -0.5 * jnp.einsum("bi,ij,bj->b", t, prec, t)

    inits = jax.random.normal(jax.random.PRNGKey(0), (128, 2))
    inits = jax.device_put(inits, shard_along(mesh))
    draws = run_slice_vectorized_fsm(
        potential, inits, num_samples=150, warmup_steps=100,
        key=jax.random.PRNGKey(1),
    )
    flat = np.asarray(draws).reshape(-1, 2)
    assert np.allclose(flat.mean(0), 0.0, atol=0.15)
    assert np.allclose(np.cov(flat.T), np.asarray(cov), atol=0.35)


def test_observation_sharded_rank_histogram_psum(mesh):
    """SBC-style rank computation sharded over observations with an
    all-reduced (psum) histogram via shard_map."""
    from jax.experimental.shard_map import shard_map

    seed_all_backends(0)
    N_OBS, L, D = 64, 50, 2
    key = jax.random.PRNGKey(0)
    thetas = jax.random.normal(key, (N_OBS, D))
    # posterior samples drawn from the SAME distribution -> uniform ranks
    post = jax.random.normal(jax.random.fold_in(key, 1), (N_OBS, L, D))

    @jax.jit
    def hist_sharded(thetas, post):
        def local(th, po):
            ranks = (po < th[:, None, :]).sum(axis=1)  # (n_local, D)
            onehot = jax.nn.one_hot(ranks, L + 1)  # (n_local, D, L+1)
            local_hist = onehot.sum(axis=0)  # (D, L+1)
            return jax.lax.psum(local_hist, "data")

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=P(),
        )(thetas, post)

    hist = hist_sharded(
        jax.device_put(thetas, shard_along(mesh)),
        jax.device_put(post, shard_along(mesh)),
    )
    assert hist.shape == (D, L + 1)
    assert float(hist.sum()) == N_OBS * D
    # uniformity: no bin wildly over-occupied (loose sanity bound)
    expected = N_OBS * D / (L + 1)
    assert float(hist.max()) < 12 * expected


def test_observation_sharded_amortized_sampling(mesh):
    """DirectPosterior.sample_batched with observations sharded over the
    mesh executes and returns per-observation posteriors."""
    from sbi_tpu.inference import NPE

    from sbi_tpu.utils.distributions import BoxUniform

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(2), 2 * jnp.ones(2))
    theta = prior.sample(jax.random.PRNGKey(0), (500,))
    x = theta + 0.1 * jax.random.normal(jax.random.PRNGKey(1), theta.shape)
    inf = NPE(prior=prior, density_estimator="mdn")
    inf.append_simulations(theta, x).train(max_num_epochs=40)
    posterior = inf.build_posterior()

    xs = jnp.linspace(-1.0, 1.0, 16)[:, None] * jnp.ones((1, 2))
    xs = jax.device_put(xs, shard_along(mesh))
    samples = posterior.sample_batched((64,), xs, key=jax.random.PRNGKey(2))
    assert samples.shape == (64, 16, 2)
    # each observation's posterior mean should track its x
    means = np.asarray(samples.mean(axis=0))
    assert np.corrcoef(means[:, 0], np.asarray(xs[:, 0]))[0, 1] > 0.9


def test_member_sharded_ensemble_step_matches_unsharded(mesh):
    """train_ensemble's member axis sharded over the mesh must produce the
    SAME per-member losses/updates as the unsharded vmapped step (members
    are independent: no collectives, pure placement)."""
    import optax

    from sbi_tpu.neural_nets.net_builders.flow import build_nsf

    seed_all_backends(0)
    key = jax.random.PRNGKey(0)
    theta = jax.random.normal(key, (64, 3))
    x = jax.random.normal(jax.random.fold_in(key, 1), (64, 4))
    members = [
        build_nsf(theta, x, hidden_features=16, num_transforms=2,
                  key=jax.random.fold_in(key, 10 + i))
        for i in range(8)
    ]
    est = members[0]
    stacked = jax.tree_util.tree_map(
        lambda *p: jnp.stack(p), *[m.params for m in members]
    )
    tx = optax.adam(1e-3)
    opt = jax.vmap(tx.init)(stacked)

    def step(params, opt_state):
        def member_step(pm, sm):
            def loss(q):
                return est.loss_fn(q, theta, x).mean()

            l, g = jax.value_and_grad(loss)(pm)
            up, sm = tx.update(g, sm, pm)
            return optax.apply_updates(pm, up), sm, l

        return jax.vmap(member_step)(params, opt_state)

    # Unsharded reference.
    p_ref, _, l_ref = jax.jit(step)(stacked, opt)
    # Member-sharded execution.
    sharded = jax.device_put(stacked, NamedSharding(mesh, P("data")))
    opt_sh = jax.vmap(tx.init)(sharded)
    p_sh, _, l_sh = jax.jit(step)(sharded, opt_sh)

    np.testing.assert_allclose(
        np.asarray(l_sh), np.asarray(l_ref), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p_sh), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # the member axis really is distributed
    leaf = jax.tree_util.tree_leaves(p_sh)[0]
    assert len(leaf.sharding.device_set) == 8
