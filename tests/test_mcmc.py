"""Sampler tests: slice/HMC exactness on analytic targets, init strategies
(counterpart of `tests/mcmc_test.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.samplers.mcmc.hmc import run_hmc, run_nuts
from sbi_tpu.samplers.mcmc.init_strategy import (
    proposal_init,
    resample_given_potential_fn,
    sir_init,
)
from sbi_tpu.samplers.mcmc.slice_fsm import run_slice_vectorized_fsm
from sbi_tpu.samplers.mcmc.slice_jax import (
    SliceSamplerVectorized,
    run_slice_vectorized,
    run_slice_vectorized_sweep,
)
from sbi_tpu.utils.distributions import BoxUniform, MultivariateNormal


COV = jnp.array([[1.0, 0.5], [0.5, 2.0]])
MEAN = jnp.array([1.0, -2.0])
PREC = jnp.linalg.inv(COV)


def logp(th):
    d = th - MEAN
    return -0.5 * jnp.einsum("bi,ij,bj->b", d, PREC, d)


@pytest.mark.parametrize(
    "runner",
    [run_slice_vectorized_fsm, run_slice_vectorized_sweep, run_hmc, run_nuts],
    ids=["slice-fsm", "slice-sweep", "hmc", "nuts"],
)
def test_mcmc_exactness(runner):
    inits = jax.random.normal(jax.random.PRNGKey(0), (50, 2))
    draws = runner(logp, inits, num_samples=300, warmup_steps=100,
                   key=jax.random.PRNGKey(1))
    flat = np.asarray(draws.reshape(-1, 2))
    assert np.allclose(flat.mean(0), np.asarray(MEAN), atol=0.15), flat.mean(0)
    assert np.allclose(np.cov(flat.T), np.asarray(COV), atol=0.3)


def test_slice_sampler_vectorized_api():
    sampler = SliceSamplerVectorized(
        log_prob_fn=logp,
        init_params=jax.random.normal(jax.random.PRNGKey(0), (10, 2)),
        num_chains=10,
        tuning=50,
    )
    out = sampler.run(100)
    assert out.shape == (10, 10, 2)


def test_init_strategies():
    prior = BoxUniform(-3 * jnp.ones(2), 3 * jnp.ones(2))
    pot = lambda t: logp(t)
    for fn in (
        lambda: proposal_init(prior, 16, key=jax.random.PRNGKey(0)),
        lambda: resample_given_potential_fn(prior, pot, 16, key=jax.random.PRNGKey(0)),
        lambda: sir_init(prior, pot, 16, key=jax.random.PRNGKey(0)),
    ):
        inits = fn()
        assert inits.shape == (16, 2)
        assert bool(jnp.isfinite(inits).all())
    # resample inits should concentrate near the mode vs proposal inits
    res = resample_given_potential_fn(prior, pot, 200, key=jax.random.PRNGKey(1))
    prop = proposal_init(prior, 200, key=jax.random.PRNGKey(1))
    assert float(logp(res).mean()) > float(logp(prop).mean())


def test_importance_and_sir():
    from sbi_tpu.samplers.importance.importance_sampling import (
        importance_sample,
        sampling_importance_resampling,
    )

    proposal = MultivariateNormal(jnp.zeros(2), covariance_matrix=4 * jnp.eye(2))
    samples, logw = importance_sample(logp, proposal, 5000, key=jax.random.PRNGKey(0))
    w = jax.nn.softmax(logw)
    mean_est = np.asarray((w[:, None] * samples).sum(0))
    assert np.allclose(mean_est, np.asarray(MEAN), atol=0.3), mean_est

    sir = sampling_importance_resampling(
        logp, proposal, num_samples=1000, oversampling_factor=32,
        key=jax.random.PRNGKey(1),
    )
    assert np.allclose(np.asarray(sir.mean(0)), np.asarray(MEAN), atol=0.3)


# ---------------------------------------------------------------------------
# Exactness on hard (multimodal / curved) targets — VERDICT r1 item 4.
# The FSM bracket logic is stress-tested where a subtle bug would hide on
# Gaussians: well-separated modes and a banana-shaped ridge.
# ---------------------------------------------------------------------------


def _bimodal_logp(th):
    """Mixture of two x-separated 2-D Gaussians (weights 0.3/0.7).

    Modes share the y-marginal so the x-conditional is bimodal — the
    stepping-out bracket must cross the density valley for chains to mix
    (axis-aligned slice cannot mix diagonally separated modes at all)."""
    m1, m2 = jnp.array([-2.0, 0.0]), jnp.array([2.0, 0.0])
    d1 = th - m1
    d2 = th - m2
    l1 = -0.5 * jnp.sum(d1**2, -1) / 0.25 + jnp.log(0.3)
    l2 = -0.5 * jnp.sum(d2**2, -1) / 0.25 + jnp.log(0.7)
    return jax.scipy.special.logsumexp(jnp.stack([l1, l2]), axis=0)


def _banana_logp(th):
    """Rosenbrock-style banana: x ~ N(0,1), y|x ~ N(x^2, 0.1)."""
    x, y = th[:, 0], th[:, 1]
    return -0.5 * x**2 - 0.5 * (y - x**2) ** 2 / 0.1


@pytest.mark.parametrize(
    "runner", [run_slice_vectorized_fsm, run_slice_vectorized_sweep],
    ids=["slice-fsm", "slice-sweep"],
)
def test_mcmc_bimodal_mode_weights(runner):
    """Chains must mix across well-separated modes with the right weights."""
    inits = jax.random.normal(jax.random.PRNGKey(0), (100, 2)) * 3.0
    draws = runner(_bimodal_logp, inits, num_samples=200, warmup_steps=200,
                   key=jax.random.PRNGKey(1))
    flat = np.asarray(draws.reshape(-1, 2))
    w2 = float((flat[:, 0] > 0).mean())
    assert abs(w2 - 0.7) < 0.1, f"mode weight {w2} vs 0.7"
    # Conditional mode means
    assert np.allclose(flat[flat[:, 0] > 0].mean(0), [2.0, 0.0], atol=0.2)
    assert np.allclose(flat[flat[:, 0] < 0].mean(0), [-2.0, 0.0], atol=0.2)


@pytest.mark.parametrize(
    "runner",
    [run_slice_vectorized_fsm, run_slice_vectorized_sweep, run_hmc, run_nuts],
    ids=["slice-fsm", "slice-sweep", "hmc", "nuts"],
)
def test_mcmc_banana_moments(runner):
    """Curved ridge: E[y] = E[x^2] = 1, Var[x] = 1."""
    inits = jax.random.normal(jax.random.PRNGKey(2), (100, 2))
    draws = runner(_banana_logp, inits, num_samples=400, warmup_steps=300,
                   key=jax.random.PRNGKey(3))
    flat = np.asarray(draws.reshape(-1, 2))
    assert abs(flat[:, 0].mean()) < 0.15
    assert abs(flat[:, 0].var() - 1.0) < 0.25
    assert abs(flat[:, 1].mean() - 1.0) < 0.25


def test_arviz_inference_data_gating():
    """get_arviz_inference_data (ref mcmc_posterior.py:288): chain-resolved
    draws are recorded by sample(); the arviz import is gated like the
    reference gates pymc (was pragma-no-cover dead code, VERDICT item 8)."""
    from sbi_tpu.inference import MCMCPosterior
    from sbi_tpu.inference.potentials.base_potential import (
        CustomPotentialWrapper,
    )
    from sbi_tpu.utils.distributions import MultivariateNormal

    prior = MultivariateNormal(jnp.zeros(2), jnp.eye(2))
    post = MCMCPosterior(
        CustomPotentialWrapper(
            lambda t: -0.5 * jnp.sum(t**2, axis=-1), prior=prior
        ),
        proposal=prior,
        num_chains=8,
        warmup_steps=20,
    )
    with pytest.raises(ValueError, match="sample"):
        post.get_arviz_inference_data()
    post.sample((40,), x=jnp.zeros((1, 2)), key=jax.random.PRNGKey(0))
    draws = post._last_chain_draws
    assert draws.ndim == 3 and draws.shape[1] == 8 and draws.shape[2] == 2
    try:
        import arviz  # noqa: F401

        idata = post.get_arviz_inference_data()
        assert idata.posterior.sizes["chain"] == 8
    except ImportError:
        with pytest.raises(ImportError, match="arviz"):
            post.get_arviz_inference_data()


def test_fsm_resumable_state_and_bounded_programs():
    """Resumable FSM chains (no reference counterpart — `slice_numpy.py` is
    host-stepped): warmup ONCE, advance in bounded device programs, and the
    concatenated stream must match the monolithic program statistically.
    `max_sweeps_per_program` on the high-level entry does the same chunking
    internally (the bounded-program mode for very expensive potentials)."""
    from sbi_tpu.samplers.mcmc.slice_fsm import (
        slice_fsm_advance,
        slice_fsm_warmup,
    )

    inits = jax.random.normal(jax.random.PRNGKey(0), (50, 2))

    # explicit state API
    state = slice_fsm_warmup(logp, inits, warmup_steps=100,
                             key=jax.random.PRNGKey(1))
    assert state.x.shape == (50, 2) and state.widths.shape == (2,)
    parts = []
    for c in range(3):
        draws, state2 = slice_fsm_advance(
            logp, state, 100, key=jax.random.PRNGKey(10 + c)
        )
        assert draws.shape == (100, 50, 2)
        # chains moved to a new, valid position (the carry may sit past the
        # last recorded sweep — chains keep stepping until all have
        # recorded, so exact equality with draws[-1] is not an invariant)
        assert bool(jnp.isfinite(state2.x).all())
        assert not jnp.allclose(state2.x, state.x)
        parts.append(draws)
        state = state2
    flat = np.asarray(jnp.concatenate(parts).reshape(-1, 2))
    assert np.allclose(flat.mean(0), np.asarray(MEAN), atol=0.15)
    assert np.allclose(np.cov(flat.T), np.asarray(COV), atol=0.3)

    # high-level chunked mode
    draws = run_slice_vectorized_fsm(
        logp, inits, num_samples=300, warmup_steps=100,
        key=jax.random.PRNGKey(2), max_sweeps_per_program=64,
    )
    assert draws.shape == (300, 50, 2)
    flat = np.asarray(draws.reshape(-1, 2))
    assert np.allclose(flat.mean(0), np.asarray(MEAN), atol=0.15)
    assert np.allclose(np.cov(flat.T), np.asarray(COV), atol=0.3)

    # thinning composes with chunking (global stream thinning)
    thinned = run_slice_vectorized_fsm(
        logp, inits, num_samples=50, thin=3, warmup_steps=50,
        key=jax.random.PRNGKey(3), max_sweeps_per_program=64,
    )
    assert thinned.shape == (50, 50, 2)


def test_fsm_chunked_no_warmup_still_moves():
    """Regression: warmup_steps=0 with max_sweeps_per_program used to
    tune widths from an EMPTY warmup buffer -> NaN widths -> every chain
    silently frozen at its init. Chains must move and track the target."""
    inits = MEAN[None, :] + jax.random.normal(jax.random.PRNGKey(0), (50, 2))
    draws = run_slice_vectorized_fsm(
        logp, inits, num_samples=200, warmup_steps=0,
        key=jax.random.PRNGKey(1), max_sweeps_per_program=32,
    )
    assert bool(jnp.isfinite(draws).all())
    assert not jnp.allclose(draws[-1], inits)  # moved
    flat = np.asarray(draws[50:].reshape(-1, 2))
    assert np.allclose(flat.mean(0), np.asarray(MEAN), atol=0.2)


@pytest.mark.parametrize("runner", [run_hmc, run_nuts], ids=["hmc", "nuts"])
def test_hmc_nuts_bounded_programs(runner):
    """max_sweeps_per_program for the gradient kernels: warmup once, then
    equal-size recording programs with the last position carried — must
    match the monolithic program statistically."""
    inits = jax.random.normal(jax.random.PRNGKey(0), (50, 2))
    draws = runner(logp, inits, num_samples=300, warmup_steps=100,
                   key=jax.random.PRNGKey(1), max_sweeps_per_program=64)
    assert draws.shape == (300, 50, 2)
    flat = np.asarray(draws.reshape(-1, 2))
    assert np.allclose(flat.mean(0), np.asarray(MEAN), atol=0.15), flat.mean(0)
    assert np.allclose(np.cov(flat.T), np.asarray(COV), atol=0.3)


def test_chunked_warmup_bounded_programs():
    """EVERY device program bounded, including warmup (the TPU-worker
    fault scenario is a single multi-minute program; warmup on an
    expensive potential is itself such a program). Chunked warmup must
    tune widths / adaptation like the monolithic one and keep accuracy."""
    from sbi_tpu.samplers.mcmc.slice_fsm import slice_fsm_warmup

    inits = jax.random.normal(jax.random.PRNGKey(0), (50, 2))

    # slice FSM: warmup_steps > max_sweeps_per_program -> chunked warmup
    state = slice_fsm_warmup(
        logp, inits, warmup_steps=100, key=jax.random.PRNGKey(1),
        max_sweeps_per_program=16,
    )
    assert state.x.shape == (50, 2) and state.widths.shape == (2,)
    assert bool(jnp.isfinite(state.widths).all())
    assert bool((state.widths > 0).all())
    # widths tuned to the target scale (COV diag ~ [1, 2.25] -> 2*std)
    assert np.asarray(state.widths).max() < 10.0

    draws = run_slice_vectorized_fsm(
        logp, inits, num_samples=300, warmup_steps=100,
        key=jax.random.PRNGKey(2), max_sweeps_per_program=16,
    )
    flat = np.asarray(draws.reshape(-1, 2))
    assert np.allclose(flat.mean(0), np.asarray(MEAN), atol=0.15)
    assert np.allclose(np.cov(flat.T), np.asarray(COV), atol=0.3)

    # gradient kernels: dual-averaging carry threaded across warmup chunks
    for runner in (run_hmc, run_nuts):
        draws = runner(logp, inits, num_samples=200, warmup_steps=100,
                       key=jax.random.PRNGKey(3), max_sweeps_per_program=32)
        flat = np.asarray(draws.reshape(-1, 2))
        assert np.allclose(flat.mean(0), np.asarray(MEAN), atol=0.15)
        assert np.allclose(np.cov(flat.T), np.asarray(COV), atol=0.35)


def test_max_sweeps_auto_resolution():
    """MCMCPosterior defaults max_sweeps_per_program to a bounded value on
    TPU backends and to monolithic (None) elsewhere; explicit values pass
    through; invalid values raise."""
    from sbi_tpu.inference.posteriors.mcmc_posterior import (
        DEFAULT_TPU_SWEEPS_PER_PROGRAM,
        _resolve_max_sweeps,
    )

    assert _resolve_max_sweeps(None) is None
    assert _resolve_max_sweeps(17) == 17
    expected = (
        DEFAULT_TPU_SWEEPS_PER_PROGRAM
        if jax.default_backend() == "tpu" else None
    )
    assert _resolve_max_sweeps("auto") == expected
    with pytest.raises(ValueError, match="max_sweeps_per_program"):
        _resolve_max_sweeps(0)
