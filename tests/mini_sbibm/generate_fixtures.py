"""Generate golden posterior-sample fixtures for the mini-sbibm tasks.

Reference posteriors come from analytic inversion (two_moons, the linear
Gaussian tasks) or long-run vectorized slice MCMC on the *exact* likelihood
(slcp). Run once; outputs committed under files/.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from sbi_tpu.samplers.mcmc.slice_jax import run_slice_vectorized  # noqa: E402
from sbi_tpu.simulators.tasks import get_task  # noqa: E402
from sbi_tpu.utils.transforms import mcmc_transform, transformed_potential  # noqa: E402

FILES_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "files")
NUM_OBS = 3
# Analytic tasks sample exactly, so the golden size is free statistical
# power: 10k matches the reference's committed two_moons/slcp fixtures and
# lets benchmark C2STs run at n=4000+ (a 1k golden clamps every eval to
# n=1000, hiding ~+/-0.02-level mismatches — discovered in round 5 when a
# "4000-sample" gaussian_linear eval silently reproduced the 1k scores).
NUM_SAMPLES = 10_000
SLCP_NUM_SAMPLES = 1000  # MCMC-generated; superseded by slcp_ref.npz anyway


def gen_analytic(name):
    task = get_task(name)
    obs, thetas, refs = [], [], []
    for i in range(NUM_OBS):
        key = jax.random.PRNGKey(1000 + i)
        theta_o, x_o = task.default_x_o(key=key)
        ref = task.reference_sampler(x_o, NUM_SAMPLES, key=jax.random.fold_in(key, 1))
        obs.append(np.asarray(x_o[0]))
        thetas.append(np.asarray(theta_o[0]))
        refs.append(np.asarray(ref))
    return np.stack(obs), np.stack(thetas), np.stack(refs)


def gen_slcp():
    task = get_task("slcp")
    obs, thetas, refs = [], [], []
    for i in range(NUM_OBS):
        key = jax.random.PRNGKey(2000 + i)
        theta_o, x_o = task.default_x_o(key=key)
        # exact posterior \propto L(theta; x_o) * prior via slice MCMC
        tt = mcmc_transform(task.prior)

        def potential(theta):
            return task.log_likelihood(theta, x_o[0]) + task.prior.log_prob(theta)

        pot_u = transformed_potential(potential, tt)
        k1, k2 = jax.random.split(jax.random.fold_in(key, 7))
        inits_raw = task.prior.sample(k1, (100,))
        inits = tt.forward(inits_raw)
        draws_u = run_slice_vectorized(
            pot_u, inits, num_samples=SLCP_NUM_SAMPLES // 100 * 4, thin=4,
            warmup_steps=300, key=k2,
        )
        samples = tt.inverse(draws_u.reshape(-1, 5))[:SLCP_NUM_SAMPLES]
        obs.append(np.asarray(x_o[0]))
        thetas.append(np.asarray(theta_o[0]))
        refs.append(np.asarray(samples))
    return np.stack(obs), np.stack(thetas), np.stack(refs)


def main():
    os.makedirs(FILES_DIR, exist_ok=True)
    for name in ("two_moons", "linear_mvg_2d", "gaussian_linear", "gaussian_mixture"):
        o, t, r = gen_analytic(name)
        np.savez_compressed(
            os.path.join(FILES_DIR, f"{name}.npz"),
            observations=o, true_thetas=t, reference_samples=r,
        )
        print(name, o.shape, r.shape)
    # slcp's self-generated fixture needs a long MCMC run and is superseded
    # by the reference-imported slcp_ref.npz; regenerate only on request.
    if "slcp" in sys.argv[1:]:
        o, t, r = gen_slcp()
        np.savez_compressed(
            os.path.join(FILES_DIR, "slcp.npz"),
            observations=o, true_thetas=t, reference_samples=r,
        )
        print("slcp", o.shape, r.shape)


if __name__ == "__main__":
    main()
