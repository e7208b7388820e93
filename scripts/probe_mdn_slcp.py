"""CPU probe: can an MDN likelihood head with log-parameterized scales fit
the SLCP conditional p(point | theta)?

Protocol (memory/slcp-benchmark-diagnosis): train on iid-factorized pairs,
then compare learned vs exact log-likelihood on reference-posterior thetas.
Round-2 numbers to beat: MAF-50 corr 0.86 / rmse 1.1 nats; MDN-softplus
corr 0.63.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import jax.random as jr
import numpy as np

from sbi_tpu.inference import NLE_A
from sbi_tpu.neural_nets.factory import likelihood_nn
from sbi_tpu.utils.sbiutils import seed_all_backends
from mini_sbibm.base_task import get_bench_task

N_SIMS = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
MODEL = sys.argv[2] if len(sys.argv) > 2 else "nsf_affine"

bench = get_bench_task("slcp")
prior = bench.prior
seed_all_backends(0)

theta = prior.sample(jr.PRNGKey(0), (N_SIMS,))
x = bench.simulator(theta, key=jr.PRNGKey(1))
theta_pts = jnp.repeat(theta, 4, axis=0)
x_pts = x.reshape(-1, 2)

if MODEL == "mdn":
    est_builder = likelihood_nn(
        "mdn", num_components=4, scale_parameterization="log",
        num_layers=3, hidden_features=64,
    )
elif MODEL == "mdn1":
    # SLCP's x|theta is EXACTLY Gaussian per trial -> K=1 is correctly
    # specified; fit error is purely in the theta -> (mean, chol) MLP.
    est_builder = likelihood_nn(
        "mdn", num_components=1, scale_parameterization="log",
        num_layers=4, hidden_features=128,
    )
elif MODEL == "mdn1_big":
    est_builder = likelihood_nn(
        "mdn", num_components=1, scale_parameterization="log",
        num_layers=5, hidden_features=256,
    )
elif MODEL == "mdn2":
    est_builder = likelihood_nn(
        "mdn", num_components=2, scale_parameterization="log",
        num_layers=4, hidden_features=128,
    )
elif MODEL == "mdn2_big":
    est_builder = likelihood_nn(
        "mdn", num_components=2, scale_parameterization="log",
        num_layers=5, hidden_features=256,
    )
elif MODEL == "mdn4_big":
    est_builder = likelihood_nn(
        "mdn", num_components=4, scale_parameterization="log",
        num_layers=5, hidden_features=256,
    )
elif MODEL == "nsf":
    est_builder = likelihood_nn("nsf")
elif MODEL == "maf":
    est_builder = likelihood_nn("maf")
elif MODEL == "maf_logfeat":
    import flax.linen as nn

    class LogFeatM(nn.Module):
        @nn.compact
        def __call__(self, c):
            c = c.reshape(c.shape[0], -1)
            return jnp.concatenate([c, jnp.log(c**2 + 1e-6)], axis=-1)

    est_builder = likelihood_nn(
        "maf", embedding_net=LogFeatM(),
        affine_log_scale_bounds=(-14.0, 5.0),
    )
elif MODEL == "maf_wide":
    est_builder = likelihood_nn("maf", affine_log_scale_bounds=(-14.0, 5.0))
elif MODEL == "nsf_affine":
    est_builder = likelihood_nn("nsf", interleave_affine=True)
elif MODEL == "nsf_affine_big":
    est_builder = likelihood_nn(
        "nsf", interleave_affine=True, hidden_features=128,
        num_transforms=8, num_bins=16,
    )
elif MODEL in ("nsf_affine_logfeat", "nsf_logfeat"):
    import flax.linen as nn

    class LogFeat(nn.Module):
        @nn.compact
        def __call__(self, c):
            c = c.reshape(c.shape[0], -1)
            return jnp.concatenate([c, jnp.log(c**2 + 1e-6)], axis=-1)

    est_builder = likelihood_nn(
        "nsf",
        interleave_affine=(MODEL == "nsf_affine_logfeat"),
        embedding_net=LogFeat(),
        z_score_theta="independent",
    )
else:
    raise SystemExit(f"unknown model {MODEL}")
inf = NLE_A(prior=prior, density_estimator=est_builder)
inf.append_simulations(theta_pts, x_pts)
t0 = time.time()
inf.train(training_batch_size=200, epoch_chunk=10, stop_after_epochs=80)
print(f"trained in {time.time()-t0:.0f}s, epochs={inf._epoch}", flush=True)

est = inf._neural_net.snapshot()

for obs in (0, 1, 2):
    x_o = bench.get_observation(obs).reshape(4, 2)
    ref_theta = bench.get_reference_posterior_samples(obs)[:2000]

    # learned sum over 4 trials
    def learned_ll(th):
        return sum(
            est.log_prob(
                jnp.broadcast_to(x_o[j], (th.shape[0], 2))[None], th
            )[0]
            for j in range(4)
        )

    ll_hat = np.asarray(learned_ll(ref_theta))
    from sbi_tpu.simulators.tasks import slcp_log_likelihood

    ll_true = np.asarray(slcp_log_likelihood(ref_theta, bench.get_observation(obs)))
    m = np.isfinite(ll_true) & np.isfinite(ll_hat)
    c = np.corrcoef(ll_hat[m], ll_true[m])[0, 1]
    rmse = np.sqrt(np.mean((ll_hat[m] - ll_true[m] - np.mean(ll_hat[m] - ll_true[m])) ** 2))
    print(
        f"obs{obs}: corr={c:.4f} centered-rmse={rmse:.3f} nats "
        f"(n={m.sum()})",
        flush=True,
    )
