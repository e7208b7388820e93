import jax; jax.config.update('jax_platforms','cpu')
import sys, time
sys.path.insert(0, '/root/repo')
import jax.numpy as jnp
import jax.random as jr
from sbi_tpu.inference import NPE
from sbi_tpu.utils.metrics import c2st
from sbi_tpu.utils.restriction_estimator import RestrictedPrior, get_density_thresholder
from sbi_tpu.utils.sbiutils import seed_all_backends
sys.path.insert(0, '/root/repo/tests')
from mini_sbibm.base_task import get_bench_task

task = sys.argv[1] if len(sys.argv) > 1 else 'two_moons'
num_sim = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4

seed_all_backends(0)
bench = get_bench_task(task)
prior = bench.prior
per_round = num_sim // rounds
for i in range(3):
    t0 = time.time()
    x_o = bench.get_observation(i)
    ref = bench.get_reference_posterior_samples(i)[:2000]
    inference = NPE(prior=prior, density_estimator="nsf")
    proposal = prior
    for r in range(rounds):
        theta = proposal.sample(jr.PRNGKey(1000*i + r), (per_round,))
        x = bench.simulator(theta, key=jr.PRNGKey(2000*i + r))
        inference.append_simulations(theta, x)
        inference.train(force_first_round_loss=True, training_batch_size=100)
        posterior = inference.build_posterior().set_default_x(x_o)
        accept_fn = get_density_thresholder(posterior, quantile=1e-4, key=jr.PRNGKey(3000*i+r))
        proposal = RestrictedPrior(prior, accept_fn)
    samples = posterior.sample((2000,), key=jr.PRNGKey(10+i))
    print(f"obs {i}: c2st={float(c2st(samples, ref)):.4f}  ({time.time()-t0:.0f}s)", flush=True)
