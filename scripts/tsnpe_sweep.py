import jax; jax.config.update('jax_platforms','cpu')
import sys, time, itertools, csv, os
sys.path.insert(0, '/root/repo')
import jax.numpy as jnp
import jax.random as jr
from sbi_tpu.inference import NPE
from sbi_tpu.neural_nets.factory import posterior_nn
from sbi_tpu.utils.metrics import c2st
from sbi_tpu.utils.restriction_estimator import RestrictedPrior, get_density_thresholder
from sbi_tpu.utils.sbiutils import seed_all_backends
sys.path.insert(0, '/root/repo/tests')
from mini_sbibm.base_task import get_bench_task

task = sys.argv[1]
num_sim = int(sys.argv[2])
out = sys.argv[3]

CONFIGS = [
    # (rounds, quantile, nsf_kwargs, epochs_kwargs)
    (4, 1e-4, {}, {}),
    (6, 1e-4, {}, {}),
    (4, 1e-3, {}, {}),
    (4, 1e-4, dict(hidden_features=64, num_transforms=8), {}),
    (6, 1e-3, dict(hidden_features=64, num_transforms=8), {}),
    (4, 1e-4, {}, dict(stop_after_epochs=40)),
]

bench = get_bench_task(task)
prior = bench.prior
rows = []
for ci, (rounds, q, nsf_kw, train_kw) in enumerate(CONFIGS):
    seed_all_backends(0)
    per_round = num_sim // rounds
    scores = []
    t0 = time.time()
    for i in range(3):
        x_o = bench.get_observation(i)
        ref = bench.get_reference_posterior_samples(i)[:2000]
        est = posterior_nn("nsf", **nsf_kw) if nsf_kw else "nsf"
        inference = NPE(prior=prior, density_estimator=est)
        proposal = prior
        for r in range(rounds):
            theta = proposal.sample(jr.PRNGKey(1000*i + r), (per_round,))
            x = bench.simulator(theta, key=jr.PRNGKey(2000*i + r))
            inference.append_simulations(theta, x)
            inference.train(force_first_round_loss=True, training_batch_size=100, **train_kw)
            posterior = inference.build_posterior().set_default_x(x_o)
            accept_fn = get_density_thresholder(posterior, quantile=q, key=jr.PRNGKey(3000*i+r))
            proposal = RestrictedPrior(prior, accept_fn)
        samples = posterior.sample((2000,), key=jr.PRNGKey(10+i))
        scores.append(float(c2st(samples, ref)))
    mean = sum(scores)/len(scores)
    row = [task, num_sim, rounds, q, str(nsf_kw), str(train_kw), round(mean,4)] + [round(s,4) for s in scores]
    rows.append(row)
    print(f"config {ci}: rounds={rounds} q={q} nsf={nsf_kw} train={train_kw} -> mean {mean:.4f} {scores} ({time.time()-t0:.0f}s)", flush=True)
    with open(out, "w", newline="") as f:
        w = csv.writer(f); w.writerow(["task","sims","rounds","quantile","nsf","train","mean","o0","o1","o2"]); w.writerows(rows)
