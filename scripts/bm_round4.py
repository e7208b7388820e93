"""Round-4 mini-sbibm experiment driver.

Targets (VERDICT round 3):
  1. NSF-family PoE on SLCP (the config that kernel-faulted in round 3) —
     reproduce/fix the fault, push mean C2ST <= 0.50.
  3. gaussian_linear npe-nsf <= 0.55; npse two_moons seed stability.

Runs on the real TPU backend. Every stage checkpoints (crash-resume).
"""

import csv
import faulthandler
import os
import sys
import time

faulthandler.enable()
faulthandler.dump_traceback_later(600, repeat=True)

import importlib.util as _u

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def _load(name):
    spec = _u.spec_from_file_location(name, os.path.join(_HERE, f"{name}.py"))
    m = _u.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


_BM3 = None


def bm3():
    global _BM3
    if _BM3 is None:
        _BM3 = _load("bm_round3")
    return _BM3


def run_nsf_poe_slcp(per_member, n_members=8, batch_size=1024, patience=40,
                     ckpt_dir="/tmp/nsf_poe_slcp", **est_kw):
    """The round-3 faulting config: K-wide vmapped NSF NLE ensemble on SLCP,
    product-of-experts potential, FSM slice sampling in bounded programs."""
    return bm3().run_poe_vmapped_slcp(
        per_member, n_members=n_members, rounds=1, patience=patience,
        batch_size=batch_size, ckpt_dir=ckpt_dir, model="nsf", **est_kw,
    )


def run_npse_tm_seeded(seed, num_simulations=30000, batch_size=200,
                       patience=50, **est_kw):
    """NPSE two_moons, full pipeline re-seeded (data, init, sampling) —
    VERDICT item 3b: <=0.55 on 3 consecutive seeds, spread < 0.03."""
    from sbi_tpu.inference import NPSE
    from sbi_tpu.neural_nets.factory import posterior_score_nn
    from sbi_tpu.utils.metrics import c2st

    b3 = bm3()
    bench = b3.get_bench_task("two_moons")
    prior = bench.prior
    b3.seed_all_backends(seed)
    theta = prior.sample(jr.PRNGKey(1000 * seed), (num_simulations,))
    x = bench.simulator(theta, key=jr.PRNGKey(1000 * seed + 1))
    est_kw = dict(
        model="ada_mlp", sde_type="vp", hidden_features=256, num_layers=6,
        **est_kw,
    )
    inference = NPSE(prior=prior, density_estimator=posterior_score_nn(**est_kw))
    inference.append_simulations(theta, x)
    inference.train(training_batch_size=batch_size, epoch_chunk=25,
                    stop_after_epochs=patience)
    scores = []
    for i in (0, 1, 2):
        x_o = bench.get_observation(i)
        posterior = inference.build_posterior().set_default_x(x_o)
        ref = bench.get_reference_posterior_samples(i)
        n = min(2000, ref.shape[0])
        samples = posterior.sample(
            (n,), key=jr.PRNGKey(1000 * seed + 10 + i),
            steps=1000, corrector="langevin",
        )
        s = float(c2st(samples, ref[:n]))
        scores.append(s)
        print(f"  obs {i}: c2st={s:.4f}", flush=True)
    return scores


def run_npse_tm_ens(seed, num_simulations=30000, n_members=4,
                    batch_size=200, patience=50):
    """NPSE two_moons with a vmapped score-net ensemble (mixture posterior):
    averaging K independently-initialized members' posteriors cancels the
    single-fit variance behind the seed-2 obs-2 outlier (0.623)."""
    from sbi_tpu.inference import NPSE
    from sbi_tpu.neural_nets.factory import posterior_score_nn
    from sbi_tpu.utils.metrics import c2st

    b3 = bm3()
    bench = b3.get_bench_task("two_moons")
    prior = bench.prior
    b3.seed_all_backends(seed)
    theta = prior.sample(jr.PRNGKey(1000 * seed), (num_simulations,))
    x = bench.simulator(theta, key=jr.PRNGKey(1000 * seed + 1))
    est = posterior_score_nn(model="ada_mlp", sde_type="vp",
                             hidden_features=256, num_layers=6)
    inference = NPSE(prior=prior, density_estimator=est)
    inference.append_simulations(theta, x)
    inference.train_ensemble(
        num_members=n_members, training_batch_size=batch_size,
        epoch_chunk=25, stop_after_epochs=patience,
    )
    scores = []
    for i in (0, 1, 2):
        x_o = bench.get_observation(i)
        ens = inference.build_ensemble_posterior(
            potential_combination="mixture")
        ens.set_default_x(x_o)
        ref = bench.get_reference_posterior_samples(i)
        n = min(2000, ref.shape[0])
        samples = ens.sample((n,), key=jr.PRNGKey(1000 * seed + 10 + i),
                             steps=1000, corrector="langevin")
        s = float(c2st(samples, ref[:n]))
        scores.append(s)
        print(f"  obs {i}: c2st={s:.4f}", flush=True)
    return scores


def run_npe_gl_nsf_ens(num_simulations=30000, n_members=8, batch_size=200,
                       patience=100):
    """gaussian_linear npe-nsf via the vmapped ensemble: single-fit
    per-observation variance (obs1 0.60 vs obs0 0.50 at identical configs)
    is exactly what mixture averaging cancels."""
    from sbi_tpu.inference import NPE
    from sbi_tpu.neural_nets.factory import posterior_nn
    from sbi_tpu.utils.metrics import c2st

    b3 = bm3()
    bench = b3.get_bench_task("gaussian_linear")
    prior = bench.prior
    b3.seed_all_backends(0)
    theta = prior.sample(jr.PRNGKey(0), (num_simulations,))
    x = bench.simulator(theta, key=jr.PRNGKey(1))
    est = posterior_nn("nsf", hidden_features=100, num_transforms=5,
                       interleave_affine=True)
    inference = NPE(prior=prior, density_estimator=est)
    inference.append_simulations(theta, x)
    inference.train_ensemble(
        num_members=n_members, training_batch_size=batch_size,
        epoch_chunk=25, stop_after_epochs=patience,
    )
    scores = []
    for i in (0, 1, 2):
        x_o = bench.get_observation(i)
        ens = inference.build_ensemble_posterior(
            potential_combination="mixture")
        ens.set_default_x(x_o)
        ref = bench.get_reference_posterior_samples(i)
        n = min(2000, ref.shape[0])
        samples = ens.sample((n,), key=jr.PRNGKey(10 + i))
        s = float(c2st(samples, ref[:n]))
        scores.append(s)
        print(f"  obs {i}: c2st={s:.4f}", flush=True)
    return scores


EXPERIMENTS = {
    "npe_gl_nsf_ens8": (
        lambda: run_npe_gl_nsf_ens(30000, n_members=8),
        "npe-nsf-ens8", "gaussian_linear", 30000,
    ),
    # (fn, label, task, sims)
    # --- VERDICT item 3a: gaussian_linear npe-nsf <= 0.55. The posterior
    # is exactly Gaussian; interleave_affine gives each spline block an
    # affine autoregressive pre-layer that can carry the exact solution,
    # leaving the spline to model the (null) residual.
    "npe_gl_nsf_affine": (
        lambda: bm3().run_npe_gl_tuned(
            30000, model="nsf", hidden_features=100, num_transforms=5,
            interleave_affine=True),
        "npe-nsf-affine", "gaussian_linear", 30000,
    ),
    # gaussian_linear: the exact posterior map is affine; NSF must learn an
    # (approximately) identity spline on top. 30k sims leaves obs-specific
    # conditional extrapolation error (obs1/obs2 > 0.58) — simulations are
    # free on device, so close the cell with data.
    "npe_gl_nsf_100k": (
        lambda: bm3().run_npe_gl_tuned(
            100_000, model="nsf", hidden_features=100, num_transforms=5,
            interleave_affine=True),
        "npe-nsf-affine-100k", "gaussian_linear", 100_000,
    ),
    "npse_tm_ens_s1": (lambda: run_npse_tm_ens(1), "npse-ens4-s1", "two_moons", 30000),
    "npse_tm_ens_s2": (lambda: run_npse_tm_ens(2), "npse-ens4-s2", "two_moons", 30000),
    "npse_tm_ens_s3": (lambda: run_npse_tm_ens(3), "npse-ens4-s3", "two_moons", 30000),
    # Rerun after the fixed-time-grid ensemble validation fix ("fv"): the
    # first ens4 runs snapshotted members at noisy random-time val minima.
    "npse_tm_ens_fv_s1": (lambda: run_npse_tm_ens(1), "npse-ens4-fv-s1", "two_moons", 30000),
    "npse_tm_ens_fv_s2": (lambda: run_npse_tm_ens(2), "npse-ens4-fv-s2", "two_moons", 30000),
    "npse_tm_ens_fv_s3": (lambda: run_npse_tm_ens(3), "npse-ens4-fv-s3", "two_moons", 30000),
    # SLCP better-single-head attack via OPTIMIZATION, not architecture:
    # the K=2 log-scale Gaussian head is correctly specified per trial, so
    # the residual ~0.03 over the 0.49 sampler floor is optimization noise
    # of the MLE. Cosine-anneal each member's LR to ~0 over a fixed horizon
    # (no early stop) to converge members far beyond constant-LR+patience.
    "poe16_gauss_cosine_2m": (
        lambda: bm3().run_poe_vmapped_slcp(
            125_000, n_members=16, rounds=1, model="mdn", num_components=2,
            scale_parameterization="log", num_layers=5, hidden_features=256,
            batch_size=1024, patience=400,
            ckpt_dir="/tmp/poe_cos2m_ckpt",
            train_kw=dict(max_num_epochs=400, lr_schedule="cosine",
                          lr_decay_epochs=400, lr_final_factor=1e-3)),
        "nle-gauss-poe16-cos-2m", "slcp", 2_000_000,
    ),
    # The untried SLCP lever: PER-MEMBER data. poe16@2M and poe32@4M both
    # use 125k/member and tie (0.5202 vs 0.5224) — member count is
    # saturated, so the residual is per-member estimation error of the
    # (correctly-specified) head, which scales with member data, not K.
    # 250k/member x 16, cosine-annealed to full convergence.
    "poe16_gauss_4m": (
        lambda: bm3().run_poe_vmapped_slcp(
            250_000, n_members=16, rounds=1, model="mdn", num_components=2,
            scale_parameterization="log", num_layers=5, hidden_features=256,
            batch_size=2048, patience=400,
            ckpt_dir="/tmp/poe_4m_ckpt",
            train_kw=dict(max_num_epochs=400, lr_schedule="cosine",
                          lr_decay_epochs=400, lr_final_factor=1e-3)),
        "nle-gauss-poe16-4m", "slcp", 4_000_000,
    ),
    "npse_tm_s1": (lambda: run_npse_tm_seeded(1), "npse-s1", "two_moons", 30000),
    "npse_tm_s2": (lambda: run_npse_tm_seeded(2), "npse-s2", "two_moons", 30000),
    "npse_tm_s3": (lambda: run_npse_tm_seeded(3), "npse-s3", "two_moons", 30000),
    "nsf_poe8_1m": (
        lambda: run_nsf_poe_slcp(125_000, n_members=8,
                                 ckpt_dir="/tmp/nsf_poe8_1m"),
        "nle-nsf-poe8-1m", "slcp", 1_000_000,
    ),
    "nsf_poe8_250k": (
        lambda: run_nsf_poe_slcp(31_250, n_members=8,
                                 ckpt_dir="/tmp/nsf_poe8_250k"),
        "nle-nsf-poe8-250k", "slcp", 250_000,
    ),
}


def main():
    name = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/bm_results_round4.csv"
    fn, label, task, sims = EXPERIMENTS[name]
    print(f"=== {name}: {label} x {task} @ {sims} sims", flush=True)
    t0 = time.time()
    scores = fn()
    mean = sum(scores) / len(scores)
    print(f"=== {name}: mean {mean:.4f} ({time.time()-t0:.0f}s)", flush=True)
    write_header = not os.path.exists(out)
    with open(out, "a", newline="") as f:
        w = csv.writer(f)
        if write_header:
            w.writerow(["method", "task", "num_simulations", "c2st_mean",
                        "c2st_obs0", "c2st_obs1", "c2st_obs2"])
        w.writerow([label, task, sims, round(mean, 4)] +
                   [round(s, 4) for s in scores])


if __name__ == "__main__":
    main()
