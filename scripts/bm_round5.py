"""Round-5 mini-sbibm experiment driver.

Targets (VERDICT round 4):
  2. SLCP <= 0.50: per-member data scaling (poe16@4M landed 0.5133, down
     from 0.5202 @2M) -> 8M; structured (m, chol S) head = the K=1
     full-covariance log-scale Gaussian head (exactly the per-trial
     likelihood's parameterization).
  4. NPSE two_moons seed spread < 0.03: per-member FRESH simulation draws
     (members no longer inherit one seed's data-draw outliers) + 4000-sample
     C2ST eval (the 2000-sample metric noise is ~+/-0.02).
  5. gaussian_linear npe-nsf <= 0.55 @30k: fewer bins / wider tail_bound /
     affine-heavy hybrid.

Runs on the real TPU backend. Every PoE stage checkpoints (crash-resume).
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


def run_npse_tm_ens_fresh(seed, per_member=30000, n_members=4,
                          batch_size=200, patience=50, eval_n=4000,
                          sample_kw=None, est_kw=None):
    """NPSE two_moons ensemble with PER-MEMBER FRESH simulation draws:
    each member trains on its own disjoint fresh block (so a data-draw
    outlier poisons at most one member, not all four), and the C2ST eval
    uses 4000 samples vs the reference's 10k-sample golden posteriors to
    cut metric noise below the spread target."""
    from sbi_tpu.inference import NPSE
    from sbi_tpu.neural_nets.factory import posterior_score_nn
    from sbi_tpu.utils.metrics import c2st

    b3 = bm3()
    bench = b3.get_bench_task("two_moons")
    prior = bench.prior
    b3.seed_all_backends(seed)
    total = per_member * n_members
    theta = prior.sample(jr.PRNGKey(1000 * seed), (total,))
    x = bench.simulator(theta, key=jr.PRNGKey(1000 * seed + 1))
    ekw = dict(model="ada_mlp", sde_type="vp",
               hidden_features=256, num_layers=6)
    ekw.update(est_kw or {})
    est = posterior_score_nn(**ekw)
    inference = NPSE(prior=prior, density_estimator=est)
    inference.append_simulations(theta, x)
    member_rows = [
        np.arange(m * per_member, (m + 1) * per_member)
        for m in range(n_members)
    ]
    inference.train_ensemble(
        num_members=n_members, training_batch_size=batch_size,
        epoch_chunk=25, stop_after_epochs=patience,
        member_train_indices=member_rows,
    )
    scores = []
    for i in (0, 1, 2):
        x_o = bench.get_observation(i)
        ens = inference.build_ensemble_posterior(
            potential_combination="mixture")
        ens.set_default_x(x_o)
        ref = bench.get_reference_posterior_samples(i)
        n = min(eval_n, ref.shape[0])
        kw = dict(steps=1000, corrector="langevin")
        kw.update(sample_kw or {})
        samples = ens.sample((n,), key=jr.PRNGKey(1000 * seed + 10 + i),
                             **kw)
        s = float(c2st(samples, ref[:n]))
        scores.append(s)
        print(f"  obs {i}: c2st={s:.4f}", flush=True)
    return scores


def _restore_poe_flagship(ckpt_dir="/tmp/poe_8m_ckpt", per_member=500_000,
                          n_members=16, num_components=2):
    """Rebuild a PoE flagship (est, stacked params) from its checkpoint by
    replaying the deterministic chunked data stage — the estimator's
    z-scoring transforms are statistics of the training data, so the SAME
    data must be appended before restore (see bm_round3._restore_stacked).
    The data keys (500/600, fold_in per 1M chunk) match
    bm_round3.run_poe_vmapped_slcp, so any of its checkpoints restores."""
    from sbi_tpu.inference import NLE_A
    from sbi_tpu.neural_nets.factory import likelihood_nn

    b3 = bm3()
    bench = b3.get_bench_task("slcp")
    prior = bench.prior
    b3.seed_all_backends(0)
    inf = NLE_A(prior=prior, density_estimator=likelihood_nn(
        "mdn", num_components=num_components, scale_parameterization="log",
        num_layers=5, hidden_features=256))
    total = n_members * per_member
    theta_parts, x_parts = [], []
    for lo in range(0, total, 1_000_000):
        n = min(1_000_000, total - lo)
        ck = lo // 1_000_000
        th = prior.sample(jr.fold_in(jr.PRNGKey(500), ck), (n,))
        xx = bench.simulator(th, key=jr.fold_in(jr.PRNGKey(600), ck))
        theta_parts.append(np.asarray(th))
        x_parts.append(np.asarray(xx))
        print(f"  flagship data chunk {ck}: {lo + n}/{total}", flush=True)
    theta_np = np.concatenate(theta_parts)
    x_np = np.concatenate(x_parts)
    del theta_parts, x_parts
    inf.append_simulations(np.repeat(theta_np, 4, axis=0),
                           x_np.reshape(-1, 2))
    del theta_np, x_np
    restored = b3._restore_stacked(inf, n_members, f"{ckpt_dir}/round0",
                                   label="flagship-8m")
    if restored is None:
        raise RuntimeError(f"no flagship checkpoint at {ckpt_dir}/round0")
    return bench, prior, restored[0], restored[1]


MIX_CKPT = "/tmp/poe_mix4m_ckpt"


def run_poe_mix_proposals(mix_unique=24_000, obs_list=(0, 1, 2)):
    """Stage 1 of the posterior-mix experiment: draw posterior-region thetas
    from the 8M flagship PoE, pooled over the benchmark observations, and
    save them for the training stage (separate queue entry => separate
    process, so the 32M-row flagship data is freed before training).

    Lever rationale (STATUS 'Known gaps'): the 8M residual is a small
    observation-uniform head bias; NLE's conditional-density fit is
    proposal-unbiased in theta, so concentrating a SMALL data fraction where
    MCMC actually evaluates the likelihood sharpens the fit there without
    the 50%-concentration collapse sequential refinement showed (0.6905)."""
    import json

    os.makedirs(MIX_CKPT, exist_ok=True)
    out = f"{MIX_CKPT}/theta_mix.npy"
    if os.path.exists(out):
        print("  proposals already on disk", flush=True)
        return [0.0]
    b3 = bm3()
    # Proposal source: any completed 4M+ PoE checkpoint — posterior-region
    # thetas don't need the best head, just a converged one. The 8M flagship
    # checkpoint died with a VM restart; fall back to the K=3 4M checkpoint
    # (sibling of the 0.5133 K=2 run, same data keys).
    if os.path.isdir("/tmp/poe_8m_ckpt/round0"):
        bench, prior, est, stacked = _restore_poe_flagship()
    else:
        bench, prior, est, stacked = _restore_poe_flagship(
            ckpt_dir="/tmp/poe_k3_ckpt", per_member=250_000,
            num_components=3)
    per_obs = mix_unique // len(obs_list)
    parts = []
    for i in obs_list:
        obs_path = f"{MIX_CKPT}/theta_obs{i}.npy"
        if os.path.exists(obs_path):
            parts.append(np.load(obs_path))
            continue
        t0 = time.time()
        x_o = bench.get_observation(i).reshape(4, 2)
        draws = b3._poe_sample(est, stacked, prior, x_o, per_obs,
                               key=jr.PRNGKey(9100 + i))
        np.save(obs_path, np.asarray(draws))
        parts.append(np.asarray(draws))
        print(f"  obs {i}: {per_obs} posterior draws in "
              f"{time.time()-t0:.0f}s", flush=True)
    theta_mix = np.concatenate(parts)[:mix_unique]
    rng = np.random.default_rng(0)
    rng.shuffle(theta_mix)
    np.save(out, theta_mix)
    json.dump({"n": int(theta_mix.shape[0])},
              open(f"{MIX_CKPT}/meta.json", "w"))
    print(f"  saved {theta_mix.shape[0]} pooled proposals", flush=True)
    return [0.0]


def run_poe_mix_slcp(per_member=250_000, mix_per_member=24_000, n_members=16,
                     batch_size=2048, patience=400, eval_n=2000,
                     ckpt_dir=None):
    """Stage 2: PoE16 with ~10% posterior-region data. Each member trains on
    its own disjoint prior block plus the SAME posterior-region thetas
    simulated with a member-distinct key (x-disjoint): repeated x|theta
    draws at posterior-region thetas densify exactly the conditionals the
    PoE potential evaluates. If mix_per_member exceeds the 24k unique pooled
    proposals, thetas are tiled — extra iid x-draws at the same theta are
    exactly the densification the lever wants. A/B control at equal total
    budget: poe16_gauss_4m = 0.5133 (all-prior)."""
    from sbi_tpu.inference import NLE_A
    from sbi_tpu.neural_nets.factory import likelihood_nn

    b3 = bm3()
    bench = b3.get_bench_task("slcp")
    prior = bench.prior
    K = n_members
    ckpt_dir = ckpt_dir or MIX_CKPT
    os.makedirs(ckpt_dir, exist_ok=True)
    prior_per_member = per_member - mix_per_member
    theta_mix = np.load(f"{MIX_CKPT}/theta_mix.npy")
    if mix_per_member > theta_mix.shape[0]:
        reps = -(-mix_per_member // theta_mix.shape[0])
        theta_mix = np.tile(theta_mix, (reps, 1))
    theta_mix = theta_mix[:mix_per_member]
    mix_n = theta_mix.shape[0]

    b3.seed_all_backends(0)
    inf = NLE_A(prior=prior, density_estimator=likelihood_nn(
        "mdn", num_components=2, scale_parameterization="log",
        num_layers=5, hidden_features=256))

    print("  simulating prior blocks...", flush=True)
    total_prior = K * prior_per_member
    theta_parts, x_parts = [], []
    for lo in range(0, total_prior, 1_000_000):
        n = min(1_000_000, total_prior - lo)
        ck = lo // 1_000_000
        th = prior.sample(jr.fold_in(jr.PRNGKey(1500), ck), (n,))
        xx = bench.simulator(th, key=jr.fold_in(jr.PRNGKey(1600), ck))
        theta_parts.append(np.asarray(th))
        x_parts.append(np.asarray(xx))
        print(f"  sim chunk {ck}: {lo + n}/{total_prior}", flush=True)
    print("  simulating member mix blocks...", flush=True)
    th_mix_j = jnp.asarray(theta_mix)
    for m in range(K):
        xm = bench.simulator(th_mix_j, key=jr.fold_in(jr.PRNGKey(1700), m))
        theta_parts.append(theta_mix)
        x_parts.append(np.asarray(xm))
    theta_np = np.concatenate(theta_parts)
    x_np = np.concatenate(x_parts)
    del theta_parts, x_parts
    inf.append_simulations(np.repeat(theta_np, 4, axis=0),
                           x_np.reshape(-1, 2))
    del theta_np, x_np
    base = 4 * total_prior
    member_rows = [
        np.concatenate([
            np.arange(m * 4 * prior_per_member,
                      (m + 1) * 4 * prior_per_member),
            base + np.arange(m * 4 * mix_n, (m + 1) * 4 * mix_n),
        ])
        for m in range(K)
    ]

    ckpt = f"{ckpt_dir}/round0"
    restored = b3._restore_stacked(inf, K, ckpt, label="mix round 0")
    if restored is not None:
        est, stacked = restored
    else:
        est, stacked = b3._train_stacked(
            inf, K, ckpt, member_rows, batch_size, patience,
            label="mix round 0", max_num_epochs=400, lr_schedule="cosine",
            lr_decay_epochs=400, lr_final_factor=1e-3,
        )
    return b3._score_obs_cached(
        (0, 1, 2),
        f"{ckpt_dir}/scores.json" if eval_n == 2000
        else f"{ckpt_dir}/scores_n{eval_n}.json",
        lambda i: b3._eval_poe(est, stacked, prior, bench, i, n=eval_n)[0],
    )


def run_poe_hw_slcp(per_member=250_000, n_members=16, batch_size=2048,
                    patience=400, eval_n=2000, alpha=0.5,
                    ckpt_dir="/tmp/poe_hw_ckpt"):
    """The LAST untried ledger lever (STATUS 'Known gaps'): heteroscedastic
    loss weighting near small-variance theta regions. SLCP's per-trial
    likelihood is N(m(theta), S(theta)) with det S = (t3^2 t4^2)^2 (1-rho^2):
    where S is small, tiny errors in the fitted mean cost large
    likelihood-ratio errors, but those rows carry no extra weight in plain
    NLL. Weight w ∝ det(S)^{-alpha/2}, clipped at its 99th percentile
    (t3,t4 -> 0 blows up), implemented PURELY at the data layer: each
    member's training rows are a weighted with-replacement resample of its
    own disjoint block. Duplicated indices reweight the empirical loss while
    z-scoring stats and architecture stay bit-identical to the A/B control
    (poe16_gauss_4m = 0.5133, same data keys, same budget). Caveat noted:
    the member-internal train/val split sees duplicated rows on both sides,
    so val loss is mildly optimistic — uniform over epochs, so best-val
    snapshot selection is unaffected to first order."""
    from sbi_tpu.inference import NLE_A
    from sbi_tpu.neural_nets.factory import likelihood_nn

    b3 = bm3()
    bench = b3.get_bench_task("slcp")
    prior = bench.prior
    K = n_members
    os.makedirs(ckpt_dir, exist_ok=True)

    b3.seed_all_backends(0)
    inf = NLE_A(prior=prior, density_estimator=likelihood_nn(
        "mdn", num_components=2, scale_parameterization="log",
        num_layers=5, hidden_features=256))
    total = K * per_member
    theta_parts, x_parts = [], []
    for lo in range(0, total, 1_000_000):
        n = min(1_000_000, total - lo)
        ck = lo // 1_000_000
        th = prior.sample(jr.fold_in(jr.PRNGKey(500), ck), (n,))
        xx = bench.simulator(th, key=jr.fold_in(jr.PRNGKey(600), ck))
        theta_parts.append(np.asarray(th))
        x_parts.append(np.asarray(xx))
        print(f"  sim chunk {ck}: {lo + n}/{total}", flush=True)
    theta_np = np.concatenate(theta_parts)
    x_np = np.concatenate(x_parts)
    del theta_parts, x_parts
    inf.append_simulations(np.repeat(theta_np, 4, axis=0),
                           x_np.reshape(-1, 2))

    # Per-theta weights -> per-row (4 iid-trial rows share the theta).
    s1 = theta_np[:, 2] ** 2
    s2 = theta_np[:, 3] ** 2
    rho = np.tanh(theta_np[:, 4])
    log_det = 2 * (np.log(s1) + np.log(s2)) + np.log1p(-rho**2)
    w = np.exp(-0.5 * alpha * log_det)
    w = np.minimum(w, np.quantile(w, 0.99))
    del theta_np, x_np

    rng = np.random.default_rng(12345)
    member_rows = []
    for m in range(K):
        pair_idx = np.arange(m * per_member, (m + 1) * per_member)
        wm = w[pair_idx]
        draw = rng.choice(pair_idx, size=per_member, replace=True,
                          p=wm / wm.sum())
        rows = (4 * draw[:, None] + np.arange(4)[None, :]).reshape(-1)
        member_rows.append(rows)
    print(f"  weighted resample done (unique frac "
          f"{np.unique(member_rows[0]).size / member_rows[0].size:.2f})",
          flush=True)

    restored = b3._restore_stacked(inf, K, f"{ckpt_dir}/round0",
                                   label="hw round 0")
    if restored is not None:
        est, stacked = restored
    else:
        est, stacked = b3._train_stacked(
            inf, K, f"{ckpt_dir}/round0", member_rows, batch_size, patience,
            label="hw round 0", max_num_epochs=400, lr_schedule="cosine",
            lr_decay_epochs=400, lr_final_factor=1e-3,
        )
    return b3._score_obs_cached(
        (0, 1, 2),
        f"{ckpt_dir}/scores.json" if eval_n == 2000
        else f"{ckpt_dir}/scores_n{eval_n}.json",
        lambda i: b3._eval_poe(est, stacked, prior, bench, i, n=eval_n)[0],
    )


def run_npe_gl_nsf_ens(num_simulations=30000, n_members=8, batch_size=200,
                       patience=100, eval_n=4000):
    """gaussian_linear npe-nsf via the vmapped ensemble (defined in round 4,
    never executed): the @30k failure is obs-specific single-fit variance
    (obs0 0.50 vs obs1 0.60 at identical configs), which mixture averaging
    over 8 members trained as ONE XLA program cancels. eval_n=4000 halves
    the ~+/-0.02 C2ST metric noise of the 2000-sample evals."""
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
        n = min(eval_n, ref.shape[0])
        samples = ens.sample((n,), key=jr.PRNGKey(10 + i))
        s = float(c2st(samples, ref[:n]))
        scores.append(s)
        print(f"  obs {i}: c2st={s:.4f}", flush=True)
    return scores


EXPERIMENTS = {
    # --- SLCP campaign -----------------------------------------------------
    # Structured head: the per-trial likelihood IS N(m(theta), S(theta)), so
    # a K=1 full-covariance log-scale Gaussian head (mean + Cholesky scale)
    # is the exactly-correctly-specified regression — no mixture-weight
    # freedom to misallocate. (VERDICT r4 item 2's "(m, chol S)-structured
    # head"; ref recipe context `sbi/neural_nets/net_builders/flow.py`.)
    "poe16_chol_4m": (
        lambda: bm3().run_poe_vmapped_slcp(
            250_000, n_members=16, rounds=1, model="mdn", num_components=1,
            scale_parameterization="log", num_layers=5, hidden_features=256,
            batch_size=2048, patience=400,
            ckpt_dir="/tmp/poe_chol4m_ckpt",
            train_kw=dict(max_num_epochs=400, lr_schedule="cosine",
                          lr_decay_epochs=400, lr_final_factor=1e-3)),
        "nle-chol-poe16-4m", "slcp", 4_000_000,
    ),
    # Per-member data scaling, step 2: 4M halved the 2M gap to the 0.49
    # sampler floor (0.5202 -> 0.5133); 8M doubles per-member data again.
    "poe16_gauss_8m": (
        lambda: bm3().run_poe_vmapped_slcp(
            500_000, n_members=16, rounds=1, model="mdn", num_components=2,
            scale_parameterization="log", num_layers=5, hidden_features=256,
            batch_size=4096, patience=400,
            ckpt_dir="/tmp/poe_8m_ckpt",
            train_kw=dict(max_num_epochs=400, lr_schedule="cosine",
                          lr_decay_epochs=400, lr_final_factor=1e-3)),
        "nle-gauss-poe16-8m", "slcp", 8_000_000,
    ),
    # 8M re-scored at a 4000-sample C2ST (resumes /tmp/poe_8m_ckpt: data +
    # members come from checkpoint, only the MCMC eval reruns) — the 2000-
    # sample metric carries ~+/-0.02 noise, material this close to the 0.49
    # sampler floor.
    "poe16_gauss_8m_eval4k": (
        lambda: bm3().run_poe_vmapped_slcp(
            500_000, n_members=16, rounds=1, model="mdn", num_components=2,
            scale_parameterization="log", num_layers=5, hidden_features=256,
            batch_size=4096, patience=400,
            ckpt_dir="/tmp/poe_8m_ckpt", eval_n=4000,
            train_kw=dict(max_num_epochs=400, lr_schedule="cosine",
                          lr_decay_epochs=400, lr_final_factor=1e-3)),
        "nle-gauss-poe16-8m-eval4k", "slcp", 8_000_000,
    ),
    # --- SLCP final levers (STATUS 'Known gaps': untried) -------------------
    # Stage 1: posterior-region proposals from the 8M flagship (no score;
    # writes /tmp/poe_mix4m_ckpt/theta_mix.npy). Run as its own queue entry
    # so the 32M-row flagship data dies with the process before training.
    "poe_mix_proposals": (
        lambda: run_poe_mix_proposals(),
        "poe-mix-proposals", "slcp", 0,
    ),
    # Stage 2: PoE16 @4M with ~10% posterior-region data (x-disjoint across
    # members). A/B control at equal budget: poe16_gauss_4m = 0.5133.
    "poe16_mix_4m": (
        lambda: run_poe_mix_slcp(),
        "nle-gauss-poe16-mix-4m", "slcp", 4_000_000,
    ),
    # Heteroscedastic row weighting at the 4M budget (the last untried
    # ledger lever). A/B control at equal budget/data: poe16_gauss_4m 0.5133.
    "poe16_hw_4m": (
        lambda: run_poe_hw_slcp(),
        "nle-gauss-poe16-hw-4m", "slcp", 4_000_000,
    ),
    # Mix WINNER follow-ups: the 4M mix run landed 0.5073 — better than the
    # equal-budget all-prior control (0.5133) AND the 8M flagship (0.5117)
    # at half the budget. (a) high-precision 4000-sample rescore (metric
    # noise ~+/-0.02 matters this close to the 0.49 sampler floor);
    # (b) scale the winning recipe to 8M (same ~10% mix share, thetas tiled
    # 2x with fresh x-draws).
    "poe16_mix_4m_eval4k": (
        lambda: run_poe_mix_slcp(eval_n=4000),
        "nle-gauss-poe16-mix-4m-eval4k", "slcp", 4_000_000,
    ),
    "poe16_mix_8m": (
        lambda: run_poe_mix_slcp(per_member=500_000, mix_per_member=48_000,
                                 batch_size=4096,
                                 ckpt_dir="/tmp/poe_mix8m_ckpt"),
        "nle-gauss-poe16-mix-8m", "slcp", 8_000_000,
    ),
    "poe16_mix_8m_eval4k": (
        lambda: run_poe_mix_slcp(per_member=500_000, mix_per_member=48_000,
                                 batch_size=4096, eval_n=4000,
                                 ckpt_dir="/tmp/poe_mix8m_ckpt"),
        "nle-gauss-poe16-mix-8m-eval4k", "slcp", 8_000_000,
    ),
    # Head-capacity probe: K=3 mixture components at the 4M budget — tests
    # whether the observation-uniform residual is mixture-capacity bias
    # (K=2 beat K=1/chol at 4M; is K=3 better still?).
    "poe16_k3_4m": (
        lambda: bm3().run_poe_vmapped_slcp(
            250_000, n_members=16, rounds=1, model="mdn", num_components=3,
            scale_parameterization="log", num_layers=5, hidden_features=256,
            batch_size=2048, patience=400,
            ckpt_dir="/tmp/poe_k3_ckpt",
            train_kw=dict(max_num_epochs=400, lr_schedule="cosine",
                          lr_decay_epochs=400, lr_final_factor=1e-3)),
        "nle-k3-poe16-4m", "slcp", 4_000_000,
    ),
    # --- NPSE seed-spread closure (VERDICT item 4) --------------------------
    "npse_tm_fresh_s1": (
        lambda: run_npse_tm_ens_fresh(1), "npse-ens4-fresh-s1", "two_moons", 120000,
    ),
    "npse_tm_fresh_s2": (
        lambda: run_npse_tm_ens_fresh(2), "npse-ens4-fresh-s2", "two_moons", 120000,
    ),
    "npse_tm_fresh_s3": (
        lambda: run_npse_tm_ens_fresh(3), "npse-ens4-fresh-s3", "two_moons", 120000,
    ),
    # Fresh-draw finding (npse-ens4-fresh-s{1,2,3}: 0.5429/0.5500/0.5833 at
    # the verdict-mandated 4000-sample eval): obs2 reads 0.61-0.64 on EVERY
    # seed — at 4k metric power the "seed-2-obs-2 data-draw outlier" story
    # collapses into a chronic small sampler/model bias at that observation
    # (the 2k eval lacked the power to see it). So the lever is sampler
    # QUALITY, not data variance: double the predictor steps and run 2
    # Langevin corrector sweeps per step.
    "npse_tm_fresh2_s1": (
        lambda: run_npse_tm_ens_fresh(
            1, sample_kw=dict(steps=2000,
                              corrector_params=dict(num_steps=2))),
        "npse-ens4-pc2-s1", "two_moons", 120000,
    ),
    "npse_tm_fresh2_s2": (
        lambda: run_npse_tm_ens_fresh(
            2, sample_kw=dict(steps=2000,
                              corrector_params=dict(num_steps=2))),
        "npse-ens4-pc2-s2", "two_moons", 120000,
    ),
    "npse_tm_fresh2_s3": (
        lambda: run_npse_tm_ens_fresh(
            3, sample_kw=dict(steps=2000,
                              corrector_params=dict(num_steps=2))),
        "npse-ens4-pc2-s3", "two_moons", 120000,
    ),
    # pc2 results: spread 0.020 < 0.03 MET (0.5457/0.5559/0.5660) but obs2
    # stays 0.58-0.62 on every seed/sampler -> the bias lives in the score
    # MODEL. Capacity probe on the worst seed (s2, 0.5660): 1.5x width,
    # +2 layers, 2x patience. If obs2 drops, run the other seeds.
    "npse_tm_big_s2": (
        lambda: run_npse_tm_ens_fresh(
            2, patience=100,
            est_kw=dict(hidden_features=384, num_layers=8),
            sample_kw=dict(steps=2000,
                           corrector_params=dict(num_steps=2))),
        "npse-ens4-big-s2", "two_moons", 120000,
    ),
    "npse_tm_big_s1": (
        lambda: run_npse_tm_ens_fresh(
            1, patience=100,
            est_kw=dict(hidden_features=384, num_layers=8),
            sample_kw=dict(steps=2000,
                           corrector_params=dict(num_steps=2))),
        "npse-ens4-big-s1", "two_moons", 120000,
    ),
    "npse_tm_big_s3": (
        lambda: run_npse_tm_ens_fresh(
            3, patience=100,
            est_kw=dict(hidden_features=384, num_layers=8),
            sample_kw=dict(steps=2000,
                           corrector_params=dict(num_steps=2))),
        "npse-ens4-big-s3", "two_moons", 120000,
    ),
    # --- gaussian_linear npe-nsf @30k (VERDICT item 5) -----------------------
    # The task's posterior is exactly Gaussian: give the spline less to do
    # (fewer bins), more reach (wider tails), and an affine pre-layer that
    # can carry the exact solution.
    "npe_gl_nsf_30k_b5t8": (
        lambda: bm3().run_npe_gl_tuned(
            30_000, model="nsf", hidden_features=100, num_transforms=5,
            interleave_affine=True, num_bins=5, tail_bound=8.0),
        "npe-nsf-b5t8", "gaussian_linear", 30_000,
    ),
    "npe_gl_nsf_30k_b4t10": (
        lambda: bm3().run_npe_gl_tuned(
            30_000, model="nsf", hidden_features=100, num_transforms=6,
            interleave_affine=True, num_bins=4, tail_bound=10.0),
        "npe-nsf-b4t10", "gaussian_linear", 30_000,
    ),
    # Negative result from the two cells above: fewer bins + wider tails
    # LOSE badly (0.597/0.601 vs the 0.5617 default-bin baseline) — spreading
    # 4-5 bins over [-8,10] starves spline resolution where the z-scored
    # data actually lives. Remaining attacks:
    # (a) the vmapped 8-member NSF ensemble (round-4 define, never ran):
    #     obs-level single-fit variance is what mixture averaging cancels;
    # (b) the unchanged baseline re-scored as a control.
    # NOTE eval_n is clamped to the golden-fixture size: gaussian_linear's
    # committed reference posterior has 1000 samples/obs, so every
    # gaussian_linear C2ST (all rounds) is an n=1000 eval regardless of
    # eval_n — confirmed by (b) reproducing round-4's scores to 4 decimals.
    # two_moons and slcp goldens have 10k, so their eval_n=4000 is real.
    # RESULTS: ens8 0.5137 (0.5185/0.5185/0.5040) closes the cell;
    # single-model control 0.5617 (obs1 0.6025) — the obs1 failure is a
    # stable single-fit artifact that mixture averaging removes.
    "npe_gl_nsf_ens8_4k": (
        lambda: run_npe_gl_nsf_ens(30_000, n_members=8),
        "npe-nsf-ens8", "gaussian_linear", 30_000,
    ),
    "npe_gl_nsf_affine_4k": (
        lambda: bm3().run_npe_gl_tuned(
            30_000, model="nsf", hidden_features=100, num_transforms=5,
            interleave_affine=True, eval_n=4000),
        "npe-nsf-affine-r5", "gaussian_linear", 30_000,
    ),
    # Reruns after the golden-fixture upgrade (analytic fixtures now carry
    # 10k samples, so eval_n=4000 is REAL for gaussian_linear; the earlier
    # "-4k" runs silently clamped to the old 1000-sample golden):
    "npe_gl_nsf_ens8_true4k": (
        lambda: run_npe_gl_nsf_ens(30_000, n_members=8),
        "npe-nsf-ens8-n4k", "gaussian_linear", 30_000,
    ),
    "npe_gl_nsf_affine_true4k": (
        lambda: bm3().run_npe_gl_tuned(
            30_000, model="nsf", hidden_features=100, num_transforms=5,
            interleave_affine=True, eval_n=4000),
        "npe-nsf-affine-n4k", "gaussian_linear", 30_000,
    ),
}


def main():
    name = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/bm_results_round5.csv"
    fn, label, task, sims = EXPERIMENTS[name]
    print(f"=== {name}: {label} x {task} @ {sims} sims", flush=True)
    t0 = time.time()
    scores = fn()
    mean = sum(scores) / len(scores)
    print(f"=== {name}: mean {mean:.4f} ({time.time()-t0:.0f}s)", flush=True)
    if sims == 0:  # data-stage entries (no C2ST) don't get a CSV row
        return
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
