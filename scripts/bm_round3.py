"""Round-3 benchmark runner: vmapped many-member PoE ensembles for SLCP
plus method-specific retunes (npse, npe/gaussian_linear).

The SLCP attack (VERDICT.md round-2 item 1): member fit error is the
bottleneck (the FSM sampler on the exact likelihood reaches C2ST 0.49);
PoE averaging of K independently trained likelihood members cancels
independent model error ~1/sqrt(K). train_ensemble vmaps all K members
into ONE XLA program, so K=16 costs roughly what one member used to.

Usage: python scripts/bm_round3.py EXPERIMENT [out_csv]
"""

import csv
import faulthandler
import os
import sys
import time

faulthandler.dump_traceback_later(240, repeat=True)

EPOCH_CHUNK = int(os.environ.get("BM_EPOCH_CHUNK", "10"))

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

if os.environ.get("BM_CPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import jax.random as jr
import numpy as np

from sbi_tpu.utils.metrics import c2st
from sbi_tpu.utils.sbiutils import seed_all_backends
from mini_sbibm.base_task import get_bench_task


def _eval_poe(est, stacked_params, prior, bench, i, n=2000,
              mcmc_kw=None):
    """C2ST of the vmapped PoE posterior (mean of member log-liks)."""
    from sbi_tpu.inference import MCMCPosterior
    from sbi_tpu.inference.potentials.base_potential import (
        CustomPotentialWrapper,
    )
    from sbi_tpu.inference.potentials.likelihood_based_potential import (
        _log_likelihoods_over_trials,
    )

    x_o = bench.get_observation(i).reshape(4, 2)

    def potential(theta):
        # lax.map (NOT vmap/unroll) over members: the K=16-wide vmapped
        # NSF inside the FSM while_loop reliably kernel-faults the TPU
        # worker (as did K=7 unrolled in round 2); a member-serial scan
        # keeps the program size K-independent. Same medicine as
        # train_ensemble's scan-outside/vmap-at-step restructure.
        lls = jax.lax.map(
            lambda p: _log_likelihoods_over_trials(x_o, theta, est, params=p),
            stacked_params,
        )  # (K, B)
        return lls.mean(axis=0) + prior.log_prob(theta)

    kw = dict(num_chains=200, warmup_steps=500, thin=5,
              init_strategy="proposal")
    kw.update(mcmc_kw or {})
    post = MCMCPosterior(
        CustomPotentialWrapper(potential, prior=prior),
        proposal=prior, **kw,
    ).set_default_x(x_o)
    ref = bench.get_reference_posterior_samples(i)
    n = min(n, ref.shape[0])
    samples = post.sample((n,), key=jr.PRNGKey(10 + i))
    return float(c2st(samples, ref[:n])), post


def _poe_sample(est, stacked_params, prior, x_o, n, key, mcmc_kw=None):
    """PoE-posterior MCMC draws in bounded device programs.

    One giant device program (warmup + n/chains sweeps of the K-member
    potential) reliably CRASHES the TPU worker beyond ~10^3 sweeps — the
    round-2 ens7 loss and two round-3 crashes were all in this spot.
    max_sweeps_per_program (the FSM's resumable-state mode) keeps every
    program short while paying warmup only once."""
    from sbi_tpu.inference import MCMCPosterior
    from sbi_tpu.inference.potentials.base_potential import (
        CustomPotentialWrapper,
    )
    from sbi_tpu.inference.potentials.likelihood_based_potential import (
        _log_likelihoods_over_trials,
    )

    def potential(theta):
        lls = jax.lax.map(  # member-serial: see _eval_poe
            lambda p: _log_likelihoods_over_trials(x_o, theta, est, params=p),
            stacked_params,
        )
        return lls.mean(axis=0) + prior.log_prob(theta)

    kw = dict(num_chains=200, warmup_steps=300, thin=3,
              init_strategy="proposal")
    kw.update(mcmc_kw or {})
    post = MCMCPosterior(
        CustomPotentialWrapper(potential, prior=prior),
        proposal=prior, **kw,
    ).set_default_x(x_o)
    # Bounded device programs WITHOUT re-warmup per chunk: the FSM's
    # resumable-state mode warms up once and advances in
    # max_sweeps_per_program-sweep programs (slice_fsm.py). 256 sweeps of
    # the K-member potential is well under the program size that faulted
    # the TPU worker (the old workaround re-ran 300-sweep warmups per
    # 12k-draw chunk; this mode pays warmup once).
    return post.sample((n,), key=key, max_sweeps_per_program=256)


def _restore_stacked(inf, K, path, label=""):
    """Rebuild the estimator on the trainer's CURRENT data and restore
    stacked member params from ``path``; None if no checkpoint. The
    estimator must be rebuilt on the SAME data the checkpointed members
    were trained on — its z-scoring transforms are data statistics, and
    a mismatch silently shifts every log-prob."""
    from sbi_tpu.utils.checkpointing import restore_pytree

    if not os.path.exists(path):
        return None
    th_all, x_all, _ = inf.get_simulations(0)
    est = inf._build_neural_net(th_all, x_all)
    template = jax.tree_util.tree_map(
        lambda p: jnp.broadcast_to(p, (K,) + p.shape), est.params
    )
    stacked = restore_pytree(path, like=template)
    print(f"  {label}: restored from checkpoint", flush=True)
    return est, stacked


def _train_stacked(inf, K, path, member_rows, batch_size, patience, label="",
                   max_num_epochs=3000, **train_kw):
    """train_ensemble + checkpoint the stacked member params."""
    from sbi_tpu.utils.checkpointing import save_pytree

    t0 = time.time()
    inf.train_ensemble(
        num_members=K, training_batch_size=batch_size,
        stop_after_epochs=patience, epoch_chunk=EPOCH_CHUNK,
        member_train_indices=member_rows, max_num_epochs=max_num_epochs,
        **train_kw,
    )
    est = inf._ensemble_estimators[0]
    stacked = inf._ensemble_stacked_params
    save_pytree(path, stacked)
    print(f"  {label}: K={K} trained in {time.time()-t0:.0f}s "
          f"({inf.summary['epochs_trained'][-1]} epochs)", flush=True)
    return est, stacked


def _score_obs_cached(obs_list, scores_path, score_fn):
    """Per-observation C2ST with a scores.json crash-resume cache."""
    import json

    scores = {}
    if os.path.exists(scores_path):
        scores = {int(k): v for k, v in json.load(open(scores_path)).items()}
    for i in obs_list:
        if i in scores:
            print(f"  obs {i}: c2st={scores[i]:.4f} (cached)", flush=True)
            continue
        t0 = time.time()
        scores[i] = score_fn(i)
        json.dump(scores, open(scores_path, "w"))
        print(f"  obs {i}: c2st={scores[i]:.4f} ({time.time()-t0:.0f}s)",
              flush=True)
    return [scores[i] for i in obs_list]


def run_poe_vmapped_slcp(per_member, n_members=16, rounds=1,
                         obs_list=(0, 1, 2), patience=100, batch_size=500,
                         ckpt_dir="/tmp/poe_slcp_ckpt", model="nsf",
                         train_kw=None, eval_n=2000, **est_kw):
    """K-member PoE with disjoint per-member simulation blocks, trained as
    one vmapped program. rounds>1 draws later-round data from the current
    PoE posterior pooled over the benchmark observations (round-2 winner's
    schedule, scripts/bm_round2.py::run_nle_iid_ens_slcp).

    Every stage checkpoints to ``ckpt_dir`` (member params per round,
    proposal thetas, per-obs scores) and is skipped on re-run — the TPU
    worker has crashed mid-PoE-MCMC twice across rounds, so the pipeline
    must survive a process restart (memory: round2-operational-notes).
    """
    from sbi_tpu.inference import NLE_A
    from sbi_tpu.neural_nets.factory import likelihood_nn

    bench = get_bench_task("slcp")
    prior = bench.prior
    K = n_members
    per_round = per_member // rounds
    os.makedirs(ckpt_dir, exist_ok=True)

    seed_all_backends(0)
    est_builder = likelihood_nn(model, **est_kw) \
        if (est_kw or model != "nsf") else likelihood_nn("nsf")
    inf = NLE_A(prior=prior, density_estimator=est_builder)

    # Round 1: K disjoint fresh blocks (deterministic keys -> reproducible
    # across resumes). Simulate in <=1M-sim chunks materialized to host:
    # a monolithic 4M-sim program (16M pairs) wedges the TPU tunnel at the
    # first sync — twice, reproducibly — while 2M-sim programs never have.
    # Chunk keys are fold_in(chunk)-derived, so the data stream differs
    # from the old single-shot draw; completed checkpoints are unaffected
    # (restore skips training, and eval never touches the training data).
    print("  simulating round-0 data...", flush=True)
    sim_chunk = 1_000_000
    total = K * per_round
    theta_parts, x_parts = [], []
    for lo in range(0, total, sim_chunk):
        n = min(sim_chunk, total - lo)
        ck = lo // sim_chunk
        th = prior.sample(jr.fold_in(jr.PRNGKey(500), ck), (n,))
        xx = bench.simulator(th, key=jr.fold_in(jr.PRNGKey(600), ck))
        theta_parts.append(np.asarray(th))
        x_parts.append(np.asarray(xx))
        print(f"  sim chunk {ck}: {lo + n}/{total}", flush=True)
    # Trial expansion on HOST: jnp.repeat materializes an (N, 4, 5)
    # device intermediate whose tiled layout pads the size-4 axis to 128
    # lanes — 20.5GB at 8M sims (OOM on v5e); numpy costs the true 640MB.
    theta_np = np.concatenate(theta_parts)
    x_np = np.concatenate(x_parts)
    del theta_parts, x_parts
    print("  data ready", flush=True)
    inf.append_simulations(np.repeat(theta_np, 4, axis=0),
                           x_np.reshape(-1, 2))
    del theta_np, x_np
    member_rows = [
        np.arange(m * 4 * per_round, (m + 1) * 4 * per_round) for m in range(K)
    ]

    restored = _restore_stacked(inf, K, f"{ckpt_dir}/round0", label="round 0")
    if restored is not None:
        est, stacked = restored
        if inf._neural_net is None:
            inf._neural_net = est
    else:
        est, stacked = _train_stacked(
            inf, K, f"{ckpt_dir}/round0", member_rows, batch_size, patience,
            label="round 0", **(train_kw or {}),
        )

    for r in range(1, rounds):
        # Pooled PoE-posterior proposal over the scored observations.
        theta_path = f"{ckpt_dir}/theta_r{r}.npy"
        if os.path.exists(theta_path):
            theta_r = jnp.asarray(np.load(theta_path))
            print(f"  round {r}: proposals restored", flush=True)
        else:
            t0 = time.time()
            parts = []
            n_per_obs = per_round // len(obs_list)
            for i in obs_list:
                # per-obs checkpoint: a worker crash costs one obs, not all
                obs_path = f"{ckpt_dir}/theta_r{r}_obs{i}.npy"
                if os.path.exists(obs_path):
                    parts.append(jnp.asarray(np.load(obs_path)))
                    continue
                x_o = bench.get_observation(i).reshape(4, 2)
                draws = _poe_sample(
                    est, stacked, prior, x_o, K * n_per_obs,
                    key=jr.PRNGKey(7000 + 100 * r + i),
                )
                np.save(obs_path, np.asarray(draws))
                parts.append(draws)
                print(f"  round {r}: obs {i} proposals done "
                      f"({time.time()-t0:.0f}s)", flush=True)
            theta_r = jnp.concatenate(parts)
            theta_r = jax.random.permutation(jr.PRNGKey(31 * r), theta_r)
            np.save(theta_path, np.asarray(theta_r))
            print(f"  round {r}: proposal draws in {time.time()-t0:.0f}s",
                  flush=True)
        x_r = bench.simulator(theta_r, key=jr.PRNGKey(800 + r))
        base = sum(t.shape[0] for t in inf._theta_roundwise)  # rows are pairs
        inf.append_simulations(np.repeat(np.asarray(theta_r), 4, axis=0),
                               np.asarray(x_r).reshape(-1, 2),
                               proposal=object())
        n_r = theta_r.shape[0] // K
        member_rows = [
            np.concatenate([
                member_rows[m],
                base + np.arange(m * 4 * n_r, (m + 1) * 4 * n_r),
            ])
            for m in range(K)
        ]
        restored = _restore_stacked(
            inf, K, f"{ckpt_dir}/round{r}", label=f"round {r}"
        )
        if restored is not None:
            est, stacked = restored
        else:
            est, stacked = _train_stacked(
                inf, K, f"{ckpt_dir}/round{r}", member_rows, batch_size,
                patience, label=f"round {r}",
            )

    return _score_obs_cached(
        obs_list,
        f"{ckpt_dir}/scores.json" if eval_n == 2000
        else f"{ckpt_dir}/scores_n{eval_n}.json",
        lambda i: _eval_poe(est, stacked, prior, bench, i, n=eval_n)[0],
    )


def run_poe_mixed_slcp(
    per_member,
    families=(
        ("mdn", dict(num_components=2, scale_parameterization="log",
                     num_layers=5, hidden_features=256), 8),
        # Second family: same MoG head but different parameterization and
        # trunk geometry (K=4 softplus-scale components, deeper/narrower)
        # => different bias structure. An 8-wide vmapped NSF family was
        # tried first and reliably kernel-faults the TPU worker during
        # TRAINING too (the fault class previously seen only in sampling).
        ("mdn", dict(num_components=4, scale_parameterization="softplus",
                     num_layers=6, hidden_features=192), 8),
    ),
    obs_list=(0, 1, 2),
    patience=100,
    batch_size=1024,
    ckpt_dir="/tmp/poe_mixed_ckpt",
):
    """Architecture-diverse PoE: K members per FAMILY, each family trained
    as one vmapped program on its own disjoint simulation blocks, combined
    as a single product of experts. Rationale: same-architecture PoE
    saturates (poe32 == poe16 at 0.52) because the residual is SHARED
    Gaussian-head bias — a second family with different bias structure is
    the remaining averaging axis."""
    from sbi_tpu.inference import MCMCPosterior, NLE_A
    from sbi_tpu.inference.potentials.base_potential import (
        CustomPotentialWrapper,
    )
    from sbi_tpu.inference.potentials.likelihood_based_potential import (
        _log_likelihoods_over_trials,
    )
    from sbi_tpu.neural_nets.factory import likelihood_nn

    bench = get_bench_task("slcp")
    prior = bench.prior
    os.makedirs(ckpt_dir, exist_ok=True)
    members = []  # (est, stacked, K) per family
    for fi, (model, est_kw, K) in enumerate(families):
        seed_all_backends(fi)
        theta = prior.sample(jr.PRNGKey(1000 + fi), (K * per_member,))
        x = bench.simulator(theta, key=jr.PRNGKey(2000 + fi))
        inf = NLE_A(prior=prior, density_estimator=likelihood_nn(model, **est_kw))
        inf.append_simulations(jnp.repeat(theta, 4, axis=0), x.reshape(-1, 2))
        rows = [
            np.arange(m * 4 * per_member, (m + 1) * 4 * per_member)
            for m in range(K)
        ]
        path = f"{ckpt_dir}/fam{fi}_{model}"
        label = f"family {fi} ({model})"
        restored = _restore_stacked(inf, K, path, label=label)
        if restored is None:
            restored = _train_stacked(
                inf, K, path, rows, batch_size, patience, label=label
            )
        members.append(restored + (K,))

    def score(i):
        x_o = bench.get_observation(i).reshape(4, 2)

        def potential(theta, _x_o=x_o):
            # member-serial lax.map per family (see _eval_poe), families
            # concatenated before the PoE mean.
            lls = [
                jax.lax.map(
                    lambda p, _e=est_f: _log_likelihoods_over_trials(
                        _x_o, theta, _e, params=p
                    ),
                    stacked_f,
                )
                for est_f, stacked_f, _ in members
            ]
            return jnp.concatenate(lls, 0).mean(0) + prior.log_prob(theta)

        post = MCMCPosterior(
            CustomPotentialWrapper(potential, prior=prior), proposal=prior,
            num_chains=200, warmup_steps=500, thin=5,
            init_strategy="proposal",
        ).set_default_x(x_o)
        ref = bench.get_reference_posterior_samples(i)
        n = min(2000, ref.shape[0])
        samples = post.sample((n,), key=jr.PRNGKey(10 + i))
        return float(c2st(samples, ref[:n]))

    return _score_obs_cached(obs_list, f"{ckpt_dir}/scores.json", score)


def run_npe_gl_tuned(num_simulations=10000, model="nsf", eval_n=2000,
                     **est_kw):
    """npe/gaussian_linear 0.557 -> target <=0.55 (VERDICT item 6)."""
    from sbi_tpu.inference import NPE
    from sbi_tpu.neural_nets.factory import posterior_nn

    bench = get_bench_task("gaussian_linear")
    prior = bench.prior
    seed_all_backends(0)
    theta = prior.sample(jr.PRNGKey(0), (num_simulations,))
    x = bench.simulator(theta, key=jr.PRNGKey(1))
    est = posterior_nn(model, **est_kw) if est_kw or model != "nsf" else \
        posterior_nn("nsf", hidden_features=100, num_transforms=8)
    inference = NPE(prior=prior, density_estimator=est)
    inference.append_simulations(theta, x)
    inference.train(training_batch_size=200, epoch_chunk=EPOCH_CHUNK,
                    stop_after_epochs=200)
    scores = []
    for i in (0, 1, 2):
        x_o = bench.get_observation(i)
        posterior = inference.build_posterior().set_default_x(x_o)
        ref = bench.get_reference_posterior_samples(i)
        n = min(eval_n, ref.shape[0])
        samples = posterior.sample((n,), key=jr.PRNGKey(10 + i))
        s = float(c2st(samples, ref[:n]))
        scores.append(s)
        print(f"  obs {i}: c2st={s:.4f}", flush=True)
    return scores


class _SymmetrizedTheta:
    """theta-embedding exploiting SLCP's exact likelihood structure: per
    trial x ~ N(m(theta), S(theta)) with m = theta[:2], s1 = theta[2]^2,
    s2 = theta[3]^2, rho = tanh(theta[4]) — invariant under sign flips of
    theta[2] and theta[3]. Mapping those dims to their squares enforces
    the invariance exactly (no information loss) and removes the |.|
    kink the MLP head otherwise has to learn from data."""

    def __init__(self):
        import flax.linen as nn

        class _Sym(nn.Module):
            @nn.compact
            def __call__(self, theta):
                # Analytic standardization for the SLCP Uniform[-3,3]^5
                # prior (condition z-scoring is off so the squares see raw
                # theta): std(theta)=sqrt(3); theta^2 has mean 3, std 2.68.
                return jnp.concatenate(
                    [theta[..., :2] / 1.732,
                     (theta[..., 2:4] ** 2 - 3.0) / 2.683,
                     theta[..., 4:] / 1.732],
                    axis=-1,
                )

        self.module = _Sym()

    def __call__(self, *a, **k):
        return self.module(*a, **k)


class _SymmetrizedThetaV2:
    """V1 plus |theta| features: squares have zero gradient at theta=0,
    which cost obs 0 (posterior mass near zero scales) 0.52->0.57 in the
    poe16_sym run; |theta| is equally sign-invariant but stays
    first-order sensitive at 0. Standardization is analytic for the
    U[-3,3] prior: E|t|=1.5, std|t|=0.866."""

    def __init__(self):
        import flax.linen as nn

        class _SymV2(nn.Module):
            @nn.compact
            def __call__(self, theta):
                return jnp.concatenate(
                    [theta[..., :2] / 1.732,
                     (theta[..., 2:4] ** 2 - 3.0) / 2.683,
                     (jnp.abs(theta[..., 2:4]) - 1.5) / 0.866,
                     theta[..., 4:] / 1.732],
                    axis=-1,
                )

        self.module = _SymV2()


EXPERIMENTS = {
    # The ~0.03 residual of poe16 over the 0.49 sampler floor is head
    # bias (STATUS.md known gaps): bake the known theta2/theta3 sign
    # symmetry into the condition embedding and re-run the 2M PoE.
    "poe16_sym_2m": (lambda: run_poe_vmapped_slcp(
        125_000, n_members=16, rounds=1, model="mdn", num_components=2,
        scale_parameterization="log", num_layers=5, hidden_features=256,
        batch_size=1024, embedding_net=_SymmetrizedTheta().module,
        z_score_theta=None, ckpt_dir="/tmp/poe_sym_ckpt"),
        "nle-gauss-poe16-sym-2m", "slcp", 2_000_000),
    "poe16_sym2_2m": (lambda: run_poe_vmapped_slcp(
        125_000, n_members=16, rounds=1, model="mdn", num_components=2,
        scale_parameterization="log", num_layers=5, hidden_features=256,
        batch_size=1024, embedding_net=_SymmetrizedThetaV2().module,
        z_score_theta=None, ckpt_dir="/tmp/poe_sym2_ckpt"),
        "nle-gauss-poe16-sym2-2m", "slcp", 2_000_000),
    "poe16_slcp": (lambda: run_poe_vmapped_slcp(
        20000, n_members=16, ckpt_dir="/tmp/poe_slcp_ckpt_r1"),
        "nle-iid-poe16", "slcp", 20000),
    "poe16_slcp_r2": (lambda: run_poe_vmapped_slcp(40000, n_members=16,
                                                   rounds=2),
                      "snle-iid-poe16", "slcp", 40000),
    "poe32_slcp_r2": (lambda: run_poe_vmapped_slcp(
        40000, n_members=32, rounds=2, ckpt_dir="/tmp/poe_slcp_ckpt_k32"),
        "snle-iid-poe32", "slcp", 40000),
    # K=8 Gaussian-head PoE with one refinement round: members are tiny,
    # so the whole fleet trains as one vmapped program and the PoE
    # potential stays a small device program (TPU-safe, unlike NSF K=16).
    "poe8_mdn1_slcp_r2": (lambda: run_poe_vmapped_slcp(
        30000, n_members=8, rounds=2, model="mdn", num_components=1,
        scale_parameterization="log", num_layers=5, hidden_features=256,
        ckpt_dir="/tmp/poe_mdn1_ckpt"),
        "snle-gauss-poe8", "slcp", 30000),
    # Massive-simulation amortized runs: SLCP simulation is a 2-D Gaussian
    # draw (free on TPU), and the likelihood-fit error that caps C2ST is
    # driven by theta-space data density (120k pairs over [-3,3]^5 is ~10
    # points/axis). 1e6 sims = 4e6 pairs = 16x denser coverage; training
    # rides the MXU at batch 4096.
    "nle_gauss_1m": (lambda: _bm2().run_nle_iid_slcp(
        1_000_000, model="mdn", num_components=2,
        scale_parameterization="log", num_layers=5, hidden_features=256,
        batch_size=4096, patience=30, eval_thin=5),
        "nle-gauss-1m", "slcp", 1_000_000),
    "nle_iid_1m": (lambda: _bm2().run_nle_iid_slcp(
        1_000_000, hidden_features=128, num_transforms=8, num_bins=16,
        batch_size=4096, patience=30, eval_thin=5),
        "nle-iid-1m", "slcp", 1_000_000),
    # The 1M single model showed large REGION-level fit variance (same
    # arch/data-scale swings obs1 c2st 0.62 <-> 0.80 across runs while
    # obs2 hits 0.52): exactly what PoE over independently-fit members
    # cancels. 8 disjoint 125k blocks, one vmapped training program.
    "poe8_mdn_1m": (lambda: run_poe_vmapped_slcp(
        125_000, n_members=8, rounds=1, model="mdn", num_components=2,
        scale_parameterization="log", num_layers=5, hidden_features=256,
        batch_size=1024, ckpt_dir="/tmp/poe_mdn1m_ckpt"),
        "nle-gauss-poe8-1m", "slcp", 1_000_000),
    # Double both axes of poe8 (members AND per-member data): the
    # sampler floor on the exact likelihood is 0.49; poe8@1M reached
    # 0.522, so keep cancelling member error until the floor.
    "poe16_mdn_2m": (lambda: run_poe_vmapped_slcp(
        125_000, n_members=16, rounds=1, model="mdn", num_components=2,
        scale_parameterization="log", num_layers=5, hidden_features=256,
        batch_size=1024, ckpt_dir="/tmp/poe_mdn2m_ckpt"),
        "nle-gauss-poe16-2m", "slcp", 2_000_000),
    # Sequential refinement on top of poe16: round 1 re-simulates from
    # the pooled PoE posterior, concentrating member capacity where the
    # posterior lives (round-2's winning schedule, now vmapped).
    "poe16_mdn_seq": (lambda: run_poe_vmapped_slcp(
        250_000, n_members=16, rounds=2, model="mdn", num_components=2,
        scale_parameterization="log", num_layers=5, hidden_features=256,
        batch_size=1024, ckpt_dir="/tmp/poe_mdnseq_ckpt"),
        "snle-gauss-poe16-seq", "slcp", 4_000_000),
    # Members are the clean lever (seq refinement hurts at this scale —
    # see the poe16_mdn_seq negative result): 32 members, disjoint 125k
    # blocks, still one vmapped program.
    "poe32_mdn_4m": (lambda: run_poe_vmapped_slcp(
        125_000, n_members=32, rounds=1, model="mdn", num_components=2,
        scale_parameterization="log", num_layers=5, hidden_features=256,
        batch_size=1024, ckpt_dir="/tmp/poe_mdn4m_ckpt"),
        "nle-gauss-poe32-4m", "slcp", 4_000_000),
    "poemix16_2m": (lambda: run_poe_mixed_slcp(125_000),
                    "nle-poemix16-2m", "slcp", 2_000_000),
    "npe_gl_tuned": (run_npe_gl_tuned, "npe", "gaussian_linear", 10000),
    "npe_gl_mdn": (lambda: run_npe_gl_tuned(
        30000, model="mdn", num_components=8, hidden_features=128,
        num_layers=3), "npe-mdn", "gaussian_linear", 30000),
    "npe_gl_maf": (lambda: run_npe_gl_tuned(
        30000, model="maf", hidden_features=100, num_transforms=8),
        "npe-maf", "gaussian_linear", 30000),
    # gaussian_linear's posterior is Gaussian — NSF's spline tails are
    # the liability; more bins + wider tail_bound + bigger net.
    "npe_gl_nsf2": (lambda: run_npe_gl_tuned(
        30000, model="nsf", hidden_features=128, num_transforms=8,
        num_bins=16, tail_bound=5.0), "npe-nsf", "gaussian_linear", 30000),
    # SLCP's per-trial likelihood is EXACTLY N(m(theta), S(theta)) — a
    # K=1 log-parameterized full-covariance MoG head is correctly
    # specified, so fit error is only the theta->(mean, chol) MLP.
    "nle_mdn1_slcp": (lambda: _bm2().run_nle_iid_slcp(
        30000, model="mdn", num_components=1, scale_parameterization="log",
        num_layers=4, hidden_features=128, eval_thin=5),
        "nle-gauss", "slcp", 30000),
    "snle_mdn1_slcp": (lambda: _bm2().run_nle_iid_slcp(
        30000, rounds=3, model="mdn", num_components=1,
        scale_parameterization="log", num_layers=5, hidden_features=256,
        eval_thin=5), "snle-gauss", "slcp", 30000),
    "npse_tm_r3": (lambda: _run_npse_tm(), "npse", "two_moons", 30000),
    "fmpe_tm_r3": (lambda: _run_fmpe_tm(), "fmpe", "two_moons", 30000),
}


_BM2 = None


def _bm2():
    """Load scripts/bm_round2.py as a module (shared experiment runners)."""
    global _BM2
    if _BM2 is None:
        import importlib.util as _u

        spec = _u.spec_from_file_location(
            "bm_round2",
            os.path.join(os.path.dirname(__file__), "bm_round2.py"),
        )
        m = _u.module_from_spec(spec)
        spec.loader.exec_module(m)
        _BM2 = m
    return _BM2


def _run_npse_tm():
    """NPSE retune with the round-3 EMA/statistical convergence (VERDICT
    item 3 'Done' target: two_moons <=0.60, stretch <=0.55)."""
    m = _bm2()
    return m.run_amortized(
        "two_moons", "npse", 30000, batch_size=200, patience=50,
        sample_kw=dict(steps=1000, corrector="langevin"),
        model="ada_mlp", sde_type="vp", hidden_features=256, num_layers=6,
    )


def _run_fmpe_tm():
    m = _bm2()
    return m.run_amortized(
        "two_moons", "fmpe", 30000, batch_size=200, patience=50,
        model="ada_mlp", hidden_features=256, num_layers=6,
    )


def main():
    name = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/bm_results_round3.csv"
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
