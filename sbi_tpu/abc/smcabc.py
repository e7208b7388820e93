"""SMCABC: sequential Monte-Carlo ABC with population resampling.

JAX counterpart of `sbi/inference/abc/smcabc.py:26-786`: gaussian/uniform
perturbation kernels, algorithm variants A/B/C, ESS-based resampling,
optional SASS/LRA/KDE, epsilon decay by distance quantile.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.distributions import Empirical, MultivariateNormal
from ..utils.sbiutils import next_key, within_support
from .abc_base import ABCBASE

Array = jax.Array


class SMCABC(ABCBASE):
    def __init__(
        self,
        simulator: Callable,
        prior,
        distance: Union[str, Callable] = "l2",
        requires_iid_data: Optional[bool] = None,
        distance_kwargs: Optional[dict] = None,
        num_workers: int = 1,
        simulation_batch_size: int = 1,
        show_progress_bars: bool = True,
        kernel: str = "gaussian",
        algorithm_variant: str = "C",
    ):
        super().__init__(
            simulator, prior, distance, requires_iid_data, distance_kwargs,
            num_workers, simulation_batch_size, show_progress_bars,
        )
        assert kernel in ("gaussian", "uniform")
        assert algorithm_variant in ("A", "B", "C")
        self.kernel = kernel
        self.algorithm_variant = algorithm_variant

    def __call__(
        self,
        x_o: Array,
        num_particles: int,
        num_initial_pop: int,
        num_simulations: int,
        epsilon_decay: float = 0.5,
        distance_based_decay: bool = True,
        ess_min: Optional[float] = 0.5,
        kernel_variance_scale: float = 1.0,
        use_last_pop_samples: bool = True,
        lra: bool = False,
        sass: bool = False,
        sass_fraction: float = 0.25,
        sass_expansion_degree: int = 1,
        kde: bool = False,
        kde_kwargs: Optional[dict] = None,
        return_summary: bool = False,
        key=None,
    ):
        key = next_key(key)
        x_o = jnp.atleast_2d(jnp.asarray(x_o, jnp.float32))

        sass_transform = None
        if sass:
            k_sass = jax.random.fold_in(key, 777)
            n_pilot = int(sass_fraction * num_simulations)
            pilot_theta = self.prior.sample(k_sass, (n_pilot,))
            pilot_x = self._simulate(pilot_theta, key=jax.random.fold_in(k_sass, 1))
            sass_transform = self.get_sass_transform(
                pilot_theta, pilot_x, sass_expansion_degree
            )
            num_simulations -= n_pilot

        def summarize(x):
            return sass_transform(x) if sass_transform is not None else x

        x_o_d = summarize(x_o)

        # ---- initial population: best num_particles of num_initial_pop ------
        key, k0, k0s = jax.random.split(key, 3)
        theta0 = self.prior.sample(k0, (num_initial_pop,))
        x0 = self._simulate(theta0, key=k0s)
        d0 = self.distance(x_o_d, summarize(x0))
        order = jnp.argsort(d0)[:num_particles]
        particles = theta0[order]
        dists = d0[order]
        epsilon = float(dists[-1])
        log_weights = jnp.full((num_particles,), -jnp.log(num_particles))
        budget = num_simulations - num_initial_pop

        pop = 0
        all_particles, all_weights, all_eps = [particles], [log_weights], [epsilon]
        while budget > 0:
            pop += 1
            if distance_based_decay:
                epsilon = float(jnp.quantile(dists, epsilon_decay))
            else:
                epsilon *= epsilon_decay

            cov = kernel_variance_scale * jnp.atleast_2d(
                jnp.cov(particles.T)
            ) + 1e-6 * jnp.eye(particles.shape[1])

            new_particles = []
            new_dists = []
            new_logw = []
            accepted = 0
            while accepted < num_particles and budget > 0:
                key, k_pick, k_pert, k_sim = jax.random.split(key, 4)
                n_batch = min(max(budget, 1), 4 * num_particles)
                idx = jax.random.categorical(
                    k_pick, log_weights, shape=(n_batch,)
                )
                base = particles[idx]
                if self.kernel == "gaussian":
                    pert = MultivariateNormal(
                        jnp.zeros(base.shape[1]), covariance_matrix=cov
                    ).sample(k_pert, (n_batch,))
                else:
                    width = 2.0 * jnp.sqrt(jnp.diagonal(cov))
                    pert = (jax.random.uniform(k_pert, base.shape) - 0.5) * width
                cand = base + pert
                inside = within_support(self.prior, cand)
                x_c = self._simulate(cand, key=k_sim)
                budget -= n_batch
                d_c = self.distance(x_o_d, summarize(x_c))
                ok = inside & (d_c <= epsilon)
                cand_ok = cand[ok]
                d_ok = d_c[ok]
                if cand_ok.shape[0] > 0:
                    new_particles.append(cand_ok)
                    new_dists.append(d_ok)
                    accepted += int(cand_ok.shape[0])

            if accepted == 0:
                break
            cand_all = jnp.concatenate(new_particles)[:num_particles]
            dist_all = jnp.concatenate(new_dists)[:num_particles]
            if cand_all.shape[0] < num_particles:
                if use_last_pop_samples:
                    fill = num_particles - cand_all.shape[0]
                    cand_all = jnp.concatenate([cand_all, particles[:fill]])
                    dist_all = jnp.concatenate([dist_all, dists[:fill]])
                else:
                    break

            # importance weights: prior / kernel-mixture (variant B/C);
            # variant A keeps uniform weights with resampling.
            if self.algorithm_variant in ("B", "C"):
                prior_lp = self.prior.log_prob(cand_all)
                diff = cand_all[:, None, :] - particles[None, :, :]
                prec = jnp.linalg.inv(cov)
                quad = jnp.einsum("nki,ij,nkj->nk", diff, prec, diff)
                _, logdet = jnp.linalg.slogdet(cov)
                D = cand_all.shape[1]
                log_k = -0.5 * (quad + logdet + D * jnp.log(2 * jnp.pi))
                mix = jax.scipy.special.logsumexp(
                    log_k + log_weights[None, :], axis=1
                )
                new_lw = prior_lp - mix
                new_lw = new_lw - jax.scipy.special.logsumexp(new_lw)
            else:
                new_lw = jnp.full((cand_all.shape[0],), -jnp.log(cand_all.shape[0]))

            # ESS-based resampling
            if ess_min is not None:
                ess = float(
                    jnp.exp(-jax.scipy.special.logsumexp(2 * new_lw))
                ) / cand_all.shape[0]
                if ess < ess_min:
                    key, k_rs = jax.random.split(key)
                    ridx = jax.random.categorical(
                        k_rs, new_lw, shape=(cand_all.shape[0],)
                    )
                    cand_all = cand_all[ridx]
                    dist_all = dist_all[ridx]
                    new_lw = jnp.full(
                        (cand_all.shape[0],), -jnp.log(cand_all.shape[0])
                    )

            particles, dists, log_weights = cand_all, dist_all, new_lw
            all_particles.append(particles)
            all_weights.append(log_weights)
            all_eps.append(epsilon)

        theta_final = particles
        if lra:
            x_final = self._simulate(theta_final, key=jax.random.fold_in(key, 5))
            theta_final = self.run_lra(theta_final, summarize(x_final), x_o_d)

        if kde:
            from ..utils.kde import get_kde

            dist_out = get_kde(theta_final, **(kde_kwargs or {}))
        else:
            dist_out = Empirical(theta_final, log_weights)

        if return_summary:
            return dist_out, dict(
                particles=all_particles,
                weights=all_weights,
                epsilons=all_eps,
                distances=dists,
            )
        return dist_out


SMC = SMCABC
