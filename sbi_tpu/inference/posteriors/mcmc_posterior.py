"""MCMCPosterior: sample a potential with on-device MCMC.

JAX counterpart of `sbi/inference/posteriors/mcmc_posterior.py` —
method registry (`:48-56`), init strategies (`:516-608`), batched-x chains
(`:369-516`), `_prepare_potential` (`:921`). Methods here run in-repo
(vectorized slice / HMC / NUTS), replacing the reference's numpy FSM and
Pyro/PyMC backends. Method-name compatibility: the reference's names
("slice_np_vectorized", "nuts_pyro", ...) map onto the JAX implementations.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from ...samplers.mcmc.hmc import run_hmc, run_nuts
from ...samplers.mcmc.init_strategy import (
    IterateParameters,
    proposal_init,
    resample_given_potential_fn,
    sir_init,
)
from ...samplers.mcmc.slice_jax import run_slice_vectorized
from ...utils.sbiutils import draw_from_proposal, ensure_theta_batched, next_key
from ...utils.transforms import IdentityTransform, transformed_potential
from .base_posterior import NeuralPosterior

Array = jax.Array

# Default per-program sweep bound applied when sampling on a TPU backend.
# One monolithic MCMC program on an expensive potential (product-of-experts
# ensembles, large iid-trial batches) can run for minutes of device time,
# which kills remote TPU workers (observed: ~43s programs fine, ~3.5min
# programs fault the worker). 64 sweeps bounds the heaviest measured
# potential (16-member PoE NSF) to well under that, while for cheap
# potentials the extra per-program dispatch is ~ms — the chunks reuse ONE
# compiled executable. Pass `max_sweeps_per_program=None` to force a single
# monolithic program, or an int to override the bound.
DEFAULT_TPU_SWEEPS_PER_PROGRAM = 64


def _resolve_max_sweeps(value):
    if value == "auto":
        if jax.default_backend() == "tpu":
            return DEFAULT_TPU_SWEEPS_PER_PROGRAM
        return None
    if value is not None and value < 1:
        raise ValueError(f"max_sweeps_per_program must be >= 1, got {value}")
    return value


_METHOD_ALIASES = {
    "slice_np": "slice_jax",
    "slice_np_vectorized": "slice_jax_vectorized",
    "slice": "slice_jax_vectorized",
    "slice_pymc": "slice_jax_vectorized",
    "hmc": "hmc",
    "hmc_pyro": "hmc",
    "hmc_pymc": "hmc",
    "nuts": "nuts",
    "nuts_pyro": "nuts",
    "nuts_pymc": "nuts",
    "slice_jax": "slice_jax",
    "slice_jax_vectorized": "slice_jax_vectorized",
}


class MCMCPosterior(NeuralPosterior):
    def __init__(
        self,
        potential_fn,
        proposal=None,
        theta_transform=None,
        method: str = "slice_jax_vectorized",
        thin: int = -1,
        warmup_steps: int = 200,
        num_chains: int = 20,
        init_strategy: str = "resample",
        init_strategy_parameters: Optional[Dict] = None,
        num_workers: int = 1,
        mp_context: str = "spawn",
        device=None,
        x_shape=None,
    ):
        """Defaults match Appendix B: thin auto / warmup 200 / 20 chains /
        init 'resample' (ref mcmc_posterior.py:57-60,121).

        On strongly multimodal targets (e.g. SLCP's 4 symmetric modes),
        'resample' init can concentrate chains in the highest-potential
        modes; ``init_strategy='proposal'`` (prior-spread inits) preserves
        mode coverage and measured ~0.06 better C2ST there. Increase
        ``thin`` when drawing many samples per chain — consecutive slice
        draws are correlated.
        """
        super().__init__(potential_fn, theta_transform, device, x_shape)
        if method not in _METHOD_ALIASES:
            raise NotImplementedError(f"MCMC method {method} not supported.")
        self.method = _METHOD_ALIASES[method]
        self.thin = 1 if thin == -1 else thin
        self.warmup_steps = warmup_steps
        self.num_chains = num_chains
        self.init_strategy = init_strategy
        self.init_strategy_parameters = init_strategy_parameters or {}
        self.proposal = proposal if proposal is not None else getattr(
            potential_fn, "prior", None
        )
        self._purpose = "It provides MCMC to .sample() from the posterior."

    # ----------------------------------------------------------------- inits
    def _get_initial_params(
        self, num_chains: int, key=None
    ) -> Array:
        """Chain inits in *unconstrained* space (ref `:572-631`)."""
        key = next_key(key)
        pot = lambda t: self.potential_fn(t)
        if self.init_strategy == "proposal":
            inits = proposal_init(self.proposal, num_chains, key=key)
        elif self.init_strategy == "resample":
            inits = resample_given_potential_fn(
                self.proposal, pot, num_chains, key=key,
                **self.init_strategy_parameters,
            )
        elif self.init_strategy == "sir":
            inits = sir_init(
                self.proposal, pot, num_chains, key=key,
                **self.init_strategy_parameters,
            )
        elif self.init_strategy == "latest_sample":
            if getattr(self, "_latest_sample", None) is not None:
                inits = self._latest_sample[:num_chains]
            else:
                inits = proposal_init(self.proposal, num_chains, key=key)
        else:
            raise NotImplementedError(
                f"init_strategy {self.init_strategy} not supported."
            )
        return self.theta_transform.forward(inits)

    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("_prepared_potential", None)  # local closures don't pickle
        state.pop("_prepared_refs", None)
        return state

    def _prepare_potential(self, method: str) -> Callable:
        """Compose potential with the unconstraining transform (ref `:921`).

        The composed closure is cached keyed on the potential's state refs
        (x_o + estimator params, compared by identity with strong refs
        held): the FSM/HMC samplers jit with the potential as a static
        argument, so reusing one closure across repeated sample() calls
        turns every call after the first into a compile-cache hit, while a
        set_x or a retrained estimator (params pytree replaced) correctly
        forces a fresh closure and re-trace."""
        refs = (method,) + tuple(
            self.potential_fn.state_refs()
            if hasattr(self.potential_fn, "state_refs")
            else ()
        )
        cached = getattr(self, "_prepared_potential", None)
        cached_refs = getattr(self, "_prepared_refs", None)
        if (
            cached is not None
            and cached_refs is not None
            and len(cached_refs) == len(refs)
            and all(a is b for a, b in zip(cached_refs, refs))
        ):
            return cached
        prepared = transformed_potential(
            lambda theta: self.potential_fn(theta), self.theta_transform
        )
        self._prepared_potential = prepared
        self._prepared_refs = refs
        return prepared

    # ---------------------------------------------------------------- sample
    def sample(
        self,
        sample_shape=(),
        x: Optional[Array] = None,
        key=None,
        method: Optional[str] = None,
        thin: Optional[int] = None,
        warmup_steps: Optional[int] = None,
        num_chains: Optional[int] = None,
        init_strategy: Optional[str] = None,
        show_progress_bars: bool = False,
        mesh=None,
        **kwargs,
    ) -> Array:
        """``mesh`` (``None``/``"auto"``/int/``jax.sharding.Mesh``) shards the
        CHAIN axis over the mesh's first axis — every sweep of the vectorized
        kernel then runs n-way parallel with no cross-chain collectives
        (chains are independent). ``num_chains`` should be a multiple of the
        mesh size for an even split."""
        key = next_key(key)
        self.potential_fn.set_x(
            self._x_else_default_x(x),
            x_is_iid=getattr(self.potential_fn, "allow_iid_x", False),
        )
        method = _METHOD_ALIASES[method] if method else self.method
        thin = self.thin if thin is None else (1 if thin == -1 else thin)
        warmup_steps = warmup_steps if warmup_steps is not None else self.warmup_steps
        num_chains = num_chains if num_chains is not None else self.num_chains
        if init_strategy is not None:
            self.init_strategy = init_strategy

        num_samples = 1
        for s in sample_shape:
            num_samples *= int(s)

        k_init, k_run = jax.random.split(key)
        inits = self._get_initial_params(num_chains, key=k_init)
        from ...parallel.mesh import resolve_mesh, shard_along

        mesh = resolve_mesh(mesh)
        if mesh is not None:
            inits = jax.device_put(inits, shard_along(mesh))
        pot_u = self._prepare_potential(method)
        per_chain = max(1, math.ceil(num_samples / num_chains))
        # Bounded-program mode (all in-repo kernels): warmup once, then
        # advance chains in equal-size device programs with carried state
        # (slice_fsm.py resumable state; hmc.py `_run_adaptive` chunking).
        max_sweeps = _resolve_max_sweeps(
            kwargs.pop("max_sweeps_per_program", "auto")
        )

        if method == "slice_jax_vectorized" or method == "slice_jax":
            draws_u = run_slice_vectorized(
                pot_u, inits, num_samples=per_chain, thin=thin,
                warmup_steps=warmup_steps, key=k_run,
                max_sweeps_per_program=max_sweeps, **kwargs,
            )
        elif method == "hmc":
            draws_u = run_hmc(
                pot_u, inits, num_samples=per_chain, thin=thin,
                warmup_steps=warmup_steps, key=k_run,
                max_sweeps_per_program=max_sweeps, **kwargs,
            )
        elif method == "nuts":
            draws_u = run_nuts(
                pot_u, inits, num_samples=per_chain, thin=thin,
                warmup_steps=warmup_steps, key=k_run,
                max_sweeps_per_program=max_sweeps, **kwargs,
            )
        else:
            raise NotImplementedError(method)

        # (per_chain, C, D) -> flatten interleaved like the reference
        D = draws_u.shape[-1]
        # Chain-resolved draws in parameter space, kept for arviz interop
        # (ref mcmc_posterior.py:288 get_arviz_inference_data).
        self._last_chain_draws = self.theta_transform.inverse(
            draws_u.reshape(-1, D)
        ).reshape(draws_u.shape)
        flat_u = draws_u.reshape(-1, D)[:num_samples]
        samples = self.theta_transform.inverse(flat_u)
        self._latest_sample = samples[-num_chains:]
        return samples.reshape(tuple(sample_shape) + (D,))

    def sample_batched(
        self,
        sample_shape,
        x: Array,
        key=None,
        num_chains: Optional[int] = None,
        mesh=None,
        **kwargs,
    ) -> Array:
        """Batched observations: num_chains per x, ONE vectorized sampler run
        over all B*num_chains chains (ref `:369-516`). Requires the potential
        to expose `batched_over_x` (likelihood/ratio/posterior potentials do);
        falls back to a per-observation loop otherwise."""
        key = next_key(key)
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        B = x.shape[0]
        num_chains = num_chains or self.num_chains
        num_samples = 1
        for s in sample_shape:
            num_samples *= int(s)

        if not hasattr(self.potential_fn, "batched_over_x"):
            samples_all = []
            for b in range(B):
                k = jax.random.fold_in(key, b)
                s = self.sample(
                    (num_samples,), x=x[b][None], key=k, num_chains=num_chains,
                    mesh=mesh, **kwargs,
                )
                samples_all.append(s)
            out = jnp.stack(samples_all, axis=1)  # (num_samples, B, D)
            return out.reshape(tuple(sample_shape) + (B, out.shape[-1]))

        # ---- single run over all observations' chains ----------------------
        pot_raw = self.potential_fn.batched_over_x(x, num_chains)
        pot_u = transformed_potential(pot_raw, self.theta_transform)
        per_chain = max(1, math.ceil(num_samples / num_chains))

        # inits: resample per observation — ONE batched potential eval over
        # all (observation, candidate) pairs via the pure batched_over_x
        # potential (no per-b set_x mutation, no host loop).
        k_init, k_run = jax.random.split(key)
        n_cand = int(kwargs.pop("num_init_candidates", 1024))
        cand = draw_from_proposal(self.proposal, k_init, n_cand)
        pot_score = self.potential_fn.batched_over_x(x, n_cand)
        cand_tiled = jnp.tile(cand, (B, 1))
        logw = pot_score(cand_tiled).reshape(B, n_cand)
        logw = jnp.where(jnp.isfinite(logw), logw, -jnp.inf)
        idx = jax.vmap(
            lambda lw, k: jax.random.categorical(k, lw, shape=(num_chains,))
        )(logw, jax.random.split(jax.random.fold_in(k_init, 1), B))
        inits = cand[idx.reshape(-1)]  # (B*num_chains, D)
        inits_u = self.theta_transform.forward(inits)
        from ...parallel.mesh import resolve_mesh, shard_along

        mesh = resolve_mesh(mesh)
        if mesh is not None:
            # Shard the flattened (observation, chain) axis: all B*num_chains
            # chains advance n-way parallel in the one sampler run.
            inits_u = jax.device_put(inits_u, shard_along(mesh))

        from ...samplers.mcmc.slice_fsm import run_slice_vectorized_fsm

        draws_u = run_slice_vectorized_fsm(
            pot_u, inits_u, num_samples=per_chain,
            thin=self.thin, warmup_steps=self.warmup_steps, key=k_run,
            max_sweeps_per_program=_resolve_max_sweeps(
                kwargs.pop("max_sweeps_per_program", "auto")
            ),
        )  # (per_chain, B*num_chains, D)
        D = draws_u.shape[-1]
        draws = self.theta_transform.inverse(draws_u.reshape(-1, D)).reshape(
            per_chain, B, num_chains, D
        )
        out = draws.swapaxes(1, 2).reshape(per_chain * num_chains, B, D)
        out = out[:num_samples]
        return out.reshape(tuple(sample_shape) + (B, D))

    def log_prob(self, theta, x=None, **kwargs):
        """Unnormalized potential (matches reference behavior for MCMC)."""
        return self.potential(theta, x)

    def get_arviz_inference_data(self):
        """`arviz.InferenceData` from the most recent `sample()` run's
        chain-resolved draws (ref `mcmc_posterior.py:288`). arviz is an
        optional dependency, gated exactly like the reference gates pymc."""
        draws = getattr(self, "_last_chain_draws", None)
        if draws is None:
            raise ValueError(
                "No MCMC draws recorded yet — call `.sample()` first."
            )
        try:
            import arviz as az
        except ImportError as err:
            raise ImportError(
                "arviz is required for `get_arviz_inference_data`; "
                "install it with `pip install arviz`."
            ) from err
        import numpy as np

        # (num_samples_per_chain, num_chains, D) -> (chain, draw, D)
        chains = np.swapaxes(np.asarray(draws), 0, 1)
        return az.convert_to_inference_data(chains)
