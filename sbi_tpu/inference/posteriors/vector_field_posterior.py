"""VectorFieldPosterior for NPSE/FMPE.

JAX counterpart of `sbi/inference/posteriors/vector_field_posterior.py`:
`sample` via reverse SDE (`_sample_via_diffusion` -> Diffuser, `:304-405`)
or probability-flow ODE (`sample_via_ode` `:406-433`); `log_prob` via the
neural-ODE CNF (`:434`); batched variants (`:468`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...samplers.rejection.rejection import accept_reject_sample
from ...samplers.score.diffuser import Diffuser
from ...utils.sbiutils import ensure_theta_batched, next_key, within_support
from ..potentials.vector_field_potential import (
    vector_field_estimator_based_potential,
)
from .base_posterior import NeuralPosterior

Array = jax.Array


class VectorFieldPosterior(NeuralPosterior):
    def __init__(
        self,
        vector_field_estimator,
        prior,
        max_sampling_batch_size: int = 10_000,
        device=None,
        x_shape=None,
        enable_transform: bool = True,
        sample_with: str = "sde",
        **kwargs,
    ):
        potential_fn, theta_transform = vector_field_estimator_based_potential(
            vector_field_estimator, prior, x_o=None,
            enable_transform=enable_transform,
        )
        super().__init__(potential_fn, theta_transform, device, x_shape)
        self.prior = prior
        self.vector_field_estimator = vector_field_estimator
        self.sample_with = sample_with
        self.max_sampling_batch_size = max_sampling_batch_size
        self._purpose = (
            "It samples from the diffusion model given the vector field "
            "estimator."
        )

    # ----------------------------------------------------------------- sample
    def sample(
        self,
        sample_shape=(),
        x: Optional[Array] = None,
        key=None,
        predictor: str = "euler_maruyama",
        corrector: Optional[str] = None,
        corrector_params: Optional[dict] = None,
        steps: int = 500,
        ts: Optional[Array] = None,
        sample_with: Optional[str] = None,
        show_progress_bars: bool = False,
        guidance_method: Optional[str] = None,
        guidance_params: Optional[dict] = None,
        **kwargs,
    ) -> Array:
        """Default: SDE with 500 steps (ref `:311`); prior-support rejection
        wraps the raw diffusion draws like the reference.

        ``guidance_method``/``guidance_params`` (ref
        `vector_field_posterior.py:162,202,243`): wrap the (iid-composed or
        single-observation) score with a registered guidance —
        ``interval`` / ``affine_classifier_free`` / ``prior_guide`` /
        ``classifier_free`` / ``universal`` / ``prior`` — SDE sampling only."""
        key = next_key(key)
        x = self._x_else_default_x(x)
        self.potential_fn.set_x(x)
        method = sample_with or self.sample_with
        num_samples = 1
        for s in sample_shape:
            num_samples *= int(s)

        est = self.vector_field_estimator
        if guidance_method is not None:
            if method != "sde" or not est.SDE_DEFINED:
                raise NotImplementedError(
                    "guidance_method is supported for SDE sampling on "
                    "SDE-defined (score) estimators only."
                )
            from ..potentials.vector_field_adaptor import build_guided_score_fn

            guided_fn = build_guided_score_fn(
                est, self.prior, x, guidance_method, guidance_params,
                iid_method=kwargs.pop("iid_method", "auto_gauss"),
            )
            diffuser = Diffuser(
                est, predictor=predictor, corrector=corrector,
                corrector_params=corrector_params,
            )

            def proposal(k, n):
                return diffuser.run(
                    n, x[:1], steps=steps, ts=ts, key=k, score_fn=guided_fn
                )[:, 0, :]

        elif method == "sde":
            diffuser = Diffuser(
                est, predictor=predictor, corrector=corrector,
                corrector_params=corrector_params,
            )
            if x.shape[0] > 1 and est.SDE_DEFINED:
                # iid observations: composed score (ref vector_field_adaptor)
                from ..potentials.vector_field_adaptor import build_iid_score_fn

                score_fn = build_iid_score_fn(
                    est, self.prior, x, method=kwargs.pop("iid_method", "auto_gauss")
                )

                def proposal(k, n):
                    return diffuser.run(
                        n, x[:1], steps=steps, ts=ts, key=k, score_fn=score_fn
                    )[:, 0, :]

            elif ts is not None:
                # Custom schedule array: rare path, don't cache.
                def proposal(k, n):
                    return diffuser.run(n, x[:1], steps=steps, ts=ts, key=k)[:, 0, :]

            else:
                cfg = (
                    "sde", predictor, corrector,
                    tuple(sorted((corrector_params or {}).items())), steps,
                )

                def make_sde(d=diffuser):
                    def fn(params, x1, k, n):
                        return d.run(n, x1, steps=steps, key=k, params=params)[:, 0, :]
                    return fn

                proposal = self._cached_proposal(cfg, make_sde, est, x)

        elif method == "ode":
            from ...samplers.ode.ode_solvers import build_neural_ode

            ode_steps = getattr(self.potential_fn, "ode_steps", 64)

            def make_ode(e=est, n_steps=ode_steps):
                def fn(params, x1, k, n):
                    node = build_neural_ode(
                        e, x1, num_steps=n_steps, params=params
                    )
                    return node.sample(k, n)
                return fn

            proposal = self._cached_proposal(
                ("ode", ode_steps), make_ode, est, x
            )

        else:
            raise NotImplementedError(f"sample_with='{method}' not supported.")

        samples, _ = accept_reject_sample(
            proposal,
            lambda s: within_support(self.prior, s),
            num_samples,
            key=key,
            sample_batch_size=min(self.max_sampling_batch_size, max(num_samples, 1000)),
        )
        return samples.reshape(tuple(sample_shape) + est.input_shape)

    def _cached_proposal(self, cfg, make_fn, est, x):
        """Jit the diffusion/ODE solver once per *static* sampling config.

        The jitted function is pure over ``(params, x, key)`` (batch size
        static), so repeated ``sample()`` calls — including with different
        observations or updated estimator params of the same shape — reuse
        the compiled solver scan instead of re-tracing it.
        """
        cache = getattr(self, "_proposal_cache", None)
        if cache is None:
            cache = self._proposal_cache = {}
        jitted = cache.get(cfg)
        if jitted is None:
            jitted = cache[cfg] = jax.jit(make_fn(), static_argnums=(3,))
        x1 = x[:1]
        return lambda k, n: jitted(est.params, x1, k, n)

    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("_proposal_cache", None)
        return state

    def sample_via_ode(self, sample_shape=(), x=None, key=None, **kwargs) -> Array:
        return self.sample(sample_shape, x=x, key=key, sample_with="ode", **kwargs)

    def sample_batched(
        self,
        sample_shape,
        x: Array,
        key=None,
        predictor: str = "euler_maruyama",
        corrector: Optional[str] = None,
        corrector_params: Optional[dict] = None,
        steps: int = 500,
        ts: Optional[Array] = None,
        max_rejection_rounds: int = 20,
        mesh=None,
        **kwargs,
    ) -> Array:
        """Vectorized over a batch of observations: (sample..., B, D).

        One reverse-SDE solve advances ALL observations' candidate batches
        (``Diffuser.run`` natively batches conditions); prior-support
        rejection uses the same scatter-fill as
        ``DirectPosterior.sample_batched`` — no per-observation python loop
        (ref `vector_field_posterior.py:468`)."""
        method = kwargs.pop("sample_with", None) or self.sample_with
        key = next_key(key)
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        B = x.shape[0]
        if method != "sde" or B == 1:
            # ODE CNF is built per condition; keep the simple path there.
            outs = [
                self.sample(sample_shape, x=x[b][None],
                            key=jax.random.fold_in(key, b),
                            sample_with=method, predictor=predictor,
                            corrector=corrector,
                            corrector_params=corrector_params,
                            steps=steps, ts=ts, **kwargs)
                for b in range(B)
            ]
            return jnp.stack(outs, axis=len(sample_shape))

        est = self.vector_field_estimator
        D = est.input_shape[0]
        num_samples = 1
        for s in sample_shape:
            num_samples *= int(s)
        S = num_samples
        per_round = max(min(num_samples, self.max_sampling_batch_size), 256)
        prior = self.prior

        cfg = (
            "sde_batched", predictor, corrector,
            tuple(sorted((corrector_params or {}).items())), steps,
            S, B, per_round,
        )
        cache = getattr(self, "_proposal_cache", None)
        if cache is None:
            cache = self._proposal_cache = {}
        # A custom ts array is closed over — don't cache that rare path.
        round_fn = cache.get(cfg) if ts is None else None
        if round_fn is None:
            diffuser = Diffuser(
                est, predictor=predictor, corrector=corrector,
                corrector_params=corrector_params,
            )

            def _round(params, xb, collected, counts, sub, ts=ts):
                cand = diffuser.run(
                    per_round, xb, steps=steps, ts=ts, key=sub, params=params
                )  # (R, B, D)
                ok = within_support(prior, cand.reshape(-1, D)).reshape(
                    per_round, B
                )
                csum = jnp.cumsum(ok.astype(jnp.int32), axis=0)
                slots = counts[None, :] + csum - 1
                valid = ok & (slots < S)
                col = jnp.broadcast_to(
                    jnp.arange(B)[None, :], (per_round, B)
                )
                flat_idx = jnp.where(valid, slots * B + col, S * B)
                collected = (
                    collected.reshape(S * B, D)
                    .at[flat_idx.reshape(-1)]
                    .set(cand.reshape(-1, D), mode="drop")
                    .reshape(S, B, D)
                )
                counts = jnp.minimum(counts + ok.sum(axis=0), S)
                return collected, counts

            round_fn = jax.jit(_round)
            if ts is None:
                cache[cfg] = round_fn

        collected = jnp.zeros((S, B, D))
        counts = jnp.zeros((B,), jnp.int32)
        from ...parallel.mesh import resolve_mesh, shard_along, shard_axis

        m = resolve_mesh(mesh)
        if m is not None:
            # Observation-sharded reverse-SDE solve: each device advances the
            # candidate batches of its slice of x (independent per-obs work).
            x = jax.device_put(x, shard_along(m))
            collected = jax.device_put(collected, shard_axis(m, 1))
            counts = jax.device_put(counts, shard_along(m))
        for _ in range(max_rejection_rounds):
            key, sub = jax.random.split(key)
            collected, counts = round_fn(
                est.params, x, collected, counts, sub
            )
            if int(counts.min()) >= S:
                break
        worst = int(counts.min())
        if worst == 0:
            raise RuntimeError(
                "sample_batched: no samples accepted for at least one "
                "observation within the sampling budget — the diffusion "
                "posterior puts (almost) all mass outside the prior support "
                "for that x. Retrain or sample via MCMC for it."
            )
        if worst < S:
            import warnings

            warnings.warn(
                "sample_batched: sampling budget exhausted before all "
                f"observations collected {S} in-support samples (worst: "
                f"{worst}); starved rows are resampled from the accepted "
                "draws."
            )
            k_fill = jax.random.fold_in(key, 7)
            idx = jax.random.randint(
                k_fill, (S, B), 0, jnp.maximum(counts, 1)[None, :]
            )
            filled = jnp.take_along_axis(collected, idx[:, :, None], axis=0)
            row = jnp.broadcast_to(jnp.arange(S)[:, None], (S, B))
            collected = jnp.where(
                (row < counts[None, :])[:, :, None], collected, filled
            )
        return collected.reshape(tuple(sample_shape) + (B, D))

    # ---------------------------------------------------------------- log_prob
    def log_prob(
        self,
        theta: Array,
        x: Optional[Array] = None,
        norm_posterior: bool = False,
        ode_steps: int = 64,
        **kwargs,
    ) -> Array:
        """Exact CNF log-prob via the probability-flow ODE (ref `:434`).

        Multiple observation rows are iid trials: the factorization
        ``sum_i log p(theta|x_i) - (N-1) log p(theta)`` (up to the evidence
        constant; ref `vector_field_potential.py:168-182`)."""
        theta = ensure_theta_batched(theta)
        x = self._x_else_default_x(x)
        if x.shape[0] > 1:
            lp = sum(
                self.potential_fn.neural_ode(x[i : i + 1]).log_prob(theta)
                for i in range(x.shape[0])
            )
            lp = lp - (x.shape[0] - 1) * self.prior.log_prob(theta)
        else:
            node = self.potential_fn.neural_ode(x[:1])
            lp = node.log_prob(theta)
        lp = jnp.where(within_support(self.prior, theta), lp, -jnp.inf)
        return lp

    def map(self, x=None, **kwargs):
        kwargs.setdefault("init_method", "posterior")
        self.potential_fn.set_x(self._x_else_default_x(x))
        return super().map(x=x, **kwargs)
