"""VIPosterior: normalizing-flow q(theta) fit to the potential.

JAX counterpart of `sbi/inference/posteriors/vi_posterior.py` — flow q built
in unconstrained space and pushed through the link transform (`:255-341`),
divergence registry (rKL/fKL/IW/alpha), `train()` (`:732`), PSIS quality
control `evaluate()` (`:1242`).

TPU-first: q is a coupling-NSF flow (single-pass sampling AND density), and
the whole variational fit is ONE jitted `lax.scan` over optimizer steps.
"""

from __future__ import annotations

import warnings
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...neural_nets.estimators.flows import FlowModule
from ...samplers.importance.importance_sampling import gpdfit, importance_sample
from ...samplers.vi.vi_divergence_optimizers import get_VI_method
from ...utils.sbiutils import ensure_theta_batched, next_key
from .base_posterior import NeuralPosterior

Array = jax.Array


def _make_q_flow(dim: int, q: str, key):
    """Build the variational flow over unconstrained space."""
    import numpy as np_

    configs = []
    if q in ("naf", "unaf"):
        # Deep-sigmoidal monotone autoregressive q (ref zuko NAF/UNAF via
        # `vi_posterior.py:255-341`); forward pass analytic, inverse by
        # bisection (sampling path).
        for _ in range(2):
            configs.append(
                (
                    "monotone_ar",
                    dict(transform="dsf", num_components=8,
                         hidden_features=32, num_blocks=2),
                )
            )
            if dim > 1:
                configs.append(
                    ("permutation", dict(perm=tuple(range(dim - 1, -1, -1))))
                )
    elif q == "gaussian_diag":
        # Mean-field Gaussian (ref vi_pyro_flows "gaussian_diag").
        configs = [("diag_affine", {})]
    elif q in ("nsf", "maf", "gaussian", "nice"):
        if q == "gaussian":
            # One affine autoregressive layer = full-cov Gaussian-ish family.
            configs = [("maf", dict(hidden_features=32, num_blocks=1))]
        elif q == "maf":
            for _ in range(3):
                configs.append(("maf", dict(hidden_features=32, num_blocks=2)))
                if dim > 1:
                    configs.append(
                        ("permutation", dict(perm=tuple(range(dim - 1, -1, -1))))
                    )
        elif q == "nice":
            for i in range(4):
                mask = (np_.arange(dim) % 2 == 0) if i % 2 == 0 else (np_.arange(dim) % 2 == 1)
                if dim == 1:
                    mask = np_.array([True])
                configs.append(
                    ("additive_coupling",
                     dict(mask=tuple(bool(m) for m in mask), hidden_features=32))
                )
                configs.append(("lu_linear", {}))
        else:  # nsf default: coupling splines, 1-pass both directions
            if dim == 1:
                configs = [("rqs_ar", dict(hidden_features=32, num_bins=8))] * 2
            else:
                for i in range(3):
                    mask = (np_.arange(dim) % 2 == 0) if i % 2 == 0 else (
                        np_.arange(dim) % 2 == 1
                    )
                    configs.append(
                        ("rqs_coupling",
                         dict(mask=tuple(bool(m) for m in mask),
                              hidden_features=32, num_bins=8))
                    )
                    configs.append(("lu_linear", {}))
    else:
        raise NotImplementedError(f"Unknown q '{q}'.")
    module = FlowModule(dim=dim, layer_configs=tuple(configs))
    params = module.init(key, jnp.zeros((2, dim)), None)
    return module, params


class VIPosterior(NeuralPosterior):
    def __init__(
        self,
        potential_fn,
        prior=None,
        q: Union[str, "VIPosterior"] = "maf",
        theta_transform=None,
        vi_method: str = "rKL",
        device=None,
        x_shape=None,
        parameters=None,
        modules=None,
    ):
        super().__init__(potential_fn, theta_transform, device, x_shape)
        self.prior = prior if prior is not None else getattr(
            potential_fn, "prior", None
        )
        self._q_name = q if isinstance(q, str) else "maf"
        self.vi_method = vi_method
        dim = int(self.prior.event_shape[0]) if self.prior is not None else None
        self._dim = dim
        self._q_module = None
        self._q_params = None
        self._trained = False
        self._purpose = (
            "It provides Variational inference to .sample() from the posterior."
        )

    # ------------------------------------------------------------------- q
    def set_vi_method(self, method: str) -> "VIPosterior":
        self.vi_method = method
        return self

    def _ensure_q(self, key=None):
        if self._q_module is None:
            self._q_module, self._q_params = _make_q_flow(
                self._dim, self._q_name, next_key(key)
            )

    @property
    def q(self):
        return (self._q_module, self._q_params)

    # ---------------------------------------------------------------- train
    def train(
        self,
        x: Optional[Array] = None,
        n_particles: int = 256,
        learning_rate: float = 1e-3,
        gamma: float = 0.999,
        max_num_iters: int = 2000,
        min_num_iters: int = 100,
        clip_value: float = 5.0,
        warm_up_rounds: int = 100,
        quality_control: bool = False,
        show_progress_bar: bool = False,
        key=None,
        **kwargs,
    ) -> "VIPosterior":
        """Fit q by the selected divergence; one jitted scan (ref `:732`)."""
        key = next_key(key)
        self.potential_fn.set_x(self._x_else_default_x(x))
        self._ensure_q(key)
        module, params = self._q_module, self._q_params

        loss_impl = get_VI_method(self.vi_method)
        tt = self.theta_transform

        def potential_u(u):
            theta, ldj = tt.inverse_and_log_det(u)
            return self.potential_fn(theta) + ldj

        def sample_and_log_prob(p, k, n):
            u, log_q = module.apply(p, k, n, None, method="sample_and_log_prob")
            return u[:, 0, :], log_q[:, 0]

        def log_prob_at(p, u):
            return module.apply(p, u, None, method="log_prob")

        tx = optax.chain(
            optax.clip_by_global_norm(clip_value),
            optax.adam(optax.exponential_decay(learning_rate, 100, gamma)),
        )
        opt_state = tx.init(params)

        def step(carry, k):
            p, s = carry

            def loss(p_):
                return loss_impl(
                    p_, k, sample_and_log_prob, log_prob_at, potential_u,
                    n_particles, **kwargs,
                )

            l, g = jax.value_and_grad(loss)(p)
            updates, s = tx.update(g, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), l

        keys = jax.random.split(key, max_num_iters)
        (params, _), losses = jax.lax.scan(jax.jit(step), (params, opt_state), keys)
        self._q_params = params
        self._trained = True
        self._losses = np.asarray(losses)
        if quality_control:
            k_hat = self.evaluate(key=key)
            if k_hat > 1.0:
                warnings.warn(
                    f"PSIS k-hat = {k_hat:.2f} > 1.0: the variational "
                    "approximation is unreliable; consider retraining or "
                    "another vi_method."
                )
        return self

    # ----------------------------------------------------------- amortized
    def _pure_potential_xfn(self):
        """Side-effect-free potential(theta, x) for vmapped amortized ELBO."""
        from ..potentials.likelihood_based_potential import (
            LikelihoodBasedPotential,
        )
        from ..potentials.posterior_based_potential import PosteriorBasedPotential
        from ..potentials.ratio_based_potential import RatioBasedPotential

        pot = self.potential_fn
        prior = self.prior
        if isinstance(pot, LikelihoodBasedPotential):
            est = pot.likelihood_estimator

            def fn(theta, x):
                B = theta.shape[0]
                x_rep = jnp.broadcast_to(x[None], (B,) + x.shape)[None]
                return est.log_prob_fn(est.params, x_rep, theta)[0] + prior.log_prob(theta)

            return fn
        if isinstance(pot, PosteriorBasedPotential):
            est = pot.posterior_estimator

            def fn(theta, x):
                return est.log_prob_fn(est.params, theta[:, None, :], x[None])[:, 0]

            return fn
        if isinstance(pot, RatioBasedPotential):
            est = pot.ratio_estimator

            def fn(theta, x):
                B = theta.shape[0]
                x_rep = jnp.broadcast_to(x[None], (B,) + x.shape)
                return est.log_ratio_fn(est.params, theta, x_rep) + prior.log_prob(theta)

            return fn
        raise NotImplementedError(
            "train_amortized needs a likelihood/posterior/ratio potential."
        )

    def train_amortized(
        self,
        xs: Array,
        n_particles: int = 128,
        learning_rate: float = 1e-3,
        max_num_iters: int = 2000,
        clip_value: float = 5.0,
        key=None,
        **kwargs,
    ) -> "VIPosterior":
        """Amortized VI (ref `vi_posterior.py:914-1241`): fit a *conditional*
        flow q(theta | x) by the rKL ELBO averaged over a batch of
        observations. After training, `sample(x=...)`/`log_prob(theta, x=...)`
        work for any x without re-fitting."""
        from ...neural_nets.net_builders.flow import build_nsf

        key = next_key(key)
        xs = jnp.atleast_2d(jnp.asarray(xs, jnp.float32))
        D = self._dim
        # conditional q: NSF over theta given x
        dummy_theta = self.prior.sample(jax.random.fold_in(key, 0), (max(xs.shape[0], 8),))
        est = build_nsf(
            self.theta_transform.forward(dummy_theta),
            xs[jnp.arange(max(xs.shape[0], 8)) % xs.shape[0]],
            z_score_theta="none",
            hidden_features=32,
            num_transforms=3,
            key=jax.random.fold_in(key, 1),
        )
        params = est.params
        tt = self.theta_transform
        pot_xfn = self._pure_potential_xfn()

        def loss(p, k, x_batch):
            def per_x(k_i, x_i):
                u, log_q = est.net.apply(
                    p, k_i, n_particles,
                    est._embed_condition(x_i[None]),
                    method="sample_and_log_prob",
                )
                u = u[:, 0, :]
                log_q = log_q[:, 0]
                theta, ldj = tt.inverse_and_log_det(u)
                lp = pot_xfn(theta, x_i) + ldj
                return jnp.mean(log_q - lp)

            keys = jax.random.split(k, x_batch.shape[0])
            return jnp.mean(jax.vmap(per_x)(keys, x_batch))

        tx = optax.chain(optax.clip_by_global_norm(clip_value),
                         optax.adam(learning_rate))
        state = tx.init(params)

        @jax.jit
        def step(p, s, k):
            l, g = jax.value_and_grad(loss)(p, k, xs)
            u, s = tx.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        for i in range(max_num_iters):
            key, k = jax.random.split(key)
            params, state, l = step(params, state, k)
        est.params = params
        self._amortized_q = est
        self._trained = True
        return self

    # --------------------------------------------------------------- sample
    def sample(self, sample_shape=(), x: Optional[Array] = None, key=None,
               **kwargs) -> Array:
        if getattr(self, "_amortized_q", None) is not None and x is not None:
            est = self._amortized_q
            u = est.sample(sample_shape, jnp.atleast_2d(jnp.asarray(x, jnp.float32)),
                           key=key)
            u = u.reshape((-1, self._dim))
            theta = self.theta_transform.inverse(u)
            return theta.reshape(tuple(sample_shape) + (self._dim,))
        if not self._trained:
            raise RuntimeError("Call `vi_posterior.train()` first.")
        key = next_key(key)
        num = 1
        for s in sample_shape:
            num *= int(s)
        method = kwargs.get("method", "naive")
        if method == "sir":
            # Sampling-importance-resampling against the potential (ref
            # `vi_posterior.py` sampling_method="sir"): draw an oversampled
            # batch from q, resample by importance weights.
            oversample = int(kwargs.get("oversampling_factor", 32))
            k_prop, k_res = jax.random.split(key)
            u = self._q_module.apply(
                self._q_params, k_prop, num * oversample, None, method="sample"
            )[:, 0, :]
            theta_all = self.theta_transform.inverse(u)
            # q's density in THETA space (transform Jacobian included)
            lq_theta = self.log_prob(theta_all)
            logw = self.potential_fn(theta_all) - lq_theta
            idx = jax.random.categorical(k_res, logw, shape=(num,))
            theta = theta_all[idx]
            return theta.reshape(tuple(sample_shape) + (self._dim,))
        u = self._q_module.apply(self._q_params, key, num, None, method="sample")
        theta = self.theta_transform.inverse(u[:, 0, :])
        return theta.reshape(tuple(sample_shape) + (self._dim,))

    def sample_batched(self, sample_shape, x, key=None, **kwargs):
        raise NotImplementedError(
            "VIPosterior requires training per x; `sample_batched` is not "
            "supported (matches the reference)."
        )

    def log_prob(self, theta: Array, x: Optional[Array] = None, **kwargs) -> Array:
        if not self._trained:
            raise RuntimeError("Call `vi_posterior.train()` first.")
        theta = ensure_theta_batched(theta)
        u, ldj = self.theta_transform.forward_and_log_det(theta)
        lq = self._q_module.apply(self._q_params, u, None, method="log_prob")
        return lq + ldj

    # -------------------------------------------------------------- evaluate
    def evaluate(self, x=None, N: int = 1000, key=None) -> float:
        """PSIS k-hat of q vs the potential (ref `:1242`)."""
        key = next_key(key)

        class _QDist:
            def __init__(s):
                pass

            def sample(s, k, shape):
                return self.sample(shape, key=k)

            def log_prob(s, theta):
                return self.log_prob(theta)

        _, log_weights = importance_sample(
            lambda t: self.potential_fn(t), _QDist(), num_samples=N, key=key
        )
        logw = log_weights - jax.scipy.special.logsumexp(log_weights)
        w = jnp.exp(logw)
        M = int(min(N / 5, 3 * (N**0.5)))
        tail = jnp.sort(w)[-M:]
        k_hat, _ = gpdfit(jnp.clip(tail - tail[0], 1e-12))
        return float(k_hat)
