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
    if q in ("nsf", "maf", "gaussian", "nice"):
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

    # --------------------------------------------------------------- sample
    def sample(self, sample_shape=(), x: Optional[Array] = None, key=None,
               **kwargs) -> Array:
        if not self._trained:
            raise RuntimeError("Call `vi_posterior.train()` first.")
        key = next_key(key)
        num = 1
        for s in sample_shape:
            num *= int(s)
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
