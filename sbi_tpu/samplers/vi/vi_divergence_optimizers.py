"""Variational divergences + optimizer registry.

JAX counterpart of `sbi/samplers/vi/vi_divergence_optimizers.py:52-742`:
`ElboOptimizer` (rKL with sticking-the-landing), `IWElboOptimizer`,
`ForwardKLOptimizer`, `RenyiDivergenceOptimizer`, and the registry
(`:383-417`). Each divergence is a pure loss over the variational flow's
params — the whole fit is one jitted optax loop in VIPosterior.train().

Interface: every loss is
  fn(params, key, sample_and_log_prob, log_prob_at, potential_u,
     num_particles, **kwargs) -> scalar
with
  sample_and_log_prob(params, key, n) -> (u (n, D), log_q (n,))  [reparam]
  log_prob_at(params, u) -> (n,)
  potential_u(u) -> (n,)  unnormalized log posterior in unconstrained space.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

Array = jax.Array

_REGISTRY: Dict[str, Callable] = {}


def register_VI_method(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def get_VI_method(name: str) -> Callable:
    if name not in _REGISTRY:
        raise NotImplementedError(
            f"Unknown VI divergence '{name}'. Available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def get_default_VI_method() -> tuple:
    return tuple(sorted(_REGISTRY))


@register_VI_method("rKL")
def reverse_kl_loss(params, key, sample_and_log_prob, log_prob_at, potential_u,
                    num_particles, stick_the_landing: bool = True, **kwargs):
    """ELBO / reverse KL (ref `:422-496`). Sticking-the-landing drops the
    score term of log q from the gradient (lower variance near optimum)."""
    u, log_q_path = sample_and_log_prob(params, key, num_particles)
    if stick_the_landing:
        log_q = log_prob_at(jax.lax.stop_gradient(params), u)
    else:
        log_q = log_q_path
    return jnp.mean(log_q - potential_u(u))


@register_VI_method("IW")
def iw_elbo_loss(params, key, sample_and_log_prob, log_prob_at, potential_u,
                 num_particles, K: int = 8, **kwargs):
    """Importance-weighted ELBO (ref `:497`)."""
    n = max(num_particles // K, 1)
    u, log_q = sample_and_log_prob(params, key, n * K)
    logw = (potential_u(u) - log_q).reshape(n, K)
    return -jnp.mean(
        jax.scipy.special.logsumexp(logw, axis=1) - jnp.log(float(K))
    )


@register_VI_method("fKL")
def forward_kl_loss(params, key, sample_and_log_prob, log_prob_at, potential_u,
                    num_particles, **kwargs):
    """Self-normalized forward KL (ref `:583`): -E_p[log q] with SNIS
    weights computed from q as the proposal."""
    u, log_q = sample_and_log_prob(params, key, num_particles)
    logw = jax.lax.stop_gradient(potential_u(u) - log_q)
    w = jax.nn.softmax(logw)
    return -jnp.sum(w * log_prob_at(params, jax.lax.stop_gradient(u)))


@register_VI_method("alpha")
def renyi_loss(params, key, sample_and_log_prob, log_prob_at, potential_u,
               num_particles, alpha: float = 0.5, **kwargs):
    """Renyi alpha-divergence bound (ref `:654`)."""
    u, log_q = sample_and_log_prob(params, key, num_particles)
    logw = (1.0 - alpha) * (potential_u(u) - log_q)
    return -(
        jax.scipy.special.logsumexp(logw, axis=0)
        - jnp.log(float(num_particles))
    ) / (1.0 - alpha)
