"""mini-sbibm style benchmark tasks: two_moons, slcp, gaussian_linear,
linear_mvg_2d, gaussian_mixture.

JAX counterparts of `tests/mini_sbibm/` in the reference plus
`sbi/simulators/gaussian_mixture.py:39`. Each task bundles prior, simulator,
and a way to draw *reference posterior samples* (analytic inversion where
possible, long-run MCMC on the true likelihood otherwise).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..utils.distributions import BoxUniform, Distribution, MultivariateNormal
from ..utils.sbiutils import next_key
from .linear_gaussian import (
    linear_gaussian,
    true_posterior_linear_gaussian_mvn_prior,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# two_moons — analytic posterior sampling via branch inversion
# ---------------------------------------------------------------------------


def two_moons_simulator(theta: Array, key: Optional[Array] = None) -> Array:
    key = next_key(key)
    theta = jnp.atleast_2d(jnp.asarray(theta, jnp.float32))
    n = theta.shape[0]
    ka, kr = jax.random.split(key)
    a = jax.random.uniform(ka, (n,), minval=-jnp.pi / 2, maxval=jnp.pi / 2)
    r = 0.1 + 0.01 * jax.random.normal(kr, (n,))
    p = jnp.stack([r * jnp.cos(a) + 0.25, r * jnp.sin(a)], axis=-1)
    sq2 = jnp.sqrt(2.0)
    shift = jnp.stack(
        [-jnp.abs(theta[:, 0] + theta[:, 1]) / sq2,
         (-theta[:, 0] + theta[:, 1]) / sq2],
        axis=-1,
    )
    return p + shift


def two_moons_reference_samples(
    x_o: Array, num_samples: int, key: Optional[Array] = None
) -> Array:
    """Exact posterior samples by inverting the noise model.

    Given x_o and noise draws (a, r):
      c := r cos a + 0.25 - x1  must equal |t1+t2|/sqrt(2)  (reject c<0)
      d := x2 - r sin a         equals (-t1+t2)/sqrt(2)
    with a uniform sign for (t1+t2). Reject draws outside the prior box.
    """
    key = next_key(key)
    x_o = jnp.asarray(x_o, jnp.float32).reshape(-1)[:2]
    sq2 = jnp.sqrt(2.0)
    out = []
    total = 0
    while total < num_samples:
        key, ka, kr, ks = jax.random.split(key, 4)
        n = max(4 * num_samples, 1000)
        a = jax.random.uniform(ka, (n,), minval=-jnp.pi / 2, maxval=jnp.pi / 2)
        r = 0.1 + 0.01 * jax.random.normal(kr, (n,))
        c = r * jnp.cos(a) + 0.25 - x_o[0]
        d = x_o[1] - r * jnp.sin(a)
        sign = jnp.where(jax.random.bernoulli(ks, 0.5, (n,)), 1.0, -1.0)
        u = sign * sq2 * c  # t1 + t2
        v = sq2 * d         # -t1 + t2
        t1 = 0.5 * (u - v)
        t2 = 0.5 * (u + v)
        theta = jnp.stack([t1, t2], axis=-1)
        ok = (c >= 0) & (jnp.abs(theta) <= 1.0).all(axis=-1)
        out.append(theta[ok])
        total += int(ok.sum())
    return jnp.concatenate(out, axis=0)[:num_samples]


# ---------------------------------------------------------------------------
# SLCP — tractable likelihood; reference samples via long-run MCMC
# ---------------------------------------------------------------------------


def _slcp_cov(theta: Array) -> Array:
    s1 = theta[..., 2] ** 2
    s2 = theta[..., 3] ** 2
    rho = jnp.tanh(theta[..., 4])
    c11 = s1**2
    c22 = s2**2
    c12 = rho * s1 * s2
    row1 = jnp.stack([c11, c12], axis=-1)
    row2 = jnp.stack([c12, c22], axis=-1)
    return jnp.stack([row1, row2], axis=-2)  # (..., 2, 2)


def slcp_simulator(theta: Array, key: Optional[Array] = None) -> Array:
    """SLCP: 4 iid draws from a 2D Gaussian whose mean/cov come from theta."""
    key = next_key(key)
    theta = jnp.atleast_2d(jnp.asarray(theta, jnp.float32))
    n = theta.shape[0]
    mean = theta[:, :2]
    cov = _slcp_cov(theta)
    # jitter for numerical stability of cholesky near rho=+-1
    chol = jnp.linalg.cholesky(cov + 1e-6 * jnp.eye(2))
    eps = jax.random.normal(key, (n, 4, 2))
    draws = mean[:, None, :] + jnp.einsum("nij,ntj->nti", chol, eps)
    return draws.reshape(n, 8)


def slcp_log_likelihood(theta: Array, x: Array) -> Array:
    """Exact log p(x | theta); theta (..., 5), x (8,) fixed observation."""
    x = jnp.asarray(x, jnp.float32).reshape(4, 2)
    mean = theta[..., :2]
    cov = _slcp_cov(theta) + 1e-6 * jnp.eye(2)
    chol = jnp.linalg.cholesky(cov)
    diff = x - mean[..., None, :]  # (..., 4, 2)
    y = _tri_solve_batch(chol, diff)
    half_logdet = jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    # y: (..., T, 2); half_logdet: (...,) -> broadcast over the trial axis
    lp_each = (
        -0.5 * jnp.sum(y**2, axis=-1) - half_logdet[..., None] - jnp.log(2 * jnp.pi)
    )
    return jnp.sum(lp_each, axis=-1)


def _tri_solve_batch(chol, diff):
    # chol: (..., 2, 2); diff: (..., T, 2) -> solve per trial
    def solve_one(L, d):
        return jax.scipy.linalg.solve_triangular(L, d.T, lower=True).T

    flat_L = chol.reshape((-1, 2, 2))
    flat_d = diff.reshape((-1,) + diff.shape[-2:])
    out = jax.vmap(solve_one)(flat_L, flat_d)
    return out.reshape(diff.shape)


# ---------------------------------------------------------------------------
# Gaussian mixture (ref `sbi/simulators/gaussian_mixture.py:39`)
# ---------------------------------------------------------------------------


def gaussian_mixture_simulator(
    theta: Array, key: Optional[Array] = None, num_trials: int = 1
) -> Array:
    """x ~ 0.5 N(theta, I) + 0.5 N(theta, 0.01 I)."""
    key = next_key(key)
    theta = jnp.atleast_2d(jnp.asarray(theta, jnp.float32))
    n, d = theta.shape
    kb, kn = jax.random.split(key)
    wide = jax.random.bernoulli(kb, 0.5, (n, num_trials))
    std = jnp.where(wide, 1.0, 0.1)
    eps = jax.random.normal(kn, (n, num_trials, d))
    x = theta[:, None, :] + std[..., None] * eps
    return x.reshape(n, num_trials * d) if num_trials > 1 else x[:, 0, :]


def gaussian_mixture_log_likelihood(theta: Array, x: Array) -> Array:
    """log[0.5 N(x; theta, I) + 0.5 N(x; theta, 0.01 I)]; theta (..., d),
    x (d,) fixed observation -> (...,)."""
    theta = jnp.asarray(theta, jnp.float32)
    x = jnp.asarray(x, jnp.float32).reshape(-1)
    d = x.shape[0]
    sq = jnp.sum((x - theta) ** 2, axis=-1)
    log_wide = -0.5 * (d * jnp.log(2 * jnp.pi) + sq)
    log_narrow = -0.5 * (d * jnp.log(2 * jnp.pi * 0.01) + sq / 0.01)
    return jnp.logaddexp(log_wide, log_narrow) + jnp.log(0.5)


def gaussian_mixture_reference_samples(
    x_o: Array, num_samples: int, key: Optional[Array] = None, bound: float = 10.0
) -> Array:
    """Exact posterior draws for the gaussian_mixture task.

    The likelihood depends on theta only through ``x - theta``, so under the
    box-uniform prior the posterior is the same two-component mixture
    *centered at x_o*, truncated to the box: sample the component, draw the
    Gaussian, reject outside the box.
    """
    key = next_key(key)
    x_o = jnp.asarray(x_o, jnp.float32).reshape(-1)
    d = x_o.shape[0]
    out = []
    total = 0
    while total < num_samples:
        key, kb, kn = jax.random.split(key, 3)
        n_draw = max(2 * num_samples, 1000)
        wide = jax.random.bernoulli(kb, 0.5, (n_draw,))
        std = jnp.where(wide, 1.0, 0.1)
        cand = x_o[None] + std[:, None] * jax.random.normal(kn, (n_draw, d))
        ok = jnp.all(jnp.abs(cand) <= bound, axis=-1)
        acc = cand[ok]
        out.append(acc)
        total += int(acc.shape[0])
    return jnp.concatenate(out)[:num_samples]


# ---------------------------------------------------------------------------
# Task registry
# ---------------------------------------------------------------------------


@dataclass
class Task:
    name: str
    prior: Distribution
    simulator: Callable
    theta_dim: int
    x_dim: int
    # fn(x_o, num_samples, key) -> reference posterior samples
    reference_sampler: Optional[Callable] = None
    # exact log-likelihood fn(theta, x) if tractable
    log_likelihood: Optional[Callable] = None

    def default_x_o(self, key: Optional[Array] = None, theta_o: Optional[Array] = None):
        key = next_key(key)
        k1, k2 = jax.random.split(key)
        if theta_o is None:
            theta_o = self.prior.sample(k1, (1,))
        x_o = self.simulator(theta_o, key=k2)
        return theta_o, x_o


def get_task(name: str) -> Task:
    if name == "two_moons":
        return Task(
            name="two_moons",
            prior=BoxUniform(-jnp.ones(2), jnp.ones(2)),
            simulator=two_moons_simulator,
            theta_dim=2,
            x_dim=2,
            reference_sampler=two_moons_reference_samples,
        )
    if name == "slcp":
        return Task(
            name="slcp",
            prior=BoxUniform(-3 * jnp.ones(5), 3 * jnp.ones(5)),
            simulator=slcp_simulator,
            theta_dim=5,
            x_dim=8,
            log_likelihood=slcp_log_likelihood,
        )
    if name == "gaussian_linear":
        prior_cov = 0.1 * jnp.eye(10)
        prior = MultivariateNormal(jnp.zeros(10), covariance_matrix=prior_cov)
        lik_cov = 0.1 * jnp.eye(10)

        def sim(theta, key=None):
            return linear_gaussian(theta, jnp.zeros(10), lik_cov, key=key)

        def ref(x_o, num_samples, key=None):
            post = true_posterior_linear_gaussian_mvn_prior(
                x_o, jnp.zeros(10), lik_cov, jnp.zeros(10), prior_cov
            )
            return post.sample(next_key(key), (num_samples,))

        return Task("gaussian_linear", prior, sim, 10, 10, reference_sampler=ref)
    if name == "linear_mvg_2d":
        prior = MultivariateNormal(jnp.zeros(2), covariance_matrix=jnp.eye(2))
        shift = -1.0 * jnp.ones(2)
        lik_cov = 0.3 * jnp.eye(2) + 0.1

        def sim2(theta, key=None):
            return linear_gaussian(theta, shift, lik_cov, key=key)

        def ref2(x_o, num_samples, key=None):
            post = true_posterior_linear_gaussian_mvn_prior(
                x_o, shift, lik_cov, jnp.zeros(2), jnp.eye(2)
            )
            return post.sample(next_key(key), (num_samples,))

        return Task("linear_mvg_2d", prior, sim2, 2, 2, reference_sampler=ref2)
    if name == "gaussian_mixture":
        return Task(
            name="gaussian_mixture",
            prior=BoxUniform(-10 * jnp.ones(2), 10 * jnp.ones(2)),
            simulator=gaussian_mixture_simulator,
            theta_dim=2,
            x_dim=2,
            reference_sampler=gaussian_mixture_reference_samples,
            log_likelihood=gaussian_mixture_log_likelihood,
        )
    raise ValueError(f"Unknown task {name}")


ALL_TASKS = ("two_moons", "slcp", "gaussian_linear", "linear_mvg_2d", "gaussian_mixture")
