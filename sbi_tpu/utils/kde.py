"""Gaussian KDE with transform support (ref `sbi/utils/kde.py:16,48`)."""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from .sbiutils import next_key
from .transforms import IdentityTransform, Transform

Array = jax.Array


class KDEWrapper:
    """Gaussian kernel density estimate over (optionally transformed) samples."""

    def __init__(self, samples: Array, bandwidth: Array, transform: Transform):
        self.samples = jnp.asarray(samples, jnp.float32)  # in transformed space
        self.bandwidth = bandwidth
        self.transform = transform

    def log_prob(self, theta: Array) -> Array:
        theta = jnp.atleast_2d(jnp.asarray(theta, jnp.float32))
        u, ldj = self.transform.forward_and_log_det(theta)
        n, D = self.samples.shape
        diff = (u[:, None, :] - self.samples[None, :, :]) / self.bandwidth
        log_k = -0.5 * jnp.sum(diff**2, axis=-1) - jnp.sum(
            jnp.log(self.bandwidth)
        ) - 0.5 * D * jnp.log(2 * jnp.pi)
        return jax.scipy.special.logsumexp(log_k, axis=1) - jnp.log(n) + ldj

    def sample(self, *args) -> Array:
        """sample(shape) or sample(key, shape)."""
        if len(args) == 2:
            key, sample_shape = args
        else:
            key, sample_shape = None, args[0] if args else ()
        key = next_key(key)
        num = 1
        for s in sample_shape:
            num *= int(s)
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (num,), 0, self.samples.shape[0])
        eps = jax.random.normal(k2, (num, self.samples.shape[1]))
        u = self.samples[idx] + self.bandwidth * eps
        theta = self.transform.inverse(u)
        return theta.reshape(tuple(sample_shape) + (self.samples.shape[1],))


def get_kde(
    samples: Array,
    bandwidth: Union[str, float] = "cv",
    transform: Optional[Transform] = None,
    num_cv_partitions: int = 20,
    sample_weights=None,
) -> KDEWrapper:
    """Fit a Gaussian KDE; bandwidth by Scott/Silverman rule or CV grid."""
    transform = transform or IdentityTransform()
    samples = jnp.atleast_2d(jnp.asarray(samples, jnp.float32))
    u, _ = transform.forward_and_log_det(samples)
    n, D = u.shape
    std = jnp.std(u, axis=0) + 1e-8

    if isinstance(bandwidth, (int, float)):
        bw = jnp.full((D,), float(bandwidth))
    elif bandwidth == "silvermann":
        bw = std * (4.0 / (D + 2.0) / n) ** (1.0 / (D + 4.0))
    elif bandwidth in ("scott", "cv"):
        # Scott's rule; 'cv' uses a small grid around it via leave-chunk-out
        bw0 = std * n ** (-1.0 / (D + 4.0))
        if bandwidth == "scott":
            bw = bw0
        else:
            factors = jnp.array([0.25, 0.5, 1.0, 2.0, 4.0])
            n_val = max(n // 5, 1)
            train, val = u[n_val:], u[:n_val]

            def score(f):
                k = KDEWrapper(train, f * bw0, IdentityTransform())
                return k.log_prob(val).mean()

            scores = jnp.stack([score(f) for f in factors])
            bw = factors[jnp.argmax(scores)] * bw0
    else:
        raise ValueError(f"Unknown bandwidth '{bandwidth}'")
    return KDEWrapper(u, bw, transform)
