"""Bijective transforms (constrained <-> unconstrained space).

Mirrors the role of torch transforms in the reference:
`sbi/utils/sbiutils.py:814-930` (``mcmc_transform``) builds a bijection from
the prior's support to R^D so that MCMC/VI/MAP run in unconstrained space.

Conventions:
  - ``forward`` maps *constrained* -> *unconstrained* (like the reference's
    ``theta_transform``), ``inverse`` maps back.
  - ``forward_and_log_det`` returns (y, logdet) with logdet summed over the
    event (last) axis, shape = batch.
  - Transforms are pytrees, safe to close over in jitted functions.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import tree_util

from .distributions import (
    BoxUniform,
    Distribution,
    Independent,
    MultipleIndependent,
    Uniform,
)


class Transform:
    _data_fields: Sequence[str] = ()
    _meta_fields: Sequence[str] = ()

    def forward(self, x):
        return self.forward_and_log_det(x)[0]

    def inverse(self, y):
        return self.inverse_and_log_det(y)[0]

    # torch-like alias used by the reference API (theta_transform.inv)
    @property
    def inv(self):
        return _Inverted(self)

    def forward_and_log_det(self, x):
        raise NotImplementedError

    def inverse_and_log_det(self, y):
        raise NotImplementedError

    def log_abs_det_jacobian(self, x, y=None):
        return self.forward_and_log_det(x)[1]

    def __call__(self, x):
        return self.forward(x)

    @classmethod
    def _register(cls):
        def flatten(t):
            return (
                tuple(getattr(t, f) for f in cls._data_fields),
                tuple(getattr(t, f) for f in cls._meta_fields),
            )

        def unflatten(meta, data):
            obj = cls.__new__(cls)
            for f, v in zip(cls._data_fields, data):
                object.__setattr__(obj, f, v)
            for f, v in zip(cls._meta_fields, meta):
                object.__setattr__(obj, f, v)
            return obj

        tree_util.register_pytree_node(cls, flatten, unflatten)


class _Inverted(Transform):
    _data_fields = ("base",)

    def __init__(self, base):
        self.base = base

    def forward_and_log_det(self, x):
        return self.base.inverse_and_log_det(x)

    def inverse_and_log_det(self, y):
        return self.base.forward_and_log_det(y)

    @property
    def inv(self):
        return self.base


_Inverted._register()


class IdentityTransform(Transform):
    def forward_and_log_det(self, x):
        return x, jnp.zeros(x.shape[:-1])

    def inverse_and_log_det(self, y):
        return y, jnp.zeros(y.shape[:-1])


IdentityTransform._register()


class AffineTransform(Transform):
    """y = (x - loc) / scale  (z-scoring direction: constrained -> standardized)."""

    _data_fields = ("loc", "scale")

    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc, dtype=jnp.float32)
        self.scale = jnp.asarray(scale, dtype=jnp.float32)

    def forward_and_log_det(self, x):
        y = (x - self.loc) / self.scale
        ldj = -jnp.sum(jnp.broadcast_to(jnp.log(jnp.abs(self.scale)), x.shape), axis=-1)
        return y, ldj

    def inverse_and_log_det(self, y):
        x = y * self.scale + self.loc
        ldj = jnp.sum(jnp.broadcast_to(jnp.log(jnp.abs(self.scale)), y.shape), axis=-1)
        return x, ldj


AffineTransform._register()


class BoxToUnboundedTransform(Transform):
    """Map a box (low, high) to R^D via scaled logit; inverse is sigmoid.

    forward: x in (low, high) -> logit((x - low)/(high - low))
    """

    _data_fields = ("low", "high")

    def __init__(self, low, high):
        self.low = jnp.asarray(low, dtype=jnp.float32)
        self.high = jnp.asarray(high, dtype=jnp.float32)

    def forward_and_log_det(self, x):
        width = self.high - self.low
        u = (x - self.low) / width
        u = jnp.clip(u, 1e-7, 1.0 - 1e-7)
        y = jnp.log(u) - jnp.log1p(-u)
        # d y / d x = 1 / (width * u * (1-u))
        ldj = jnp.sum(-jnp.log(width) - jnp.log(u) - jnp.log1p(-u), axis=-1)
        return y, ldj

    def inverse_and_log_det(self, y):
        width = self.high - self.low
        # Clamp into the OPEN interval (torch clamp_probs behavior): at
        # |y| >~ 17, float32 sigmoid saturates to exactly 0/1, putting
        # MCMC states on the closed boundary where bounded priors are
        # log_prob = -inf and HMC gradients NaN.
        u = jnp.clip(jax.nn.sigmoid(y), 1e-7, 1.0 - 1e-7)
        x = self.low + width * u
        ldj = jnp.sum(jnp.log(width) + jax.nn.log_sigmoid(y) + jax.nn.log_sigmoid(-y), axis=-1)
        return x, ldj


BoxToUnboundedTransform._register()


class LogTransform(Transform):
    """Map (0, inf) -> R via log."""

    def forward_and_log_det(self, x):
        x = jnp.clip(x, 1e-30)
        return jnp.log(x), jnp.sum(-jnp.log(x), axis=-1)

    def inverse_and_log_det(self, y):
        x = jnp.exp(y)
        return x, jnp.sum(y, axis=-1)


LogTransform._register()


class ComposeTransform(Transform):
    _data_fields = ("parts",)

    def __init__(self, parts):
        self.parts = tuple(parts)

    def forward_and_log_det(self, x):
        total = 0.0
        for t in self.parts:
            x, ldj = t.forward_and_log_det(x)
            total = total + ldj
        return x, total

    def inverse_and_log_det(self, y):
        total = 0.0
        for t in reversed(self.parts):
            y, ldj = t.inverse_and_log_det(y)
            total = total + ldj
        return y, total


ComposeTransform._register()


class PerDimTransform(Transform):
    """Apply different scalar transforms per slice of the event axis.

    Used for MultipleIndependent priors with mixed supports
    (cf. reference mcmc_transform composing biject_to per marginal).
    """

    _data_fields = ("transforms",)
    _meta_fields = ("dims",)

    def __init__(self, transforms, dims):
        self.transforms = tuple(transforms)
        self.dims = tuple(dims)

    def _apply(self, value, direction):
        parts, ldjs, i = [], [], 0
        for t, d in zip(self.transforms, self.dims):
            chunk = value[..., i:i + d]
            if direction == "fwd":
                out, ldj = t.forward_and_log_det(chunk)
            else:
                out, ldj = t.inverse_and_log_det(chunk)
            parts.append(out)
            ldjs.append(ldj)
            i += d
        total = ldjs[0]
        for l in ldjs[1:]:
            total = total + l
        return jnp.concatenate(parts, axis=-1), total

    def forward_and_log_det(self, x):
        return self._apply(x, "fwd")

    def inverse_and_log_det(self, y):
        return self._apply(y, "inv")


PerDimTransform._register()


def _transform_for(dist: Distribution, num_dims: int) -> Transform:
    """Pick an unconstraining transform for a single marginal."""
    from .distributions import Beta, Exponential, Gamma, LogNormal, Normal, MultivariateNormal

    if isinstance(dist, BoxUniform):
        return BoxToUnboundedTransform(dist.low, dist.high)
    if isinstance(dist, Independent) and isinstance(dist.base, Uniform):
        return BoxToUnboundedTransform(dist.base.low, dist.base.high)
    if isinstance(dist, Uniform):
        return BoxToUnboundedTransform(dist.low, dist.high)
    if isinstance(dist, Beta):
        return BoxToUnboundedTransform(jnp.zeros(num_dims), jnp.ones(num_dims))
    if isinstance(dist, (Gamma, Exponential, LogNormal)):
        return LogTransform()
    # Unbounded support: standardize with prior moments like the reference
    # (`sbi/utils/sbiutils.py:880-930`).
    try:
        loc = jnp.broadcast_to(dist.mean, (num_dims,))
        scale = jnp.broadcast_to(dist.stddev, (num_dims,))
        return AffineTransform(loc, scale)
    except NotImplementedError:
        return IdentityTransform()


def mcmc_transform(prior: Distribution, enable_transform: bool = True) -> Transform:
    """Bijection from the prior's support to unconstrained R^D.

    Mirror of `sbi/utils/sbiutils.py:814` ``mcmc_transform``. ``forward`` maps
    constrained -> unconstrained; ``.inv`` maps back (matches the reference's
    ``theta_transform`` usage in `sbi/inference/posteriors/mcmc_posterior.py`).
    """
    if not enable_transform:
        return IdentityTransform()
    if isinstance(prior, MultipleIndependent):
        transforms = [
            _transform_for(d, dim) for d, dim in zip(prior.dists, prior._dims)
        ]
        return PerDimTransform(transforms, prior._dims)
    num_dims = int(prior.event_shape[0]) if prior.event_shape else 1
    return _transform_for(prior, num_dims)


def transformed_potential(potential_fn, theta_transform: Transform):
    """Compose a potential with a transform so MCMC runs unconstrained.

    Mirror of `sbi/utils/potentialutils.py:14` ``transformed_potential``:
    ``pot_u(u) = potential(T.inv(u)) + log|det dT.inv/du|``.
    """

    def transformed(u):
        theta, ldj = theta_transform.inverse_and_log_det(u)
        return potential_fn(theta) + ldj

    return transformed
