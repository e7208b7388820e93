"""Minimal distribution layer for sbi_tpu.

The reference (`sbi`) leans on ``torch.distributions`` throughout
(e.g. `sbi/utils/torchutils.py:430` BoxUniform, `sbi/utils/
user_input_checks_utils.py` MultipleIndependent). JAX has no equivalent
in-tree, so this module provides a small, jit-friendly distribution
protocol with explicit PRNG keys:

  - ``sample(key, sample_shape) -> sample_shape + batch_shape + event_shape``
  - ``log_prob(value) -> broadcast(batch)`` with event dims reduced
  - distributions are pytrees (registered) so they can cross jit boundaries.

Design: shapes follow the torch.distributions convention (sample, batch,
event) because the whole reference API is written against it
(`sbi/neural_nets/estimators/shape_handling.py:8`).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util


Array = jax.Array


def _size(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


class Distribution:
    """Base class. Subclasses register as pytrees via ``_register``."""

    batch_shape: Tuple[int, ...] = ()
    event_shape: Tuple[int, ...] = ()

    # ---- protocol -------------------------------------------------------
    def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
        raise NotImplementedError

    def log_prob(self, value: Array) -> Array:
        raise NotImplementedError

    def rsample(self, key, sample_shape=()):  # all JAX samples are "r" when smooth
        return self.sample(key, sample_shape)

    @property
    def mean(self) -> Array:
        raise NotImplementedError

    @property
    def variance(self) -> Array:
        raise NotImplementedError

    @property
    def stddev(self) -> Array:
        return jnp.sqrt(self.variance)

    # ---- support --------------------------------------------------------
    def within_support(self, value: Array) -> Array:
        """Boolean mask over batch dims; default: finite log_prob."""
        return jnp.isfinite(self.log_prob(value))

    # ---- pytree helpers ---------------------------------------------------
    _data_fields: Sequence[str] = ()
    _meta_fields: Sequence[str] = ()

    @classmethod
    def _register(cls):
        def flatten(d):
            data = tuple(getattr(d, f) for f in cls._data_fields)
            meta = tuple(getattr(d, f) for f in cls._meta_fields)
            return data, meta

        def unflatten(meta, data):
            obj = cls.__new__(cls)
            for f, v in zip(cls._data_fields, data):
                object.__setattr__(obj, f, v)
            for f, v in zip(cls._meta_fields, meta):
                object.__setattr__(obj, f, v)
            obj.__post_unflatten__()
            return obj

        tree_util.register_pytree_node(cls, flatten, unflatten)

    def __post_unflatten__(self):
        pass


# ---------------------------------------------------------------------------
# Normal / MultivariateNormal
# ---------------------------------------------------------------------------

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


class Normal(Distribution):
    """Diagonal-free scalar normal, broadcast over loc/scale."""

    _data_fields = ("loc", "scale")
    _meta_fields = ()

    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc, dtype=jnp.float32)
        self.scale = jnp.asarray(scale, dtype=jnp.float32)
        self.__post_unflatten__()

    def __post_unflatten__(self):
        self.batch_shape = jnp.broadcast_shapes(
            jnp.shape(self.loc), jnp.shape(self.scale)
        )
        self.event_shape = ()

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return self.loc + self.scale * jax.random.normal(key, shape)

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -0.5 * z**2 - jnp.log(self.scale) - _LOG_SQRT_2PI

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(self.scale**2, self.batch_shape)


Normal._register()


class MultivariateNormal(Distribution):
    """MVN parameterized by covariance (Cholesky cached).

    Mirrors `torch.distributions.MultivariateNormal` as used by
    `sbi/simulators/linear_gaussian.py:62` analytic posteriors.
    """

    _data_fields = ("loc", "scale_tril")
    _meta_fields = ()

    def __init__(self, loc, covariance_matrix=None, scale_tril=None, precision_matrix=None):
        self.loc = jnp.asarray(loc, dtype=jnp.float32)
        if scale_tril is not None:
            self.scale_tril = jnp.asarray(scale_tril, dtype=jnp.float32)
        elif covariance_matrix is not None:
            self.scale_tril = jnp.linalg.cholesky(
                jnp.asarray(covariance_matrix, dtype=jnp.float32)
            )
        elif precision_matrix is not None:
            prec = jnp.asarray(precision_matrix, dtype=jnp.float32)
            cov = jnp.linalg.inv(prec)
            self.scale_tril = jnp.linalg.cholesky(cov)
        else:
            raise ValueError("Provide covariance_matrix, scale_tril, or precision_matrix.")
        self.__post_unflatten__()

    def __post_unflatten__(self):
        self.event_shape = (self.loc.shape[-1],)
        self.batch_shape = jnp.broadcast_shapes(
            self.loc.shape[:-1], self.scale_tril.shape[:-2]
        )

    @property
    def covariance_matrix(self):
        return self.scale_tril @ jnp.swapaxes(self.scale_tril, -1, -2)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape + self.event_shape
        eps = jax.random.normal(key, shape)
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)

    def log_prob(self, value):
        d = self.event_shape[0]
        diff = value - self.loc
        # Solve L y = diff (broadcast over arbitrary leading dims).
        if self.scale_tril.ndim == 2:
            flat = diff.reshape(-1, d)
            y = jax.scipy.linalg.solve_triangular(self.scale_tril, flat.T, lower=True).T
            y = y.reshape(diff.shape)
        else:
            y = _batched_tri_solve(
                jnp.broadcast_to(self.scale_tril, diff.shape + (d,)), diff
            )
        half_log_det = jnp.sum(
            jnp.log(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1)), axis=-1
        )
        return -0.5 * jnp.sum(y**2, axis=-1) - half_log_det - d * _LOG_SQRT_2PI

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape + self.event_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(
            jnp.diagonal(self.covariance_matrix, axis1=-2, axis2=-1),
            self.batch_shape + self.event_shape,
        )


def _batched_tri_solve(L, b):
    solve = jax.scipy.linalg.solve_triangular
    flat_L = L.reshape((-1,) + L.shape[-2:])
    flat_b = b.reshape((-1,) + b.shape[-1:])
    out = jax.vmap(lambda l, v: solve(l, v, lower=True))(flat_L, flat_b)
    return out.reshape(b.shape)


MultivariateNormal._register()


# ---------------------------------------------------------------------------
# Uniform / BoxUniform
# ---------------------------------------------------------------------------


class Uniform(Distribution):
    _data_fields = ("low", "high")
    _meta_fields = ()

    def __init__(self, low, high):
        self.low = jnp.asarray(low, dtype=jnp.float32)
        self.high = jnp.asarray(high, dtype=jnp.float32)
        self.__post_unflatten__()

    def __post_unflatten__(self):
        self.batch_shape = jnp.broadcast_shapes(self.low.shape, self.high.shape)
        self.event_shape = ()

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(key, shape)
        return self.low + (self.high - self.low) * u

    def log_prob(self, value):
        inside = (value >= self.low) & (value <= self.high)
        lp = -jnp.log(self.high - self.low)
        return jnp.where(inside, lp, -jnp.inf)

    def within_support(self, value):
        return (value >= self.low) & (value <= self.high)

    @property
    def mean(self):
        return jnp.broadcast_to(0.5 * (self.low + self.high), self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to((self.high - self.low) ** 2 / 12.0, self.batch_shape)


Uniform._register()


class Independent(Distribution):
    """Reinterpret rightmost batch dims of ``base`` as event dims.

    Mirror of ``torch.distributions.Independent``.
    """

    _data_fields = ("base",)
    _meta_fields = ("reinterpreted_batch_ndims",)

    def __init__(self, base: Distribution, reinterpreted_batch_ndims: int):
        self.base = base
        self.reinterpreted_batch_ndims = reinterpreted_batch_ndims
        self.__post_unflatten__()

    def __post_unflatten__(self):
        n = self.reinterpreted_batch_ndims
        self.batch_shape = self.base.batch_shape[: len(self.base.batch_shape) - n]
        self.event_shape = (
            self.base.batch_shape[len(self.base.batch_shape) - n:]
            + self.base.event_shape
        )

    def sample(self, key, sample_shape=()):
        return self.base.sample(key, sample_shape)

    def log_prob(self, value):
        lp = self.base.log_prob(value)
        for _ in range(self.reinterpreted_batch_ndims):
            lp = lp.sum(axis=-1)
        return lp

    def within_support(self, value):
        ok = self.base.within_support(value)
        for _ in range(self.reinterpreted_batch_ndims):
            ok = ok.all(axis=-1)
        return ok

    @property
    def mean(self):
        return self.base.mean

    @property
    def variance(self):
        return self.base.variance


Independent._register()


class BoxUniform(Independent):
    """Multidimensional uniform over a box. Ref: `sbi/utils/torchutils.py:430`."""

    _data_fields = ("base",)
    _meta_fields = ("reinterpreted_batch_ndims",)

    def __init__(self, low, high):
        low = jnp.atleast_1d(jnp.asarray(low, dtype=jnp.float32))
        high = jnp.atleast_1d(jnp.asarray(high, dtype=jnp.float32))
        super().__init__(Uniform(low, high), 1)

    @property
    def low(self):
        return self.base.low

    @property
    def high(self):
        return self.base.high


BoxUniform._register()


# ---------------------------------------------------------------------------
# Other distributions used by the reference API
# ---------------------------------------------------------------------------


class Gamma(Distribution):
    _data_fields = ("concentration", "rate")
    _meta_fields = ()

    def __init__(self, concentration, rate):
        self.concentration = jnp.asarray(concentration, dtype=jnp.float32)
        self.rate = jnp.asarray(rate, dtype=jnp.float32)
        self.__post_unflatten__()

    def __post_unflatten__(self):
        self.batch_shape = jnp.broadcast_shapes(
            self.concentration.shape, self.rate.shape
        )
        self.event_shape = ()

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        g = jax.random.gamma(key, jnp.broadcast_to(self.concentration, shape))
        return g / self.rate

    def log_prob(self, value):
        a, b = self.concentration, self.rate
        lp = a * jnp.log(b) + (a - 1.0) * jnp.log(value) - b * value - jax.scipy.special.gammaln(a)
        return jnp.where(value > 0, lp, -jnp.inf)

    def within_support(self, value):
        return value > 0

    @property
    def mean(self):
        return jnp.broadcast_to(self.concentration / self.rate, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(self.concentration / self.rate**2, self.batch_shape)


Gamma._register()


class Beta(Distribution):
    _data_fields = ("concentration1", "concentration0")
    _meta_fields = ()

    def __init__(self, concentration1, concentration0):
        self.concentration1 = jnp.asarray(concentration1, dtype=jnp.float32)
        self.concentration0 = jnp.asarray(concentration0, dtype=jnp.float32)
        self.__post_unflatten__()

    def __post_unflatten__(self):
        self.batch_shape = jnp.broadcast_shapes(
            self.concentration1.shape, self.concentration0.shape
        )
        self.event_shape = ()

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.beta(
            key,
            jnp.broadcast_to(self.concentration1, shape),
            jnp.broadcast_to(self.concentration0, shape),
        )

    def log_prob(self, value):
        a, b = self.concentration1, self.concentration0
        lp = (
            (a - 1.0) * jnp.log(value)
            + (b - 1.0) * jnp.log1p(-value)
            - (jax.scipy.special.gammaln(a) + jax.scipy.special.gammaln(b)
               - jax.scipy.special.gammaln(a + b))
        )
        return jnp.where((value > 0) & (value < 1), lp, -jnp.inf)

    def within_support(self, value):
        return (value > 0) & (value < 1)

    @property
    def mean(self):
        a, b = self.concentration1, self.concentration0
        return jnp.broadcast_to(a / (a + b), self.batch_shape)

    @property
    def variance(self):
        a, b = self.concentration1, self.concentration0
        return jnp.broadcast_to(a * b / ((a + b) ** 2 * (a + b + 1.0)), self.batch_shape)


Beta._register()


class Exponential(Distribution):
    _data_fields = ("rate",)
    _meta_fields = ()

    def __init__(self, rate):
        self.rate = jnp.asarray(rate, dtype=jnp.float32)
        self.__post_unflatten__()

    def __post_unflatten__(self):
        self.batch_shape = self.rate.shape
        self.event_shape = ()

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.exponential(key, shape) / self.rate

    def log_prob(self, value):
        lp = jnp.log(self.rate) - self.rate * value
        return jnp.where(value >= 0, lp, -jnp.inf)

    def within_support(self, value):
        return value >= 0

    @property
    def mean(self):
        return 1.0 / self.rate

    @property
    def variance(self):
        return 1.0 / self.rate**2


Exponential._register()


class LogNormal(Distribution):
    _data_fields = ("loc", "scale")
    _meta_fields = ()

    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc, dtype=jnp.float32)
        self.scale = jnp.asarray(scale, dtype=jnp.float32)
        self.__post_unflatten__()

    def __post_unflatten__(self):
        self.batch_shape = jnp.broadcast_shapes(self.loc.shape, self.scale.shape)
        self.event_shape = ()

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jnp.exp(self.loc + self.scale * jax.random.normal(key, shape))

    def log_prob(self, value):
        logv = jnp.log(value)
        z = (logv - self.loc) / self.scale
        lp = -0.5 * z**2 - jnp.log(self.scale) - _LOG_SQRT_2PI - logv
        return jnp.where(value > 0, lp, -jnp.inf)

    def within_support(self, value):
        return value > 0

    @property
    def mean(self):
        return jnp.exp(self.loc + 0.5 * self.scale**2)

    @property
    def variance(self):
        return (jnp.exp(self.scale**2) - 1.0) * jnp.exp(2 * self.loc + self.scale**2)


LogNormal._register()


class Bernoulli(Distribution):
    _data_fields = ("probs",)
    _meta_fields = ()

    def __init__(self, probs):
        self.probs = jnp.asarray(probs, dtype=jnp.float32)
        self.__post_unflatten__()

    def __post_unflatten__(self):
        self.batch_shape = self.probs.shape
        self.event_shape = ()

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.bernoulli(key, self.probs, shape).astype(jnp.float32)

    def log_prob(self, value):
        p = jnp.clip(self.probs, 1e-7, 1 - 1e-7)
        return value * jnp.log(p) + (1.0 - value) * jnp.log1p(-p)

    @property
    def mean(self):
        return self.probs

    @property
    def variance(self):
        return self.probs * (1.0 - self.probs)


Bernoulli._register()


class Categorical(Distribution):
    """Categorical over the last axis of ``logits`` or ``probs``."""

    _data_fields = ("logits",)
    _meta_fields = ()

    def __init__(self, logits=None, probs=None):
        if logits is None:
            logits = jnp.log(jnp.clip(jnp.asarray(probs, jnp.float32), 1e-30))
        self.logits = jnp.asarray(logits, dtype=jnp.float32)
        self.__post_unflatten__()

    def __post_unflatten__(self):
        self.batch_shape = self.logits.shape[:-1]
        self.event_shape = ()

    @property
    def probs(self):
        return jax.nn.softmax(self.logits, axis=-1)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.categorical(key, self.logits, shape=shape).astype(jnp.int32)

    def log_prob(self, value):
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        return jnp.take_along_axis(
            logp, value[..., None].astype(jnp.int32), axis=-1
        )[..., 0]

    def within_support(self, value):
        n = self.logits.shape[-1]
        return (value >= 0) & (value < n)

    @property
    def mean(self):
        raise NotImplementedError


Categorical._register()


class MultipleIndependent(Distribution):
    """Joint over independent 1D/low-D marginals, concatenated on the event axis.

    Mirror of `sbi/utils/user_input_checks_utils.py` MultipleIndependent: the
    reference's way of letting users pass ``[Gamma(...), BoxUniform(...), ...]``
    as a joint prior.
    """

    _data_fields = ("dists",)
    _meta_fields = ("_dims",)

    def __init__(self, dists: Sequence[Distribution]):
        self.dists = list(dists)
        # Reference validation (`user_input_checks_utils.py` MultipleIndependent
        # asserts; exercised at `tests/user_input_checks_test.py:373-404`):
        # >= 2 components, each a Distribution over >= 1 dim, no nesting.
        if len(self.dists) < 2:
            raise ValueError(
                "MultipleIndependent needs at least two distributions; pass "
                "the single prior directly instead."
            )
        for d in self.dists:
            if not isinstance(d, Distribution):
                raise TypeError(
                    f"Component priors must be sbi_tpu Distributions, got "
                    f"{type(d)}. Scalar/python distributions are not "
                    f"supported — use e.g. Uniform(jnp.zeros(1), jnp.ones(1))."
                )
            if isinstance(d, MultipleIndependent):
                raise TypeError(
                    "Nested MultipleIndependent is not supported; pass a flat "
                    "list of component distributions."
                )
            # (scalar components are allowed — they contribute one dim;
            # unlike torch, jax scalar distributions have well-defined
            # batch-of-one semantics here.)
        dims = []
        for d in self.dists:
            if len(d.event_shape) == 0:
                if len(d.batch_shape) > 0:
                    dims.append(_size(d.batch_shape))
                else:
                    dims.append(1)
            else:
                dims.append(_size(d.event_shape))
        self._dims = tuple(dims)
        self.__post_unflatten__()

    def __post_unflatten__(self):
        self.batch_shape = ()
        self.event_shape = (sum(self._dims),)

    def sample(self, key, sample_shape=()):
        keys = jax.random.split(key, len(self.dists))
        parts = []
        for k, d, dim in zip(keys, self.dists, self._dims):
            s = d.sample(k, sample_shape)
            s = s.reshape(tuple(sample_shape) + (dim,))
            parts.append(s)
        return jnp.concatenate(parts, axis=-1)

    def _split(self, value):
        out, i = [], 0
        for dim in self._dims:
            out.append(value[..., i:i + dim])
            i += dim
        return out

    def log_prob(self, value):
        value = jnp.atleast_2d(value)
        parts = self._split(value)
        total = 0.0
        for d, p in zip(self.dists, parts):
            if len(d.event_shape) >= 1:
                lp = d.log_prob(p)
            else:
                lp = d.log_prob(p.squeeze(-1) if d.batch_shape == () else p)
                if d.batch_shape != ():
                    lp = lp.sum(axis=-1)
            total = total + lp
        return total

    def within_support(self, value):
        value = jnp.atleast_2d(value)
        parts = self._split(value)
        ok = jnp.ones(value.shape[:-1], dtype=bool)
        for d, p in zip(self.dists, parts):
            w = d.within_support(p.squeeze(-1) if (d.batch_shape == () and len(d.event_shape) == 0) else p)
            while w.ndim > ok.ndim:
                w = w.all(axis=-1)
            ok = ok & w
        return ok

    @property
    def mean(self):
        parts = []
        for d, dim in zip(self.dists, self._dims):
            parts.append(jnp.broadcast_to(d.mean, (dim,)).reshape(dim))
        return jnp.concatenate(parts)

    @property
    def variance(self):
        parts = []
        for d, dim in zip(self.dists, self._dims):
            parts.append(jnp.broadcast_to(d.variance, (dim,)).reshape(dim))
        return jnp.concatenate(parts)


MultipleIndependent._register()


class Empirical(Distribution):
    """Weighted empirical distribution over given samples.

    Mirror of `sbi/utils/sbiutils.py:956` ImproperEmpirical (which assigns
    uniform log-prob); here log_prob returns zeros like the reference.
    """

    _data_fields = ("samples", "log_weights")
    _meta_fields = ()

    def __init__(self, samples, log_weights=None):
        self.samples = jnp.asarray(samples, dtype=jnp.float32)
        n = self.samples.shape[0]
        if log_weights is None:
            log_weights = jnp.zeros((n,), dtype=jnp.float32)
        self.log_weights = jnp.asarray(log_weights, dtype=jnp.float32)
        self.__post_unflatten__()

    def __post_unflatten__(self):
        self.batch_shape = ()
        self.event_shape = self.samples.shape[1:]

    def sample(self, key, sample_shape=()):
        n = self.samples.shape[0]
        num = _size(sample_shape) if sample_shape else 1
        logits = self.log_weights - jax.scipy.special.logsumexp(self.log_weights)
        idx = jax.random.categorical(key, logits, shape=(num,))
        out = self.samples[idx]
        return out.reshape(tuple(sample_shape) + self.event_shape)

    def log_prob(self, value):
        return jnp.zeros(value.shape[: value.ndim - len(self.event_shape)])

    @property
    def mean(self):
        w = jax.nn.softmax(self.log_weights)
        return jnp.einsum("n,n...->...", w, self.samples)

    @property
    def variance(self):
        w = jax.nn.softmax(self.log_weights)
        m = self.mean
        return jnp.einsum("n,n...->...", w, (self.samples - m) ** 2)


Empirical._register()

# Alias matching the reference name.
ImproperEmpirical = Empirical


class TransformedDistribution(Distribution):
    """Push a base distribution through a bijection (sbi_tpu.utils.transforms)."""

    _data_fields = ("base", "transform")
    _meta_fields = ()

    def __init__(self, base: Distribution, transform):
        self.base = base
        self.transform = transform
        self.__post_unflatten__()

    def __post_unflatten__(self):
        self.batch_shape = self.base.batch_shape
        self.event_shape = self.base.event_shape

    def sample(self, key, sample_shape=()):
        x = self.base.sample(key, sample_shape)
        y, _ = self.transform.forward_and_log_det(x)
        return y

    def log_prob(self, value):
        x, ildj = self.transform.inverse_and_log_det(value)
        lp = self.base.log_prob(x)
        # ildj has event dims already reduced by the transform convention.
        return lp + ildj


TransformedDistribution._register()
