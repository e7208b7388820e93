"""Normalizing flows, implemented in-repo (replaces nflows + zuko).

The reference delegates flows to third-party libs (`sbi/neural_nets/
net_builders/flow.py:330-456` builds nflows NSF/MAF; `:459-1170` the zuko
zoo). Those are load-bearing capabilities, so they are re-implemented here as
first-class JAX modules:

  - MADE masked autoregressive nets (Gaussian and MoG heads)
  - MAF (masked affine autoregressive), MAF-RQS (autoregressive splines)
  - NSF (rational-quadratic spline *coupling* + LU-linear, matching the
    reference's nflows recipe at `flow.py:330-456`)
  - NICE (additive coupling)

Conventions:
  - ``forward`` maps data -> noise (one pass for all layers; this is the
    training hot path), ``inverse`` maps noise -> data (one pass for
    couplings, D sequential passes for autoregressive layers).
  - log_prob(x|ctx) = N(forward(x); 0, I) + sum ldj. All ldj are (batch,).
  - Context is embedded once per call by an optional embedding submodule.

TPU notes: the RQ spline uses a one-hot bin gather (K is small) instead of
searchsorted — fully vectorized, fuses into the surrounding elementwise ops.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import ConditionalDensityEstimator, UnconditionalEstimator

Array = jax.Array

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


# ===========================================================================
# Rational-quadratic spline (Durkan et al. 2019), both directions analytic.
# ===========================================================================


def rational_quadratic_spline(
    inputs: Array,
    unnormalized_widths: Array,
    unnormalized_heights: Array,
    unnormalized_derivatives: Array,
    inverse: bool = False,
    tail_bound: float = 3.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
    use_pallas: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """Elementwise monotonic RQ spline with linear tails.

    inputs: (...,); unnormalized_*: (..., K) / (..., K) / (..., K-1).
    Returns (outputs, log_abs_det) elementwise.

    On TPU, large calls dispatch to the fused Pallas kernel
    (`sbi_tpu/ops/rqs_pallas.py`, ~5x over the XLA-fused path); gradients
    route through this jnp implementation's VJP either way.
    """
    K = unnormalized_widths.shape[-1]
    if use_pallas is None:
        from ...ops.rqs_pallas import pallas_available

        use_pallas = (
            pallas_available()
            and inputs.size >= 4096
            and min_bin_width == DEFAULT_MIN_BIN_WIDTH
            and min_bin_height == DEFAULT_MIN_BIN_HEIGHT
            and min_derivative == DEFAULT_MIN_DERIVATIVE
        )
    if use_pallas:
        from ...ops.rqs_pallas import rational_quadratic_spline_pallas

        return rational_quadratic_spline_pallas(
            inputs, unnormalized_widths, unnormalized_heights,
            unnormalized_derivatives, inverse, tail_bound,
        )

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * K) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.concatenate([jnp.zeros_like(cumwidths[..., :1]), cumwidths], -1)
    cumwidths = (cumwidths * 2 - 1) * tail_bound  # map [0,1] -> [-B, B]
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * K) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.concatenate([jnp.zeros_like(cumheights[..., :1]), cumheights], -1)
    cumheights = (cumheights * 2 - 1) * tail_bound
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    derivs_inner = min_derivative + jax.nn.softplus(unnormalized_derivatives)
    # Boundary derivatives = 1 so the spline matches linear tails.
    ones = jnp.ones_like(derivs_inner[..., :1])
    derivatives = jnp.concatenate([ones, derivs_inner, ones], axis=-1)  # (..., K+1)

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    # Clamp for safe gather math; outside values are passed through below.
    x = jnp.clip(inputs, -tail_bound, tail_bound)

    # Bin index via comparison-sum (K small => cheap, fully vectorized).
    ref = cumheights if inverse else cumwidths
    idx = jnp.sum((x[..., None] >= ref[..., :-1]).astype(jnp.int32), axis=-1) - 1
    idx = jnp.clip(idx, 0, K - 1)

    def take(a, i):
        return jnp.take_along_axis(a, i[..., None], axis=-1)[..., 0]

    in_w = take(widths, idx)
    in_cw = take(cumwidths[..., :-1], idx)
    in_h = take(heights, idx)
    in_ch = take(cumheights[..., :-1], idx)
    d_k = take(derivatives[..., :-1], idx)
    d_k1 = take(derivatives[..., 1:], idx)
    s = in_h / in_w  # bin slope

    if not inverse:
        theta = (x - in_cw) / in_w
        theta = jnp.clip(theta, 0.0, 1.0)
        tt = theta * (1 - theta)
        numerator = in_h * (s * theta**2 + d_k * tt)
        denominator = s + (d_k1 + d_k - 2 * s) * tt
        outputs = in_ch + numerator / denominator
        deriv_num = s**2 * (d_k1 * theta**2 + 2 * s * tt + d_k * (1 - theta) ** 2)
        logabsdet = jnp.log(deriv_num) - 2 * jnp.log(denominator)
    else:
        y_rel = x - in_ch
        a = in_h * (s - d_k) + y_rel * (d_k1 + d_k - 2 * s)
        b = in_h * d_k - y_rel * (d_k1 + d_k - 2 * s)
        c = -s * y_rel
        disc = b**2 - 4 * a * c
        disc = jnp.clip(disc, 0.0)
        # Numerically stable quadratic root in [0, 1].
        theta = 2 * c / (-b - jnp.sqrt(disc))
        theta = jnp.clip(theta, 0.0, 1.0)
        outputs = theta * in_w + in_cw
        tt = theta * (1 - theta)
        denominator = s + (d_k1 + d_k - 2 * s) * tt
        deriv_num = s**2 * (d_k1 * theta**2 + 2 * s * tt + d_k * (1 - theta) ** 2)
        logabsdet = -(jnp.log(deriv_num) - 2 * jnp.log(denominator))

    outputs = jnp.where(inside, outputs, inputs)
    logabsdet = jnp.where(inside, logabsdet, jnp.zeros_like(logabsdet))
    return outputs, logabsdet


def circular_rational_quadratic_spline(
    inputs: Array,
    unnormalized_widths: Array,
    unnormalized_heights: Array,
    unnormalized_derivatives: Array,
    unnormalized_shift: Array,
    inverse: bool = False,
    tail_bound: float = np.pi,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[Array, Array]:
    """TRUE circular RQ spline (zuko NCSF recipe, ref
    `net_builders/flow.py:459-1170` -> zuko CircularRQSTransform): a learned
    circular shift followed by an RQ spline on [-B, B] whose first and last
    knot derivatives are TIED to one learned value, so the map is smooth
    across the periodic boundary. Values outside [-B, B] pass through
    unchanged (the circular transform only acts on the circle).

    unnormalized_derivatives: (..., K) = K-1 interior + 1 shared boundary
    derivative. unnormalized_shift: (...,) circular shift.
    """
    K = unnormalized_widths.shape[-1]
    two_b = 2.0 * tail_bound

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * K) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.concatenate([jnp.zeros_like(cumwidths[..., :1]), cumwidths], -1)
    cumwidths = (cumwidths * 2 - 1) * tail_bound
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * K) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.concatenate([jnp.zeros_like(cumheights[..., :1]), cumheights], -1)
    cumheights = (cumheights * 2 - 1) * tail_bound
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    derivs = min_derivative + jax.nn.softplus(unnormalized_derivatives)
    d_bound = derivs[..., -1:]
    derivatives = jnp.concatenate([d_bound, derivs[..., :-1], d_bound], -1)

    shift = jnp.tanh(unnormalized_shift) * tail_bound  # bounded shift

    def wrap(v):
        return jnp.mod(v + tail_bound, two_b) - tail_bound

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    def core(x, inv):
        ref = cumheights if inv else cumwidths
        idx = jnp.sum((x[..., None] >= ref[..., :-1]).astype(jnp.int32), -1) - 1
        idx = jnp.clip(idx, 0, K - 1)

        def take(a, i):
            return jnp.take_along_axis(a, i[..., None], axis=-1)[..., 0]

        in_w = take(widths, idx)
        in_cw = take(cumwidths[..., :-1], idx)
        in_h = take(heights, idx)
        in_ch = take(cumheights[..., :-1], idx)
        d_k = take(derivatives[..., :-1], idx)
        d_k1 = take(derivatives[..., 1:], idx)
        s = in_h / in_w
        if not inv:
            theta = jnp.clip((x - in_cw) / in_w, 0.0, 1.0)
            tt = theta * (1 - theta)
            num = in_h * (s * theta**2 + d_k * tt)
            den = s + (d_k1 + d_k - 2 * s) * tt
            out = in_ch + num / den
            dnum = s**2 * (d_k1 * theta**2 + 2 * s * tt + d_k * (1 - theta) ** 2)
            ld = jnp.log(dnum) - 2 * jnp.log(den)
        else:
            y_rel = x - in_ch
            a = in_h * (s - d_k) + y_rel * (d_k1 + d_k - 2 * s)
            b = in_h * d_k - y_rel * (d_k1 + d_k - 2 * s)
            c = -s * y_rel
            disc = jnp.clip(b**2 - 4 * a * c, 0.0)
            theta = jnp.clip(2 * c / (-b - jnp.sqrt(disc)), 0.0, 1.0)
            out = theta * in_w + in_cw
            tt = theta * (1 - theta)
            den = s + (d_k1 + d_k - 2 * s) * tt
            dnum = s**2 * (d_k1 * theta**2 + 2 * s * tt + d_k * (1 - theta) ** 2)
            ld = -(jnp.log(dnum) - 2 * jnp.log(den))
        return out, ld

    x = jnp.clip(inputs, -tail_bound, tail_bound)
    if not inverse:
        out, ld = core(wrap(x + shift), False)
    else:
        out, ld = core(x, True)
        out = wrap(out - shift)
    outputs = jnp.where(inside, out, inputs)
    logabsdet = jnp.where(inside, ld, jnp.zeros_like(ld))
    return outputs, logabsdet


# ===========================================================================
# MADE masks
# ===========================================================================


def _made_degrees(d: int, hidden: Sequence[int]) -> list:
    """Autoregressive degree assignment. Hidden degrees range over [0, d-1]:
    degree-0 hidden units receive NO theta inputs but DO receive the (unmasked)
    context injection, giving the first output dim (degree 1, which may only
    read hidden degrees < 1) a pure-context channel. Without degree-0 units,
    dim 1's parameters are context-independent — a silent bug that makes 1-D
    conditional MAFs unconditional."""
    degrees = [np.arange(1, d + 1)]
    for h in hidden:
        degrees.append(np.arange(h) % d)  # 0 .. d-1
    return degrees


def _made_masks(d: int, hidden: Sequence[int], out_mult: int):
    """Masks for MADE: hidden masks (prev<=next), output mask (hidden<out)."""
    degrees = _made_degrees(d, hidden)
    masks = []
    for ins, outs in zip(degrees[:-1], degrees[1:]):
        masks.append((outs[None, :] >= ins[:, None]).astype(np.float32))
    out_deg = np.repeat(np.arange(1, d + 1), out_mult)
    masks.append((out_deg[None, :] > degrees[-1][:, None]).astype(np.float32))
    return masks


class MaskedDense(nn.Module):
    features: int
    mask: Any  # np.ndarray, static
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        kernel_init = (
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        )
        kernel = self.param("kernel", kernel_init, (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x @ (kernel * jnp.asarray(self.mask)) + bias


class MADENet(nn.Module):
    """Masked MLP: (x, context) -> (batch, D * out_mult) autoregressive in x."""

    dim: int
    out_mult: int
    hidden_features: int = 50
    num_hidden_layers: int = 2
    context_features: Optional[int] = None
    zero_init_output: bool = True

    @nn.compact
    def __call__(self, x, context=None):
        hidden = [self.hidden_features] * self.num_hidden_layers
        masks = _made_masks(self.dim, hidden, self.out_mult)
        h = MaskedDense(self.hidden_features, masks[0])(x)
        if context is not None:
            h = h + nn.Dense(self.hidden_features)(context)
        h = nn.relu(h)
        for m in masks[1:-1]:
            h = nn.relu(MaskedDense(self.hidden_features, m)(h))
        out = MaskedDense(self.dim * self.out_mult, masks[-1], zero_init=self.zero_init_output)(h)
        # Reorder to (batch, D, out_mult): output degrees repeat each dim.
        return out.reshape(out.shape[0], self.dim, self.out_mult)


# ===========================================================================
# Bijection layers. Interface: forward(x, ctx) -> (y, ldj); inverse likewise.
# ===========================================================================


class MaskedAffineAutoregressive(nn.Module):
    """One MAF layer: z = (x - mu(x_<i)) * exp(-log_scale(x_<i))."""

    dim: int
    hidden_features: int = 50
    num_blocks: int = 2
    context_features: Optional[int] = None
    # Default bounds follow nflows' stability clamp. Conditionals whose scale
    # spans many orders of magnitude (e.g. SLCP's sigma = theta^2, down to
    # 1e-5 in z-space) need a much wider lower bound — the affine layer is
    # then the component that absorbs the dynamic range so downstream
    # splines only see O(1) residuals.
    log_scale_bounds: Tuple[float, float] = (-5.0, 3.0)

    def setup(self):
        self.made = MADENet(
            dim=self.dim,
            out_mult=2,
            hidden_features=self.hidden_features,
            num_hidden_layers=self.num_blocks,
            context_features=self.context_features,
        )

    def _params(self, x, context):
        out = self.made(x, context)
        mu = out[..., 0]
        log_scale = jnp.clip(out[..., 1], *self.log_scale_bounds)
        return mu, log_scale

    def forward(self, x, context=None):
        mu, log_scale = self._params(x, context)
        z = (x - mu) * jnp.exp(-log_scale)
        return z, -jnp.sum(log_scale, axis=-1)

    def inverse(self, z, context=None):
        # Sequential over dims: dim i only depends on x_<i.
        x = jnp.zeros_like(z)
        for _ in range(self.dim):
            mu, log_scale = self._params(x, context)
            x = mu + z * jnp.exp(log_scale)
        _, log_scale = self._params(x, context)
        return x, jnp.sum(log_scale, axis=-1)


class MaskedRQSAutoregressive(nn.Module):
    """Autoregressive RQ-spline layer (zuko-NSF style / MAF-RQS).

    With ``circular=True`` the univariate transform is the TRUE circular
    spline (tied boundary derivatives + learned circular shift), i.e. the
    zuko NCSF building block rather than a bounded-spline approximation."""

    dim: int
    hidden_features: int = 50
    num_blocks: int = 2
    num_bins: int = 10
    tail_bound: float = 3.0
    context_features: Optional[int] = None
    circular: bool = False

    def setup(self):
        # circular: K widths + K heights + K derivs (K-1 interior + 1
        # shared boundary) + 1 shift; linear-tail: 3K-1.
        out_mult = 3 * self.num_bins + 1 if self.circular else 3 * self.num_bins - 1
        self.made = MADENet(
            dim=self.dim,
            out_mult=out_mult,
            hidden_features=self.hidden_features,
            num_hidden_layers=self.num_blocks,
            context_features=self.context_features,
        )

    def _spline(self, v, x_params, context, inverse):
        out = self.made(x_params, context)
        K = self.num_bins
        w, h = out[..., :K], out[..., K:2 * K]
        if self.circular:
            d, s = out[..., 2 * K:3 * K], out[..., 3 * K]
            return circular_rational_quadratic_spline(
                v, w, h, d, s, inverse=inverse, tail_bound=self.tail_bound
            )
        return rational_quadratic_spline(
            v, w, h, out[..., 2 * K:], inverse=inverse, tail_bound=self.tail_bound
        )

    def forward(self, x, context=None):
        y, ldj = self._spline(x, x, context, inverse=False)
        return y, jnp.sum(ldj, axis=-1)

    def inverse(self, z, context=None):
        x = jnp.zeros_like(z)
        for _ in range(self.dim):
            x, ldj = self._spline(z, x, context, inverse=True)
        return x, jnp.sum(ldj, axis=-1)


class RQSCoupling(nn.Module):
    """RQ-spline coupling layer (nflows NSF recipe, ref flow.py:330-456).

    The identity half conditions a residual-MLP that outputs spline params
    for the transform half. Both directions are a single pass.
    """

    dim: int
    mask: Any  # np bool array (D,): True = identity half
    hidden_features: int = 50
    num_blocks: int = 2
    num_bins: int = 10
    tail_bound: float = 3.0
    context_features: Optional[int] = None

    @nn.compact
    def _conditioner(self, x_id, context):
        h = x_id
        if context is not None:
            h = jnp.concatenate([h, context], axis=-1)
        h = nn.Dense(self.hidden_features)(h)
        for _ in range(self.num_blocks):
            r = nn.relu(h)
            r = nn.Dense(self.hidden_features)(r)
            r = nn.relu(r)
            r = nn.Dense(self.hidden_features)(r)
            h = h + r
        n_trans = int((~np.asarray(self.mask)).sum())
        out = nn.Dense(
            n_trans * (3 * self.num_bins - 1), kernel_init=nn.initializers.zeros
        )(nn.relu(h))
        return out.reshape(-1, n_trans, 3 * self.num_bins - 1)

    def _apply(self, v, context, inverse):
        mask = np.asarray(self.mask)
        id_idx = np.where(mask)[0]
        tr_idx = np.where(~mask)[0]
        x_id = v[:, id_idx]
        x_tr = v[:, tr_idx]
        p = self._conditioner(x_id, context)
        K = self.num_bins
        w, h, d = p[..., :K], p[..., K:2 * K], p[..., 2 * K:]
        y_tr, ldj = rational_quadratic_spline(
            x_tr, w, h, d, inverse=inverse, tail_bound=self.tail_bound
        )
        out = jnp.zeros_like(v)
        out = out.at[:, id_idx].set(x_id)
        out = out.at[:, tr_idx].set(y_tr)
        return out, jnp.sum(ldj, axis=-1)

    def forward(self, x, context=None):
        return self._apply(x, context, inverse=False)

    def inverse(self, z, context=None):
        return self._apply(z, context, inverse=True)


class AdditiveCoupling(nn.Module):
    """NICE additive coupling (zuko_nice equivalent)."""

    dim: int
    mask: Any
    hidden_features: int = 50
    num_blocks: int = 2
    context_features: Optional[int] = None

    @nn.compact
    def _shift(self, x_id, context):
        h = x_id
        if context is not None:
            h = jnp.concatenate([h, context], axis=-1)
        for _ in range(self.num_blocks):
            h = nn.relu(nn.Dense(self.hidden_features)(h))
        n_trans = int((~np.asarray(self.mask)).sum())
        return nn.Dense(n_trans, kernel_init=nn.initializers.zeros)(h)

    def _apply(self, v, context, inverse):
        mask = np.asarray(self.mask)
        id_idx = np.where(mask)[0]
        tr_idx = np.where(~mask)[0]
        x_id = v[:, id_idx]
        shift = self._shift(x_id, context)
        out = jnp.zeros_like(v)
        out = out.at[:, id_idx].set(x_id)
        if inverse:
            out = out.at[:, tr_idx].set(v[:, tr_idx] - shift)
        else:
            out = out.at[:, tr_idx].set(v[:, tr_idx] + shift)
        return out, jnp.zeros(v.shape[0])

    def forward(self, x, context=None):
        return self._apply(x, context, inverse=False)

    def inverse(self, z, context=None):
        return self._apply(z, context, inverse=True)


class LULinear(nn.Module):
    """Invertible linear layer W = L U (unit-lower L, upper U), + bias.

    Mirrors nflows' LULinear used between NSF coupling blocks.
    """

    dim: int

    @nn.compact
    def _get_lu(self):
        D = self.dim
        lower_entries = self.param(
            "lower", nn.initializers.zeros, (D * (D - 1) // 2,)
        )
        upper_entries = self.param(
            "upper", nn.initializers.zeros, (D * (D - 1) // 2,)
        )
        # Unconstrained diag -> positive via exp of a small-init param.
        log_diag = self.param("log_diag", nn.initializers.zeros, (D,))
        bias = self.param("bias", nn.initializers.zeros, (D,))
        tril_idx = jnp.tril_indices(D, -1)
        triu_idx = jnp.triu_indices(D, 1)
        L = jnp.eye(D).at[tril_idx].set(lower_entries)
        U = jnp.zeros((D, D)).at[triu_idx].set(upper_entries)
        U = U + jnp.diag(jnp.exp(log_diag))
        return L, U, log_diag, bias

    def forward(self, x, context=None):
        L, U, log_diag, bias = self._get_lu()
        y = (x @ U.T) @ L.T + bias
        return y, jnp.broadcast_to(jnp.sum(log_diag), (x.shape[0],))

    def inverse(self, y, context=None):
        L, U, log_diag, bias = self._get_lu()
        z = y - bias
        z = jax.scipy.linalg.solve_triangular(L, z.T, lower=True).T
        x = jax.scipy.linalg.solve_triangular(U, z.T, lower=False).T
        return x, jnp.broadcast_to(-jnp.sum(log_diag), (y.shape[0],))


class DiagAffine(nn.Module):
    """Elementwise affine bijection x -> exp(log_scale) * x + shift.

    The terminal layer of the reference's ``gaussian_diag`` variational
    family (`sbi/samplers/vi/vi_pyro_flows.py` AffineTransform build): a
    mean-field Gaussian when stacked on a standard-normal base.
    """

    dim: int

    @nn.compact
    def _params(self):
        log_scale = self.param("log_scale", nn.initializers.zeros, (self.dim,))
        shift = self.param("shift", nn.initializers.zeros, (self.dim,))
        return log_scale, shift

    def forward(self, x, context=None):
        log_scale, shift = self._params()
        y = x * jnp.exp(log_scale) + shift
        return y, jnp.broadcast_to(jnp.sum(log_scale), (x.shape[0],))

    def inverse(self, y, context=None):
        log_scale, shift = self._params()
        x = (y - shift) * jnp.exp(-log_scale)
        return x, jnp.broadcast_to(-jnp.sum(log_scale), (y.shape[0],))


class Permutation(nn.Module):
    """Fixed permutation of dims (reverse or given order)."""

    perm: Any  # np int array

    def forward(self, x, context=None):
        return x[:, np.asarray(self.perm)], jnp.zeros(x.shape[0])

    def inverse(self, z, context=None):
        inv = np.argsort(np.asarray(self.perm))
        return z[:, inv], jnp.zeros(z.shape[0])

    def __call__(self, x, context=None):  # for init
        return self.forward(x, context)


class MADEMoGLayer(nn.Module):
    """MADE with per-dim MoG head: an autoregressive density (build_made).

    Not a bijection — used as a terminal density (log_prob/sample only).
    """

    dim: int
    num_mixture_components: int = 10
    hidden_features: int = 50
    num_blocks: int = 2
    context_features: Optional[int] = None

    def setup(self):
        self.made = MADENet(
            dim=self.dim,
            out_mult=3 * self.num_mixture_components,
            hidden_features=self.hidden_features,
            num_hidden_layers=self.num_blocks,
            context_features=self.context_features,
            zero_init_output=False,
        )

    def _mixture_params(self, x, context):
        out = self.made(x, context)  # (B, D, 3K)
        K = self.num_mixture_components
        logits = out[..., :K]
        means = out[..., K:2 * K]
        log_stds = jnp.clip(out[..., 2 * K:], -7.0, 3.0)
        return logits, means, log_stds

    def log_prob(self, x, context=None):
        logits, means, log_stds = self._mixture_params(x, context)
        log_w = jax.nn.log_softmax(logits, axis=-1)
        z = (x[..., None] - means) * jnp.exp(-log_stds)
        log_comp = -0.5 * z**2 - log_stds - _LOG_SQRT_2PI
        lp_dim = jax.scipy.special.logsumexp(log_w + log_comp, axis=-1)
        return jnp.sum(lp_dim, axis=-1)

    def sample(self, key, num_samples, context=None):
        B = 1 if context is None else context.shape[0]
        x = jnp.zeros((num_samples * B, self.dim))
        ctx = None
        if context is not None:
            ctx = jnp.tile(context, (num_samples, 1))
        keys = jax.random.split(key, self.dim)
        for i in range(self.dim):
            logits, means, log_stds = self._mixture_params(x, ctx)
            kc, kn = jax.random.split(keys[i])
            comp = jax.random.categorical(kc, logits[:, i, :], axis=-1)
            mu = jnp.take_along_axis(means[:, i, :], comp[:, None], axis=-1)[:, 0]
            std = jnp.exp(
                jnp.take_along_axis(log_stds[:, i, :], comp[:, None], axis=-1)[:, 0]
            )
            xi = mu + std * jax.random.normal(kn, mu.shape)
            x = x.at[:, i].set(xi)
        return x.reshape(num_samples, B, self.dim)


# ===========================================================================
# Flow module: stack of bijections + standard-normal base
# ===========================================================================


class FlowModule(nn.Module):
    """Stack of bijections over a standard normal base, with optional
    context embedding. Layer configs are provided as (kind, kwargs) tuples so
    the module stays a plain dataclass."""

    dim: int
    layer_configs: Tuple[Tuple[str, Any], ...]
    embedding_net: Optional[nn.Module] = None
    context_features: Optional[int] = None

    def setup(self):
        layers = []
        for kind, kw in self.layer_configs:
            kw = dict(kw)
            if kind == "maf":
                layers.append(MaskedAffineAutoregressive(dim=self.dim, **kw))
            elif kind == "rqs_ar":
                layers.append(MaskedRQSAutoregressive(dim=self.dim, **kw))
            elif kind == "rqs_coupling":
                layers.append(RQSCoupling(dim=self.dim, **kw))
            elif kind == "additive_coupling":
                layers.append(AdditiveCoupling(dim=self.dim, **kw))
            elif kind == "lu_linear":
                layers.append(LULinear(dim=self.dim, **kw))
            elif kind == "diag_affine":
                layers.append(DiagAffine(dim=self.dim, **kw))
            elif kind == "monotone_ar":
                from .monotone_flows import MonotoneAutoregressive

                layers.append(MonotoneAutoregressive(dim=self.dim, **kw))
            elif kind == "permutation":
                layers.append(Permutation(**kw))
            else:
                raise ValueError(f"Unknown layer kind {kind}")
        self.layers = layers

    def _embed(self, context):
        if context is None:
            return None
        if self.embedding_net is not None:
            return self.embedding_net(context)
        return context.reshape(context.shape[0], -1)

    def log_prob(self, x, context=None):
        ctx = self._embed(context)
        total = jnp.zeros(x.shape[0])
        h = x
        for layer in self.layers:
            h, ldj = layer.forward(h, ctx)
            total = total + ldj
        base_lp = jnp.sum(-0.5 * h**2 - _LOG_SQRT_2PI, axis=-1)
        return base_lp + total

    def sample(self, key, num_samples, context=None):
        ctx = self._embed(context)
        B = 1 if ctx is None else ctx.shape[0]
        z = jax.random.normal(key, (num_samples * B, self.dim))
        ctx_rep = None if ctx is None else jnp.tile(ctx, (num_samples, 1))
        h = z
        for layer in reversed(self.layers):
            h, _ = layer.inverse(h, ctx_rep)
        return h.reshape(num_samples, B, self.dim)

    def sample_and_log_prob(self, key, num_samples, context=None):
        ctx = self._embed(context)
        B = 1 if ctx is None else ctx.shape[0]
        z = jax.random.normal(key, (num_samples * B, self.dim))
        base_lp = jnp.sum(-0.5 * z**2 - _LOG_SQRT_2PI, axis=-1)
        ctx_rep = None if ctx is None else jnp.tile(ctx, (num_samples, 1))
        h = z
        total = jnp.zeros(h.shape[0])
        for layer in reversed(self.layers):
            h, ldj = layer.inverse(h, ctx_rep)
            total = total + ldj
        lp = base_lp - total
        return h.reshape(num_samples, B, self.dim), lp.reshape(num_samples, B)

    def __call__(self, x, context=None):
        return self.log_prob(x, context)


class MADEMoGModule(nn.Module):
    """Terminal MADE-MoG density (the reference's build_made)."""

    dim: int
    num_mixture_components: int = 10
    hidden_features: int = 50
    num_blocks: int = 2
    embedding_net: Optional[nn.Module] = None

    def setup(self):
        self.made_mog = MADEMoGLayer(
            dim=self.dim,
            num_mixture_components=self.num_mixture_components,
            hidden_features=self.hidden_features,
            num_blocks=self.num_blocks,
        )

    def _embed(self, context):
        if context is None:
            return None
        if self.embedding_net is not None:
            return self.embedding_net(context)
        return context.reshape(context.shape[0], -1)

    def log_prob(self, x, context=None):
        return self.made_mog.log_prob(x, self._embed(context))

    def sample(self, key, num_samples, context=None):
        return self.made_mog.sample(key, num_samples, self._embed(context))

    def __call__(self, x, context=None):
        return self.log_prob(x, context)


# ===========================================================================
# Estimator wrappers
# ===========================================================================


class FlowEstimator(ConditionalDensityEstimator):
    """ConditionalDensityEstimator over a FlowModule / MADEMoGModule.

    Counterpart of NFlowsFlow / ZukoFlow wrappers
    (`sbi/neural_nets/estimators/nflows_flow.py:14`, `zuko_flow.py:17`).
    """

    def _log_prob_fn(self, params, input, condition):
        return self.net.apply(params, input, condition, method="log_prob")

    def _sample_fn(self, params, key, num_samples, condition):
        return self.net.apply(params, key, num_samples, condition, method="sample")

    def sample_and_log_prob_fn(self, params, key, num_samples, condition):
        """Single-pass sample+log_prob in raw space (for atomic NPE etc.)."""
        zc = self._embed_condition(condition)
        z, lp = self.net.apply(
            params, key, num_samples, zc, method="sample_and_log_prob"
        )
        theta = jax.vmap(self.input_transform.inverse)(z)
        _, ldj = jax.vmap(self.input_transform.forward_and_log_det)(theta)
        return theta, lp + ldj


class UnconditionalFlowEstimator(UnconditionalEstimator):
    """Unconditional flow (ZukoUnconditionalFlow counterpart) for marginals."""

    def __init__(self, net, params, input_shape, input_transform=None):
        super().__init__(net, params, input_shape)
        from ...utils.transforms import IdentityTransform

        self.input_transform = input_transform or IdentityTransform()

    def log_prob_fn(self, params, input):
        z, ldj = self.input_transform.forward_and_log_det(input)
        return self.net.apply(params, z, None, method="log_prob") + ldj

    def sample_fn(self, params, key, num):
        z = self.net.apply(params, key, num, None, method="sample")[:, 0, :]
        return self.input_transform.inverse(z)
