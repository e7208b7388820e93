"""Fused Pallas TPU kernel for the rational-quadratic spline.

The RQ spline (Durkan et al. 2019) is the hot elementwise op of NSF flows —
the north-star kernel of this build (BASELINE.json). The jnp reference
implementation (`sbi_tpu/neural_nets/estimators/flows.py`) materializes
softmax/cumsum/one-hot-gather intermediates in HBM between fusions; this
kernel keeps the entire bin search + rational-quadratic evaluation in VMEM
in one pass.

Layout: spline parameters arrive transposed as (K, N) — bins on the
*sublane* axis (K ~ 10, padded to the 8-row f32 tile), elements on the
*lane* axis (N padded to the 128-lane tile). All reductions (softmax,
cumsum, bin selection) run along sublanes; every lane is one element.
Bin selection uses one-hot masked sums instead of gathers — K is small and
static, so this is K fused multiply-adds on the VPU.

Differentiation: the op carries a custom VJP whose backward pass calls
`jax.vjp` of the jnp reference implementation — forward sampling/density
paths get the fused kernel, training gradients stay exact.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3

_BLOCK_N = 1024


def _rqs_kernel(inverse: bool, tail_bound: float, num_bins: int,
                x_ref, w_ref, h_ref, d_ref, y_ref, ld_ref):
    """One block: x (1, B); w,h (K, B); d (K-1, B); outputs (1, B)."""
    from jax.experimental import pallas as pl  # noqa: F401

    K = num_bins
    mbw, mbh, mdr = (
        DEFAULT_MIN_BIN_WIDTH, DEFAULT_MIN_BIN_HEIGHT, DEFAULT_MIN_DERIVATIVE
    )

    x = x_ref[0, :]  # (B,)
    w_un = w_ref[:, :]  # (K, B)
    h_un = h_ref[:, :]
    d_un = d_ref[:, :]  # (K-1, B)

    # --- normalized widths/heights with min-bin floor, along sublanes -------
    w = jax.nn.softmax(w_un, axis=0)
    w = mbw + (1.0 - mbw * K) * w
    h = jax.nn.softmax(h_un, axis=0)
    h = mbh + (1.0 - mbh * K) * h

    # cumulative knots in [-B, B]; manual unrolled cumsum over K rows
    # (Mosaic has no cumsum primitive; K is small and static).
    def _cumsum_rows(a):
        rows = []
        acc = a[0:1, :]
        rows.append(acc)
        for k in range(1, K):
            acc = acc + a[k:k + 1, :]
            rows.append(acc)
        return jnp.concatenate(rows, axis=0)

    cw = _cumsum_rows(w)  # (K, B) upper edges in (0,1]
    ch = _cumsum_rows(h)
    cw = (cw * 2.0 - 1.0) * tail_bound
    ch = (ch * 2.0 - 1.0) * tail_bound
    lo = -tail_bound
    # lower edges: shift down one row
    cw_lo = jnp.concatenate([jnp.full((1, cw.shape[1]), lo), cw[:-1]], axis=0)
    ch_lo = jnp.concatenate([jnp.full((1, ch.shape[1]), lo), ch[:-1]], axis=0)
    widths = cw - cw_lo  # (K, B)
    heights = ch - ch_lo

    dpad = mdr + jax.nn.softplus(d_un)  # (K-1, B)
    ones = jnp.ones((1, dpad.shape[1]), dpad.dtype)
    d_lo = jnp.concatenate([ones, dpad], axis=0)  # deriv at lower knot (K, B)
    d_hi = jnp.concatenate([dpad, ones], axis=0)  # deriv at upper knot (K, B)

    inside = (x >= -tail_bound) & (x <= tail_bound)
    xc = jnp.clip(x, -tail_bound, tail_bound)

    # --- one-hot bin mask along sublanes ------------------------------------
    ref_lo = ch_lo if inverse else cw_lo
    ref_hi = ch if inverse else cw
    ge = xc[None, :] >= ref_lo
    # element belongs to the LAST bin whose lower edge it passes
    idx_i = jnp.sum(ge.astype(jnp.int32), axis=0) - 1  # (B,)
    idx_i = jnp.clip(idx_i, 0, K - 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, ge.shape[1]), 0)
    onehot = (rows == idx_i[None, :]).astype(jnp.float32)  # (K, B)

    def sel(a):  # masked-sum gather along sublanes
        return jnp.sum(a * onehot, axis=0)

    in_w = sel(widths)
    in_cw = sel(cw_lo)
    in_h = sel(heights)
    in_ch = sel(ch_lo)
    dk = sel(d_lo)
    dk1 = sel(d_hi)
    s = in_h / in_w

    if not inverse:
        theta = jnp.clip((xc - in_cw) / in_w, 0.0, 1.0)
        tt = theta * (1.0 - theta)
        numerator = in_h * (s * theta * theta + dk * tt)
        denominator = s + (dk1 + dk - 2.0 * s) * tt
        y = in_ch + numerator / denominator
        deriv_num = s * s * (dk1 * theta * theta + 2.0 * s * tt + dk * (1.0 - theta) ** 2)
        ld = jnp.log(deriv_num) - 2.0 * jnp.log(denominator)
    else:
        y_rel = xc - in_ch
        a = in_h * (s - dk) + y_rel * (dk1 + dk - 2.0 * s)
        b = in_h * dk - y_rel * (dk1 + dk - 2.0 * s)
        c = -s * y_rel
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        theta = jnp.clip(2.0 * c / (-b - jnp.sqrt(disc)), 0.0, 1.0)
        y = theta * in_w + in_cw
        tt = theta * (1.0 - theta)
        denominator = s + (dk1 + dk - 2.0 * s) * tt
        deriv_num = s * s * (dk1 * theta * theta + 2.0 * s * tt + dk * (1.0 - theta) ** 2)
        ld = -(jnp.log(deriv_num) - 2.0 * jnp.log(denominator))

    y = jnp.where(inside, y, x)
    ld = jnp.where(inside, ld, jnp.zeros_like(ld))
    y_ref[0, :] = y
    ld_ref[0, :] = ld


def _rqs_pallas_raw(x_flat, w_t, h_t, d_t, inverse: bool, tail_bound: float):
    """x_flat (N,), w_t/h_t (K, N), d_t (K-1, N) -> (y (N,), ld (N,))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import os

    N = x_flat.shape[0]
    K = w_t.shape[0]
    interpret = bool(os.environ.get("SBI_TPU_PALLAS_INTERPRET"))
    pad = (-N) % _BLOCK_N
    if pad:
        x_flat = jnp.pad(x_flat, (0, pad))
        w_t = jnp.pad(w_t, ((0, 0), (0, pad)))
        h_t = jnp.pad(h_t, ((0, 0), (0, pad)))
        d_t = jnp.pad(d_t, ((0, 0), (0, pad)))
    Np = x_flat.shape[0]
    grid = (Np // _BLOCK_N,)

    kernel = functools.partial(_rqs_kernel, inverse, tail_bound, K)
    y, ld = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _BLOCK_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, _BLOCK_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, _BLOCK_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K - 1, _BLOCK_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _BLOCK_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Np), x_flat.dtype),
            jax.ShapeDtypeStruct((1, Np), x_flat.dtype),
        ],
        interpret=interpret,
    )(x_flat[None, :], w_t, h_t, d_t)
    return y[0, :N], ld[0, :N]


@functools.lru_cache(maxsize=None)
def _rqs_flat_fn(inverse: bool, tail_bound: float):
    """custom_vmap wrapper: the spline is elementwise over the leading axes,
    so batching = merge the batch axis into the element axis and run ONE
    pallas_call. This bypasses pallas_call's generic auto-batching rule
    (extra leading grid dim + 3-D blocks), which Mosaic kernel-faults on
    for wide-vmapped NSF programs (round-3 known gap)."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def f(inputs, w, h, d):
        shape = inputs.shape
        K = w.shape[-1]
        y, ld = _rqs_pallas_raw(
            inputs.reshape(-1), w.reshape(-1, K).T, h.reshape(-1, K).T,
            d.reshape(-1, K - 1).T, inverse, tail_bound,
        )
        return y.reshape(shape), ld.reshape(shape)

    @f.def_vmap
    def _rule(axis_size, in_batched, inputs, w, h, d):
        def bc(a, batched):
            if batched:
                return a
            return jnp.broadcast_to(a[None], (axis_size,) + a.shape)

        args = [bc(a, b) for a, b in zip((inputs, w, h, d), in_batched)]
        return f(*args), (True, True)

    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def rational_quadratic_spline_pallas(
    inputs, unnormalized_widths, unnormalized_heights, unnormalized_derivatives,
    inverse: bool = False, tail_bound: float = 3.0,
):
    """Drop-in fused version of `rational_quadratic_spline` (same signature
    semantics: inputs (..., ), params (..., K)/(..., K-1)); TPU-only."""
    return _rqs_flat_fn(inverse, float(tail_bound))(
        inputs, unnormalized_widths, unnormalized_heights,
        unnormalized_derivatives,
    )


def _fwd(inputs, w, h, d, inverse, tail_bound):
    out = rational_quadratic_spline_pallas(inputs, w, h, d, inverse, tail_bound)
    return out, (inputs, w, h, d)


def _bwd(inverse, tail_bound, residuals, cotangents):
    # Exact gradients via the jnp reference implementation's VJP.
    from ..neural_nets.estimators.flows import rational_quadratic_spline

    inputs, w, h, d = residuals
    _, vjp = jax.vjp(
        lambda x_, w_, h_, d_: rational_quadratic_spline(
            x_, w_, h_, d_, inverse=inverse, tail_bound=tail_bound,
            use_pallas=False,  # prevent re-dispatch recursion
        ),
        inputs, w, h, d,
    )
    return vjp(cotangents)


rational_quadratic_spline_pallas.defvjp(_fwd, _bwd)


def pallas_available() -> bool:
    """Pallas TPU kernels need a real TPU backend.

    ``SBI_TPU_DISABLE_PALLAS=1`` force-disables the kernel (ops fall back
    to the XLA-fused jnp path) — escape hatch for Mosaic kernel faults
    observed on very large fused PoE-potential programs."""
    import os

    if os.environ.get("SBI_TPU_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
