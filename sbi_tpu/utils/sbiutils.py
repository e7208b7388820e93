"""Core utilities: PRNG management, z-scoring, invalid-data handling, MAP.

JAX counterparts of `sbi/utils/sbiutils.py` and `sbi/utils/torchutils.py`.
The one deep design difference: torch has a global RNG, JAX threads explicit
keys. We keep a module-level key store so the reference's seed-free API
(`posterior.sample(...)` with no key) keeps working, while every function
also accepts an explicit ``key=``.
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# ---------------------------------------------------------------------------
# Global PRNG (mirror of `sbi/utils/sbiutils.py:1232` seed_all_backends)
# ---------------------------------------------------------------------------

_GLOBAL_KEY = [jax.random.PRNGKey(0)]


def seed_all_backends(seed: int = 0) -> None:
    """Seed sbi_tpu's global key and numpy (reference: seed_all_backends)."""
    _GLOBAL_KEY[0] = jax.random.PRNGKey(int(seed))
    np.random.seed(int(seed))


def next_key(key: Optional[Array] = None) -> Array:
    """Return ``key`` if given, else split the global key."""
    if key is not None:
        return key
    _GLOBAL_KEY[0], sub = jax.random.split(_GLOBAL_KEY[0])
    return sub


def draw_from_proposal(proposal, key: Array, num_samples: int) -> Array:
    """Sample ``(num_samples, *event)`` from either sampling convention.

    Priors/Distributions use ``sample(key, shape)``; trained posteriors use
    ``sample(shape, x=..., key=...)`` (the reference passes posteriors as
    proposals to rejection/importance/init-strategy code paths, e.g.
    ref `importance_sampling.py:76`, `rejection.py:231`)."""
    from ..inference.posteriors.base_posterior import NeuralPosterior

    if isinstance(proposal, NeuralPosterior):
        return proposal.sample((num_samples,), key=key)
    return proposal.sample(key, (num_samples,))


# ---------------------------------------------------------------------------
# z-scoring (mirror of `sbi/utils/sbiutils.py:235-432`)
# ---------------------------------------------------------------------------


def z_score_stats(
    batch: Array, structured: bool = False, min_std: float = 1e-7
) -> Tuple[Array, Array]:
    """Mean/std over the batch axis for standardizing nets' inputs.

    ``structured=True`` mirrors the reference's z_score_structured: one
    scalar mean/std across all event dims (for structured data like images).
    """
    batch = jnp.asarray(batch, dtype=jnp.float32)
    if structured:
        mean = jnp.mean(batch) * jnp.ones(batch.shape[1:])
        std = jnp.std(batch) * jnp.ones(batch.shape[1:])
    else:
        mean = jnp.mean(batch, axis=0)
        std = jnp.std(batch, axis=0)
    std = jnp.clip(std, min_std)
    return mean, std


def z_score_parser(z_score_flag=None) -> Tuple[bool, bool]:
    """Parse the z-score flag into (do_z_score, structured) booleans.

    Mirror of `sbi/utils/sbiutils.py:154-200`: accepts None/"none",
    "independent", "structured", or "transform_to_unconstrained" (handled by
    the builder itself, so returns (False, False)); booleans are deprecated;
    anything else raises.
    """
    if isinstance(z_score_flag, bool):
        warnings.warn(
            "Boolean flag for z-scoring is deprecated. Use 'none', "
            "'independent', or 'structured'.",
            stacklevel=2,
        )
        return z_score_flag, False
    if z_score_flag is None or z_score_flag == "none":
        return False, False
    if z_score_flag in ("independent", "structured"):
        return True, z_score_flag == "structured"
    if z_score_flag == "transform_to_unconstrained":
        return False, False
    raise ValueError(
        "Invalid z-scoring option. Use 'none', 'independent', 'structured' "
        "or 'transform_to_unconstrained'."
    )


def assert_transform_to_unconstrained_supported(
    z_score_flag, builder_name: str, suggestion: str = ""
) -> None:
    """Raise when a builder without `transform_to_unconstrained` support
    receives that flag — a silent no-op otherwise
    (ref `sbi/utils/sbiutils.py:202-233`)."""
    if z_score_flag == "transform_to_unconstrained":
        raise ValueError(
            f"`z_score='transform_to_unconstrained'` is not supported by "
            f"`{builder_name}`. {suggestion}"
        )


@partial(jax.jit, static_argnums=(1,))
def _zscore_warn_stats(x, outlier_iqr_factor: float):
    """Per-dim (std, constant?, outlier?, any-valid-iqr?) in one device
    program; only D-sized flags are transferred to host."""
    x = x.astype(jnp.float32)
    std = jnp.std(x, axis=0)
    constant = std < 1e-14
    q = jnp.quantile(x, jnp.asarray([0.25, 0.75], x.dtype), axis=0)
    q1, q3 = q[0], q[1]
    iqr = q3 - q1
    valid_iqr = iqr > 1e-14
    lower = q1 - outlier_iqr_factor * iqr
    upper = q3 + outlier_iqr_factor * iqr
    outlier = ((x < lower) | (x > upper)).any(axis=0) & valid_iqr
    return std, constant, outlier, valid_iqr.any()


def warn_if_invalid_for_zscoring(x: Array, outlier_iqr_factor: float = 10.0) -> None:
    """Warn about data properties that degrade z-scoring.

    Mirror of ``sbi/utils/sbiutils.py:39-123``: (1) a single sample gives
    meaningless statistics, (2) constant features map to zero, (3) extreme
    outliers (beyond ``outlier_iqr_factor`` IQRs from the quartiles — IQR is
    robust to the outliers themselves) cause precision loss when distinct
    values are squashed together. Host-side trace-time check on the training
    batch; never runs inside jit.
    """
    # Stats run ON DEVICE (one fused reduction program) and only per-dim
    # flags come back to host: converting multi-million-row simulation
    # buffers to host float64 and sorting them in numpy stalled large PoE
    # pipelines for minutes per member build on the remote-TPU tunnel.
    x = jnp.asarray(x)
    if x.ndim > 2:
        x = x.reshape(x.shape[0], -1)
    if x.shape[0] <= 1:
        warnings.warn(
            "Only one data sample provided. Z-scoring requires multiple samples "
            "to compute meaningful statistics. Consider adding more simulations.",
            UserWarning,
            stacklevel=2,
        )
        return
    std, constant, outlier, any_valid_iqr = _zscore_warn_stats(x, outlier_iqr_factor)
    constant_dims = np.where(np.asarray(constant))[0]
    if constant_dims.size > 0:
        warnings.warn(
            f"Data has constant values in dimension(s) {constant_dims.tolist()}. "
            "These dimensions carry no information and will be mapped to zero "
            "after z-scoring.",
            UserWarning,
            stacklevel=2,
        )
        return
    if not bool(any_valid_iqr):
        return
    outlier_dims = np.where(np.asarray(outlier))[0]
    if outlier_dims.size > 0:
        warnings.warn(
            f"Data has extreme outliers in dimension(s) {outlier_dims.tolist()} "
            f"(beyond {outlier_iqr_factor}x IQR from quartiles). This may cause "
            "precision loss during z-scoring, where distinct values become "
            "indistinguishable. Consider removing outliers or z_score='none'.",
            UserWarning,
            stacklevel=2,
        )


def standardizing_transform(batch: Array, structured: bool = False):
    from .transforms import AffineTransform

    warn_if_invalid_for_zscoring(batch)
    mean, std = z_score_stats(batch, structured)
    return AffineTransform(mean, std)


# ---------------------------------------------------------------------------
# Invalid simulation handling (mirror of `sbi/utils/sbiutils.py:433-522`)
# ---------------------------------------------------------------------------


def handle_invalid_x(
    x: Array, exclude_invalid_x: bool = True
) -> Tuple[Array, int, int]:
    """Return (is_valid mask, num_nans, num_infs)."""
    x = jnp.asarray(x)
    batch = x.shape[0]
    flat = x.reshape(batch, -1)
    nan_mask = jnp.isnan(flat).any(axis=1)
    inf_mask = jnp.isinf(flat).any(axis=1)
    num_nans = int(nan_mask.sum())
    num_infs = int(inf_mask.sum())
    if exclude_invalid_x:
        is_valid = ~(nan_mask | inf_mask)
    else:
        is_valid = jnp.ones(batch, dtype=bool)
    return is_valid, num_nans, num_infs


def warn_on_invalid_x(num_nans: int, num_infs: int, exclude_invalid_x: bool) -> None:
    if num_nans + num_infs > 0:
        if exclude_invalid_x:
            warnings.warn(
                f"Found {num_nans} NaN simulations and {num_infs} Inf simulations. "
                "They will be excluded from training."
            )
        else:
            warnings.warn(
                f"Found {num_nans} NaN simulations and {num_infs} Inf simulations. "
                "Training might fail."
            )


def nle_nre_apt_msg_on_invalid_x(num_nans, num_infs, exclude_invalid_x, algorithm):
    if num_nans + num_infs > 0:
        warnings.warn(
            f"Found {num_nans} NaN and {num_infs} Inf simulations. Excluding them "
            f"is not exact for {algorithm}; consider a RestrictionEstimator."
        )


# ---------------------------------------------------------------------------
# Support checks
# ---------------------------------------------------------------------------


def within_support(distribution, samples: Array) -> Array:
    """Boolean mask of which samples lie in the distribution's support.

    Mirror of `sbi/utils/sbiutils.py:707`.
    """
    if hasattr(distribution, "within_support"):
        return distribution.within_support(samples)
    return jnp.isfinite(distribution.log_prob(samples))


# ---------------------------------------------------------------------------
# Mixture-of-Gaussians log prob (mirror of `sbi/utils/sbiutils.py:1063`)
# ---------------------------------------------------------------------------


def mog_log_prob(
    theta: Array, logits_pp: Array, means_pp: Array, precisions_pp: Array
) -> Array:
    """log prob of a MoG with given mixture logits, means, and precisions.

    Args:
        theta: (batch, D)
        logits_pp: (batch, K) unnormalized mixture logits
        means_pp: (batch, K, D)
        precisions_pp: (batch, K, D, D)
    """
    theta = jnp.asarray(theta)
    D = theta.shape[-1]
    log_weights = jax.nn.log_softmax(logits_pp, axis=-1)
    diff = theta[:, None, :] - means_pp  # (batch, K, D)
    quad = jnp.einsum("bki,bkij,bkj->bk", diff, precisions_pp, diff)
    _, logabsdet = jnp.linalg.slogdet(precisions_pp)
    log_comp = 0.5 * (logabsdet - D * jnp.log(2 * jnp.pi) - quad)
    return jax.scipy.special.logsumexp(log_weights + log_comp, axis=-1)


# ---------------------------------------------------------------------------
# Gradient ascent / MAP (mirror of `sbi/utils/sbiutils.py:1104-1231`)
# ---------------------------------------------------------------------------


def gradient_ascent(
    potential_fn: Callable[[Array], Array],
    inits: Array,
    theta_transform=None,
    num_iter: int = 1000,
    num_to_optimize: int = 100,
    learning_rate: float = 0.01,
    save_best_every: int = 10,
    show_progress_bars: bool = False,
) -> Tuple[Array, Array]:
    """Multi-start Adam ascent on ``potential_fn``; returns (argmax, max).

    All starts are advanced in parallel in one jitted ``lax.fori_loop`` —
    unlike the reference's per-iteration Python loop with host-side best
    tracking (`sbi/utils/sbiutils.py:1104`), everything stays on device.
    """
    import optax

    from .transforms import IdentityTransform

    if theta_transform is None:
        theta_transform = IdentityTransform()

    inits = jnp.asarray(inits, dtype=jnp.float32)
    # Rank inits by potential, keep the best `num_to_optimize`.
    init_potentials = potential_fn(inits)
    num_keep = min(num_to_optimize, inits.shape[0])
    top = jnp.argsort(-init_potentials)[:num_keep]
    x0 = theta_transform.forward(inits[top])

    opt = optax.adam(learning_rate)

    def neg_pot(u):
        theta = theta_transform.inverse(u)
        return -potential_fn(theta).sum()

    grad_fn = jax.grad(neg_pot)

    def step(carry, _):
        u, opt_state, best_u, best_val = carry
        g = grad_fn(u)
        updates, opt_state = opt.update(g, opt_state)
        u = optax.apply_updates(u, updates)
        vals = potential_fn(theta_transform.inverse(u))
        improved = vals > best_val
        best_val = jnp.where(improved, vals, best_val)
        best_u = jnp.where(improved[:, None], u, best_u)
        return (u, opt_state, best_u, best_val), None

    init_vals = potential_fn(theta_transform.inverse(x0))
    carry = (x0, opt.init(x0), x0, init_vals)
    carry, _ = jax.lax.scan(jax.jit(step), carry, None, length=num_iter)
    _, _, best_u, best_val = carry
    best_idx = jnp.argmax(best_val)
    best_theta = theta_transform.inverse(best_u[best_idx][None])[0]
    return best_theta, best_val[best_idx]


# ---------------------------------------------------------------------------
# Misc small helpers
# ---------------------------------------------------------------------------


def ensure_theta_batched(theta: Array) -> Array:
    theta = jnp.asarray(theta, dtype=jnp.float32)
    if theta.ndim == 1:
        theta = theta[None]
    return theta


def ensure_x_batched(x: Array) -> Array:
    x = jnp.asarray(x, dtype=jnp.float32)
    if x.ndim == 1:
        x = x[None]
    return x


def atleast_2d_float32(*arrays):
    out = tuple(ensure_theta_batched(a) for a in arrays)
    return out if len(out) > 1 else out[0]


def assert_all_finite(quantity: Array, description: str = "tensor") -> None:
    """Raise if non-finite values present (reference `torchutils.py:639`)."""
    if not bool(jnp.isfinite(quantity).all()):
        raise AssertionError(f"NaN/Inf present in {description}.")


def expit(x):
    return jax.nn.sigmoid(x)


def logit(x, eps=1e-7):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x) - jnp.log1p(-x)
