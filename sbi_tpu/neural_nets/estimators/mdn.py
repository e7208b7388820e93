"""Mixture-density network estimator (MoG head).

JAX counterpart of `sbi/neural_nets/estimators/mixture_density_estimator.py:27,304`
and the `MoG` container (`sbi/neural_nets/estimators/mog.py:22`). The net maps
an (embedded) condition to mixture logits, component means, and Cholesky
factors of component *precisions* — same parameterization as the reference,
which NPE-A/NPE-C exploit for closed-form proposal corrections.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import tree_util

from .base import ConditionalDensityEstimator

Array = jax.Array

_LOG_2PI = jnp.log(2.0 * jnp.pi)


# ---------------------------------------------------------------------------
# MoG container (pytree) — ref `mog.py:22`
# ---------------------------------------------------------------------------


@tree_util.register_pytree_node_class
@dataclass
class MoG:
    """Batched mixture of Gaussians with precision-Cholesky parameterization.

    logits: (B, K); means: (B, K, D); precision_chols: (B, K, D, D) lower.
    """

    logits: Array
    means: Array
    precision_chols: Array

    def tree_flatten(self):
        return (self.logits, self.means, self.precision_chols), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def precisions(self) -> Array:
        L = self.precision_chols
        return L @ jnp.swapaxes(L, -1, -2)

    @property
    def weights(self) -> Array:
        """Normalized mixture weights (B, K) (ref `mog.py` `weights`)."""
        return jax.nn.softmax(self.logits, axis=-1)

    @property
    def dim(self) -> int:
        return self.means.shape[-1]

    @property
    def num_components(self) -> int:
        return self.means.shape[-2]

    @property
    def batch_shape(self):
        return self.means.shape[:-2]

    def validate(self) -> None:
        """Raise on non-finite parameters or non-PD precisions.

        The reference rejects these at construction (`mog.py` __post_init__);
        here construction happens inside XLA traces where values are abstract,
        so validation is an explicit host-side call on concrete MoGs.
        """
        import numpy as _np

        logits = _np.asarray(self.logits)
        means = _np.asarray(self.means)
        chols = _np.asarray(self.precision_chols)
        if _np.isnan(logits).any() or _np.isinf(logits).any():
            raise ValueError("MoG logits contain NaN/Inf.")
        if not _np.isfinite(means).all():
            raise ValueError("MoG means contain NaN/Inf.")
        if not _np.isfinite(chols).all():
            raise ValueError("MoG precision factors contain NaN/Inf.")
        diag = _np.diagonal(chols, axis1=-2, axis2=-1)
        if (diag <= 0).any():
            raise ValueError(
                "MoG precision factors have non-positive diagonal "
                "(precision not positive definite)."
            )

    def detach(self) -> "MoG":
        """Stop gradients through all parameters (ref `mog.py` `detach`)."""
        return MoG(
            jax.lax.stop_gradient(self.logits),
            jax.lax.stop_gradient(self.means),
            jax.lax.stop_gradient(self.precision_chols),
        )

    @classmethod
    def from_gaussian(cls, mean: Array, covariance: Array) -> "MoG":
        """Single-component MoG from (mean, covariance) — used to fold a
        Gaussian prior into MoG algebra (ref `mog.py` `from_gaussian`)."""
        mean = jnp.atleast_2d(jnp.asarray(mean, jnp.float32))  # (B, D)
        covariance = jnp.asarray(covariance, jnp.float32)
        if covariance.ndim == 2:
            covariance = covariance[None]
        precision = jnp.linalg.inv(covariance)  # (B, D, D)
        chol = jnp.linalg.cholesky(precision)
        B = mean.shape[0]
        return cls(jnp.zeros((B, 1)), mean[:, None, :], chol[:, None])

    def condition(self, condition: Array, dims_to_sample) -> "MoG":
        """Condition each component on the fixed dims; reweight by the exact
        per-component marginal density of the fixed values.

        Mirror of `mog.py` `condition` (conditional mean
        ``mu_s - P_ss^{-1} P_sc (y - mu_c)``, conditional precision ``P_ss``);
        the component reweighting here uses the *exact* marginal covariance
        ``[P^{-1}]_cc`` rather than the reference's precision-factor
        submatrix approximation.
        """
        B, K, D = self.means.shape
        free = jnp.zeros(D, dtype=bool).at[jnp.asarray(dims_to_sample)].set(True)
        free_idx = jnp.where(free)[0]
        fixed_idx = jnp.where(~free)[0]
        condition = jnp.atleast_2d(jnp.asarray(condition, jnp.float32))
        y = condition[:, fixed_idx]  # (B, C)

        P = self.precisions
        P_ss = P[:, :, free_idx][:, :, :, free_idx]
        P_sc = P[:, :, free_idx][:, :, :, fixed_idx]
        mu_s = self.means[:, :, free_idx]
        mu_c = self.means[:, :, fixed_idx]

        diff_c = y[:, None, :] - mu_c  # (B, K, C)
        adjustment = jnp.linalg.solve(
            P_ss, jnp.einsum("bkij,bkj->bki", P_sc, diff_c)[..., None]
        )[..., 0]
        cond_means = mu_s - adjustment
        cond_chols = jnp.linalg.cholesky(P_ss)

        # Exact marginal of the fixed dims: Sigma_cc = [P^{-1}]_cc.
        cov = jnp.linalg.inv(P)
        cov_cc = cov[:, :, fixed_idx][:, :, :, fixed_idx]
        sol = jnp.linalg.solve(cov_cc, diff_c[..., None])[..., 0]
        quad = jnp.sum(diff_c * sol, axis=-1)  # (B, K)
        _, logdet_cc = jnp.linalg.slogdet(cov_cc)
        C = fixed_idx.shape[0]
        log_marg = -0.5 * (C * _LOG_2PI + logdet_cc + quad)

        new_logits = jax.nn.log_softmax(self.logits, axis=-1) + log_marg
        new_logits = new_logits - jax.scipy.special.logsumexp(
            new_logits, axis=-1, keepdims=True
        )
        return MoG(new_logits, cond_means, cond_chols)

    def log_prob(self, theta: Array) -> Array:
        """theta: (B, D) -> (B,)."""
        D = self.means.shape[-1]
        log_w = jax.nn.log_softmax(self.logits, axis=-1)
        diff = theta[:, None, :] - self.means  # (B, K, D)
        # y = L^T diff  =>  diff^T P diff = ||y||^2
        y = jnp.einsum("bkij,bkj->bki", jnp.swapaxes(self.precision_chols, -1, -2), diff)
        quad = jnp.sum(y**2, axis=-1)
        half_logdet = jnp.sum(
            jnp.log(jnp.diagonal(self.precision_chols, axis1=-2, axis2=-1)), axis=-1
        )
        log_comp = half_logdet - 0.5 * (D * _LOG_2PI + quad)
        return jax.scipy.special.logsumexp(log_w + log_comp, axis=-1)

    def sample(self, key: Array, num_samples: int) -> Array:
        """-> (num_samples, B, D)."""
        B, K, D = self.means.shape
        kc, kn = jax.random.split(key)
        comps = jax.random.categorical(
            kc, self.logits, axis=-1, shape=(num_samples, B)
        )  # (S, B)
        means = jnp.take_along_axis(
            self.means[None], comps[..., None, None], axis=2
        )[:, :, 0, :]  # (S, B, D)
        chols = jnp.take_along_axis(
            self.precision_chols[None], comps[..., None, None, None], axis=2
        )[:, :, 0]  # (S, B, D, D)
        eps = jax.random.normal(kn, (num_samples, B, D))
        # Cov = P^-1 = L^-T L^-1 => sample = mean + L^-T eps
        LT = jnp.swapaxes(chols, -1, -2)
        delta = jax.scipy.linalg.solve_triangular(LT, eps[..., None], lower=False)[..., 0]
        return means + delta

    @staticmethod
    def product(a: "MoG", b: "MoG", subtract_natural=None) -> "MoG":
        """Pairwise product of two MoGs (up to normalization), used by the
        NPE-C non-atomic closed form (`npe_c.py:436-721` Appendix A.1).

        If ``subtract_natural=(P0, eta0)`` is given (a single Gaussian's
        natural parameters: precision ``(D, D)`` and ``eta0 = P0 @ mu0`` of
        shape ``(D,)``), the pairwise components are additionally *divided*
        by that Gaussian — the prior correction of the proposal-posterior
        ``pp ∝ q * proposal / prior`` (ref `npe_c.py:596-643`,
        ``_precisions/means/logits_proposal_posterior``). Per-component
        logits drop all terms constant across components (the prior's own
        normalizer), exactly as the reference does — they vanish under the
        ``log_softmax`` in :meth:`log_prob`.
        """
        Pa, Pb = a.precisions, b.precisions
        B, Ka, D = a.means.shape
        Kb = b.means.shape[1]
        P = Pa[:, :, None] + Pb[:, None, :]  # (B, Ka, Kb, D, D)
        eta = (
            jnp.einsum("bkij,bkj->bki", Pa, a.means)[:, :, None]
            + jnp.einsum("bkij,bkj->bki", Pb, b.means)[:, None, :]
        )
        if subtract_natural is not None:
            P0, eta0 = subtract_natural
            P = P - P0
            eta = eta - eta0
        cov = jnp.linalg.inv(P)
        means = jnp.einsum("bklij,bklj->bkli", cov, eta)

        # Component logits (constants across components omitted):
        #   log w_a + log w_b
        #   + 0.5 (logdet cov_pp + logdet P_a + logdet P_b)
        #   - 0.5 (m_a' P_a m_a + m_b' P_b m_b - m_pp' P_pp m_pp)
        # == reference `_logits_proposal_posterior` (npe_c.py:655-721).
        log_wa = jax.nn.log_softmax(a.logits, -1)
        log_wb = jax.nn.log_softmax(b.logits, -1)
        _, logdet_P = jnp.linalg.slogdet(P)
        _, logdet_Pa = jnp.linalg.slogdet(Pa)
        _, logdet_Pb = jnp.linalg.slogdet(Pb)
        expo_a = jnp.einsum("bki,bkij,bkj->bk", a.means, Pa, a.means)
        expo_b = jnp.einsum("bki,bkij,bkj->bk", b.means, Pb, b.means)
        expo_pp = jnp.einsum("bkli,bkli->bkl", means, eta)
        log_n = 0.5 * (
            -logdet_P + logdet_Pa[:, :, None] + logdet_Pb[:, None, :]
        ) - 0.5 * (expo_a[:, :, None] + expo_b[:, None, :] - expo_pp)
        logits = (log_wa[:, :, None] + log_wb[:, None, :] + log_n).reshape(B, Ka * Kb)
        P_flat = P.reshape(B, Ka * Kb, D, D)
        means_flat = means.reshape(B, Ka * Kb, D)
        chol = jnp.linalg.cholesky(P_flat)
        return MoG(logits, means_flat, chol)


# ---------------------------------------------------------------------------
# Flax module
# ---------------------------------------------------------------------------


class MDNModule(nn.Module):
    """Condition -> MoG parameters. Hidden MLP + (logits, means, chol) heads."""

    theta_dim: int
    num_components: int = 10
    hidden_features: int = 50
    num_layers: int = 2
    embedding_net: Optional[nn.Module] = None
    scale_parameterization: str = "softplus"

    @nn.compact
    def __call__(self, condition: Array) -> Tuple[Array, Array, Array]:
        h = condition
        if self.embedding_net is not None:
            h = self.embedding_net(h)
        h = h.reshape((h.shape[0], -1))
        for _ in range(self.num_layers):
            h = nn.relu(nn.Dense(self.hidden_features)(h))
        K, D = self.num_components, self.theta_dim
        logits = nn.Dense(K)(h)
        means = nn.Dense(K * D)(h).reshape(-1, K, D)
        # Cholesky of precision: positive diagonal. Two parameterizations:
        #   "softplus": softplus(raw) + 1e-4 — the reference's
        #     (`mdn.py` via pyknos); linear in raw for large precisions, so
        #     representing precision 1e6 needs raw ~1e6 — unreachable for
        #     conditionals whose scale spans many orders of magnitude.
        #   "log": exp(clip(raw)) — log-precision is LINEAR in the network
        #     output, so e.g. SLCP's sigma = theta^2 (precision 1e-2..1e8)
        #     is a smooth ~4-unit swing in raw. Clip bounds keep the NLL
        #     finite for outlier inits.
        diag_raw = nn.Dense(K * D, bias_init=nn.initializers.zeros)(h).reshape(-1, K, D)
        if self.scale_parameterization == "log":
            diag = jnp.exp(jnp.clip(diag_raw, -10.0, 14.0))
        else:
            diag = jax.nn.softplus(diag_raw) + 1e-4
        n_off = D * (D - 1) // 2
        B = h.shape[0]
        if n_off > 0:
            off = nn.Dense(K * n_off, kernel_init=nn.initializers.zeros)(h).reshape(
                -1, K, n_off
            )
            tril = jnp.zeros((B, K, D, D))
            idx = jnp.tril_indices(D, -1)
            tril = tril.at[:, :, idx[0], idx[1]].set(off)
        else:
            tril = jnp.zeros((B, K, D, D))
        eye = jnp.eye(D)
        chol = tril + diag[..., None] * eye
        return logits, means, chol


# ---------------------------------------------------------------------------
# Estimator wrapper
# ---------------------------------------------------------------------------


class MixtureDensityEstimator(ConditionalDensityEstimator):
    """MoG conditional density estimator (ref mixture_density_estimator.py:27)."""

    def get_mixture_fn(self, params, condition: Array) -> MoG:
        """Pure: z-scored condition -> MoG in the *z-scored theta* space."""
        logits, means, chols = self.net.apply(params, condition)
        return MoG(logits, means, chols)

    def get_uncorrected_mog(self, condition: Array) -> MoG:
        """MoG in z-space for a raw condition (ref `:304`), used by NPE-A/C."""
        zc = self._embed_condition(jnp.atleast_2d(condition))
        return self.get_mixture_fn(self.params, zc)

    def _log_prob_fn(self, params, input: Array, condition: Array) -> Array:
        mog = self.get_mixture_fn(params, condition)
        return mog.log_prob(input)

    def _sample_fn(self, params, key, num_samples: int, condition: Array) -> Array:
        mog = self.get_mixture_fn(params, condition)
        return mog.sample(key, num_samples)


# Alias matching the reference's lower-level name.
MultivariateGaussianMDN = MixtureDensityEstimator
