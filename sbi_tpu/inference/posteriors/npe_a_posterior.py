"""NPE_A_Posterior: MoG posterior with analytic proposal correction.

JAX counterpart of `sbi/inference/posteriors/npe_a_posterior.py:25` +
the correction math of `sbi/inference/trainers/npe/npe_a.py:495,622`
(Papamakarios & Murray 2016, Eqs. 25-26): the MDN trained on proposal
samples approximates the *proposal posterior* p~(theta|x) proportional to
p(theta|x) proposal(theta)/prior(theta); the true-posterior MoG follows by
the exponential-family quotient
    P'_k   = P_k + P_prior - P_prop
    eta'_k = eta_k + eta_prior - eta_prop
    log a'_k = log a_k + A(P'_k, eta'_k) - A(P_k, eta_k),
with A(P, eta) = 0.5 (eta^T P^-1 eta - log|P|).
"""

from __future__ import annotations

import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...neural_nets.estimators.mdn import MixtureDensityEstimator, MoG
from ...samplers.rejection.rejection import accept_reject_sample
from ...utils.distributions import MultivariateNormal
from ...utils.sbiutils import ensure_theta_batched, next_key, within_support
from ..potentials.posterior_based_potential import posterior_estimator_based_potential
from .base_posterior import NeuralPosterior

Array = jax.Array


def _log_partition(P: Array, eta: Array) -> Array:
    """A(P, eta) = 0.5 (eta^T P^-1 eta - log|P|), batched over components."""
    sol = jnp.linalg.solve(P, eta[..., None])[..., 0]
    quad = jnp.einsum("...i,...i->...", eta, sol)
    _, logdet = jnp.linalg.slogdet(P)
    return 0.5 * (quad - logdet)


class _GaussSpec:
    """Pre-transported Gaussian natural parameters (precision, eta)."""

    def __init__(self, P, eta):
        self.P = P
        self.eta = eta


def _gaussian_natural_params(prior_or_gauss, dim: int) -> Tuple[Array, Array]:
    """(precision, eta) of a Gaussian; (0, 0) for uniform-support priors."""
    if isinstance(prior_or_gauss, _GaussSpec):
        return prior_or_gauss.P, prior_or_gauss.eta
    if isinstance(prior_or_gauss, MultivariateNormal):
        cov = prior_or_gauss.covariance_matrix
        P = jnp.linalg.inv(cov)
        eta = P @ prior_or_gauss.loc
        return P, eta
    # BoxUniform / flat: zero natural parameters inside the support.
    return jnp.zeros((dim, dim)), jnp.zeros(dim)


def correct_mog_for_proposal(
    mog: MoG,
    prior,
    proposal_gaussian: Optional[Tuple[Array, Array]],
    dim: int,
) -> MoG:
    """Apply the NPE-A quotient correction to a batched MoG (B, K, ...) for a
    *single-Gaussian* proposal (exact; Papamakarios 2016 Eqs. 23-26)."""
    P_k = mog.precisions  # (B, K, D, D)
    eta_k = jnp.einsum("bkij,bkj->bki", P_k, mog.means)

    P0, eta0 = _gaussian_natural_params(prior, dim)
    if proposal_gaussian is None:
        Pp = jnp.zeros((dim, dim))
        etap = jnp.zeros(dim)
        # proposal == prior: correction cancels
        Pp, etap = P0, eta0
    else:
        Pp, etap = proposal_gaussian

    P_new = P_k + (P0 - Pp)
    eta_new = eta_k + (eta0 - etap)

    # Guard: corrected precisions must stay PD; nudge if needed.
    eigs = jnp.linalg.eigvalsh(P_new)
    min_eig = eigs.min()
    P_new = jnp.where(
        min_eig <= 1e-6,
        P_new + (1e-6 - jnp.minimum(min_eig, 0.0)) * jnp.eye(dim),
        P_new,
    )

    log_alpha = jax.nn.log_softmax(mog.logits, axis=-1)
    log_alpha_new = (
        log_alpha + _log_partition(P_new, eta_new) - _log_partition(P_k, eta_k)
    )
    means_new = jnp.linalg.solve(P_new, eta_new[..., None])[..., 0]
    chol_new = jnp.linalg.cholesky(P_new)
    return MoG(log_alpha_new, means_new, chol_new)


def divide_mog_by_proposal_mog(
    density_mog: MoG,
    proposal_mog: MoG,
    prior_natural: Optional[Tuple[Array, Array]],
    dim: int,
) -> MoG:
    """Pairwise NPE-A quotient: posterior = density * prior / proposal with
    an L-component MoG proposal -> K*L-component MoG (ref npe_a.py:495-721,
    Appendix C of Papamakarios 2016). ``prior_natural`` is ``(P0, eta0)`` of
    a Gaussian prior in the shared z-space, or None for uniform priors.

    Per pair (k, l):
        P_kl   = P_d,k + P0 - P_p,l
        eta_kl = eta_d,k + eta0 - eta_p,l
        log w_kl = log w_d,k - log w_p,l + A(P_kl, eta_kl)
                   - A(P_d,k, eta_d,k) + A(P_p,l, eta_p,l)
    with A the Gaussian log-partition (prior's A is constant -> dropped).
    """
    Pd = density_mog.precisions  # (B, K, D, D)
    Pp = proposal_mog.precisions  # (B, L, D, D)
    eta_d = jnp.einsum("bkij,bkj->bki", Pd, density_mog.means)
    eta_p = jnp.einsum("blij,blj->bli", Pp, proposal_mog.means)
    B, K = Pd.shape[:2]
    L = Pp.shape[1]

    P = Pd[:, :, None] - Pp[:, None, :]  # (B, K, L, D, D)
    eta = eta_d[:, :, None] - eta_p[:, None, :]
    if prior_natural is not None:
        P0, eta0 = prior_natural
        P = P + P0
        eta = eta + eta0

    # PD guard per pair: a density component sharper than (or equal to) the
    # proposal component it divides produces a non-PD quotient whose
    # epsilon-stabilized mean/weight explode (the reference raises here,
    # npe_a.py:562-569). Dropping such pairs (weight -> -inf) keeps the
    # valid mixture instead of failing or blowing up.
    eigs = jnp.linalg.eigvalsh(P)
    min_eig = jnp.min(eigs, axis=-1)  # (B, K, L)
    valid = min_eig > 1e-4
    P = jnp.where(valid[..., None, None], P, jnp.eye(dim))
    eta = jnp.where(valid[..., None], eta, jnp.zeros(dim))

    log_wd = jax.nn.log_softmax(density_mog.logits, -1)
    log_wp = jax.nn.log_softmax(proposal_mog.logits, -1)
    log_w = (
        log_wd[:, :, None]
        - log_wp[:, None, :]
        + _log_partition(P, eta)
        - _log_partition(Pd, eta_d)[:, :, None]
        + _log_partition(Pp, eta_p)[:, None, :]
    )
    log_w = jnp.where(valid, log_w, -jnp.inf)
    means = jnp.linalg.solve(P, eta[..., None])[..., 0]
    return MoG(
        log_w.reshape(B, K * L),
        means.reshape(B, K * L, dim),
        jnp.linalg.cholesky(P.reshape(B, K * L, dim, dim)),
    )


class NPE_A_Posterior(NeuralPosterior):
    """Posterior for NPE-A: corrected MoG in the estimator's z-space, with
    prior-support rejection like DirectPosterior."""

    def __init__(
        self,
        posterior_estimator: MixtureDensityEstimator,
        prior,
        proposal=None,
        max_sampling_batch_size: int = 10_000,
        device=None,
        x_shape=None,
    ):
        potential_fn, theta_transform = posterior_estimator_based_potential(
            posterior_estimator, prior, x_o=None
        )
        super().__init__(potential_fn, theta_transform, device, x_shape)
        self.prior = prior
        self.posterior_estimator = posterior_estimator
        self.proposal = proposal
        self.max_sampling_batch_size = max_sampling_batch_size
        self._purpose = "NPE-A posterior with analytic proposal correction."

    # --------------------------------------------------------------- helpers
    def _corrected_mog(self, x: Array) -> MoG:
        est = self.posterior_estimator
        mog = est.get_uncorrected_mog(x)
        dim = est.input_shape[0]

        # The MoG lives in z-scored theta space: transport prior/proposal
        # natural params to z-space via the affine transform.
        tr = est.input_transform
        scale = getattr(tr, "scale", jnp.ones(dim))
        loc = getattr(tr, "loc", jnp.zeros(dim))

        def to_z(P, eta):
            # theta = z*scale + loc ; density over z gets P_z = S P S,
            # eta_z = S (eta - P loc), S = diag(scale)
            S = jnp.diag(scale)
            return S @ P @ S, S @ (eta - P @ loc)

        if isinstance(self.prior, MultivariateNormal):
            P0, eta0 = _gaussian_natural_params(self.prior, dim)
            P0, eta0 = to_z(P0, eta0)
            prior_z = _GaussSpec(P0, eta0)
        else:
            prior_z = self.prior  # flat: zeros in any space

        if self.proposal is not None and not (self.proposal is self.prior):
            pm = self.proposal
            if isinstance(pm, NPE_A_Posterior):
                # Full pairwise MoG division (ref npe_a.py:495-721 App. C):
                # posterior = density * prior / proposal_mog, K*L components.
                prop_mog = pm._corrected_mog(pm.default_x)
                # Transport the proposal MoG from the proposal estimator's
                # z-space through raw theta space into the current z-space.
                # (NPE-A forbids retrain_from_scratch, so in practice both
                # transforms coincide and this is a no-op.)
                tr_p = pm.posterior_estimator.input_transform
                scale_p = getattr(tr_p, "scale", jnp.ones(dim))
                loc_p = getattr(tr_p, "loc", jnp.zeros(dim))
                a = scale_p / scale  # z_cur = (z_prop*scale_p + loc_p - loc)/scale
                b = (loc_p - loc) / scale
                A = jnp.diag(a)
                Ainv = jnp.diag(1.0 / a)
                means_z = prop_mog.means * a + b
                # cov_z = A cov_p A^T => P_z = A^-T P_p A^-1
                P_z = jnp.einsum(
                    "ij,bkjl,lm->bkim", Ainv.T, prop_mog.precisions, Ainv
                )
                prop_mog_z = MoG(
                    prop_mog.logits, means_z, jnp.linalg.cholesky(P_z)
                )
                prior_nat = (
                    (prior_z.P, prior_z.eta)
                    if isinstance(prior_z, _GaussSpec)
                    else None
                )
                return divide_mog_by_proposal_mog(mog, prop_mog_z, prior_nat, dim)

        return correct_mog_for_proposal(
            mog,
            prior_z if isinstance(prior_z, _GaussSpec) else self.prior,
            None,
            dim,
        )

    # ---------------------------------------------------------------- public
    def sample(self, sample_shape=(), x: Optional[Array] = None, key=None,
               **kwargs) -> Array:
        key = next_key(key)
        x = self._x_else_default_x(x)
        est = self.posterior_estimator
        mog = self._corrected_mog(x)
        num = 1
        for s in sample_shape:
            num *= int(s)

        def proposal_fn(k, n):
            z = mog.sample(k, n)[:, 0, :]
            return est.input_transform.inverse(z)

        samples, _ = accept_reject_sample(
            proposal_fn,
            lambda s: within_support(self.prior, s),
            num,
            key=key,
            sample_batch_size=min(self.max_sampling_batch_size, max(num, 1000)),
        )
        return samples.reshape(tuple(sample_shape) + est.input_shape)

    def log_prob(self, theta: Array, x: Optional[Array] = None, **kwargs) -> Array:
        theta = ensure_theta_batched(theta)
        x = self._x_else_default_x(x)
        est = self.posterior_estimator
        mog = self._corrected_mog(x)
        z, ldj = est.input_transform.forward_and_log_det(theta)
        # MoG.log_prob log-softmaxes the corrected logits, so it already
        # returns the normalized posterior — no extra logsumexp subtraction.
        lp = mog.log_prob(z) + ldj
        return jnp.where(within_support(self.prior, theta), lp, -jnp.inf)


def _moment_match(mog: MoG) -> Tuple[Array, Array]:
    """Single-Gaussian moment match of a batched MoG -> (mean (B,D), cov
    (B,D,D))."""
    w = jax.nn.softmax(mog.logits, axis=-1)  # (B, K)
    mean = jnp.einsum("bk,bkd->bd", w, mog.means)
    covs = jnp.linalg.inv(mog.precisions)
    diff = mog.means - mean[:, None, :]
    cov = jnp.einsum("bk,bkij->bij", w, covs) + jnp.einsum(
        "bk,bki,bkj->bij", w, diff, diff
    )
    return mean, cov
