"""NPE-C / APT (Greenberg et al. 2019): atomic proposal-posterior loss.

JAX counterpart of `sbi/inference/trainers/npe/npe_c.py:350-434` (atomic
loss: contrastive atoms, logp_post - logp_prior, logsumexp normalization).
The non-atomic MoG closed form (`:436-721`) activates when both proposal and
net are MDNs (see `_log_prob_proposal_posterior_mog`).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ....neural_nets.estimators.mdn import MixtureDensityEstimator, MoG
from ....utils.distributions import (
    BoxUniform,
    Independent,
    MultivariateNormal,
    Uniform,
)
from ....utils.transforms import AffineTransform, IdentityTransform
from .npe_base import PosteriorEstimatorTrainer

Array = jax.Array


class NPE_C(PosteriorEstimatorTrainer):
    def __init__(
        self,
        prior=None,
        density_estimator="maf",
        device: str = "tpu",
        logging_level="WARNING",
        summary_writer=None,
        show_progress_bars: bool = True,
        **kwargs,
    ):
        super().__init__(
            prior=prior,
            density_estimator=density_estimator,
            device=device,
            logging_level=logging_level,
            summary_writer=summary_writer,
            show_progress_bars=show_progress_bars,
            **kwargs,
        )
        self._num_atoms = 10
        self._use_combined_loss = False

    def train(self, num_atoms: int = 10, use_combined_loss: bool = False, **kwargs):
        """Defaults match the reference (`npe_c.py:129`: 10 atoms).

        ``use_combined_loss`` adds a masks-weighted MLE term on prior-round
        samples to the atomic loss (ref npe_c.py:423-433).
        """
        self._num_atoms = num_atoms
        self._use_combined_loss = use_combined_loss
        # Non-atomic closed form iff net is MDN, proposal is a
        # DirectPosterior over an MDN, AND the prior is Uniform-like or
        # MVN (ref npe_c.py:205-227 gates on Uniform/MultivariateNormal —
        # the closed form divides by the prior, which is only tractable for
        # those classes).
        proposal = self._proposal_roundwise[-1] if self._proposal_roundwise else None
        self.use_non_atomic_loss = self._is_mog_case(proposal)
        return super().train(**kwargs)

    def _prior_is_gaussian_or_uniform(self) -> bool:
        prior = self._prior
        if isinstance(prior, (MultivariateNormal, BoxUniform, Uniform)):
            return True
        if isinstance(prior, Independent):
            return isinstance(prior.base, Uniform)
        return False

    def _is_mog_case(self, proposal) -> bool:
        from ...posteriors.direct_posterior import DirectPosterior

        if self._neural_net is None:
            # Net built lazily; decide from the builder result later. Default
            # to atomic (safe and general).
            return False
        net_is_mdn = isinstance(self._neural_net, MixtureDensityEstimator)
        # The closed form assumes an affine (or identity) theta transform so
        # the prior can be mapped into z-space analytically.
        affine_z = isinstance(
            self._neural_net.input_transform, (AffineTransform, IdentityTransform)
        )
        return (
            net_is_mdn
            and affine_z
            and isinstance(proposal, DirectPosterior)
            and isinstance(proposal.posterior_estimator, MixtureDensityEstimator)
            and self._prior_is_gaussian_or_uniform()
        )

    def _z_scored_prior_natural_params(self):
        """Natural parameters (P0, eta0) of an MVN prior in the estimator's
        z-scored theta space, or None for Uniform-like priors (constant
        density — no correction needed; ref npe_c.py:258-308).

        z = (theta - loc) / scale  =>  theta-prior N(mu0, Sigma0) becomes
        N((mu0 - loc)/scale, D^-1 Sigma0 D^-1) with D = diag(scale), i.e.
        P_z = D Sigma0^-1 D.
        """
        if not isinstance(self._prior, MultivariateNormal):
            return None
        tf = self._neural_net.input_transform
        mu0 = self._prior.loc
        cov0 = self._prior.covariance_matrix
        if isinstance(tf, AffineTransform):
            scale = jnp.broadcast_to(tf.scale, mu0.shape)
            loc = jnp.broadcast_to(tf.loc, mu0.shape)
            mu_z = (mu0 - loc) / scale
            D = jnp.diag(scale)
            cov_z = cov0 / (scale[:, None] * scale[None, :])
        else:
            mu_z = mu0
            cov_z = cov0
        P0 = jnp.linalg.inv(cov_z)
        eta0 = P0 @ mu_z
        return P0, eta0

    # --------------------------------------------------------------- atomic
    def _make_proposal_loss_fn(self, proposal, calibration_kernel) -> Callable:
        if self.use_non_atomic_loss:
            return self._make_mog_loss_fn(proposal)
        est = self._neural_net
        prior = self._prior
        num_atoms = self._num_atoms

        use_combined_loss = self._use_combined_loss

        def loss_fn(params, key, theta_b, x_b, masks_b):
            B = theta_b.shape[0]
            M = min(num_atoms, B)
            # Sample M-1 contrasting thetas per row from the batch, excluding
            # the diagonal (ref npe_c.py:350-434).
            # Row i picks from indices != i: draw a permutation per row of
            # 0..B-2 and map j -> j + (j >= i).
            perm_keys = jax.random.split(key, B)
            perms = jax.vmap(lambda k: jax.random.permutation(k, B - 1))(perm_keys)
            picks = perms[:, : M - 1]  # (B, M-1)
            row_idx = jnp.arange(B)[:, None]
            contrast_idx = picks + (picks >= row_idx)
            atomic_idx = jnp.concatenate([row_idx, contrast_idx], axis=1)  # (B, M)
            atomic_theta = theta_b[atomic_idx]  # (B, M, D)

            # q(atomic_theta | x_i): (M, B) via (sample, batch, event) API.
            lp_posterior = est.log_prob_fn(
                params, jnp.swapaxes(atomic_theta, 0, 1), x_b
            )  # (M, B)
            lp_prior = prior.log_prob(atomic_theta.reshape(B * M, -1)).reshape(B, M).T
            log_frac = lp_posterior - lp_prior  # (M, B)
            # True atom is row 0.
            lp_proposal_posterior = log_frac[0] - jax.scipy.special.logsumexp(
                log_frac, axis=0
            )
            if use_combined_loss:
                # Masks-weighted MLE add-on for prior-round samples
                # (ref npe_c.py:423-433).
                lp_non_atomic = est.log_prob_fn(params, theta_b[None], x_b)[0]
                lp_proposal_posterior = (
                    masks_b.reshape(-1) * lp_non_atomic + lp_proposal_posterior
                )
            loss = -lp_proposal_posterior
            if calibration_kernel is not None:
                # Reference weights the per-sample loss by the calibration
                # kernel in every round (npe_base.py:506-516).
                loss = loss * calibration_kernel(x_b)
            return loss

        return loss_fn

    # ------------------------------------------------------------ non-atomic
    def _make_mog_loss_fn(self, proposal) -> Callable:
        """Closed-form proposal-posterior product for MDN net + MDN proposal
        (ref npe_c.py:436-721, Greenberg 2019 App. A1).

        Both MoGs live in the *z-scored theta space* of their respective
        estimators; the reference assumes identical z-scoring (same data), and
        so do we: the proposal net's z-space equals the current net's z-space
        because both are built from the same roundwise buffers.
        """
        est: MixtureDensityEstimator = self._neural_net
        prop_est: MixtureDensityEstimator = proposal.posterior_estimator
        prop_params = prop_est.params
        x_o = proposal.default_x
        # Natural params of the MVN prior in z-space (None for uniform
        # priors, whose density is constant over the support).
        prior_natural = self._z_scored_prior_natural_params()

        def loss_fn(params, key, theta_b, x_b, masks_b):
            B = theta_b.shape[0]
            # Current net MoG at x_b (z-space of est).
            zc = est._embed_condition(x_b)
            mog_post = est.get_mixture_fn(params, zc)
            # Proposal MoG at x_o (fixed), broadcast to batch.
            zc_o = prop_est._embed_condition(jnp.broadcast_to(x_o, x_b.shape))
            mog_prop = prop_est.get_mixture_fn(prop_params, zc_o)
            # Proposal posterior \propto q(theta|x) * proposal(theta) /
            # prior(theta): MoG product with the Gaussian prior divided out
            # in natural parameters (ref npe_c.py:596-643; for uniform
            # priors the division is a constant).
            mog_pp = MoG.product(mog_post, mog_prop, subtract_natural=prior_natural)
            z_theta, ldj = jax.vmap(
                lambda t: est.input_transform.forward_and_log_det(t[None])
            )(theta_b)
            z_theta = z_theta[:, 0, :]
            # MoG.log_prob normalizes the (unnormalized) product logits via
            # log_softmax — this IS the normalized proposal posterior; do NOT
            # subtract the product mass again.
            lp = mog_pp.log_prob(z_theta) + ldj[:, 0]
            return -lp

        return loss_fn


# Aliases (ref `sbi/inference/__init__.py:21-36`).
NPE = NPE_C
SNPE = NPE_C
SNPE_C = NPE_C
APT = NPE_C
