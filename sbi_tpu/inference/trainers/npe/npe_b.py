"""NPE-B / SNPE-B (Lueckmann et al. 2017): importance-weighted MLE loss.

JAX counterpart of `sbi/inference/trainers/npe/npe_b.py:110`:
loss = - (prior(theta)/proposal(theta)) * log q(theta | x).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .npe_base import PosteriorEstimatorTrainer


class NPE_B(PosteriorEstimatorTrainer):
    def _make_proposal_loss_fn(self, proposal, calibration_kernel):
        est = self._neural_net
        prior = self._prior
        # Build a jit-safe proposal log_prob: the DirectPosterior leakage
        # normalizer is a theta-independent constant — precompute it once
        # host-side so the traced loss never hits the caching path.
        prop_est = getattr(proposal, "posterior_estimator", None)
        prop_x = getattr(proposal, "default_x", None)
        if prop_est is not None and prop_x is not None:
            def proposal_log_prob(theta_b):
                # (N, 1, D) inputs against the single x_o condition -> (N,)
                return prop_est.log_prob_fn(
                    prop_est.params, theta_b[:, None, :], prop_x
                )[:, 0]
        else:
            def proposal_log_prob(theta_b):
                return proposal.log_prob(theta_b)

        def loss_fn(params, key, theta_b, x_b, masks_b):
            lp = est.log_prob_fn(params, theta_b[None], x_b)[0]
            prior_lp = prior.log_prob(theta_b)
            prop_lp = proposal_log_prob(theta_b)
            # Importance weights prior/proposal, detached.
            logw = jax.lax.stop_gradient(prior_lp - prop_lp)
            logw = jnp.clip(logw, -10.0, 10.0)  # heavy-tail guard
            w = jnp.exp(logw)
            if calibration_kernel is not None:
                w = w * calibration_kernel(x_b)
            return -w * lp

        return loss_fn


SNPE_B = NPE_B
