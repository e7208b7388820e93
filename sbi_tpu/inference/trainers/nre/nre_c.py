"""NRE-C / CNRE (Miller et al. 2022): K contrastive classes + an independent
class with gamma weighting -> asymptotically *exact* ratios
(ref `sbi/inference/trainers/nre/nre_c.py:162-206`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .nre_base import RatioEstimatorTrainer, classifier_logits


class NRE_C(RatioEstimatorTrainer):
    def train(self, num_classes: int = 5, gamma: float = 1.0, **kwargs):
        kwargs.setdefault("loss_kwargs", {})
        kwargs["loss_kwargs"].update(num_classes=num_classes, gamma=gamma)
        kwargs.setdefault("num_atoms", num_classes)
        return super().train(**kwargs)

    def _make_loss_fn(self, num_atoms: int, num_classes: int = 5, gamma: float = 1.0,
                      **kwargs):
        est = self._neural_net
        K = num_classes

        def loss_fn(params, key, theta_b, x_b, masks_b):
            B = theta_b.shape[0]
            k1, k2, k3 = jax.random.split(key, 3)
            M = min(K, B - 1) + 1  # K atoms incl. the joint slot
            # Joint set: true theta + (M-1) contrast.
            logits_joint = classifier_logits(est, params, k1, theta_b, x_b, M)
            # Marginal set: all M thetas independent of x (shuffle everything).
            perm = jax.random.permutation(k2, B)
            logits_marg = classifier_logits(
                est, params, k3, theta_b[perm], x_b, M
            )
            log_gamma_K = jnp.log(gamma) - jnp.log(float(M))
            # log q(y=0 | marginal draws) = -softplus(lse_m)
            lse_m = jax.scipy.special.logsumexp(logits_marg + log_gamma_K, axis=-1)
            log_q0 = -jax.nn.softplus(lse_m)
            # log q(y=k* | joint draws)
            lse_j = jax.scipy.special.logsumexp(logits_joint + log_gamma_K, axis=-1)
            log_qk = log_gamma_K + logits_joint[:, 0] - jax.nn.softplus(lse_j)
            w0 = 1.0 / (1.0 + gamma)
            wk = gamma / (1.0 + gamma)
            return -(w0 * log_q0 + wk * log_qk)

        return loss_fn


CNRE = NRE_C
SNRE_C = NRE_C
