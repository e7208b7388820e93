"""NRE-B / SRE (Durkan et al. 2020): 1-of-K softmax over contrastive atoms
(ref `sbi/inference/trainers/nre/nre_b.py:151-172`; default 10 atoms)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .nre_base import RatioEstimatorTrainer, classifier_logits


class NRE_B(RatioEstimatorTrainer):
    def _make_loss_fn(self, num_atoms: int, **kwargs):
        est = self._neural_net

        def loss_fn(params, key, theta_b, x_b, masks_b):
            B = theta_b.shape[0]
            M = min(num_atoms, B)
            logits = classifier_logits(est, params, key, theta_b, x_b, M)
            # true atom is column 0
            return -(logits[:, 0] - jax.scipy.special.logsumexp(logits, axis=-1))

        return loss_fn


SRE = NRE_B
SNRE = NRE_B
SNRE_B = NRE_B
NRE = NRE_B
