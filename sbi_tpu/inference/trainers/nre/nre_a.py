"""NRE-A / AALR (Hermans et al. 2020): BCE over joint vs marginal pairs,
2 atoms (ref `sbi/inference/trainers/nre/nre_a.py:159-171`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .nre_base import RatioEstimatorTrainer, classifier_logits


class NRE_A(RatioEstimatorTrainer):
    _ensemble_num_atoms = 2

    def train(self, **kwargs):
        kwargs.setdefault("num_atoms", 2)
        assert kwargs["num_atoms"] == 2, "NRE-A uses exactly 2 atoms."
        return super().train(**kwargs)

    def _make_loss_fn(self, num_atoms: int, **kwargs):
        est = self._neural_net

        def loss_fn(params, key, theta_b, x_b, masks_b):
            logits = classifier_logits(est, params, key, theta_b, x_b, 2)
            # column 0: joint (label 1); column 1: marginal (label 0)
            loss_joint = optax.sigmoid_binary_cross_entropy(
                logits[:, 0], jnp.ones(logits.shape[0])
            )
            loss_marginal = optax.sigmoid_binary_cross_entropy(
                logits[:, 1], jnp.zeros(logits.shape[0])
            )
            return 0.5 * (loss_joint + loss_marginal)

        return loss_fn


AALR = NRE_A
SNRE_A = NRE_A
