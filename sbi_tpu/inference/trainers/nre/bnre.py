"""BNRE (Delaunoy et al. 2022): NRE-A + balancing regularizer
(ref `sbi/inference/trainers/nre/bnre.py:161`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .nre_base import RatioEstimatorTrainer, classifier_logits


class BNRE(RatioEstimatorTrainer):
    _ensemble_num_atoms = 2

    def train(self, regularization_strength: float = 100.0, **kwargs):
        kwargs.setdefault("loss_kwargs", {})
        kwargs["loss_kwargs"].update(
            regularization_strength=regularization_strength
        )
        kwargs.setdefault("num_atoms", 2)
        return super().train(**kwargs)

    def _make_loss_fn(self, num_atoms: int, regularization_strength: float = 100.0,
                      **kwargs):
        est = self._neural_net

        def loss_fn(params, key, theta_b, x_b, masks_b):
            logits = classifier_logits(est, params, key, theta_b, x_b, 2)
            bce = 0.5 * (
                optax.sigmoid_binary_cross_entropy(
                    logits[:, 0], jnp.ones(logits.shape[0])
                )
                + optax.sigmoid_binary_cross_entropy(
                    logits[:, 1], jnp.zeros(logits.shape[0])
                )
            )
            balance = (
                jax.nn.sigmoid(logits[:, 0]) + jax.nn.sigmoid(logits[:, 1]) - 1.0
            ).mean() ** 2
            # Regularizer is a batch-level scalar; spread over samples so the
            # mean over the batch matches the reference's total objective.
            return bce + regularization_strength * balance

        return loss_fn
