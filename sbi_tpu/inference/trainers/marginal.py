"""MarginalTrainer: unconditional density over x for misspecification tests.

JAX counterpart of `sbi/inference/trainers/marginal/marginal_base.py:32-434`.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

from ...neural_nets.factory import marginal_nn
from ...utils.sbiutils import next_key
from ._contracts import TrainConfig
from .base import NeuralInference

Array = jax.Array


class MarginalTrainer(NeuralInference):
    def __init__(
        self,
        density_estimator: Union[str, Callable] = "maf",
        device: str = "tpu",
        logging_level="WARNING",
        summary_writer=None,
        show_progress_bars: bool = True,
        **kwargs,
    ):
        super().__init__(
            prior=None,
            device=device,
            logging_level=logging_level,
            summary_writer=summary_writer,
            show_progress_bars=show_progress_bars,
            tracker=kwargs.pop("tracker", None),
        )
        if isinstance(density_estimator, str):
            self._build_neural_net = marginal_nn(model=density_estimator)
        else:
            self._build_neural_net = density_estimator

    def _ensemble_build_net(self, theta, x):
        # Marginal builder is unconditional: x only.
        return self._build_neural_net(x)

    def _ensemble_loss_fn(self):
        est = self._neural_net

        def loss_fn(params, k, theta_b, x_b, masks_b):
            return -est.log_prob_fn(params, x_b)

        return loss_fn

    def append_simulations(self, x: Array, data_device=None) -> "MarginalTrainer":
        x = jnp.asarray(x, jnp.float32)
        keep = jnp.isfinite(x.reshape(x.shape[0], -1)).all(axis=1)
        x = x[keep]
        theta_placeholder = jnp.zeros((x.shape[0], 1))
        self._append_to_data_store(theta_placeholder, x, jnp.ones(x.shape[0]), 0)
        return self

    def train(
        self,
        training_batch_size: int = 200,
        learning_rate: float = 5e-4,
        validation_fraction: float = 0.1,
        stop_after_epochs: int = 20,
        max_num_epochs: int = 2**31 - 1,
        clip_max_norm: Optional[float] = 5.0,
        resume_training: bool = False,
        retrain_from_scratch: bool = False,
        show_train_summary: bool = False,
        key=None,
        **kwargs,
    ):
        cfg = TrainConfig(
            training_batch_size=training_batch_size,
            learning_rate=learning_rate,
            validation_fraction=validation_fraction,
            stop_after_epochs=stop_after_epochs,
            max_num_epochs=max_num_epochs,
            clip_max_norm=clip_max_norm,
            resume_training=resume_training,
            retrain_from_scratch=retrain_from_scratch,
            show_train_summary=show_train_summary,
            epoch_chunk=int(kwargs.get("epoch_chunk", 1)),
            lr_schedule=kwargs.get("lr_schedule"),
            lr_decay_epochs=kwargs.get("lr_decay_epochs"),
            lr_warmup_frac=float(kwargs.get("lr_warmup_frac", 0.02)),
            lr_final_factor=float(kwargs.get("lr_final_factor", 0.01)),
            mesh=kwargs.get("mesh"),
        )
        key = next_key(key)
        _, x, _ = self.get_simulations(0)
        if self._neural_net is None or retrain_from_scratch:
            self._neural_net = self._build_neural_net(x)
        est = self._neural_net

        def loss_fn(params, k, theta_b, x_b, masks_b):
            return -est.log_prob_fn(params, x_b)

        return self._run_training_loop(loss_fn, cfg, start_idx=0, key=key)

    def build_estimator(self):
        """Return the trained unconditional density estimator."""
        if self._neural_net is None:
            raise ValueError("Run `.train()` first.")
        return self._neural_net

    def build_posterior(self, **kwargs):
        raise NotImplementedError(
            "MarginalTrainer fits p(x); there is no posterior to build. Use "
            "`build_estimator()`."
        )
