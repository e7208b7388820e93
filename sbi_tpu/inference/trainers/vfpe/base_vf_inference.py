"""Shared trainer for flow-matching and score estimation.

JAX counterpart of `sbi/inference/trainers/vfpe/base_vf_inference.py`:
single-round only (`:142-147`), per-batch stochastic times in the loss with
fixed validation times for variance reduction (`:193-337,576-623`).
"""

from __future__ import annotations

import warnings
from abc import abstractmethod
from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from ....utils.sbiutils import next_key
from .._contracts import TrainConfig
from ..base import NeuralInference

Array = jax.Array


class VectorFieldTrainer(NeuralInference):
    def __init__(
        self,
        prior=None,
        density_estimator: Union[str, Callable] = "mlp",
        device: str = "tpu",
        logging_level="WARNING",
        summary_writer=None,
        show_progress_bars: bool = True,
        **kwargs,
    ):
        super().__init__(
            prior=prior,
            device=device,
            logging_level=logging_level,
            summary_writer=summary_writer,
            show_progress_bars=show_progress_bars,
            tracker=kwargs.pop("tracker", None),
        )
        if isinstance(density_estimator, str):
            self._build_neural_net = self._default_builder(density_estimator)
        else:
            self._build_neural_net = density_estimator

    @abstractmethod
    def _default_builder(self, model: str) -> Callable: ...

    def append_simulations(
        self, theta, x, proposal=None, exclude_invalid_x: bool = True,
        data_device=None,
    ) -> "VectorFieldTrainer":
        if proposal is not None:
            warnings.warn(
                "Vector-field methods are single-round; `proposal` is ignored "
                "(ref base_vf_inference.py:142-147)."
            )
        theta, x = self._validate_theta_and_x(
            theta, x, exclude_invalid_x, algorithm=self.__class__.__name__
        )
        prior_mask = jnp.ones((theta.shape[0],))
        self._append_to_data_store(theta, x, prior_mask, 0)
        self._round = 0
        return self

    def train(
        self,
        training_batch_size: int = 200,
        learning_rate: float = 5e-4,
        validation_fraction: float = 0.1,
        stop_after_epochs: int = 20,
        max_num_epochs: int = 2**31 - 1,
        clip_max_norm: Optional[float] = 5.0,
        ema_loss_decay: float = 0.1,
        ema_params_decay: Optional[float] = 0.999,
        validation_times: int = 10,
        validation_times_nugget: float = 0.05,
        resume_training: bool = False,
        retrain_from_scratch: bool = False,
        show_train_summary: bool = False,
        key=None,
        **kwargs,
    ):
        """DSM/FM losses are inherently noisy, so convergence detection uses
        three variance-reduction devices from the reference
        (`base_vf_inference.py:202-239,339-407,576-623`):
          - the VALIDATION loss is evaluated on a fixed grid of
            ``validation_times`` diffusion times (nugget-inset from {0,1})
            with a fixed noise key, so epochs are comparable;
          - recorded train/val losses are exponential moving averages with
            decay ``ema_loss_decay``;
          - the statistical convergence test in :meth:`_converged_chunk`
            (patience counts epochs > 2 sigma above the best EMA loss).

        Additionally (no reference counterpart; opt out with
        ``ema_params_decay=None``): an on-device exponential moving average
        of the PARAMETERS is what gets validated, snapshotted, and returned —
        the standard stabilizer for score/FM nets whose raw SGD iterates
        jitter around the optimum.
        """
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
            ema_params_decay=ema_params_decay,
        )
        key = next_key(key)
        theta, x, _ = self.get_simulations(0)
        if self._neural_net is None or retrain_from_scratch:
            self._neural_net = self._build_neural_net(theta, x)
        est = self._neural_net

        self._ema_loss_decay = float(ema_loss_decay)
        val_times = jnp.linspace(
            validation_times_nugget, 1.0 - validation_times_nugget,
            int(validation_times),
        )
        fixed_noise_key = jax.random.PRNGKey(0)

        def loss_fn(params, k, theta_b, x_b, masks_b):
            return est.loss_fn(params, theta_b, x_b, k)

        def val_loss_fn(params, k, theta_b, x_b, masks_b):
            B = theta_b.shape[0]

            def at_t(t):
                return est.loss_fn(
                    params, theta_b, x_b, fixed_noise_key,
                    times=jnp.full((B,), t),
                )

            return jax.vmap(at_t)(val_times).mean(axis=0)

        return self._run_training_loop(
            loss_fn, cfg, start_idx=0, key=key, val_loss_fn=val_loss_fn
        )

    def _ensemble_loss_fn(self):
        est = self._neural_net

        def loss_fn(params, k, theta_b, x_b, masks_b):
            return est.loss_fn(params, theta_b, x_b, k)

        return loss_fn

    def _ensemble_val_loss_fn(self):
        """Fixed-time-grid validation, matching single-model VF training
        (`:131-146`): the raw random-time loss is far too noisy for the
        per-member best-val snapshots in train_ensemble."""
        est = self._neural_net
        val_times = jnp.linspace(1e-3, 1.0 - 1e-3, 20)
        fixed_noise_key = jax.random.PRNGKey(0)

        def val_loss_fn(params, k, theta_b, x_b, masks_b):
            B = theta_b.shape[0]

            def at_t(t):
                return est.loss_fn(
                    params, theta_b, x_b, fixed_noise_key,
                    times=jnp.full((B,), t),
                )

            return jax.vmap(at_t)(val_times).mean(axis=0)

        return val_loss_fn

    def _postprocess_epoch_losses(self, train_losses, val_losses):
        """EMA summarization (ref `base_vf_inference.py:597-623`): the
        recorded loss curves are exponential moving averages, chained across
        epoch chunks through the last recorded summary entry."""
        import numpy as np

        decay = getattr(self, "_ema_loss_decay", 0.1)

        def ema(arr, prev):
            out = np.empty_like(arr)
            for i, v in enumerate(arr):
                prev = v if prev is None else (1.0 - decay) * prev + decay * v
                out[i] = prev
            return out

        prev_t = (
            self._summary["training_loss"][-1]
            if self._summary["training_loss"] else None
        )
        prev_v = (
            self._summary["validation_loss"][-1]
            if self._summary["validation_loss"] else None
        )
        return ema(train_losses, prev_t), ema(val_losses, prev_v)

    def _converged_chunk(self, val_losses, params, stop_after_epochs):
        """Statistical convergence on EMA'd val losses (ref `:339-407`):
        patience counts epochs whose loss sits more than 2 running standard
        deviations above the best; epochs within 2 sigma reset it. Best
        params snapshots stay at chunk granularity (see base loop note)."""
        import numpy as np

        stop = False
        for v in np.asarray(val_losses, dtype=float):
            if v < self._best_val_loss:
                self._best_val_loss = float(v)
                self._epochs_since_last_improvement = 0
                self._best_params = params
                continue
            history = self._summary["validation_loss"]
            if len(history) < stop_after_epochs:
                continue
            recent = np.asarray(history[-stop_after_epochs * 2:], dtype=float)
            loss_std = float(recent.std())
            diff_normalized = (
                (v - self._best_val_loss) / loss_std
                if loss_std > 0 else np.inf
            )
            if diff_normalized > 2.0:
                self._epochs_since_last_improvement += 1
            else:
                self._epochs_since_last_improvement = 0
            if self._epochs_since_last_improvement > stop_after_epochs - 1:
                stop = True
        return stop

    def build_posterior(
        self,
        density_estimator=None,
        prior=None,
        sample_with: Optional[str] = None,
        **kwargs,
    ):
        from ...posteriors.vector_field_posterior import VectorFieldPosterior

        prior = prior if prior is not None else self._prior
        assert prior is not None, "A prior is required to build the posterior."
        estimator = density_estimator if density_estimator is not None else self._neural_net
        estimator = estimator.snapshot() if hasattr(estimator, "snapshot") else estimator
        if estimator is None:
            raise ValueError("Run `.train()` first or pass a density_estimator.")

        posterior_parameters = kwargs.pop("posterior_parameters", None)
        if posterior_parameters is not None:
            from ...posteriors.posterior_parameters import (
                build_posterior_from_parameters,
                check_legacy_sampler_args,
            )

            check_legacy_sampler_args(
                {k: v for k, v in kwargs.items() if isinstance(v, dict) or k.endswith("_parameters")},
                {"sample_with": (sample_with, None)},
            )
            self._posterior = build_posterior_from_parameters(
                posterior_parameters, estimator, prior, kind="vf"
            )
            return self._posterior

        if sample_with is None:
            # SDE default for score estimators (ref trainers/base.py:703);
            # flow matching has no SDE -> probability-flow ODE.
            sample_with = "sde" if estimator.SDE_DEFINED else "ode"
        self._posterior = VectorFieldPosterior(
            estimator, prior, sample_with=sample_with, **kwargs
        )
        return self._posterior
