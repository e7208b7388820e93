"""NPE family base trainer.

JAX counterpart of `sbi/inference/trainers/npe/npe_base.py`:
`append_simulations(..., proposal=)` round bookkeeping (`:125-240`),
`train()` (`:242-359`), round-0 MLE vs proposal-corrected loss (`:483-516`),
lazy net build from the first batch (`:616-651`).
"""

from __future__ import annotations

import warnings
from abc import abstractmethod
from typing import Any, Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from ....neural_nets.factory import posterior_nn
from ....utils.sbiutils import next_key, nle_nre_apt_msg_on_invalid_x
from ....utils.distributions import Distribution
from .._contracts import TrainConfig
from ..base import NeuralInference, check_if_proposal_has_default_x

Array = jax.Array


class PosteriorEstimatorTrainer(NeuralInference):
    def __init__(
        self,
        prior=None,
        density_estimator: Union[str, Callable] = "maf",
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
            self._build_neural_net = posterior_nn(model=density_estimator)
        else:
            self._build_neural_net = density_estimator
        self._proposal_roundwise = []
        self.use_non_atomic_loss = False

    # ------------------------------------------------------------------ data
    def append_simulations(
        self,
        theta: Array,
        x: Array,
        proposal: Optional[Any] = None,
        exclude_invalid_x: Optional[bool] = None,
        data_device: Optional[str] = None,
    ) -> "PosteriorEstimatorTrainer":
        """Round bookkeeping: proposal None/prior => round 0 data
        (ref npe_base.py:125-240)."""
        is_prior = proposal is None or proposal is self._prior
        if exclude_invalid_x is None:
            exclude_invalid_x = is_prior
        theta, x = self._validate_theta_and_x(
            theta, x, exclude_invalid_x, algorithm=self.__class__.__name__
        )

        if is_prior:
            current_round = 0
        else:
            check_if_proposal_has_default_x(proposal)
            current_round = max(self._data_round_index, default=-1) + 1
            if not exclude_invalid_x:
                pass
        prior_mask = jnp.full((theta.shape[0],), float(current_round == 0))
        self._append_to_data_store(theta, x, prior_mask, current_round)
        self._proposal_roundwise.append(proposal)
        self._round = max(self._data_round_index)
        return self

    # ------------------------------------------------------------------ train
    def train(
        self,
        training_batch_size: int = 200,
        learning_rate: float = 5e-4,
        validation_fraction: float = 0.1,
        stop_after_epochs: int = 20,
        max_num_epochs: int = 2**31 - 1,
        clip_max_norm: Optional[float] = 5.0,
        calibration_kernel: Optional[Callable] = None,
        resume_training: bool = False,
        force_first_round_loss: bool = False,
        discard_prior_samples: bool = False,
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

        start_idx = self._get_start_index(discard_prior_samples, force_first_round_loss)
        proposal = self._proposal_roundwise[-1] if self._proposal_roundwise else None

        theta, x, _ = self.get_simulations(start_idx)
        if self._neural_net is None or retrain_from_scratch:
            self._neural_net = self._build_neural_net(theta, x)
            del theta, x

        use_first_round_loss = self._round == 0 or force_first_round_loss
        if not use_first_round_loss:
            self._check_proposal_support(proposal)
        loss_fn = self._make_loss_fn(
            proposal=proposal,
            calibration_kernel=calibration_kernel,
            force_first_round_loss=use_first_round_loss,
        )
        return self._run_training_loop(loss_fn, cfg, start_idx=start_idx, key=key)

    def _get_start_index(
        self, discard_prior_samples: bool, force_first_round_loss: bool
    ) -> int:
        """Which rounds to train on (ref npe_base.py:572-614)."""
        start_idx = int(discard_prior_samples and self._round > 0)
        if self.use_non_atomic_loss and self._round > 0:
            # Non-atomic loss trains only on the latest round's data.
            start_idx = self._round
        return start_idx

    def _check_proposal_support(self, proposal) -> None:
        pass

    # --------------------------------------------------------------- losses
    def _make_loss_fn(
        self,
        proposal,
        calibration_kernel: Optional[Callable],
        force_first_round_loss: bool,
    ) -> Callable:
        """Return pure loss fn(params, key, theta_b, x_b, masks_b) -> (B,).

        Round 0: -log q(theta|x), optionally weighted by the calibration
        kernel (ref npe_base.py:483-516). Later rounds: subclass loss.
        """
        est = self._neural_net

        if self._round == 0 or force_first_round_loss:

            def loss_fn(params, key, theta_b, x_b, masks_b):
                lp = est.log_prob_fn(params, theta_b[None], x_b)[0]
                if calibration_kernel is not None:
                    lp = lp * calibration_kernel(x_b)
                return -lp

            return loss_fn
        return self._make_proposal_loss_fn(proposal, calibration_kernel)

    def _ensemble_loss_fn(self) -> Callable:
        """First-round NPE loss for vmapped ensembles (sequential-round
        proposal corrections stay per-member via ``train``)."""
        est = self._neural_net

        def loss_fn(params, key, theta_b, x_b, masks_b):
            return -est.log_prob_fn(params, theta_b[None], x_b)[0]

        return loss_fn

    @abstractmethod
    def _make_proposal_loss_fn(self, proposal, calibration_kernel) -> Callable:
        """Sequential-round (proposal-corrected) loss — subclass specific."""

    # --------------------------------------------------------------- build
    def build_posterior(
        self,
        density_estimator=None,
        prior=None,
        sample_with: str = "direct",
        mcmc_method: str = "slice_jax_vectorized",
        mcmc_parameters: Optional[Dict] = None,
        vi_parameters: Optional[Dict] = None,
        rejection_sampling_parameters: Optional[Dict] = None,
        direct_sampling_parameters: Optional[Dict] = None,
        importance_sampling_parameters: Optional[Dict] = None,
        posterior_parameters=None,
    ):
        """Wire estimator + prior + sampler into a posterior
        (ref trainers/base.py:479-975 dispatch; NPE default 'direct')."""
        from ...posteriors.direct_posterior import DirectPosterior

        prior = prior if prior is not None else self._prior
        estimator = density_estimator if density_estimator is not None else self._neural_net
        estimator = estimator.snapshot() if hasattr(estimator, "snapshot") else estimator
        if estimator is None:
            raise ValueError("Run `.train()` first or pass a density_estimator.")

        if posterior_parameters is not None:
            from ...posteriors.posterior_parameters import build_posterior_from_parameters

            self._posterior = build_posterior_from_parameters(
                posterior_parameters, estimator, prior, kind="npe"
            )
            return self._posterior

        if sample_with == "direct":
            self._posterior = DirectPosterior(
                posterior_estimator=estimator,
                prior=prior,
                **(direct_sampling_parameters or {}),
            )
        elif sample_with == "mcmc":
            from ...potentials.posterior_based_potential import (
                posterior_estimator_based_potential,
            )
            from ...posteriors.mcmc_posterior import MCMCPosterior

            potential_fn, theta_transform = posterior_estimator_based_potential(
                estimator, prior, x_o=None
            )
            self._posterior = MCMCPosterior(
                potential_fn,
                theta_transform=theta_transform,
                proposal=prior,
                method=mcmc_method,
                **(mcmc_parameters or {}),
            )
        elif sample_with == "rejection":
            from ...potentials.posterior_based_potential import (
                posterior_estimator_based_potential,
            )
            from ...posteriors.rejection_posterior import RejectionPosterior

            potential_fn, _ = posterior_estimator_based_potential(
                estimator, prior, x_o=None
            )
            self._posterior = RejectionPosterior(
                potential_fn,
                proposal=prior,
                **(rejection_sampling_parameters or {}),
            )
        elif sample_with == "importance":
            from ...potentials.posterior_based_potential import (
                posterior_estimator_based_potential,
            )
            from ...posteriors.importance_posterior import (
                ImportanceSamplingPosterior,
            )

            potential_fn, theta_transform = posterior_estimator_based_potential(
                estimator, prior, x_o=None
            )
            self._posterior = ImportanceSamplingPosterior(
                potential_fn,
                proposal=prior,
                theta_transform=theta_transform,
                **(importance_sampling_parameters or {}),
            )
        elif sample_with == "vi":
            from ...potentials.posterior_based_potential import (
                posterior_estimator_based_potential,
            )
            from ...posteriors.vi_posterior import VIPosterior

            potential_fn, theta_transform = posterior_estimator_based_potential(
                estimator, prior, x_o=None
            )
            self._posterior = VIPosterior(
                potential_fn,
                prior=prior,
                theta_transform=theta_transform,
                **(vi_parameters or {}),
            )
        else:
            raise NotImplementedError(f"sample_with='{sample_with}' not supported.")
        return self._posterior
