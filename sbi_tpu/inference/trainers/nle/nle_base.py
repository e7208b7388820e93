"""NLE: neural likelihood estimation trainer.

JAX counterpart of `sbi/inference/trainers/nle/nle_base.py`: plain NLL loss
on p(x|theta) (`:330`), posterior = likelihood potential sampled with
MCMC/VI/rejection/importance (`:224-329`).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from ....neural_nets.factory import likelihood_nn
from ....utils.sbiutils import next_key
from .._contracts import TrainConfig
from ..base import NeuralInference

Array = jax.Array


class LikelihoodEstimatorTrainer(NeuralInference):
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
            self._build_neural_net = likelihood_nn(model=density_estimator)
        else:
            self._build_neural_net = density_estimator

    def append_simulations(
        self,
        theta: Array,
        x: Array,
        proposal=None,
        exclude_invalid_x: bool = False,
        data_device=None,
    ) -> "LikelihoodEstimatorTrainer":
        """NLE keeps invalid x by default: excluding them biases the learned
        likelihood (ref nle_base.py warns and defaults exclude_invalid_x to
        False)."""
        from ....utils.sbiutils import handle_invalid_x, nle_nre_apt_msg_on_invalid_x

        _, num_nans, num_infs = handle_invalid_x(jnp.asarray(x, jnp.float32), True)
        nle_nre_apt_msg_on_invalid_x(
            int(num_nans), int(num_infs), exclude_invalid_x, algorithm="NLE"
        )
        theta, x = self._validate_theta_and_x(
            theta, x, exclude_invalid_x=exclude_invalid_x, algorithm="NLE"
        )
        current_round = 0 if proposal is None else max(
            self._data_round_index, default=-1
        ) + 1
        prior_mask = jnp.full((theta.shape[0],), float(current_round == 0))
        self._append_to_data_store(theta, x, prior_mask, current_round)
        self._proposal_roundwise.append(proposal)
        self._round = max(self._data_round_index)
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
        start_idx = int(discard_prior_samples and self._round > 0)
        theta, x, _ = self.get_simulations(start_idx)
        if self._neural_net is None or retrain_from_scratch:
            self._neural_net = self._build_neural_net(theta, x)
        est = self._neural_net

        def loss_fn(params, k, theta_b, x_b, masks_b):
            # -log p(x | theta): estimator input is x, condition is theta
            lp = est.log_prob_fn(params, x_b[None], theta_b)[0]
            return -lp

        return self._run_training_loop(loss_fn, cfg, start_idx=start_idx, key=key)

    def _ensemble_loss_fn(self):
        est = self._neural_net

        def loss_fn(params, k, theta_b, x_b, masks_b):
            return -est.log_prob_fn(params, x_b[None], theta_b)[0]

        return loss_fn

    def build_posterior(
        self,
        density_estimator=None,
        prior=None,
        sample_with: str = "mcmc",
        mcmc_method: str = "slice_jax_vectorized",
        mcmc_parameters: Optional[Dict] = None,
        vi_parameters: Optional[Dict] = None,
        rejection_sampling_parameters: Optional[Dict] = None,
        importance_sampling_parameters: Optional[Dict] = None,
        posterior_parameters=None,
    ):
        """Default: MCMC with vectorized slice (ref Appendix B)."""
        from ...potentials.likelihood_based_potential import (
            likelihood_estimator_based_potential,
        )

        prior = prior if prior is not None else self._prior
        assert prior is not None, "NLE needs a prior to build a posterior."
        estimator = density_estimator if density_estimator is not None else self._neural_net
        estimator = estimator.snapshot() if hasattr(estimator, "snapshot") else estimator
        if estimator is None:
            raise ValueError("Run `.train()` first or pass a density_estimator.")

        if posterior_parameters is not None:
            from ...posteriors.posterior_parameters import (
                build_posterior_from_parameters,
                check_legacy_sampler_args,
            )

            check_legacy_sampler_args(
                {
                    "mcmc_parameters": mcmc_parameters,
                    "vi_parameters": vi_parameters,
                    "rejection_sampling_parameters": rejection_sampling_parameters,
                    "importance_sampling_parameters": importance_sampling_parameters,
                },
                {
                    "sample_with": (sample_with, "mcmc"),
                    "mcmc_method": (mcmc_method, "slice_jax_vectorized"),
                },
            )
            self._posterior = build_posterior_from_parameters(
                posterior_parameters, estimator, prior, kind="nle"
            )
            return self._posterior

        potential_fn, theta_transform = likelihood_estimator_based_potential(
            estimator, prior, x_o=None
        )
        if sample_with == "mcmc":
            from ...posteriors.mcmc_posterior import MCMCPosterior

            self._posterior = MCMCPosterior(
                potential_fn,
                theta_transform=theta_transform,
                proposal=prior,
                method=mcmc_method,
                **(mcmc_parameters or {}),
            )
        elif sample_with == "rejection":
            from ...posteriors.rejection_posterior import RejectionPosterior

            self._posterior = RejectionPosterior(
                potential_fn, proposal=prior,
                **(rejection_sampling_parameters or {}),
            )
        elif sample_with == "importance":
            from ...posteriors.importance_posterior import ImportanceSamplingPosterior

            self._posterior = ImportanceSamplingPosterior(
                potential_fn, proposal=prior, theta_transform=theta_transform,
                **(importance_sampling_parameters or {}),
            )
        elif sample_with == "vi":
            from ...posteriors.vi_posterior import VIPosterior

            self._posterior = VIPosterior(
                potential_fn, prior=prior, theta_transform=theta_transform,
                **(vi_parameters or {}),
            )
        else:
            raise NotImplementedError(f"sample_with='{sample_with}' not supported.")
        return self._posterior


class NLE_A(LikelihoodEstimatorTrainer):
    """SNLE-A (Papamakarios et al. 2019) — the base NLE with MAF default
    (ref `nle_a.py:97`)."""


NLE = NLE_A
SNLE = NLE_A
SNLE_A = NLE_A
SNL = NLE_A
