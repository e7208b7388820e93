"""NRE family base: classifier-based likelihood-ratio estimation.

JAX counterpart of `sbi/inference/trainers/nre/nre_base.py` — shared
`_classifier_logits` builds contrastive (theta, x) atom pairs (`:375-395`);
subclasses define the loss over those logits.
"""

from __future__ import annotations

from abc import abstractmethod
from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from ....neural_nets.factory import classifier_nn
from ....utils.sbiutils import next_key
from .._contracts import TrainConfig
from ..base import NeuralInference

Array = jax.Array


def classifier_logits(est, params, key, theta: Array, x: Array, num_atoms: int) -> Array:
    """(B, M) logits: row i = f(theta_atoms_i, x_i); column 0 is the true
    (joint) pair, columns 1..M-1 contrast thetas drawn from the batch
    without replacement (ref nre_base.py:375-395)."""
    B = theta.shape[0]
    M = num_atoms
    perm_keys = jax.random.split(key, B)
    perms = jax.vmap(lambda k: jax.random.permutation(k, B - 1))(perm_keys)
    picks = perms[:, : M - 1]
    row_idx = jnp.arange(B)[:, None]
    contrast_idx = picks + (picks >= row_idx)
    atomic_idx = jnp.concatenate([row_idx, contrast_idx], axis=1)  # (B, M)
    atomic_theta = theta[atomic_idx].reshape(B * M, -1)
    x_rep = jnp.repeat(x, M, axis=0)
    return est.log_ratio_fn(params, atomic_theta, x_rep).reshape(B, M)


class RatioEstimatorTrainer(NeuralInference):
    def __init__(
        self,
        prior=None,
        classifier: Union[str, Callable] = "resnet",
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
        if isinstance(classifier, str):
            self._build_neural_net = classifier_nn(model=classifier)
        else:
            self._build_neural_net = classifier

    def append_simulations(
        self, theta, x, proposal=None, exclude_invalid_x: bool = True,
        data_device=None, from_round: Optional[int] = None,
    ) -> "RatioEstimatorTrainer":
        theta, x = self._validate_theta_and_x(
            theta, x, exclude_invalid_x, algorithm="NRE"
        )
        current_round = 0 if proposal is None else max(
            self._data_round_index, default=-1
        ) + 1
        if from_round is not None:
            current_round = from_round
        prior_mask = jnp.full((theta.shape[0],), float(current_round == 0))
        self._append_to_data_store(theta, x, prior_mask, current_round)
        self._proposal_roundwise.append(proposal)
        self._round = max(self._data_round_index)
        return self

    def train(
        self,
        num_atoms: int = 10,
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
        loss_kwargs: Optional[Dict] = None,
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
        loss_fn = self._make_loss_fn(num_atoms, **(loss_kwargs or {}))
        return self._run_training_loop(loss_fn, cfg, start_idx=start_idx, key=key)

    @abstractmethod
    def _make_loss_fn(self, num_atoms: int, **kwargs) -> Callable: ...

    # Contrastive-atom count used by vmapped `train_ensemble` (subclasses
    # with fixed-atom losses override: NRE-A/BNRE use exactly 2).
    _ensemble_num_atoms = 10

    def _ensemble_loss_fn(self) -> Callable:
        """Per-member contrastive loss for vmapped ensembles: the same
        atom-based loss as :meth:`train` (ref nre_base.py:375-395), with the
        subclass default loss kwargs."""
        return self._make_loss_fn(self._ensemble_num_atoms)

    def build_posterior(
        self,
        ratio_estimator=None,
        prior=None,
        sample_with: str = "mcmc",
        mcmc_method: str = "slice_jax_vectorized",
        mcmc_parameters: Optional[Dict] = None,
        vi_parameters: Optional[Dict] = None,
        rejection_sampling_parameters: Optional[Dict] = None,
        importance_sampling_parameters: Optional[Dict] = None,
        density_estimator=None,
        posterior_parameters=None,
    ):
        from ...potentials.ratio_based_potential import (
            ratio_estimator_based_potential,
        )

        prior = prior if prior is not None else self._prior
        assert prior is not None, "NRE needs a prior to build a posterior."
        estimator = ratio_estimator or density_estimator or self._neural_net
        estimator = estimator.snapshot() if hasattr(estimator, "snapshot") else estimator
        if estimator is None:
            raise ValueError("Run `.train()` first or pass a ratio_estimator.")

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
                posterior_parameters, estimator, prior, kind="nre"
            )
            return self._posterior

        potential_fn, theta_transform = ratio_estimator_based_potential(
            estimator, prior, x_o=None
        )
        if sample_with == "mcmc":
            from ...posteriors.mcmc_posterior import MCMCPosterior

            self._posterior = MCMCPosterior(
                potential_fn, theta_transform=theta_transform, proposal=prior,
                method=mcmc_method, **(mcmc_parameters or {}),
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
