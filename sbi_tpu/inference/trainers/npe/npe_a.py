"""NPE-A / SNPE-A (Papamakarios & Murray 2016).

JAX counterpart of `sbi/inference/trainers/npe/npe_a.py`: MLE on the
proposal posterior each round, then an analytic post-hoc MoG correction
(`_correct_for_proposal` `:495`, `_compute_posterior_logits` `:622`,
implementing Eqs. 25-26) — the correction lives in
`posteriors/npe_a_posterior.py` here. Requires an MDN estimator.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax.numpy as jnp

from ....neural_nets.factory import posterior_nn
from .npe_base import PosteriorEstimatorTrainer


class NPE_A(PosteriorEstimatorTrainer):
    def __init__(
        self,
        prior=None,
        density_estimator: Union[str, Callable] = "mdn_snpe_a",
        num_components: int = 10,
        device: str = "tpu",
        logging_level="WARNING",
        summary_writer=None,
        show_progress_bars: bool = True,
        **kwargs,
    ):
        self._num_components = num_components
        if isinstance(density_estimator, str):
            assert density_estimator in ("mdn_snpe_a", "mdn"), (
                "NPE-A requires an MDN density estimator."
            )
            # Classic SNPE-A (Papamakarios 2016): train a *single* Gaussian
            # component in non-final rounds so every proposal is one
            # Gaussian and the posthoc quotient is exact; the head is
            # expanded to `num_components` at the start of the final round
            # (the reference's historical `_expand_mog`).
            density_estimator = posterior_nn(model="mdn", num_components=1)
        super().__init__(
            prior=prior,
            density_estimator=density_estimator,
            device=device,
            logging_level=logging_level,
            summary_writer=summary_writer,
            show_progress_bars=show_progress_bars,
            **kwargs,
        )

    def train(self, final_round: bool = False, **kwargs):
        """NPE-A always trains by MLE on the *latest proposal's* data (prior
        samples discarded after round 0, ref npe_a.py:215-217) so the net
        cleanly converges to the proposal posterior; the correction is
        applied analytically in build_posterior."""
        kwargs.setdefault("force_first_round_loss", True)
        kwargs.setdefault("discard_prior_samples", True)
        assert not kwargs.get("retrain_from_scratch", False), (
            "Retraining from scratch is not supported in SNPE-A: rebuilding "
            "the net would change the z-scoring and break the correction."
        )
        if final_round and self._num_components > 1:
            self._maybe_expand_mog()
        return super().train(**kwargs)

    def _maybe_expand_mog(self, eps: float = 1e-3, key=None) -> None:
        """Expand the single-component MoG head to `num_components` by
        replicating the head weights and jittering the means to break
        symmetry (the reference's historical `_expand_mog`). Hidden layers
        and z-scoring are untouched, so the correction stays valid."""
        import jax
        import jax.random as jrandom

        from ....neural_nets.estimators.mdn import MDNModule
        from ....utils.sbiutils import next_key

        est = self._neural_net
        if est is None:
            # Net not built yet (single-round usage): build it now from the
            # stored data so it can be expanded before training.
            theta, x, _ = self.get_simulations(0)
            self._neural_net = est = self._build_neural_net(theta, x)
        mod = est.net
        if mod.num_components != 1:
            return
        K = self._num_components
        D = mod.theta_dim
        n_off = D * (D - 1) // 2
        nl = mod.num_layers
        key = next_key(key)

        params = dict(est.params["params"])

        def tile_head(name, noise_scale=0.0, k=None):
            head = params[name]
            kern = jnp.tile(head["kernel"], (1, K))
            bias = jnp.tile(head["bias"], (K,))
            if noise_scale > 0.0:
                bias = bias + noise_scale * jrandom.normal(k, bias.shape)
            params[name] = {"kernel": kern, "bias": bias}

        k1, k2 = jrandom.split(key)
        tile_head(f"Dense_{nl}", noise_scale=eps, k=k1)  # logits
        tile_head(f"Dense_{nl + 1}", noise_scale=eps, k=k2)  # means
        tile_head(f"Dense_{nl + 2}")  # precision diag
        if n_off > 0:
            tile_head(f"Dense_{nl + 3}")  # precision off-diagonal

        est.net = MDNModule(
            theta_dim=D,
            num_components=K,
            hidden_features=mod.hidden_features,
            num_layers=nl,
            embedding_net=mod.embedding_net,
        )
        est.params = {"params": params}

    def _make_proposal_loss_fn(self, proposal, calibration_kernel):
        # Never used (force_first_round_loss=True), but keep MLE as fallback.
        est = self._neural_net

        def loss_fn(params, key, theta_b, x_b, masks_b):
            return -est.log_prob_fn(params, theta_b[None], x_b)[0]

        return loss_fn

    def build_posterior(
        self,
        density_estimator=None,
        prior=None,
        **kwargs,
    ):
        """Return NPE_A_Posterior with the analytic correction chained to the
        latest proposal."""
        from ...posteriors.npe_a_posterior import NPE_A_Posterior

        prior = prior if prior is not None else self._prior
        estimator = density_estimator if density_estimator is not None else self._neural_net
        estimator = estimator.snapshot() if hasattr(estimator, "snapshot") else estimator
        if estimator is None:
            raise ValueError("Run `.train()` first or pass a density_estimator.")
        proposal = self._proposal_roundwise[-1] if self._proposal_roundwise else None
        self._posterior = NPE_A_Posterior(
            posterior_estimator=estimator,
            prior=prior,
            proposal=proposal,
        )
        return self._posterior


SNPE_A = NPE_A
