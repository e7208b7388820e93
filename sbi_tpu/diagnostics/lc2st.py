"""LC2ST: local classifier two-sample test (Linhart et al. 2023).

JAX counterpart of `sbi/diagnostics/lc2st.py:63-1229` (LC2ST, LC2ST_NF).
Train classifiers to distinguish (theta_q, x) from (theta_p, x) jointly over
calibration data; the *local* statistic at x_o is the MSE of predicted
probabilities from 1/2 over posterior samples. Null distribution by
permutation trials. LC2ST-NF runs the test in the flow's base space where
the null is exactly N(0, I) (no permutation retraining needed).

Classifiers are sklearn MLPs like the reference (host-side diagnostic).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.sbiutils import next_key

Array = jax.Array


@dataclass
class LC2STScores:
    """Scores container (reference export)."""

    observed: Optional[np.ndarray] = None
    null: List[np.ndarray] = field(default_factory=list)


@dataclass
class LC2STState:
    """Trained-state container (reference export)."""

    clfs: list = field(default_factory=list)
    clfs_null: list = field(default_factory=list)
    trained: bool = False
    trained_null: bool = False


def _build_clf(seed: int, ndim: int, classifier: str = "mlp", **kwargs):
    from sklearn.neural_network import MLPClassifier

    if classifier == "mlp":
        return MLPClassifier(
            activation="relu",
            hidden_layer_sizes=(10 * ndim, 10 * ndim),
            max_iter=300,
            solver="adam",
            random_state=seed,
            early_stopping=True,
            n_iter_no_change=20,
        )
    from sklearn.ensemble import RandomForestClassifier

    return RandomForestClassifier(random_state=seed)


class LC2ST:
    def __init__(
        self,
        thetas: Array,
        xs: Array,
        posterior_samples: Array,
        seed: int = 1,
        num_ensemble: int = 1,
        num_folds: int = 1,
        classifier: str = "mlp",
        z_score: bool = False,
        num_trials_null: int = 100,
        permutation: bool = True,
        **classifier_kwargs,
    ):
        """Args mirror the reference: thetas/xs are calibration joint draws,
        posterior_samples are one posterior draw per x. ``num_folds > 1``
        enables cross-validation (ref `lc2st.py:63-300`): each fold's
        classifier trains on the complementary K-1 folds and the local
        statistic aggregates probabilities over all fold classifiers."""
        self.theta_p = np.asarray(thetas, np.float64)
        self.x_p = np.asarray(xs, np.float64).reshape(len(thetas), -1)
        self.theta_q = np.asarray(posterior_samples, np.float64)
        self.seed = seed
        self.num_ensemble = num_ensemble
        self.num_folds = num_folds
        self.classifier = classifier
        self.num_trials_null = num_trials_null
        self.permutation = permutation
        self.state = LC2STState()
        self.scores = LC2STScores()
        if z_score:
            self._mu = self.theta_p.mean(0)
            self._sigma = self.theta_p.std(0) + 1e-12
            self.theta_p = (self.theta_p - self._mu) / self._sigma
            self.theta_q = (self.theta_q - self._mu) / self._sigma
        else:
            self._mu, self._sigma = 0.0, 1.0

    # ------------------------------------------------------------- training
    def _train_single(self, theta_p, theta_q, x_p, x_q, seed):
        data = np.concatenate(
            [
                np.concatenate([theta_p, x_p], axis=1),
                np.concatenate([theta_q, x_q], axis=1),
            ]
        )
        labels = np.concatenate([np.zeros(len(theta_p)), np.ones(len(theta_q))])
        clf = _build_clf(seed, theta_p.shape[1], self.classifier)
        clf.fit(data, labels)
        return clf

    def _fold_train_indices(self):
        """Train-split indices per fold (all data when num_folds == 1)."""
        n = len(self.theta_p)
        if self.num_folds <= 1:
            return [np.arange(n)]
        rng = np.random.RandomState(self.seed)
        perm = rng.permutation(n)
        folds = np.array_split(perm, self.num_folds)
        return [
            np.concatenate([f for j, f in enumerate(folds) if j != i])
            for i in range(self.num_folds)
        ]

    def train_on_observed_data(self, seed: Optional[int] = None):
        """Train the (ensemble x fold) classifiers distinguishing q from p
        (ref `train_...`; CV folds `lc2st.py:63-300`)."""
        seed = self.seed if seed is None else seed
        self.state.clfs = [
            self._train_single(
                self.theta_p[idx], self.theta_q[idx],
                self.x_p[idx], self.x_p[idx], seed + 37 * f + i,
            )
            for f, idx in enumerate(self._fold_train_indices())
            for i in range(self.num_ensemble)
        ]
        self.state.trained = True
        return self

    def train_under_null_hypothesis(self):
        """Permutation null: shuffle class labels within pairs (ref)."""
        rng = np.random.RandomState(self.seed)
        self.state.clfs_null = []
        fold_indices = self._fold_train_indices()
        for t in range(self.num_trials_null):
            # permute which member of each (theta_p, theta_q) pair gets which label
            swap = rng.rand(len(self.theta_p)) < 0.5
            a = np.where(swap[:, None], self.theta_q, self.theta_p)
            b = np.where(swap[:, None], self.theta_p, self.theta_q)
            self.state.clfs_null.append([
                self._train_single(
                    a[idx], b[idx], self.x_p[idx], self.x_p[idx],
                    self.seed + 1000 + 37 * f + t,
                )
                for f, idx in enumerate(fold_indices)
            ])
        self.state.trained_null = True
        return self

    # ------------------------------------------------------------ statistics
    def _probs(self, clfs, theta_o: np.ndarray, x_o: np.ndarray) -> np.ndarray:
        x_rep = np.tile(np.asarray(x_o, np.float64).reshape(1, -1), (len(theta_o), 1))
        data = np.concatenate([theta_o, x_rep], axis=1)
        probs = np.mean([clf.predict_proba(data)[:, 1] for clf in clfs], axis=0)
        return probs

    def get_statistic_on_observed_data(self, theta_o: Array, x_o: Array) -> float:
        """Local statistic at x_o: mean (prob - 0.5)^2 over posterior draws."""
        assert self.state.trained, "Call train_on_observed_data() first."
        theta_o = (np.asarray(theta_o, np.float64) - self._mu) / self._sigma
        probs = self._probs(self.state.clfs, theta_o, np.asarray(x_o))
        stat = float(np.mean((probs - 0.5) ** 2))
        self.scores.observed = probs
        return stat

    def get_statistics_under_null_hypothesis(self, theta_o: Array, x_o: Array) -> np.ndarray:
        assert self.state.trained_null, "Call train_under_null_hypothesis() first."
        theta_o = (np.asarray(theta_o, np.float64) - self._mu) / self._sigma
        stats = []
        for clfs in self.state.clfs_null:
            clfs = clfs if isinstance(clfs, list) else [clfs]
            probs = self._probs(clfs, theta_o, np.asarray(x_o))
            stats.append(np.mean((probs - 0.5) ** 2))
            self.scores.null.append(probs)
        return np.asarray(stats)

    def p_value(self, theta_o: Array, x_o: Array) -> float:
        stat = self.get_statistic_on_observed_data(theta_o, x_o)
        null = self.get_statistics_under_null_hypothesis(theta_o, x_o)
        return float((null >= stat).mean())

    def reject_test(self, theta_o: Array, x_o: Array, alpha: float = 0.05) -> bool:
        return self.p_value(theta_o, x_o) < alpha


class LC2ST_NF(LC2ST):
    """LC2ST in the flow's base space (ref `lc2st.py:886`): z = T^-1(theta; x)
    should be standard normal for every x; the null needs no permutation —
    fresh N(0, I) draws give exact null trials (much cheaper)."""

    def __init__(
        self,
        thetas: Array,
        xs: Array,
        posterior_samples: Array,
        flow_inverse_transform=None,
        flow_base_samples: Optional[Array] = None,
        num_trials_null: int = 100,
        **kwargs,
    ):
        if flow_inverse_transform is not None:
            z_p = np.asarray(flow_inverse_transform(thetas, xs))
        else:
            z_p = np.asarray(thetas)
        if flow_base_samples is None:
            rng = np.random.RandomState(kwargs.get("seed", 1))
            flow_base_samples = rng.randn(*z_p.shape)
        kwargs["permutation"] = False
        super().__init__(
            thetas=flow_base_samples,  # class p = base normal
            xs=xs,
            posterior_samples=z_p,  # class q = inverse-mapped posterior
            num_trials_null=num_trials_null,
            **kwargs,
        )

    def train_under_null_hypothesis(self):
        """Null trials with fresh N(0,I) vs N(0,I) — no permutation."""
        rng = np.random.RandomState(self.seed)
        self.state.clfs_null = []
        fold_indices = self._fold_train_indices()
        for t in range(self.num_trials_null):
            a = rng.randn(*self.theta_p.shape)
            b = rng.randn(*self.theta_q.shape)
            self.state.clfs_null.append([
                self._train_single(
                    a[idx], b[idx], self.x_p[idx], self.x_p[idx],
                    self.seed + 1000 + 37 * f + t,
                )
                for f, idx in enumerate(fold_indices)
            ])
        self.state.trained_null = True
        return self
