"""Restriction estimator: learn and avoid invalid-simulation regions.

JAX counterpart of `sbi/utils/restriction_estimator.py:66,613,484`:
`RestrictionEstimator` trains a classifier valid-vs-invalid over theta;
`RestrictedPrior` accept-rejects prior draws through it;
`get_density_thresholder` builds an acceptance fn from a posterior density.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from .distributions import Distribution
from .sbiutils import handle_invalid_x, next_key, standardizing_transform

Array = jax.Array


class _ClassifierNet(nn.Module):
    hidden: int = 100
    num_layers: int = 2

    @nn.compact
    def __call__(self, theta):
        h = theta
        for _ in range(self.num_layers):
            h = nn.relu(nn.Dense(self.hidden)(h))
        return nn.Dense(1)(h)[:, 0]


class RestrictionEstimator:
    def __init__(
        self,
        prior: Distribution,
        classifier: str = "resnet",
        hidden_features: int = 100,
        num_blocks: int = 2,
        decision_criterion: str = "nan",
    ):
        self._prior = prior
        self._net = _ClassifierNet(hidden_features, num_blocks)
        self._params = None
        self._theta_all = []
        self._x_all = []
        self._label_all = []
        self._transform = None

    def append_simulations(self, theta: Array, x: Array) -> "RestrictionEstimator":
        theta = jnp.asarray(theta, jnp.float32)
        is_valid, _, _ = handle_invalid_x(x, exclude_invalid_x=True)
        self._theta_all.append(theta)
        self._x_all.append(jnp.asarray(x, jnp.float32))
        self._label_all.append(jnp.asarray(is_valid, jnp.float32))
        return self

    def get_simulations(self):
        """All appended (theta, x, is_valid) across rounds
        (ref `restriction_estimator.py:262-283`)."""
        theta = jnp.concatenate(self._theta_all)
        x = jnp.concatenate(self._x_all)
        is_valid = jnp.concatenate(self._label_all).astype(bool)
        return theta, x, is_valid

    def train(
        self,
        training_batch_size: int = 200,
        learning_rate: float = 5e-4,
        max_num_epochs: int = 300,
        stop_after_epochs: int = 20,
        validation_fraction: float = 0.1,
        key=None,
    ):
        key = next_key(key)
        theta = jnp.concatenate(self._theta_all)
        labels = jnp.concatenate(self._label_all)
        self._transform = standardizing_transform(theta)
        z = self._transform.forward(theta)

        # class-balance weights (invalid sims often rare)
        pos = jnp.clip(labels.mean(), 1e-3, 1 - 1e-3)
        w = jnp.where(labels > 0.5, 0.5 / pos, 0.5 / (1 - pos))

        n = z.shape[0]
        n_val = max(1, int(validation_fraction * n))
        perm = jax.random.permutation(key, n)
        tr, va = perm[n_val:], perm[:n_val]

        params = self._net.init(key, z[:2])
        tx = optax.adam(learning_rate)
        state = tx.init(params)

        @jax.jit
        def epoch(params, state, k):
            idx = jax.random.permutation(k, tr.shape[0])
            bs = min(training_batch_size, tr.shape[0])
            nb = max(1, tr.shape[0] // bs)
            batches = tr[idx[: nb * bs]].reshape(nb, bs)

            def body(carry, b):
                p, s = carry

                def loss(p_):
                    logits = self._net.apply(p_, z[b])
                    return jnp.mean(
                        w[b] * optax.sigmoid_binary_cross_entropy(logits, labels[b])
                    )

                l, g = jax.value_and_grad(loss)(p)
                u, s = tx.update(g, s)
                return (optax.apply_updates(p, u), s), l

            (params, state), _ = jax.lax.scan(body, (params, state), batches)
            val = jnp.mean(
                w[va]
                * optax.sigmoid_binary_cross_entropy(
                    self._net.apply(params, z[va]), labels[va]
                )
            )
            return params, state, val

        best_val, since, best = jnp.inf, 0, params
        for _ in range(max_num_epochs):
            key, k = jax.random.split(key)
            params, state, val = epoch(params, state, k)
            if float(val) < float(best_val):
                best_val, best, since = val, params, 0
            else:
                since += 1
            if since >= stop_after_epochs:
                break
        self._params = best
        return self

    def predict(self, theta: Array) -> Array:
        """P(valid | theta)."""
        z = self._transform.forward(jnp.atleast_2d(jnp.asarray(theta, jnp.float32)))
        return jax.nn.sigmoid(self._net.apply(self._params, z))

    def restrict_prior(
        self, allowed_false_negatives: float = 0.0, quantile: Optional[float] = None
    ) -> "RestrictedPrior":
        """Threshold chosen so at most `allowed_false_negatives` of the valid
        training thetas are rejected (ref `:480-560`)."""
        theta = jnp.concatenate(self._theta_all)
        labels = jnp.concatenate(self._label_all)
        probs_valid = self.predict(theta[labels > 0.5])
        q = allowed_false_negatives if quantile is None else quantile
        threshold = float(jnp.quantile(probs_valid, q)) if q > 0 else float(
            probs_valid.min()
        )
        return RestrictedPrior(self._prior, self.predict, threshold)


class RestrictedPrior(Distribution):
    """Prior x acceptance-classifier, sampled by accept/reject
    (ref `restriction_estimator.py:613`)."""

    def __init__(self, prior: Distribution, accept_fn: Callable, threshold: float = 0.5):
        self.prior = prior
        self.accept_fn = accept_fn
        self.threshold = threshold
        self.batch_shape = prior.batch_shape
        self.event_shape = prior.event_shape
        self._acceptance_rate = None

    def _accept(self, theta: Array) -> Array:
        return self.accept_fn(theta) >= self.threshold

    def sample(self, key=None, sample_shape=()):
        key = next_key(key)
        num = 1
        for s in sample_shape:
            num *= int(s)
        out = []
        total = 0
        n_drawn = 0
        while total < num:
            key, sub = jax.random.split(key)
            cand = self.prior.sample(sub, (max(2 * num, 1000),))
            ok = self._accept(cand)
            n_drawn += cand.shape[0]
            acc = cand[ok]
            out.append(acc)
            total += int(acc.shape[0])
            if n_drawn > 1000 * max(num, 1) and total == 0:
                raise RuntimeError("RestrictedPrior: acceptance rate ~ 0.")
        self._acceptance_rate = total / n_drawn
        samples = jnp.concatenate(out)[:num]
        return samples.reshape(tuple(sample_shape) + self.prior.event_shape)

    def log_prob(self, theta: Array, normalize: bool = False) -> Array:
        lp = self.prior.log_prob(theta)
        ok = self._accept(jnp.atleast_2d(jnp.asarray(theta, jnp.float32)))
        lp = jnp.where(ok.reshape(lp.shape), lp, -jnp.inf)
        if normalize and self._acceptance_rate:
            lp = lp - jnp.log(self._acceptance_rate)
        return lp

    def within_support(self, theta):
        base = self.prior.within_support(theta)
        ok = self._accept(jnp.atleast_2d(jnp.asarray(theta, jnp.float32)))
        return base & ok.reshape(base.shape)


def get_density_thresholder(
    posterior,
    quantile: float = 1e-4,
    num_samples_to_estimate_support: int = 1_000_000,
    key=None,
) -> Callable:
    """Acceptance fn keeping the (1-quantile) highest-density region of a
    posterior (ref `restriction_estimator.py:484`)."""
    key = next_key(key)
    samples = posterior.sample(
        (min(num_samples_to_estimate_support, 100_000),), key=key
    )
    lp = posterior.log_prob(samples)
    threshold = jnp.quantile(lp, quantile)

    def accept_fn(theta):
        return (posterior.log_prob(jnp.atleast_2d(theta)) > threshold).astype(
            jnp.float32
        )

    return accept_fn
