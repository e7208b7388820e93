"""Active-subspace sensitivity analysis.

JAX counterpart of `sbi/analysis/sensitivity_analysis.py:104-484`
(ActiveSubspace): train a regression net from theta to a scalar property,
then eigendecompose the posterior-weighted expected outer product of
gradients E[grad grad^T]. The gradient matrix is one vmapped jax.grad —
no per-sample autograd loop.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..utils.sbiutils import next_key

Array = jax.Array


class _RegressionNet(nn.Module):
    hidden: int = 100
    num_layers: int = 3

    @nn.compact
    def __call__(self, theta):
        h = theta
        for _ in range(self.num_layers):
            h = nn.relu(nn.Dense(self.hidden)(h))
        return nn.Dense(1)(h)[:, 0]


class ActiveSubspace:
    def __init__(self, posterior):
        self._posterior = posterior
        self._regression_net = None
        self._params = None
        self._theta_mean = None
        self._theta_std = None
        self._emergent_fn = None

    def add_property(
        self,
        theta: Array,
        emergent_property: Array,
        model: str = "mlp",
        hidden_features: int = 100,
        num_layers: int = 3,
    ) -> "ActiveSubspace":
        """Provide (theta, property) training pairs (ref `:143`)."""
        self._theta = jnp.asarray(theta, jnp.float32)
        self._prop = jnp.asarray(emergent_property, jnp.float32).reshape(-1)
        self._regression_net = _RegressionNet(hidden_features, num_layers)
        return self

    def train(
        self,
        training_batch_size: int = 200,
        learning_rate: float = 5e-4,
        max_num_epochs: int = 500,
        stop_after_epochs: int = 20,
        validation_fraction: float = 0.1,
        key=None,
    ):
        """Fit the regression net theta -> property (ref `:201`)."""
        key = next_key(key)
        theta, prop = self._theta, self._prop
        self._theta_mean = theta.mean(0)
        self._theta_std = jnp.clip(theta.std(0), 1e-6)
        self._prop_mean = prop.mean()
        self._prop_std = jnp.clip(prop.std(), 1e-6)
        z = (theta - self._theta_mean) / self._theta_std
        y = (prop - self._prop_mean) / self._prop_std

        n = z.shape[0]
        n_val = max(1, int(validation_fraction * n))
        perm = jax.random.permutation(key, n)
        tr, va = perm[n_val:], perm[:n_val]

        params = self._regression_net.init(key, z[:2])
        tx = optax.adam(learning_rate)
        state = tx.init(params)

        @jax.jit
        def epoch(params, state, k):
            idx = jax.random.permutation(k, tr.shape[0])
            batches = idx[: (idx.shape[0] // training_batch_size) * training_batch_size]
            batches = tr[batches].reshape(-1, min(training_batch_size, tr.shape[0]))

            def body(carry, b):
                p, s = carry

                def loss(p_):
                    pred = self._regression_net.apply(p_, z[b])
                    return jnp.mean((pred - y[b]) ** 2)

                l, g = jax.value_and_grad(loss)(p)
                u, s = tx.update(g, s)
                return (optax.apply_updates(p, u), s), l

            (params, state), _ = jax.lax.scan(body, (params, state), batches)
            val = jnp.mean(
                (self._regression_net.apply(params, z[va]) - y[va]) ** 2
            )
            return params, state, val

        best_val, since, best_params = jnp.inf, 0, params
        for e in range(max_num_epochs):
            key, k = jax.random.split(key)
            params, state, val = epoch(params, state, k)
            if float(val) < float(best_val):
                best_val, best_params, since = val, params, 0
            else:
                since += 1
            if since >= stop_after_epochs:
                break
        self._params = best_params
        return self

    def find_directions(
        self,
        posterior_log_prob_as_property: bool = False,
        norm_gradients_to_prior: bool = True,
        num_monte_carlo_samples: int = 1000,
        key=None,
    ) -> Tuple[Array, Array]:
        """Eigendecompose E_posterior[grad grad^T] (ref `:300`).

        Returns (eigenvalues ascending, eigenvectors as columns)."""
        key = next_key(key)
        thetas = self._posterior.sample((num_monte_carlo_samples,), key=key)

        if posterior_log_prob_as_property:
            def prop_fn(t):
                return self._posterior.log_prob(t[None])[0]
        else:
            assert self._params is not None, "Call .train() first."
            mean, std = self._theta_mean, self._theta_std

            def prop_fn(t):
                z = (t - mean) / std
                return self._regression_net.apply(self._params, z[None])[0]

        grads = jax.vmap(jax.grad(prop_fn))(thetas)  # (N, D)
        if norm_gradients_to_prior:
            # Scale gradients by the prior std so directions are comparable
            # across parameters with different units (ref `:382`).
            prior = getattr(self._posterior.potential_fn, "prior", None)
            if prior is not None:
                try:
                    grads = grads * jnp.sqrt(prior.variance)
                except NotImplementedError:
                    pass
        M = grads.T @ grads / grads.shape[0]
        eigvals, eigvecs = jnp.linalg.eigh(M)
        return eigvals, eigvecs

    def project(self, theta: Array, num_dimensions: int, key=None) -> Array:
        """Project thetas onto the top active-subspace directions."""
        eigvals, eigvecs = self.find_directions(key=key)
        top = eigvecs[:, -num_dimensions:]
        return jnp.asarray(theta) @ top
