"""TabPFN-backed in-context conditional density estimator.

JAX counterpart of `sbi/neural_nets/estimators/tabpfn_flow.py:28-472`: the
estimator keeps a context set of (theta, x) pairs and evaluates
p(theta | x) by an autoregressive factorization over theta dimensions,
fitting a tabular foundation-model regressor per dimension with the
context as training data. Training-free: `params` is an empty pytree.

TabPFN is a pretrained torch model with a CPU/numpy API, so this
estimator runs HOST-SIDE by design (the reference pins its context to CPU
for the same reason, `tabpfn_flow.py:87-88`); it cannot be jitted and
marks itself `jittable = False` so posteriors skip their compiled
fast paths. The TPU compute path is unaffected — this is an optional
in-context method, not a gradient-trained estimator.

The regressor is abstracted behind a 2-method adapter protocol
(`fit(X, y)` + `predict_dist(Xq) -> (log_prob_fn, sample_fn)`), with
`TabPFNAdapter` wrapping `tabpfn.TabPFNRegressor`'s full-output predictive
(bar distribution) when the optional dependency is installed. Tests inject
a Gaussian linear-regression adapter through the same protocol.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def tabpfn_available() -> bool:
    try:
        import tabpfn  # noqa: F401

        return True
    except ImportError:
        return False


class TabPFNAdapter:
    """Adapter over `tabpfn.TabPFNRegressor` full-output predictive
    (ref `tabpfn_flow.py:210-314`: fit on context columns, predict the
    bar-distribution criterion + logits, score/sample through it)."""

    def __init__(self, **regressor_kwargs):
        from tabpfn import TabPFNRegressor  # gated import

        self._model = TabPFNRegressor(**regressor_kwargs)

    def fit(self, X: np.ndarray, y: np.ndarray) -> None:
        self._model.fit(X, y)

    def predict_dist(self, Xq: np.ndarray):
        import torch

        out = self._model.predict(Xq, output_type="full", quantiles=[])
        criterion, logits = out["criterion"], out["logits"]

        def log_prob(y: np.ndarray) -> np.ndarray:
            with torch.no_grad():
                lp = -criterion(
                    logits.to(criterion.borders.device),
                    torch.as_tensor(y, dtype=torch.float32).to(
                        criterion.borders.device
                    ),
                )
            lp = lp.cpu().numpy()
            return np.where(np.isneginf(lp), np.log(1e-15), lp)

        def sample(rng: np.random.Generator) -> np.ndarray:
            with torch.no_grad():
                import torch as _t

                _t.manual_seed(int(rng.integers(0, 2**31 - 1)))
                s = criterion.sample(logits)
            return s.cpu().numpy().reshape(-1)

        return log_prob, sample


class TabPFNFlow:
    """In-context autoregressive conditional density estimator.

    API mirrors ConditionalDensityEstimator's pure-fn surface
    (`log_prob_fn(params, input, condition)`, `sample_fn(params, key,
    sample_shape, condition)`) so posteriors compose unchanged; `params`
    is empty and every call runs host-side through the adapter.
    """

    jittable = False

    def __init__(
        self,
        input_shape: Tuple[int, ...],
        condition_shape: Tuple[int, ...],
        adapter_factory: Optional[Callable[[], object]] = None,
        max_context_size: int = 10_000,
    ):
        if adapter_factory is None:
            if not tabpfn_available():
                raise ImportError(
                    "TabPFNFlow requires the optional dependency `tabpfn` "
                    "(pip install tabpfn), or an injected adapter_factory."
                )
            adapter_factory = TabPFNAdapter
        self._adapter_factory = adapter_factory
        self.input_shape = tuple(input_shape)
        self.condition_shape = tuple(condition_shape)
        self.max_context_size = int(max_context_size)
        self._input_numel = int(np.prod(self.input_shape))
        self._ctx_theta: Optional[np.ndarray] = None
        self._ctx_x: Optional[np.ndarray] = None
        self.params = {}

    # ------------------------------------------------------------- context
    def set_context(self, input_context, condition_context) -> "TabPFNFlow":
        theta = np.asarray(input_context, np.float32).reshape(
            len(input_context), -1
        )
        x = np.asarray(condition_context, np.float32).reshape(len(theta), -1)
        if theta.shape[0] > self.max_context_size:
            raise ValueError(
                f"Context size {theta.shape[0]} exceeds max_context_size="
                f"{self.max_context_size}."
            )
        self._ctx_theta, self._ctx_x = theta, x
        return self

    def filtered(self, x_o, filter_size: int = 1000, filter_type="knn"):
        """Return a copy whose context is filtered around `x_o`
        (ref FilteredDirectPosterior context filtering: 'knn' keeps the
        filter_size nearest observations, 'first' truncates, a callable
        returns indices)."""
        self._require_context()
        x_o = np.asarray(x_o, np.float32).reshape(-1)
        if callable(filter_type):
            idx = np.asarray(filter_type(self._ctx_x, x_o))
        elif filter_type == "knn":
            d = np.linalg.norm(self._ctx_x - x_o[None, :], axis=1)
            idx = np.argsort(d)[:filter_size]
        elif filter_type == "first":
            idx = np.arange(min(filter_size, len(self._ctx_x)))
        else:
            raise ValueError(f"Unknown filter_type {filter_type!r}")
        out = TabPFNFlow(
            self.input_shape,
            self.condition_shape,
            adapter_factory=self._adapter_factory,
            max_context_size=self.max_context_size,
        )
        out.set_context(self._ctx_theta[idx], self._ctx_x[idx])
        return out

    def _require_context(self):
        if self._ctx_theta is None:
            raise RuntimeError(
                "No context set. Call set_context(theta, x) first."
            )
        return self._ctx_theta, self._ctx_x

    # ------------------------------------------------------- log_prob / sample
    def _fit_dim(self, dim_idx: int):
        """Fit the adapter for p(theta_d | x, theta_<d) on the context."""
        ctx_theta, ctx_x = self._require_context()
        X = np.concatenate([ctx_x, ctx_theta[:, :dim_idx]], axis=1)
        y = ctx_theta[:, dim_idx]
        adapter = self._adapter_factory()
        adapter.fit(X, y)
        return adapter

    def log_prob_fn(self, params, input: Array, condition: Array) -> Array:
        """input: (S, B, *event), condition: (B, *cond) -> (S, B)."""
        theta = np.asarray(input, np.float32)
        S, B = theta.shape[0], theta.shape[1]
        theta = theta.reshape(S * B, -1)
        x = np.asarray(condition, np.float32).reshape(B, -1)
        x_rep = np.tile(x, (S, 1))
        total = np.zeros(S * B, np.float32)
        for d in range(self._input_numel):
            adapter = self._fit_dim(d)
            log_prob, _ = adapter.predict_dist(
                np.concatenate([x_rep, theta[:, :d]], axis=1)
            )
            total += log_prob(theta[:, d]).astype(np.float32)
        return jnp.asarray(total.reshape(S, B))

    def log_prob(self, input, condition):
        return self.log_prob_fn(self.params, input, condition)

    def sample_fn(self, params, key, sample_shape, condition) -> Array:
        n = 1
        for s in sample_shape:
            n *= int(s)
        x = np.asarray(condition, np.float32).reshape(-1, np.prod(self.condition_shape) if self.condition_shape else 1)
        B = x.shape[0]
        rng = np.random.default_rng(
            int(jax.random.randint(key, (), 0, 2**31 - 1))
        )
        x_rep = np.tile(x, (n, 1))
        theta = np.zeros((n * B, 0), np.float32)
        for d in range(self._input_numel):
            adapter = self._fit_dim(d)
            _, sample = adapter.predict_dist(
                np.concatenate([x_rep, theta], axis=1)
            )
            theta = np.concatenate(
                [theta, sample(rng).reshape(-1, 1).astype(np.float32)], axis=1
            )
        out = theta.reshape((n, B) + self.input_shape)
        return jnp.asarray(out).reshape(tuple(sample_shape) + (B,) + self.input_shape)

    def sample(self, sample_shape, condition, key=None):
        from ...utils.sbiutils import next_key

        return self.sample_fn(self.params, next_key(key), sample_shape, condition)

    def loss_fn(self, params, input, condition):
        return -self.log_prob_fn(params, input[None], condition)[0]

    def loss(self, input, condition):
        return self.loss_fn(self.params, input, condition)

    def snapshot(self):
        return self.params
