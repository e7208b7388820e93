"""Two-sample metrics: C2ST, MMD, Wasserstein; ABC distances.

JAX counterpart of `sbi/utils/metrics.py:56,167,178-292,293,543`. C2ST keeps
the reference's sklearn cross-validated classifier (sklearn is a test-time
dependency only; nothing on the TPU compute path uses it). An in-repo jitted
MLP variant (`c2st_jax`) is provided for fully self-contained use.
"""

from __future__ import annotations

import warnings
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# C2ST (classifier two-sample test) — ref `sbi/utils/metrics.py:56`
# ---------------------------------------------------------------------------


def c2st(
    X: Array,
    Y: Array,
    seed: int = 1,
    n_folds: int = 5,
    scoring: str = "accuracy",
    z_score: bool = True,
    classifier: str = "mlp",
) -> Array:
    """Cross-validated classifier accuracy separating X from Y (0.5 = same)."""
    from sklearn.ensemble import RandomForestClassifier
    from sklearn.model_selection import KFold, cross_val_score
    from sklearn.neural_network import MLPClassifier

    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    if X.shape[0] == 0 or Y.shape[0] == 0:
        raise ValueError("c2st: empty sample set")
    imbalance = max(X.shape[0], Y.shape[0]) / min(X.shape[0], Y.shape[0])
    if imbalance > 1.1:
        # Accuracy under class imbalance is inflated toward the majority
        # fraction (e.g. 2:1 -> 0.667 for IDENTICAL distributions), which
        # silently corrupts the metric.
        warnings.warn(
            f"c2st: unbalanced sample sets ({X.shape[0]} vs {Y.shape[0]}); "
            "accuracy is biased toward "
            f"{max(X.shape[0], Y.shape[0]) / (X.shape[0] + Y.shape[0]):.3f} "
            "for identical distributions. Subsample to equal sizes."
        )
    if z_score:
        mu, sigma = X.mean(axis=0), X.std(axis=0)
        sigma[sigma < 1e-12] = 1e-12
        X = (X - mu) / sigma
        Y = (Y - mu) / sigma

    ndim = X.shape[1]
    if classifier == "rf":
        clf = RandomForestClassifier(random_state=seed)
    else:
        clf = MLPClassifier(
            activation="relu",
            hidden_layer_sizes=(10 * ndim, 10 * ndim),
            max_iter=1000,
            solver="adam",
            random_state=seed,
        )

    data = np.concatenate((X, Y))
    target = np.concatenate((np.zeros(X.shape[0]), np.ones(Y.shape[0])))
    shuffle = KFold(n_splits=n_folds, shuffle=True, random_state=seed)
    scores = cross_val_score(clf, data, target, cv=shuffle, scoring=scoring)
    return jnp.asarray(np.mean(scores), dtype=jnp.float32)


def check_c2st(x: Array, y: Array, alg: str = "", tol: float = 0.1) -> None:
    """Assert c2st in [0.5 - tol, 0.5 + tol] (ref `metrics.py:167`)."""
    score = float(c2st(x, y))
    assert 0.5 - tol <= score <= 0.5 + tol, (
        f"C2ST for {alg} was {score:.3f}, not within 0.5 +/- {tol}."
    )


def c2st_jax(
    X: Array,
    Y: Array,
    key: Optional[Array] = None,
    hidden: int = 64,
    num_epochs: int = 200,
    lr: float = 1e-3,
) -> Array:
    """Self-contained jitted-MLP C2ST (holdout accuracy), no sklearn.

    Trains a 2-layer MLP with optax Adam on an 80/20 split; the full
    training loop is one `lax.scan`, so the whole test is a single XLA
    program — the TPU-native replacement for the sklearn path.
    """
    import optax

    from .sbiutils import next_key

    key = next_key(key)
    X = jnp.asarray(X, jnp.float32)
    Y = jnp.asarray(Y, jnp.float32)
    mu, sigma = X.mean(0), jnp.clip(X.std(0), 1e-6)
    X = (X - mu) / sigma
    Y = (Y - mu) / sigma
    data = jnp.concatenate([X, Y], axis=0)
    labels = jnp.concatenate([jnp.zeros(X.shape[0]), jnp.ones(Y.shape[0])])

    n = data.shape[0]
    kperm, kinit = jax.random.split(key)
    perm = jax.random.permutation(kperm, n)
    data, labels = data[perm], labels[perm]
    n_train = int(0.8 * n)
    xtr, ytr = data[:n_train], labels[:n_train]
    xte, yte = data[n_train:], labels[n_train:]

    d = data.shape[1]
    k1, k2, k3 = jax.random.split(kinit, 3)
    params = {
        "w1": jax.random.normal(k1, (d, hidden)) / jnp.sqrt(d),
        "b1": jnp.zeros(hidden),
        "w2": jax.random.normal(k2, (hidden, hidden)) / jnp.sqrt(hidden),
        "b2": jnp.zeros(hidden),
        "w3": jax.random.normal(k3, (hidden, 1)) / jnp.sqrt(hidden),
        "b3": jnp.zeros(1),
    }

    def logits_fn(p, x):
        h = jax.nn.relu(x @ p["w1"] + p["b1"])
        h = jax.nn.relu(h @ p["w2"] + p["b2"])
        return (h @ p["w3"] + p["b3"])[:, 0]

    def loss_fn(p, x, y):
        lg = logits_fn(p, x)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(lg, y))

    opt = optax.adam(lr)

    def step(carry, _):
        p, s = carry
        g = jax.grad(loss_fn)(p, xtr, ytr)
        updates, s = opt.update(g, s)
        p = optax.apply_updates(p, updates)
        return (p, s), None

    (params, _), _ = jax.lax.scan(step, (params, opt.init(params)), None, length=num_epochs)
    pred = (logits_fn(params, xte) > 0).astype(jnp.float32)
    return jnp.mean(pred == yte)


# ---------------------------------------------------------------------------
# MMD — ref `sbi/utils/metrics.py:178-292`
# ---------------------------------------------------------------------------


def _sq_dists(x: Array, y: Array) -> Array:
    return jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)


def _median_heuristic(x: Array, y: Array) -> Array:
    d = _sq_dists(jnp.concatenate([x, y]), jnp.concatenate([x, y]))
    return jnp.sqrt(jnp.median(d) / 2.0)


def unbiased_mmd_squared(x: Array, y: Array, scale: Optional[float] = None) -> Array:
    x, y = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    sigma = _median_heuristic(x, y) if scale is None else scale
    gamma = 1.0 / (2.0 * sigma**2)
    n, m = x.shape[0], y.shape[0]
    kxx = jnp.exp(-gamma * _sq_dists(x, x))
    kyy = jnp.exp(-gamma * _sq_dists(y, y))
    kxy = jnp.exp(-gamma * _sq_dists(x, y))
    sum_xx = (kxx.sum() - jnp.trace(kxx)) / (n * (n - 1))
    sum_yy = (kyy.sum() - jnp.trace(kyy)) / (m * (m - 1))
    sum_xy = kxy.mean()
    return sum_xx + sum_yy - 2 * sum_xy


def biased_mmd(x: Array, y: Array, scale: Optional[float] = None) -> Array:
    x, y = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    sigma = _median_heuristic(x, y) if scale is None else scale
    gamma = 1.0 / (2.0 * sigma**2)
    kxx = jnp.exp(-gamma * _sq_dists(x, x)).mean()
    kyy = jnp.exp(-gamma * _sq_dists(y, y)).mean()
    kxy = jnp.exp(-gamma * _sq_dists(x, y)).mean()
    return jnp.sqrt(jnp.clip(kxx + kyy - 2 * kxy, 0.0))


def mmd(x, y, scale=None, squared: bool = False):
    out = unbiased_mmd_squared(x, y, scale)
    return out if squared else jnp.sqrt(jnp.clip(out, 0.0))


def biased_mmd_hypothesis_test(x: Array, y: Array, alpha: float = 0.05):
    """(mmd, threshold) pair for the biased-MMD two-sample test
    (ref `sbi/utils/metrics.py:277-282`); mmd < threshold accepts H0."""
    assert x.shape[0] == y.shape[0]
    mmd_biased = float(biased_mmd(x, y))
    threshold = np.sqrt(2 / x.shape[0]) * (1 + np.sqrt(-2 * np.log(alpha)))
    return mmd_biased, threshold


def unbiased_mmd_squared_hypothesis_test(x: Array, y: Array, alpha: float = 0.05):
    """(mmd^2, threshold) for the unbiased-MMD^2 two-sample test
    (ref `sbi/utils/metrics.py:285-290`)."""
    assert x.shape[0] == y.shape[0]
    mmd_square_unbiased = float(unbiased_mmd_squared(x, y))
    threshold = (4 / np.sqrt(x.shape[0])) * np.sqrt(-np.log(alpha))
    return mmd_square_unbiased, threshold


# ---------------------------------------------------------------------------
# Sinkhorn Wasserstein-2 — ref `sbi/utils/metrics.py:293`
# ---------------------------------------------------------------------------


def wasserstein_2_squared(
    x: Array, y: Array, epsilon: float = 1e-1, max_iter: int = 1000, tol: float = 1e-9
) -> Array:
    """Entropy-regularized W2^2 via log-domain Sinkhorn (jitted fixed loop).

    Mirror of `sbi/utils/metrics.py:293-438`: accepts (m, d)/(n, d) or
    batched (B, m, d)/(B, n, d) inputs and returns () or (B,). The dual
    (log-sum-exp) updates stay finite for any cost scale — a kernel-domain
    `exp(-C/eps)` underflows to an all-zero coupling on well-separated
    samples, silently reporting distance 0.
    """
    x, y = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    assert x.ndim == y.ndim, "x and y must both be batched or both unbatched"
    batched = x.ndim == 3
    if not batched:
        x, y = x[None], y[None]
    n, m = x.shape[1], y.shape[1]
    C = jnp.sum((x[:, :, None, :] - y[:, None, :, :]) ** 2, axis=-1)  # (B, n, m)
    log_a = jnp.full((n,), -jnp.log(n))
    log_b = jnp.full((m,), -jnp.log(m))

    def body(carry, _):
        f, g = carry
        # f_i = -eps * LSE_j[(g_j - C_ij)/eps + log b_j], and symmetrically.
        f = -epsilon * jax.scipy.special.logsumexp(
            (g[:, None, :] - C) / epsilon + log_b[None, None, :], axis=2
        )
        g = -epsilon * jax.scipy.special.logsumexp(
            (f[:, :, None] - C) / epsilon + log_a[None, :, None], axis=1
        )
        return (f, g), None

    init = (jnp.zeros((x.shape[0], n)), jnp.zeros((x.shape[0], m)))
    (f, g), _ = jax.lax.scan(body, init, None, length=max_iter)
    log_P = (
        (f[:, :, None] + g[:, None, :] - C) / epsilon
        + log_a[None, :, None]
        + log_b[None, None, :]
    )
    out = jnp.sum(jnp.exp(log_P) * C, axis=(1, 2))
    return out if batched else out[0]


# ---------------------------------------------------------------------------
# Posterior quality scalars — ref `sbi/utils/metrics.py:426,468`
# ---------------------------------------------------------------------------


def posterior_shrinkage(prior_samples: Array, post_samples: Array) -> Array:
    prior_var = jnp.var(jnp.asarray(prior_samples, jnp.float32), axis=0)
    post_var = jnp.var(jnp.asarray(post_samples, jnp.float32), axis=0)
    return 1.0 - post_var / prior_var


def posterior_zscore(true_theta: Array, post_samples: Array) -> Array:
    post_samples = jnp.asarray(post_samples, jnp.float32)
    true_theta = jnp.asarray(true_theta, jnp.float32).reshape(-1)
    return jnp.abs((jnp.mean(post_samples, 0) - true_theta) / jnp.std(post_samples, 0))


# ---------------------------------------------------------------------------
# ABC distances — ref `sbi/utils/metrics.py:543`
# ---------------------------------------------------------------------------


class Distance:
    """Registry of batched distances d(x_o, x_batch) for ABC."""

    CHOICES = ("l2", "l1", "mse")

    def __init__(self, distance: str = "l2", requires_iid_data: bool = False):
        if callable(distance):
            self.fn = distance
        else:
            assert distance in self.CHOICES, f"Unknown distance {distance}"
            self.fn = getattr(self, f"_{distance}")
        self.requires_iid_data = requires_iid_data

    def __call__(self, x_o: Array, x: Array) -> Array:
        x_o = jnp.asarray(x_o, jnp.float32).reshape(1, -1)
        x = jnp.asarray(x, jnp.float32).reshape(x.shape[0], -1)
        return self.fn(x_o, x)

    @staticmethod
    def _l2(x_o, x):
        return jnp.sqrt(jnp.sum((x - x_o) ** 2, axis=-1))

    @staticmethod
    def _l1(x_o, x):
        return jnp.sum(jnp.abs(x - x_o), axis=-1)

    @staticmethod
    def _mse(x_o, x):
        return jnp.mean((x - x_o) ** 2, axis=-1)
