"""Conditional density evaluation and correlation.

JAX counterpart of `sbi/analysis/conditional_density.py:29,110,189`
(eval_conditional_density, conditional_corrcoeff, ConditionedMDN) +
`sbi/utils/conditional_density_utils.py`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..neural_nets.estimators.mdn import MixtureDensityEstimator, MoG
from ..utils.sbiutils import ensure_theta_batched

Array = jax.Array


def _density_log_prob(density, theta, condition=None):
    """Dispatch: posterior-like objects take x=, estimators take condition."""
    if hasattr(density, "log_prob"):
        try:
            return density.log_prob(theta, x=condition)
        except TypeError:
            return density.log_prob(theta)
    raise TypeError(f"Cannot evaluate density of type {type(density)}")


def eval_conditional_density(
    density,
    condition: Array,
    limits: Array,
    dim1: int,
    dim2: int,
    resolution: int = 50,
    eps_margins1: float = 1e-32,
    eps_margins2: float = 1e-32,
    return_raw_log_prob: bool = False,
    return_grids: bool = False,
):
    """Evaluate p(theta_dim1, theta_dim2 | rest = condition) on a grid.

    condition: (1, D) full parameter vector supplying the conditioned dims.
    Returns normalized probs (resolution,) if dim1==dim2 else
    (resolution, resolution). Ref `conditional_density.py:29`.
    """
    condition = jnp.atleast_2d(jnp.asarray(condition, jnp.float32))
    limits = jnp.asarray(limits, jnp.float32)
    if limits.ndim == 1:
        limits = jnp.tile(limits, (condition.shape[1], 1))

    grid1 = jnp.linspace(limits[dim1][0] + eps_margins1,
                         limits[dim1][1] - eps_margins1, resolution)
    if dim1 == dim2:
        thetas = jnp.tile(condition, (resolution, 1)).at[:, dim1].set(grid1)
        lp = _density_log_prob(density, thetas, condition=None)
        lp = lp - jax.scipy.special.logsumexp(lp)
        probs = jnp.exp(lp)
        probs = probs / probs.sum()
        if return_raw_log_prob:
            return lp, grid1
        return probs * resolution / (limits[dim1][1] - limits[dim1][0]), grid1

    grid2 = jnp.linspace(limits[dim2][0] + eps_margins2,
                         limits[dim2][1] - eps_margins2, resolution)
    G1, G2 = jnp.meshgrid(grid1, grid2, indexing="ij")
    thetas = jnp.tile(condition, (resolution * resolution, 1))
    thetas = thetas.at[:, dim1].set(G1.ravel()).at[:, dim2].set(G2.ravel())
    lp = _density_log_prob(density, thetas, condition=None).reshape(
        resolution, resolution
    )
    lp = lp - jax.scipy.special.logsumexp(lp)
    probs = jnp.exp(lp)
    probs = probs / probs.sum()
    if return_grids:
        return probs, (grid1, grid2)
    return probs, (grid1, grid2) if return_raw_log_prob else probs


def conditional_corrcoeff(
    density,
    limits: Array,
    condition: Array,
    subset: Optional[Sequence[int]] = None,
    resolution: int = 50,
) -> Array:
    """Average conditional correlation matrix over conditions
    (ref `conditional_density.py:110`)."""
    condition = jnp.atleast_2d(jnp.asarray(condition, jnp.float32))
    D = condition.shape[1]
    dims = list(subset) if subset is not None else list(range(D))
    n = len(dims)
    limits = jnp.asarray(limits, jnp.float32)
    if limits.ndim == 1:
        limits = jnp.tile(limits, (D, 1))

    mats = []
    for c in range(condition.shape[0]):
        mat = np.eye(n)
        for i in range(n):
            for j in range(i + 1, n):
                di, dj = dims[i], dims[j]
                probs, (g1, g2) = eval_conditional_density(
                    density, condition[c][None], limits, di, dj,
                    resolution=resolution, return_grids=True,
                )
                probs = np.asarray(probs)
                probs = probs / probs.sum()
                m1 = (probs.sum(axis=1) * np.asarray(g1)).sum()
                m2 = (probs.sum(axis=0) * np.asarray(g2)).sum()
                v1 = (probs.sum(axis=1) * (np.asarray(g1) - m1) ** 2).sum()
                v2 = (probs.sum(axis=0) * (np.asarray(g2) - m2) ** 2).sum()
                cov = (
                    probs
                    * np.outer(np.asarray(g1) - m1, np.asarray(g2) - m2)
                ).sum()
                rho = cov / np.sqrt(v1 * v2 + 1e-30)
                mat[i, j] = mat[j, i] = rho
        mats.append(mat)
    return jnp.asarray(np.mean(mats, axis=0), jnp.float32)


class ConditionedMDN:
    """Analytically condition an MDN on a subset of theta dims
    (ref `conditional_density.py:189`): Gaussian conditionals are closed-form.
    """

    def __init__(
        self,
        mdn: MixtureDensityEstimator,
        x_o: Array,
        condition: Array,
        dims_to_sample: Sequence[int],
    ):
        self.dims_to_sample = list(dims_to_sample)
        mog = mdn.get_uncorrected_mog(jnp.atleast_2d(x_o))
        tr = mdn.input_transform
        D = mdn.input_shape[0]
        scale = getattr(tr, "scale", jnp.ones(D))
        loc = getattr(tr, "loc", jnp.zeros(D))
        cond_z = (jnp.asarray(condition, jnp.float32).reshape(-1) - loc) / scale

        keep = jnp.asarray(self.dims_to_sample)
        rest = jnp.asarray([d for d in range(D) if d not in self.dims_to_sample])

        logits, means, precs = mog.logits, mog.means, mog.precisions
        covs = jnp.linalg.inv(precs)  # (1, K, D, D)
        # Gaussian conditional: mu_a|b = mu_a + C_ab C_bb^-1 (b - mu_b)
        mu_a = means[:, :, keep]
        mu_b = means[:, :, rest]
        C_aa = covs[:, :, keep][:, :, :, keep]
        C_ab = covs[:, :, keep][:, :, :, rest]
        C_bb = covs[:, :, rest][:, :, :, rest]
        b = cond_z[rest]
        sol = jnp.linalg.solve(C_bb, (b - mu_b)[..., None])[..., 0]
        mu_cond = mu_a + jnp.einsum("bkij,bkj->bki", C_ab, sol)
        C_cond = C_aa - jnp.einsum(
            "bkij,bkjl->bkil", C_ab, jnp.linalg.solve(C_bb, jnp.swapaxes(C_ab, -1, -2))
        )
        # weight update: w_k * N(b; mu_b, C_bb)
        diff = b - mu_b
        solb = jnp.linalg.solve(C_bb, diff[..., None])[..., 0]
        quad = jnp.einsum("bki,bki->bk", diff, solb)
        _, logdet = jnp.linalg.slogdet(C_bb)
        log_w = jax.nn.log_softmax(logits, -1) - 0.5 * (
            quad + logdet + len(rest) * jnp.log(2 * jnp.pi)
        )
        prec_cond = jnp.linalg.inv(C_cond)
        self.mog = MoG(log_w, mu_cond, jnp.linalg.cholesky(prec_cond))
        self._scale = scale[keep]
        self._loc = loc[keep]

    def sample(self, sample_shape=(), key=None) -> Array:
        from ..utils.sbiutils import next_key

        num = 1
        for s in sample_shape:
            num *= int(s)
        z = self.mog.sample(next_key(key), num)[:, 0, :]
        theta = z * self._scale + self._loc
        return theta.reshape(tuple(sample_shape) + (len(self.dims_to_sample),))

    def log_prob(self, theta: Array) -> Array:
        theta = ensure_theta_batched(theta)
        z = (theta - self._loc) / self._scale
        lp = self.mog.log_prob(z) - jax.scipy.special.logsumexp(
            self.mog.logits, axis=-1
        )
        return lp - jnp.sum(jnp.log(self._scale))


def conditional_potential(potential_fn, theta_transform, prior, condition,
                          dims_to_sample):
    """Condition a potential on fixed dims (ref analysis __init__ export)."""
    condition = jnp.asarray(condition, jnp.float32).reshape(-1)
    dims = list(dims_to_sample)
    D = condition.shape[0]
    rest = [d for d in range(D) if d not in dims]

    def conditioned(theta_subset):
        theta_subset = ensure_theta_batched(theta_subset)
        B = theta_subset.shape[0]
        full = jnp.tile(condition[None], (B, 1))
        full = full.at[:, jnp.asarray(dims)].set(theta_subset)
        return potential_fn(full)

    return conditioned
