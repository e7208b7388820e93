"""Pallas RQ-spline kernel: numerics vs the jnp reference.

On CPU CI this exercises only the dispatch logic (kernel needs a TPU);
the @tpu-marked test runs the kernel itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_tpu.neural_nets.estimators.flows import rational_quadratic_spline
from sbi_tpu.ops.rqs_pallas import pallas_available


def _data(B=512, D=4, K=10, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.uniform(ks[0], (B, D), minval=-4, maxval=4)
    w = jax.random.normal(ks[1], (B, D, K))
    h = jax.random.normal(ks[2], (B, D, K))
    d = jax.random.normal(ks[3], (B, D, K - 1))
    return x, w, h, d


def test_dispatch_safe_on_cpu():
    """use_pallas=None on CPU must fall back to the jnp path."""
    assert not pallas_available()
    x, w, h, d = _data()
    y, ld = rational_quadratic_spline(x, w, h, d)
    assert bool(jnp.isfinite(y).all()) and bool(jnp.isfinite(ld).all())


def test_spline_roundtrip_jnp():
    x, w, h, d = _data()
    y, ld = rational_quadratic_spline(x, w, h, d, inverse=False, use_pallas=False)
    back, ild = rational_quadratic_spline(y, w, h, d, inverse=True, use_pallas=False)
    assert np.allclose(np.asarray(back), np.asarray(x), atol=1e-3)
    assert np.allclose(np.asarray(ld + ild), 0.0, atol=5e-3)


@pytest.mark.tpu
def test_pallas_matches_jnp():
    if not pallas_available():
        pytest.skip("needs TPU")
    from sbi_tpu.ops.rqs_pallas import rational_quadratic_spline_pallas

    x, w, h, d = _data(B=4096, D=8)
    for inv in (False, True):
        y_ref, ld_ref = rational_quadratic_spline(
            x, w, h, d, inverse=inv, use_pallas=False
        )
        y_pal, ld_pal = rational_quadratic_spline_pallas(x, w, h, d, inv, 3.0)
        assert np.allclose(np.asarray(y_ref), np.asarray(y_pal), atol=1e-3)
        assert np.allclose(np.asarray(ld_ref), np.asarray(ld_pal), atol=1e-2)

    # gradients must match exactly (custom VJP routes through the jnp path)
    g_pal = jax.grad(
        lambda w_: rational_quadratic_spline_pallas(x, w_, h, d, False, 3.0)[1].sum()
    )(w)
    g_ref = jax.grad(
        lambda w_: rational_quadratic_spline(
            x, w_, h, d, inverse=False, use_pallas=False
        )[1].sum()
    )(w)
    assert np.allclose(np.asarray(g_pal), np.asarray(g_ref), atol=1e-5)
