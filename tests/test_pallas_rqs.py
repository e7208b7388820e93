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


def _member_data(M=8, B=64, D=4, K=10, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.uniform(ks[0], (M, B, D), minval=-4, maxval=4)
    w = jax.random.normal(ks[1], (M, B, D, K))
    h = jax.random.normal(ks[2], (M, B, D, K))
    d = jax.random.normal(ks[3], (M, B, D, K - 1))
    return x, w, h, d


def _check_vmapped_kernel():
    """vmap over a member axis must merge into ONE pallas_call (custom_vmap
    rule, `ops/rqs_pallas.py::_rqs_flat_fn`) — pallas auto-batching
    Mosaic-faulted on wide-vmapped NSF (round-3 known gap)."""
    from sbi_tpu.ops.rqs_pallas import rational_quadratic_spline_pallas

    x, w, h, d = _member_data()
    for inv in (False, True):
        y_ref, ld_ref = rational_quadratic_spline(
            x, w, h, d, inverse=inv, use_pallas=False
        )
        y, ld = jax.vmap(
            lambda *a: rational_quadratic_spline_pallas(*a, inv, 3.0)
        )(x, w, h, d)
        assert np.allclose(np.asarray(y), np.asarray(y_ref), atol=1e-3)
        assert np.allclose(np.asarray(ld), np.asarray(ld_ref), atol=1e-2)

    # the ensemble-training composition: jit(vmap(grad(loss)))
    def loss(x_, w_, h_, d_):
        y, ld = rational_quadratic_spline_pallas(x_, w_, h_, d_, False, 3.0)
        return (y**2).sum() + ld.sum()

    g = jax.jit(jax.vmap(jax.grad(loss, argnums=1)))(x, w, h, d)
    g_ref = jax.vmap(
        jax.grad(
            lambda x_, w_, h_, d_: (
                lambda y, ld: (y**2).sum() + ld.sum()
            )(*rational_quadratic_spline(x_, w_, h_, d_, use_pallas=False)),
            argnums=1,
        )
    )(x, w, h, d)
    assert np.allclose(np.asarray(g), np.asarray(g_ref), atol=1e-3)

    # nested vmap (member x chain) also merges
    x2, w2, h2, d2 = (a.reshape((2, 4) + a.shape[1:]) for a in (x, w, h, d))
    y2, _ = jax.vmap(
        jax.vmap(lambda *a: rational_quadratic_spline_pallas(*a, False, 3.0))
    )(x2, w2, h2, d2)
    y_ref, _ = rational_quadratic_spline(x, w, h, d, use_pallas=False)
    assert np.allclose(
        np.asarray(y2.reshape(y_ref.shape)), np.asarray(y_ref), atol=1e-3
    )


def test_vmapped_kernel_interpret(monkeypatch):
    """CPU: run the kernel in pallas interpret mode to pin the custom_vmap
    merge rule without TPU hardware."""
    monkeypatch.setenv("SBI_TPU_PALLAS_INTERPRET", "1")
    _check_vmapped_kernel()


@pytest.mark.tpu
def test_vmapped_kernel_tpu():
    if not pallas_available():
        pytest.skip("needs TPU")
    _check_vmapped_kernel()
