"""Exercise the REAL `TabPFNAdapter` torch path against a mock `tabpfn`
module (VERDICT r3 item 8): the gated branch at
`neural_nets/estimators/tabpfn_flow.py:43-81` — fit, full-output predict,
bar-distribution scoring and sampling through torch tensors — runs end to
end without the optional dependency installed, pinning the adapter
protocol against the artifact's API (ref
`sbi/neural_nets/estimators/tabpfn_flow.py:28,210-314`).
"""

import sys
import types

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

torch = pytest.importorskip("torch")


class _GaussianBarCriterion:
    """Mimics tabpfn's FullSupportBarDistribution surface used by the
    adapter: `.borders` (device-carrying tensor), `__call__(logits, y) ->
    NLL`, `.sample(logits) -> draws`. Backed by a fixed-sigma Gaussian whose
    mean is the (single-logit) regression prediction."""

    def __init__(self, sigma: float):
        self.sigma = float(sigma)
        self.borders = torch.linspace(-10.0, 10.0, 11)  # device anchor only

    def __call__(self, logits, y):
        mean = logits.reshape(-1)
        z = (y.reshape(-1) - mean) / self.sigma
        return 0.5 * z**2 + np.log(self.sigma) + 0.5 * np.log(2 * np.pi)

    def sample(self, logits):
        mean = logits.reshape(-1)
        return mean + self.sigma * torch.randn_like(mean)


class _MockTabPFNRegressor:
    """Linear least-squares stand-in for `tabpfn.TabPFNRegressor` exposing
    the full-output predictive the adapter consumes."""

    def __init__(self, **kwargs):
        self._w = None

    def fit(self, X, y):
        X1 = np.concatenate([X, np.ones((len(X), 1))], axis=1)
        self._w, *_ = np.linalg.lstsq(X1, y, rcond=None)
        resid = y - X1 @ self._w
        self._sigma = max(float(resid.std()), 1e-3)

    def predict(self, Xq, output_type="full", quantiles=()):
        assert output_type == "full"
        X1 = np.concatenate([Xq, np.ones((len(Xq), 1))], axis=1)
        mean = torch.as_tensor(X1 @ self._w, dtype=torch.float32)
        return {
            "criterion": _GaussianBarCriterion(self._sigma),
            "logits": mean.reshape(-1, 1),
        }


@pytest.fixture()
def mock_tabpfn(monkeypatch):
    mod = types.ModuleType("tabpfn")
    mod.TabPFNRegressor = _MockTabPFNRegressor
    monkeypatch.setitem(sys.modules, "tabpfn", mod)
    return mod


def test_tabpfn_available_with_mock(mock_tabpfn):
    from sbi_tpu.neural_nets.estimators.tabpfn_flow import tabpfn_available

    assert tabpfn_available()


def test_tabpfn_adapter_log_prob_and_sample(mock_tabpfn):
    """TabPFNFlow built WITHOUT adapter_factory resolves TabPFNAdapter and
    runs the torch scoring/sampling path; on linear-Gaussian context the
    in-context posterior mean tracks the regression prediction."""
    from sbi_tpu.neural_nets.estimators.tabpfn_flow import TabPFNFlow

    rng = np.random.default_rng(0)
    theta = rng.normal(size=(400, 2)).astype(np.float32)
    x = theta + 0.1 * rng.normal(size=(400, 2)).astype(np.float32)

    est = TabPFNFlow(input_shape=(2,), condition_shape=(2,))
    est.set_context(theta, x)

    x_o = np.array([[0.7, -0.3]], np.float32)
    lp = est.log_prob_fn({}, jnp.asarray(theta[:5])[:, None, :], jnp.asarray(x_o))
    assert lp.shape == (5, 1)
    assert bool(jnp.isfinite(lp).all())

    s = est.sample_fn({}, jr.PRNGKey(0), (200,), jnp.asarray(x_o))
    assert s.shape == (200, 1, 2)
    m = np.asarray(s).reshape(200, 2).mean(0)
    assert np.allclose(m, x_o[0], atol=0.2), m
    # Higher density at the predicted mean than far away.
    lp_near = est.log_prob_fn({}, jnp.asarray(x_o)[:, None, :], jnp.asarray(x_o))
    lp_far = est.log_prob_fn(
        {}, jnp.asarray(x_o + 3.0)[:, None, :], jnp.asarray(x_o)
    )
    assert float(lp_near[0, 0]) > float(lp_far[0, 0])


def test_npe_pfn_pipeline_with_mock_tabpfn(mock_tabpfn):
    """NPE_PFN with NO injected adapter resolves the real TabPFNAdapter."""
    from sbi_tpu.inference import NPE_PFN
    from sbi_tpu.utils.distributions import BoxUniform
    from sbi_tpu.utils.sbiutils import seed_all_backends

    seed_all_backends(0)
    prior = BoxUniform(-2 * jnp.ones(2), 2 * jnp.ones(2))
    theta = prior.sample(jr.PRNGKey(0), (300,))
    x = theta + 0.1 * jr.normal(jr.PRNGKey(1), theta.shape)
    inf = NPE_PFN(prior=prior)
    inf.append_simulations(theta, x).train()
    post = inf.build_posterior()
    s = post.sample((50,), x=jnp.zeros(2), key=jr.PRNGKey(2))
    assert s.shape == (50, 2)
    assert bool(jnp.isfinite(s).all())
