"""Pyro interop (ref `sbi/utils/pyroutils.py:44,192`).

Pyro is torch-based and out of the TPU compute path; these adapters are
provided for users who post-process sbi_tpu posteriors with Pyro on the
host. They require `pyro-ppl` to be installed (optional, like the
reference's dependency)."""

from __future__ import annotations

import numpy as np


def _require_pyro():
    try:
        import pyro  # noqa: F401
        import torch  # noqa: F401
    except ImportError as err:
        raise ImportError(
            "Pyro interop requires `pyro-ppl` (and torch). Install it to use "
            "to_pyro_distribution; no sbi_tpu core functionality needs it."
        ) from err


def to_pyro_distribution(distribution):
    """Wrap an sbi_tpu Distribution as a Pyro/torch distribution whose
    sample/log_prob round-trip through numpy."""
    _require_pyro()
    import torch
    from pyro.distributions import TorchDistribution

    import jax

    class _Wrapped(TorchDistribution):
        arg_constraints = {}

        def __init__(self, dist):
            self._dist = dist
            super().__init__(
                batch_shape=torch.Size(dist.batch_shape),
                event_shape=torch.Size(dist.event_shape),
            )

        def sample(self, sample_shape=torch.Size()):
            key = jax.random.PRNGKey(int(torch.randint(0, 2**31 - 1, ())))
            s = self._dist.sample(key, tuple(sample_shape))
            return torch.as_tensor(np.asarray(s))

        def log_prob(self, value):
            lp = self._dist.log_prob(np.asarray(value.detach().cpu()))
            return torch.as_tensor(np.asarray(lp))

    return _Wrapped(distribution)
