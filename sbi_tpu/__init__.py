"""sbi_tpu — TPU-native simulation-based inference (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of `sbi` (sbi-dev/sbi v0.26.1)
for TPU hardware: density estimators and flows are jitted flax modules,
trainers compile to on-device training loops, samplers run thousands of
vmapped chains on-chip, and diagnostics batch across the device mesh.

Canonical 4-line API (matches the reference, README.md:63-69):

    from sbi_tpu.inference import NPE
    inference = NPE(prior=prior)
    inference.append_simulations(theta, x).train()
    posterior = inference.build_posterior()
"""

__version__ = "0.1.0"

from . import utils  # noqa: F401
from .utils.sbiutils import seed_all_backends  # noqa: F401
