"""Run the deep tutorials verbatim at full budget, generating docs/figures/.

CPU-forced so it never contends with TPU experiment queues; the tutorials'
budgets are sized to finish in minutes on host cores.

    python -u scripts/run_deep_tutorials.py            # all five
    python -u scripts/run_deep_tutorials.py 00 03      # by prefix
"""

import os
import sys
import time

# 06_scaling_tpu_mesh.md wants multiple devices; request 8 virtual CPU
# devices before the backend initializes (harmless for the other tutorials).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))

from tutorial_blocks import DEEP_TUTORIALS, REPO_ROOT, run_tutorial  # noqa: E402


def main():
    os.chdir(REPO_ROOT)
    os.makedirs(os.path.join(REPO_ROOT, "docs", "figures"), exist_ok=True)
    prefixes = sys.argv[1:]
    for name in DEEP_TUTORIALS:
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        t0 = time.time()
        print(f"=== {name}", flush=True)
        run_tutorial(name)
        print(f"=== {name} done ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
