"""mini-sbibm benchmark package (counterpart of `tests/mini_sbibm/` in the
reference): tasks with pre-computed reference observations + posterior
samples, used by the --bm benchmark harness."""

from .base_task import BenchTask, get_bench_task

ALL_BENCH_TASKS = (
    "two_moons",
    "linear_mvg_2d",
    "gaussian_linear",
    "slcp",
    "gaussian_mixture",
)

__all__ = ["BenchTask", "get_bench_task", "ALL_BENCH_TASKS"]
