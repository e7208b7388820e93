from .linear_gaussian import (
    diagonal_linear_gaussian,
    linear_gaussian,
    samples_true_posterior_linear_gaussian_mvn_prior_different_dims,
    samples_true_posterior_linear_gaussian_uniform_prior,
    true_posterior_linear_gaussian_mvn_prior,
)
from .tasks import (
    ALL_TASKS,
    Task,
    gaussian_mixture_simulator,
    get_task,
    slcp_log_likelihood,
    slcp_simulator,
    two_moons_reference_samples,
    two_moons_simulator,
)

__all__ = [
    "linear_gaussian",
    "diagonal_linear_gaussian",
    "true_posterior_linear_gaussian_mvn_prior",
    "samples_true_posterior_linear_gaussian_uniform_prior",
    "samples_true_posterior_linear_gaussian_mvn_prior_different_dims",
    "Task",
    "get_task",
    "ALL_TASKS",
    "two_moons_simulator",
    "two_moons_reference_samples",
    "slcp_simulator",
    "slcp_log_likelihood",
    "gaussian_mixture_simulator",
]
