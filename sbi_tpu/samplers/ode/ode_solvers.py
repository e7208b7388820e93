"""Neural-ODE solving + CNF log-prob.

JAX counterpart of `sbi/samplers/ode_solvers/` (NeuralODE ABC `base.py:36`,
zuko CNF adapter `zuko_ode.py:19-126`). In-repo fixed-grid RK4 (TPU-friendly
static shapes; adaptive stepping buys little for these small smooth fields)
with exact divergence via per-sample `jax.jacfwd` — exact log-probs for the
low-dim theta spaces of SBI, Hutchinson available for high-dim.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ...utils.sbiutils import next_key

Array = jax.Array


def rk4_step(f: Callable, z: Array, t0: Array, dt: Array) -> Array:
    k1 = f(z, t0)
    k2 = f(z + 0.5 * dt * k1, t0 + 0.5 * dt)
    k3 = f(z + 0.5 * dt * k2, t0 + 0.5 * dt)
    k4 = f(z + dt * k3, t0 + dt)
    return z + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


def odeint_rk4(f: Callable, z0: Array, t0: float, t1: float, num_steps: int = 64) -> Array:
    """Integrate dz/dt = f(z, t) from t0 to t1 on a fixed grid."""
    ts = jnp.linspace(t0, t1, num_steps + 1)

    def body(z, i):
        return rk4_step(f, z, ts[i], ts[i + 1] - ts[i]), None

    z, _ = jax.lax.scan(body, z0, jnp.arange(num_steps))
    return z


def odeint_with_logdet(
    f: Callable,
    z0: Array,
    t0: float,
    t1: float,
    num_steps: int = 64,
    exact: bool = True,
    key: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """CNF flow with instantaneous change of variables:
    d log p / dt = -div f. Returns (z(t1), integral of div f)."""
    D = z0.shape[-1]

    if exact:
        def div_f(z, t):
            # z: (B, D) -> divergence per sample via per-sample jacobian
            def single(zi):
                J = jax.jacfwd(lambda u: f(u[None], t)[0])(zi)
                return jnp.trace(J)

            return jax.vmap(single)(z)
    else:
        eps = jax.random.normal(next_key(key), z0.shape)

        def div_f(z, t):
            # Hutchinson estimator with fixed probe
            _, jvp = jax.jvp(lambda u: f(u, t), (z,), (eps,))
            return jnp.sum(jvp * eps, axis=-1)

    def aug(state, t):
        z, _ = state
        return (f(z, t), div_f(z, t))

    ts = jnp.linspace(t0, t1, num_steps + 1)

    def body(state, i):
        z, ld = state
        dt = ts[i + 1] - ts[i]
        t = ts[i]
        # RK4 on the augmented system
        k1z, k1l = aug((z, ld), t)
        k2z, k2l = aug((z + 0.5 * dt * k1z, ld), t + 0.5 * dt)
        k3z, k3l = aug((z + 0.5 * dt * k2z, ld), t + 0.5 * dt)
        k4z, k4l = aug((z + dt * k3z, ld), t + dt)
        z = z + dt / 6.0 * (k1z + 2 * k2z + 2 * k3z + k4z)
        ld = ld + dt / 6.0 * (k1l + 2 * k2l + 2 * k3l + k4l)
        return (z, ld), None

    (z, logdet), _ = jax.lax.scan(
        body, (z0, jnp.zeros(z0.shape[0])), jnp.arange(num_steps)
    )
    return z, logdet


class NeuralODE:
    """Lazy CNF distribution over theta given an ODE velocity field
    (ref `base.py:36`): time t_dir_start -> t_dir_end maps noise -> data."""

    def __init__(
        self,
        ode_fn: Callable,  # (z (B,D), t scalar) -> (B, D)
        input_transform,
        dim: int,
        t_noise: float,
        t_data: float,
        num_steps: int = 64,
        noise_std: float = 1.0,
    ):
        self.ode_fn = ode_fn
        self.input_transform = input_transform
        self.dim = dim
        self.t_noise = t_noise
        self.t_data = t_data
        self.num_steps = num_steps
        self.noise_std = noise_std

    def sample(self, key: Array, num_samples: int) -> Array:
        z0 = self.noise_std * jax.random.normal(key, (num_samples, self.dim))
        z1 = odeint_rk4(self.ode_fn, z0, self.t_noise, self.t_data, self.num_steps)
        return self.input_transform.inverse(z1)

    def log_prob(self, theta: Array) -> Array:
        z1, ldj_t = self.input_transform.forward_and_log_det(theta)
        z0, logdet = odeint_with_logdet(
            self.ode_fn, z1, self.t_data, self.t_noise, self.num_steps
        )
        base_lp = jnp.sum(
            -0.5 * (z0 / self.noise_std) ** 2
            - jnp.log(self.noise_std)
            - 0.5 * jnp.log(2 * jnp.pi),
            axis=-1,
        )
        # Integrating backward accumulates +div; log p(data) = base + logdet.
        return base_lp + logdet + ldj_t


def build_neural_ode(
    estimator, condition: Array, num_steps: int = 64, params=None
) -> NeuralODE:
    """Factory (ref `ode_builder.py:14`): CNF over theta | condition.

    ``params``/``condition`` may be tracers (call under ``jax.jit`` with
    explicit params to keep the compiled CNF reusable across param updates).
    """
    est = estimator
    cond_z = est._embed_condition(jnp.atleast_2d(condition))
    params = est.params if params is None else params

    def f(z, t):
        cz = jnp.broadcast_to(cond_z[:1], (z.shape[0],) + cond_z.shape[1:])
        return est.ode_z_fn(params, z, cz, t)

    if est.SDE_DEFINED:
        # score-based: time runs t_max (noise) -> t_min (data)
        t_noise, t_data = est.t_max, est.t_min
        # Keep as an array scalar: under jit tracing even constant-array
        # computations are staged, so float() would raise.
        noise_std = est.std_fn(jnp.asarray([est.t_max]))[0]
    else:
        # flow matching: 0 (noise) -> 1 (data)
        t_noise, t_data = est.t_min, est.t_max
        noise_std = 1.0
    return NeuralODE(
        ode_fn=f,
        input_transform=est.input_transform,
        dim=est.input_shape[0],
        t_noise=t_noise,
        t_data=t_data,
        num_steps=num_steps,
        noise_std=noise_std,
    )
