"""Batched-FSM vectorized slice sampler: ONE potential eval per iteration.

This is the reference's `SliceSamplerVectorized` state machine
(`sbi/samplers/mcmc/slice_numpy.py:353-620`: BEGIN/LOWER/UPPER/SAMPLE per
chain, one stacked log-prob call per FSM step) re-formulated as a single
`lax.while_loop` whose carry holds every chain's phase. Unlike the
sweep-structured sampler (`slice_jax.py`), chains never wait at phase or
dimension boundaries: each iteration evaluates the potential ONCE for all
chains at their individual proposal points. For expensive potentials
(flow/classifier forward passes in NLE/NRE) this cuts the number of
batched network evaluations by ~2-3x.

Phases: 0 = stepping out LOWER, 1 = stepping out UPPER, 2 = shrinkage.
Bracket init happens inline at every dim advance (no eval needed — the
current point's log-prob is carried).

TPU performance notes:
- Every per-chain indexed read/write (coordinate select, coordinate
  update, sample recording) is a one-hot masked vector op rather than a
  gather/scatter — dynamic-index scatters serialize on TPU and cost
  ~10ms/iteration at 1k chains, two orders of magnitude above the masked
  form.
- Warmup, on-device width tuning, and the sampling phase are ONE jitted
  program held in a module-level cache keyed on the potential function —
  re-creating the jit wrapper per call would re-trace/lower every
  invocation (~10s fixed overhead per sample() call observed on TPU).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.sbiutils import next_key

Array = jax.Array

_LOWER, _UPPER, _SHRINK = 0, 1, 2


def _fsm_phase(
    potential_fn,
    key,
    widths,
    inits,
    n_record,
    n_skip,
    max_steps_out,
    max_shrink,
    max_total,
):
    """One FSM phase: record `n_record` sweeps per chain after skipping
    `n_skip` (n_skip is a traced value; only shapes are static)."""
    C, D = inits.shape
    lp0 = potential_fn(inits)

    def coord(x, onehot):
        """x[c, dim[c]] for all chains via one-hot contraction."""
        return (x * onehot).sum(-1)

    def init_bracket(x, onehot, lp, k):
        """Draw slice level + initial bracket for coordinate `dim`."""
        k1, k2, k3 = jax.random.split(k, 3)
        log_y = lp - jax.random.exponential(k1, lp.shape)
        xi = coord(x, onehot)
        w = (widths[None, :] * onehot).sum(-1)
        u = jax.random.uniform(k2, xi.shape)
        lx = xi - u * w
        ux = lx + w
        return log_y, lx, ux, k3

    key0, k_init = jax.random.split(key)
    log_y, lx, ux, _ = init_bracket(
        inits, jax.nn.one_hot(jnp.zeros(C, jnp.int32), D), lp0, k_init
    )

    state = dict(
        x=inits,
        lp=lp0,
        dim=jnp.zeros(C, jnp.int32),
        phase=jnp.full(C, _LOWER, jnp.int32),
        log_y=log_y,
        lx=lx,
        ux=ux,
        iters=jnp.zeros(C, jnp.int32),       # per-phase iteration counter
        sweeps=jnp.zeros(C, jnp.int32),      # completed sweeps per chain
        key=key0,
        samples=jnp.zeros((n_record, C, D)),
        it_total=jnp.asarray(0, jnp.int32),
    )

    def cond(s):
        return (s["sweeps"].min() < n_skip + n_record) & (
            s["it_total"] < max_total
        )

    def body(s):
        x, lp, dim, phase = s["x"], s["lp"], s["dim"], s["phase"]
        log_y, lx, ux, iters = s["log_y"], s["lx"], s["ux"], s["iters"]
        key = s["key"]
        key, k_prop, k_next = jax.random.split(key, 3)

        # Evaluation point per chain, by phase.
        onehot = jax.nn.one_hot(dim, D)  # (C, D)
        u = jax.random.uniform(k_prop, (C,))
        prop = lx + (ux - lx) * u  # shrinkage proposal
        eval_coord = jnp.where(
            phase == _LOWER, lx, jnp.where(phase == _UPPER, ux, prop)
        )
        x_eval = (x * onehot).sum(-1)
        x_eval_full = x * (1.0 - onehot) + eval_coord[:, None] * onehot
        lp_eval = potential_fn(x_eval_full)  # <-- the ONE batched eval
        above = lp_eval > log_y
        w_dim = (widths[None, :] * onehot).sum(-1)

        # ---- LOWER: expand or move to UPPER ------------------------------
        is_lower = phase == _LOWER
        expand_l = is_lower & above & (iters < max_steps_out)
        new_lx = jnp.where(expand_l, lx - w_dim, lx)
        to_upper = is_lower & ~expand_l

        # ---- UPPER: expand or move to SHRINK -----------------------------
        is_upper = phase == _UPPER
        expand_u = is_upper & above & (iters < max_steps_out)
        new_ux = jnp.where(expand_u, ux + w_dim, ux)
        to_shrink = is_upper & ~expand_u

        # ---- SHRINK: accept / shrink / cap-out ---------------------------
        is_shrink = phase == _SHRINK
        accept = is_shrink & above
        capped = is_shrink & ~above & (iters >= max_shrink)
        shrink_more = is_shrink & ~above & ~capped
        xi0 = x_eval  # current coordinate value
        new_lx = jnp.where(shrink_more & (prop < xi0), prop, new_lx)
        new_ux = jnp.where(shrink_more & (prop >= xi0), prop, new_ux)

        # coordinate update on accept; keep x on cap-out
        new_x = jnp.where(accept[:, None], x_eval_full, x)
        new_lp = jnp.where(accept, lp_eval, lp)

        done_coord = accept | capped
        new_dim = jnp.where(done_coord, (dim + 1) % D, dim)
        finished_sweep = done_coord & (dim == D - 1)

        # record finished sweeps into the buffer (post-skip only) —
        # masked broadcast write over the record axis, not a scatter
        rec_idx = jnp.clip(s["sweeps"] - n_skip, 0, n_record - 1)
        do_rec = finished_sweep & (s["sweeps"] >= n_skip) & (
            s["sweeps"] < n_skip + n_record
        )
        row_mask = (
            jax.nn.one_hot(rec_idx, n_record, dtype=jnp.bool_).T
            & do_rec[None, :]
        )  # (n_record, C)
        samples = jnp.where(
            row_mask[:, :, None], new_x[None, :, :], s["samples"]
        )
        new_sweeps = s["sweeps"] + finished_sweep.astype(jnp.int32)

        # phase transitions
        new_phase = jnp.where(to_upper, _UPPER, phase)
        new_phase = jnp.where(to_shrink, _SHRINK, new_phase)
        new_iters = jnp.where(
            to_upper | to_shrink, 0, iters + (expand_l | expand_u | shrink_more)
        )

        # re-init bracket for chains that finished a coordinate
        k_br = jax.random.fold_in(k_next, 0)
        log_y_new, lx_new, ux_new, _ = init_bracket(
            new_x, jax.nn.one_hot(new_dim, D), new_lp, k_br
        )
        new_log_y = jnp.where(done_coord, log_y_new, log_y)
        new_lx = jnp.where(done_coord, lx_new, new_lx)
        new_ux = jnp.where(done_coord, ux_new, new_ux)
        new_phase = jnp.where(done_coord, _LOWER, new_phase)
        new_iters = jnp.where(done_coord, 0, new_iters)

        return dict(
            x=new_x, lp=new_lp, dim=new_dim, phase=new_phase,
            log_y=new_log_y, lx=new_lx, ux=new_ux, iters=new_iters,
            sweeps=new_sweeps, key=key, samples=samples,
            it_total=s["it_total"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["samples"], out["x"]


@partial(
    jax.jit,
    static_argnames=(
        "potential_fn",
        "n_warm_record",
        "n_record",
        "max_steps_out",
        "max_shrink",
        "tune_width",
    ),
)
def _run_fsm(
    key,
    widths0,
    inits,
    n_warm_skip,
    *,
    potential_fn,
    n_warm_record,
    n_record,
    max_steps_out,
    max_shrink,
    tune_width,
):
    """Warmup + on-device width tuning + sampling as ONE XLA program."""
    C, D = inits.shape
    per_sweep_cap = D * (2 * max_steps_out + max_shrink + 4)
    k_w, k_m = jax.random.split(key)
    x_cur = inits
    widths = widths0
    if n_warm_record > 0:
        warm_cap = (n_warm_record + 1) * 2 * per_sweep_cap
        warm, x_cur = _fsm_phase(
            potential_fn, k_w, widths0, inits, n_warm_record, n_warm_skip,
            max_steps_out, max_shrink, warm_cap,
        )
        if tune_width:
            widths = 2.0 * jnp.std(warm.reshape(-1, D), axis=0) + 1e-3
    main_cap = (n_record + 1) * per_sweep_cap
    draws, _ = _fsm_phase(
        potential_fn, k_m, widths, x_cur, n_record, jnp.int32(0),
        max_steps_out, max_shrink, main_cap,
    )
    return draws


def run_slice_vectorized_fsm(
    potential_fn: Callable[[Array], Array],
    inits: Array,
    num_samples: int,
    thin: int = 1,
    warmup_steps: int = 200,
    init_width: float | Array = 1.0,
    max_steps_out: int = 50,
    max_shrink: int = 100,
    tune_width: bool = True,
    key: Optional[Array] = None,
    max_sweeps_per_program: Optional[int] = None,
) -> Array:
    """Run C chains; return (num_samples, C, D) draws (post warmup+thinning).

    potential_fn: batched (C, D) -> (C,), pure/jittable. Repeated calls with
    the same potential_fn object and shapes reuse the compiled program.

    max_sweeps_per_program bounds the size of any single device program:
    warmup runs once (its own program), then the recording sweeps are taken
    in chunks of at most that many sweeps, with chain state carried between
    programs (see `slice_fsm_warmup`/`slice_fsm_advance`). Use for very
    expensive potentials (e.g. product-of-experts ensembles) where one
    monolithic program would run for minutes on-device.
    """
    key = next_key(key)
    inits = jnp.asarray(inits, jnp.float32)
    C, D = inits.shape
    widths0 = jnp.broadcast_to(jnp.asarray(init_width, jnp.float32), (D,))

    n_total = num_samples * thin
    if max_sweeps_per_program is not None and (
        n_total > max_sweeps_per_program
        or warmup_steps > max_sweeps_per_program
    ):
        k_w, k_m = jax.random.split(key)
        state = slice_fsm_warmup(
            potential_fn, inits, warmup_steps=warmup_steps,
            init_width=init_width, max_steps_out=max_steps_out,
            max_shrink=max_shrink, tune_width=tune_width, key=k_w,
            max_sweeps_per_program=max_sweeps_per_program,
        )
        # Equal-size chunks so every chunk reuses ONE compiled program
        # (a ragged tail would compile a second XLA executable).
        chunk = max_sweeps_per_program
        n_chunks = -(-n_total // chunk)
        parts = []
        for c in range(n_chunks):
            draws_c, state = slice_fsm_advance(
                potential_fn, state, chunk, max_steps_out=max_steps_out,
                max_shrink=max_shrink, key=jax.random.fold_in(k_m, c),
            )
            parts.append(draws_c)
        draws = jnp.concatenate(parts)[:n_total]
    else:
        n_warm_record = max(warmup_steps // 2, 1) if warmup_steps > 0 else 0
        n_warm_skip = warmup_steps - n_warm_record if warmup_steps > 0 else 0
        draws = _run_fsm(
            key,
            widths0,
            inits,
            jnp.int32(n_warm_skip),
            potential_fn=potential_fn,
            n_warm_record=n_warm_record,
            n_record=n_total,
            max_steps_out=max_steps_out,
            max_shrink=max_shrink,
            tune_width=tune_width,
        )
    if thin > 1:
        draws = draws[thin - 1::thin]
    return draws[:num_samples]


# --- Resumable chain state ---------------------------------------------------
#
# The monolithic program above is fastest when it fits, but very expensive
# potentials (PoE ensembles, large iid-trial batches) can push a single
# XLA program into minutes of device time, where a worker preemption or
# kernel fault loses everything. These entry points expose the FSM's
# natural chain state (positions + tuned widths) so callers can warm up
# ONCE and then advance in bounded device programs. No reference
# counterpart (`slice_numpy.py` is host-stepped and trivially resumable).


class SliceFSMState(NamedTuple):
    """Carried chain state: positions (C, D) and slice widths (D,)."""

    x: Array
    widths: Array


@partial(
    jax.jit,
    static_argnames=(
        "potential_fn", "n_warm_record", "max_steps_out", "max_shrink",
        "tune_width",
    ),
)
def _warmup_fsm(
    key, widths0, inits, n_warm_skip, *, potential_fn, n_warm_record,
    max_steps_out, max_shrink, tune_width,
):
    C, D = inits.shape
    per_sweep_cap = D * (2 * max_steps_out + max_shrink + 4)
    warm_cap = (n_warm_record + 1) * 2 * per_sweep_cap
    warm, x_cur = _fsm_phase(
        potential_fn, key, widths0, inits, n_warm_record, n_warm_skip,
        max_steps_out, max_shrink, warm_cap,
    )
    if tune_width:
        widths = 2.0 * jnp.std(warm.reshape(-1, D), axis=0) + 1e-3
    else:
        widths = widths0
    return x_cur, widths


def slice_fsm_warmup(
    potential_fn: Callable[[Array], Array],
    inits: Array,
    warmup_steps: int = 200,
    init_width: float | Array = 1.0,
    max_steps_out: int = 50,
    max_shrink: int = 100,
    tune_width: bool = True,
    key: Optional[Array] = None,
    max_sweeps_per_program: Optional[int] = None,
) -> SliceFSMState:
    """Warm up C chains and return resumable state.

    With ``max_sweeps_per_program`` set and ``warmup_steps`` above it, the
    warmup itself runs as a sequence of bounded device programs (fixed
    initial widths throughout, exactly like the monolithic warmup), with
    chain positions carried between programs and widths tuned once at the
    end from the recorded second half. A warmup on a very expensive
    potential (e.g. a product-of-experts ensemble) is otherwise itself a
    multi-minute single program — the documented TPU-worker fault scenario.
    """
    key = next_key(key)
    inits = jnp.asarray(inits, jnp.float32)
    C, D = inits.shape
    widths0 = jnp.broadcast_to(jnp.asarray(init_width, jnp.float32), (D,))
    if warmup_steps <= 0:
        # No warmup phase: nothing to tune widths from (a (0, D) std is
        # NaN and silently freezes every chain downstream).
        return SliceFSMState(x=inits, widths=widths0)
    n_warm_record = max(warmup_steps // 2, 1)
    n_warm_skip = warmup_steps - n_warm_record
    if (
        max_sweeps_per_program is not None
        and warmup_steps > max_sweeps_per_program
    ):
        # Equal-size chunks so every chunk reuses ONE compiled executable;
        # record every sweep and apply the skip/record split on the host.
        chunk = max_sweeps_per_program
        state = SliceFSMState(x=inits, widths=widths0)
        parts = []
        for c in range(-(-warmup_steps // chunk)):
            draws_c, state = slice_fsm_advance(
                potential_fn, state, chunk, max_steps_out=max_steps_out,
                max_shrink=max_shrink, key=jax.random.fold_in(key, c),
            )
            parts.append(draws_c)
        warm = jnp.concatenate(parts)[:warmup_steps][n_warm_skip:]
        if tune_width:
            widths = 2.0 * jnp.std(warm.reshape(-1, D), axis=0) + 1e-3
        else:
            widths = widths0
        return SliceFSMState(x=state.x, widths=widths)
    x_cur, widths = _warmup_fsm(
        key, widths0, inits, jnp.int32(n_warm_skip),
        potential_fn=potential_fn, n_warm_record=n_warm_record,
        max_steps_out=max_steps_out, max_shrink=max_shrink,
        tune_width=tune_width,
    )
    return SliceFSMState(x=x_cur, widths=widths)


@partial(
    jax.jit,
    static_argnames=("potential_fn", "n_record", "max_steps_out", "max_shrink"),
)
def _advance_fsm(
    key, x, widths, *, potential_fn, n_record, max_steps_out, max_shrink
):
    C, D = x.shape
    per_sweep_cap = D * (2 * max_steps_out + max_shrink + 4)
    cap = (n_record + 1) * per_sweep_cap
    return _fsm_phase(
        potential_fn, key, widths, x, n_record, jnp.int32(0),
        max_steps_out, max_shrink, cap,
    )


def slice_fsm_advance(
    potential_fn: Callable[[Array], Array],
    state: SliceFSMState,
    num_sweeps: int,
    max_steps_out: int = 50,
    max_shrink: int = 100,
    key: Optional[Array] = None,
):
    """Advance warmed chains by `num_sweeps` in ONE bounded device program.

    Returns `(draws, new_state)` with draws of shape (num_sweeps, C, D);
    thinning is the caller's concern (slice the concatenated stream).
    Calls with the same (potential_fn, shapes, num_sweeps) reuse one
    compiled executable.
    """
    key = next_key(key)
    draws, x_new = _advance_fsm(
        key, state.x, state.widths, potential_fn=potential_fn,
        n_record=num_sweeps, max_steps_out=max_steps_out,
        max_shrink=max_shrink,
    )
    return draws, SliceFSMState(x=x_new, widths=state.widths)
