"""Pure on-device propagation drivers.

Reference parity: heyoka's ``step_impl`` / ``propagate_until_impl`` /
``propagate_grid_impl`` (``src/taylor_adaptive.cpp:725,1105,1394``) — but as
pure jax functions whose loops are ``lax.while_loop``s: zero host round-trips
per step (the north-star requirement), and a *single* implementation serves
both the scalar integrator and the batch one, because every carry update is
masked with the per-lane ``done`` flag — under ``vmap`` the while_loop runs
all lanes in lockstep until every lane finishes, which is exactly the
semantics of ``taylor_adaptive_batch`` (``src/taylor_adaptive_batch.cpp``).

The integrator time is a double-double ``(hi, lo)`` pair, matching the
reference's dfloat time accumulation (``i_data.hpp``, ``dfloat.cpp``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..dfloat import dd_add_d, dd_add_dd
from .outcome import TaylorOutcome
from . import stepper as _st


class StepFns(NamedTuple):
    """Bundle of the per-system compiled pieces used by the drivers."""

    jet: Callable  # (state, pars, t) -> tc
    order: int
    n_eq: int
    update: Callable  # (tc, h) -> new_state  (horner or ceval)


def make_step_fns(
    tape, order: int, dtype, high_accuracy: bool, compact_mode: bool = False
) -> StepFns:
    if compact_mode:
        # the fori_loop engine (O(groups) graph, ~10x faster compiles and
        # slightly faster runtime) is the default; ops without a dynamic-k
        # rule (dataset interpolants) fall back to the order-unrolled engine;
        # compact_mode="unrolled" forces the latter
        jetf = None
        if compact_mode != "unrolled":
            from .compact_loop import UnsupportedLoopOp, make_jet_fn_compact_loop

            try:
                jetf = make_jet_fn_compact_loop(tape, order, dtype=dtype)
            except UnsupportedLoopOp:
                jetf = None
        if jetf is None:
            from .compact import make_jet_fn_compact

            jetf = make_jet_fn_compact(tape, order, dtype=dtype)
    else:
        from .jet import make_jet_fn

        jetf = make_jet_fn(tape, order, dtype=dtype)
    n_eq = tape.n_eq
    if high_accuracy:
        upd = lambda tc, h: _st.ceval_update(tc, h, order, n_eq)  # noqa: E731
    else:
        upd = lambda tc, h: _st.horner_update(tc, h, order, n_eq)  # noqa: E731
    return StepFns(jetf, order, n_eq, upd)


def single_step(fns: StepFns, state, pars, t_hi, max_dt):
    """One adaptive Taylor step: jet -> h -> state update.

    Returns (new_state, h, tc).  The non-finite check and the
    success/time_limit classification live in the callers (as in
    ``taylor_adaptive.cpp:770-791``).
    """
    tc = fns.jet(state, pars, t_hi)
    h = _st.determine_h(tc, fns.order, fns.n_eq, max_dt)
    new_state = fns.update(tc, h)
    return new_state, h, tc


def step_outcome(new_state, h, max_dt):
    """success / time_limit / err_nf_state classification for one step."""
    finite = jnp.all(jnp.isfinite(new_state)) & jnp.isfinite(h)
    clamped = jnp.abs(h) >= jnp.abs(max_dt)
    out = jnp.where(
        clamped,
        jnp.int32(TaylorOutcome.time_limit),
        jnp.int32(TaylorOutcome.success),
    )
    return jnp.where(finite, out, jnp.int32(TaylorOutcome.err_nf_state))


# ---------------------------------------------------------------------------
# propagate_until
# ---------------------------------------------------------------------------

def make_propagate_until(fns: StepFns, *, step_callback=None):
    """Build ``pu(state, pars, t_hi, t_lo, target_hi, target_lo, max_delta_t,
    max_steps) -> dict`` — on-device propagate-until.

    ``step_callback``, if given, is an in-graph callable
    ``cb(state, pars, t_hi, t_lo, h, tc) -> (state, keep_going)`` executed
    after every accepted step (heyoka's ``step_callback``,
    ``step_callback.hpp``; pre_hook semantics are not needed in-graph).
    """

    def pu(state, pars, t_hi, t_lo, target_hi, target_lo, max_delta_t, max_steps):
        dtype = state.dtype
        zero = jnp.asarray(0.0, dtype)
        inf = jnp.asarray(jnp.inf, dtype)

        def remaining(th, tl):
            rh, _ = dd_add_dd(target_hi, target_lo, -th, -tl)
            return rh

        rem0 = remaining(t_hi, t_lo)
        # direction of propagation; rem0 == 0 -> already there
        fwd = rem0 > zero

        init = dict(
            state=state,
            t_hi=t_hi,
            t_lo=t_lo,
            last_h=zero,
            tc=jnp.zeros((fns.order + 1, fns.n_eq), dtype),
            nsteps=jnp.int64(0),
            min_h=inf,
            max_h=zero,
            outcome=jnp.int32(TaylorOutcome.time_limit),
            done=rem0 == zero,
        )

        def cond(c):
            return ~c["done"]

        def body(c):
            rem = remaining(c["t_hi"], c["t_lo"])
            # per-step cap: min(|remaining|, max_delta_t), signed
            cap = jnp.minimum(jnp.abs(rem), max_delta_t)
            dt = jnp.where(fwd, cap, -cap)

            new_state, h, tc = single_step(
                fns, c["state"], pars, c["t_hi"], dt
            )
            nt_hi, nt_lo = dd_add_d(c["t_hi"], c["t_lo"], h)

            finite = jnp.all(jnp.isfinite(new_state)) & jnp.isfinite(h)

            if step_callback is not None:
                new_state, keep = step_callback(
                    new_state, pars, nt_hi, nt_lo, h, tc
                )
                keep = jnp.asarray(keep, bool)
            else:
                keep = jnp.asarray(True)

            nsteps = c["nsteps"] + 1
            rem_after = remaining(nt_hi, nt_lo)
            reached = jnp.where(fwd, rem_after <= zero, rem_after >= zero)

            hit_step_limit = (max_steps > 0) & (nsteps >= max_steps) & ~reached

            outcome = jnp.where(
                ~finite,
                jnp.int32(TaylorOutcome.err_nf_state),
                jnp.where(
                    ~keep,
                    jnp.int32(TaylorOutcome.cb_stop),
                    jnp.where(
                        hit_step_limit,
                        jnp.int32(TaylorOutcome.step_limit),
                        jnp.int32(TaylorOutcome.time_limit),
                    ),
                ),
            )
            done = ~finite | ~keep | hit_step_limit | reached

            # masked carry update: if a lane was already done, keep all old
            # values (required for correct lockstep batch semantics)
            alive = ~c["done"]

            def sel(new, old):
                return jnp.where(alive, new, old)

            abs_h = jnp.abs(h)
            return dict(
                state=sel(new_state, c["state"]),
                t_hi=sel(nt_hi, c["t_hi"]),
                t_lo=sel(nt_lo, c["t_lo"]),
                last_h=sel(h, c["last_h"]),
                tc=jnp.where(alive, tc, c["tc"]),
                nsteps=sel(nsteps, c["nsteps"]),
                min_h=sel(jnp.minimum(c["min_h"], abs_h), c["min_h"]),
                max_h=sel(jnp.maximum(c["max_h"], abs_h), c["max_h"]),
                outcome=sel(outcome, c["outcome"]),
                done=sel(done, c["done"]),
            )

        return lax.while_loop(cond, body, init)

    return pu


# ---------------------------------------------------------------------------
# propagate_grid
# ---------------------------------------------------------------------------

def make_propagate_grid(fns: StepFns, *, step_callback=None):
    """Build ``pg(state, pars, t_hi, t_lo, grid, max_delta_t, max_steps)``.

    Dense-output sampling over a monotonic time grid
    (``propagate_grid_impl``, ``taylor_adaptive.cpp:1394``): one adaptive step
    at a time; after each step, every grid point inside the step's span is
    evaluated with the Horner dense-output kernel.  The grid-filling inner
    loop is a ``lax.while_loop`` with dynamic indexing — fully on-device.
    """

    def pg(state, pars, t_hi, t_lo, grid, max_delta_t, max_steps):
        dtype = state.dtype
        zero = jnp.asarray(0.0, dtype)
        inf = jnp.asarray(jnp.inf, dtype)
        ngrid = grid.shape[0]
        target = grid[-1]

        fwd = target - t_hi >= zero

        out0 = jnp.zeros((ngrid, fns.n_eq), dtype)

        # grid points exactly at the current time resolve to the current state
        def fill_t0_cond(c):
            gi, _ = c
            return (gi < ngrid) & (grid[jnp.minimum(gi, ngrid - 1)] == t_hi)

        def fill_t0_body(c):
            gi, out = c
            out = lax.dynamic_update_slice(out, state[None, :], (gi, 0))
            return gi + 1, out

        gi0, out0 = lax.while_loop(fill_t0_cond, fill_t0_body, (jnp.int64(0), out0))

        init = dict(
            state=state,
            t_hi=t_hi,
            t_lo=t_lo,
            last_h=zero,
            tc=jnp.zeros((fns.order + 1, fns.n_eq), dtype),
            nsteps=jnp.int64(0),
            min_h=inf,
            max_h=zero,
            outcome=jnp.int32(TaylorOutcome.time_limit),
            done=gi0 >= ngrid,
            gi=gi0,
            out=out0,
        )

        def cond(c):
            return ~c["done"]

        def body(c):
            rem = target - c["t_hi"]
            cap = jnp.minimum(jnp.abs(rem), max_delta_t)
            dt = jnp.where(fwd, cap, -cap)

            new_state, h, tc = single_step(fns, c["state"], pars, c["t_hi"], dt)
            t_prev_hi, t_prev_lo = c["t_hi"], c["t_lo"]
            nt_hi, nt_lo = dd_add_d(t_prev_hi, t_prev_lo, h)

            finite = jnp.all(jnp.isfinite(new_state)) & jnp.isfinite(h)

            if step_callback is not None:
                new_state, keep = step_callback(new_state, pars, nt_hi, nt_lo, h, tc)
                keep = jnp.asarray(keep, bool)
            else:
                keep = jnp.asarray(True)

            # fill all grid points with |grid[gi]| inside (t_prev, t_new]
            def gcond(g):
                gi, _ = g
                inb = jnp.where(
                    fwd,
                    grid[jnp.minimum(gi, ngrid - 1)] <= nt_hi,
                    grid[jnp.minimum(gi, ngrid - 1)] >= nt_hi,
                )
                return (gi < ngrid) & inb & finite

            def gbody(g):
                gi, out = g
                # evaluation time relative to the step start, in dd precision
                rel, _ = dd_add_dd(
                    grid[gi], zero, -t_prev_hi, -t_prev_lo
                )
                vals = _st.dense_output(tc, rel, fns.order)[: fns.n_eq]
                out = lax.dynamic_update_slice(out, vals[None, :], (gi, 0))
                return gi + 1, out

            gi, out = lax.while_loop(gcond, gbody, (c["gi"], c["out"]))

            nsteps = c["nsteps"] + 1
            reached = gi >= ngrid
            hit_step_limit = (max_steps > 0) & (nsteps >= max_steps) & ~reached

            outcome = jnp.where(
                ~finite,
                jnp.int32(TaylorOutcome.err_nf_state),
                jnp.where(
                    ~keep,
                    jnp.int32(TaylorOutcome.cb_stop),
                    jnp.where(
                        hit_step_limit,
                        jnp.int32(TaylorOutcome.step_limit),
                        jnp.int32(TaylorOutcome.time_limit),
                    ),
                ),
            )
            done = ~finite | ~keep | hit_step_limit | reached

            alive = ~c["done"]

            def sel(new, old):
                return jnp.where(alive, new, old)

            abs_h = jnp.abs(h)
            return dict(
                state=sel(new_state, c["state"]),
                t_hi=sel(nt_hi, c["t_hi"]),
                t_lo=sel(nt_lo, c["t_lo"]),
                last_h=sel(h, c["last_h"]),
                tc=jnp.where(alive, tc, c["tc"]),
                nsteps=sel(nsteps, c["nsteps"]),
                min_h=sel(jnp.minimum(c["min_h"], abs_h), c["min_h"]),
                max_h=sel(jnp.maximum(c["max_h"], abs_h), c["max_h"]),
                outcome=sel(outcome, c["outcome"]),
                done=sel(done, c["done"]),
                gi=sel(gi, c["gi"]),
                out=jnp.where(alive, out, c["out"]),
            )

        return lax.while_loop(cond, body, init)

    return pg
