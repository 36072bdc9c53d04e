"""Event detection (terminal & non-terminal events).

Reference parity: heyoka ``t_event``/``nt_event`` (``include/heyoka/events.hpp``),
``ed_data::detect_events`` (``src/detail/event_detection.cpp``): per step, the
Taylor polynomials of the event equations come out of the jet as sv_funcs;
roots inside the step interval [0, h) are isolated and polished, callbacks are
dispatched in chronological order, terminal events truncate the step and
carry a cooldown.

TPU-native design (vs the reference's host-side recursive working list,
``event_detection.cpp:1284-1414``): root isolation runs in-graph as a
fixed-depth vectorized bisection over the Taylor polynomial of each event
equation — interval sign-change counting via the Collins-Akritas bound is
replaced by (a) a fast exclusion check (Cauchy bound on the translated
polynomial, the analog of ``llvm_add_fex_check``, ``event_detection.cpp:704``)
and (b) dense bisection + Newton polishing, all with static shapes.

This module currently provides the event classes and the in-graph detection
for the single-step driver; full cooldown automation follows the reference
(auto-deduced from the error bound, ``event_detection.cpp:519-596``).
"""

from __future__ import annotations

import enum
import math as _pymath
from typing import Callable, Optional

import jax.numpy as jnp

from ..expr.core import Expr, expr


class EventDirection(enum.IntEnum):
    """Trigger direction (heyoka ``event_direction``, events.hpp)."""

    negative = -1  #: trigger on decreasing zero-crossings only
    any = 0
    positive = 1  #: trigger on increasing zero-crossings only


class nt_event:
    """Non-terminal event: detect every zero of ``expression`` along the flow
    and invoke ``callback(ta, t, d_sgn)`` (heyoka ``nt_event``,
    ``events.hpp:52-150``)."""

    def __init__(self, expression, callback: Callable, *, direction=EventDirection.any):
        self.expression: Expr = expr(expression)
        self.callback = callback
        self.direction = EventDirection(int(direction))

    def __repr__(self):
        return f"nt_event({self.expression!r}, direction={self.direction.name})"


class t_event:
    """Terminal event: a zero of ``expression`` stops the step (truncating h
    at the trigger time); optional ``callback(ta, mr, d_sgn) -> bool`` decides
    whether integration continues (heyoka ``t_event``, ``events.hpp:151-309``).

    ``cooldown``: time window after a trigger during which this event is not
    re-detected; ``None`` auto-deduces it (``event_detection.cpp:519-596``).
    """

    def __init__(
        self,
        expression,
        *,
        callback: Optional[Callable] = None,
        cooldown: Optional[float] = None,
        direction=EventDirection.any,
    ):
        self.expression: Expr = expr(expression)
        self.callback = callback
        self.cooldown = cooldown
        self.direction = EventDirection(int(direction))

    def __repr__(self):
        return (
            f"t_event({self.expression!r}, direction={self.direction.name}, "
            f"cooldown={self.cooldown})"
        )


def make_event_step(fns, tape, t_events, nt_events, dtype, tol, *,
                    jit: bool = True):
    """Build the single-step-with-events driver (jitted by default).
    Implemented in ``events_impl.py`` (kept separate: it is the largest
    in-graph kernel)."""
    import jax

    from .events_impl import build_event_step

    make = build_event_step(fns, tape, t_events, nt_events, dtype)
    step = make(float(tol))
    return jax.jit(step) if jit else step


def dispatch_callbacks(ta, res) -> bool:
    """Fire host-side callbacks for the events recorded by the in-graph
    detector, in chronological order (reference dispatch:
    ``taylor_adaptive.cpp:896-1030``).  Returns True if propagation should
    stop (stopping terminal event)."""
    import numpy as np

    nts = ta.nt_events
    tes = ta.t_events
    mask = np.asarray(res["nt_mask"])
    if mask.any() and nts:
        times = np.asarray(res["nt_times"])[mask]
        idxs = np.asarray(res["nt_idx"])[mask]
        sgns = np.asarray(res["nt_sgn"])[mask]
        order = np.argsort(np.abs(times - (ta.time - ta.last_h)), kind="stable")
        for k in order:
            ev = nts[int(idxs[k])]
            if ev.callback is not None:
                ev.callback(ta, float(times[k]), int(sgns[k]))
    te_idx = int(res["te_idx"])
    if te_idx >= 0 and tes:
        ev = tes[te_idx]
        if ev.callback is None:
            return True  # terminal event without callback stops propagation
        cont = ev.callback(ta, int(res["te_sgn"]))
        return cont is False
    return False


def make_propagate_until_ev(ev_step_raw, order, n_eq, n_te, n_nte,
                            rec_cap=1024):
    """On-device propagate-until with events; terminal events are
    *pure-stop* (no host callback).

    The host-driven stepwise driver pays a dispatch round-trip per step
    (~35x overhead measured on the Henon-Heiles Poincare workload); here the
    whole propagation runs in one ``lax.while_loop``, recording every nt
    hit ``(t, idx, d_sgn)`` in a bounded on-device buffer.  Callbacks are
    dispatched chronologically *after* the loop (they see the integrator at
    its final state — note in ``propagate_until``'s docstring; the
    reference invokes them mid-flight with the post-step state, so
    callbacks that only use ``(t, d_sgn)`` — the common case — are
    unaffected).  On buffer overflow the driver returns early and the host
    re-enters it (chunked, like the continuous-output recorder).

    A triggering terminal event ends the lane at the (truncated) event
    time with outcome = the event index (heyoka's stopping-terminal-event
    outcome, ``taylor_adaptive.cpp:868-890`` — there the outcome is the
    index biased into the reserved band; here outcomes are int32 lane
    values and terminal indices are the non-negative codes, see
    ``outcome.py``).  Terminal-event *callbacks* decide continue-vs-stop
    mid-flight in the reference and therefore cannot ride in this driver;
    callers must route callback-carrying terminal events through the
    stepwise driver.

    The trailing ``active`` input gates the lane: when False the driver
    returns its inputs untouched (``done`` immediately) — this is how the
    vmapped chunked re-entry keeps terminally-stopped lanes stopped while
    other lanes replay an overflowed recording chunk.

    Returns a dict with the final integrator arrays, per-lane diagnostics,
    the nt hit record, and ``te_idx`` (-1 = none) / ``te_sgn``.
    """
    from jax import lax

    from ..dfloat import dd_add_dd
    from .outcome import TaylorOutcome

    from .events_impl import MAX_ROOTS

    n_slots = n_nte * MAX_ROOTS

    def pu(state, pars, t_hi, t_lo, target_hi, target_lo, max_delta_t,
           max_steps, cooldowns, active):
        dtype = state.dtype
        zero = jnp.asarray(0.0, dtype)

        def remaining(th, tl):
            rh, _ = dd_add_dd(target_hi, target_lo, -th, -tl)
            return rh

        rem0 = remaining(t_hi, t_lo)
        fwd = rem0 > zero

        init = dict(
            state=state,
            t_hi=t_hi,
            t_lo=t_lo,
            last_h=zero,
            tc=jnp.zeros((order + 1, n_eq + n_te + n_nte), dtype),
            nsteps=jnp.int64(0),
            min_h=jnp.asarray(jnp.inf, dtype),
            max_h=zero,
            outcome=jnp.int32(TaylorOutcome.time_limit),
            done=(rem0 == zero) | ~active,
            cooldowns=cooldowns,
            te_idx=jnp.int32(-1),
            te_sgn=jnp.int32(0),
            rec_t=jnp.zeros((rec_cap,), dtype),
            rec_idx=jnp.zeros((rec_cap,), jnp.int32),
            rec_sgn=jnp.zeros((rec_cap,), jnp.int32),
            rec_n=jnp.int32(0),
            overflow=jnp.asarray(False),
        )

        def cond(c):
            return ~c["done"] & ~c["overflow"]

        def body(c):
            rem = remaining(c["t_hi"], c["t_lo"])
            cap = jnp.minimum(jnp.abs(rem), max_delta_t)
            dt = jnp.where(fwd, cap, -cap)

            res = ev_step_raw(
                c["state"], pars, c["t_hi"], c["t_lo"], dt, c["cooldowns"]
            )

            # if this step's hits would not all fit, do NOT advance: flag
            # overflow and let the host re-enter with a cleared buffer (no
            # hit is ever dropped)
            n_hits = jnp.sum(res["nt_mask"].astype(jnp.int32))
            overflow = c["rec_n"] + n_hits > rec_cap

            # append recorded nt hits (n_slots is small and static)
            rec_t, rec_idx, rec_sgn = c["rec_t"], c["rec_idx"], c["rec_sgn"]
            rec_n = c["rec_n"]
            for s in range(n_slots):  # empty when n_nte == 0
                ok = res["nt_mask"][s] & ~overflow
                rec_t = lax.dynamic_update_slice(
                    rec_t,
                    jnp.where(ok, res["nt_times"][s], rec_t[rec_n])[None],
                    (rec_n,),
                )
                rec_idx = lax.dynamic_update_slice(
                    rec_idx,
                    jnp.where(ok, res["nt_idx"][s], rec_idx[rec_n])[None],
                    (rec_n,),
                )
                rec_sgn = lax.dynamic_update_slice(
                    rec_sgn,
                    jnp.where(ok, res["nt_sgn"][s], rec_sgn[rec_n])[None],
                    (rec_n,),
                )
                rec_n = rec_n + ok.astype(jnp.int32)

            finite = res["outcome"] != jnp.int32(TaylorOutcome.err_nf_state)
            if n_te:
                te_hit = res["te_idx"] >= 0
            else:
                te_hit = jnp.asarray(False)
            nsteps = c["nsteps"] + 1
            rem_after = remaining(res["t_hi"], res["t_lo"])
            reached = jnp.where(fwd, rem_after <= zero, rem_after >= zero)
            hit_step_limit = (max_steps > 0) & (nsteps >= max_steps) & ~reached

            outcome = jnp.where(
                ~finite,
                jnp.int32(TaylorOutcome.err_nf_state),
                jnp.where(
                    te_hit,
                    res["te_idx"] if n_te else jnp.int32(0),
                    jnp.where(
                        hit_step_limit,
                        jnp.int32(TaylorOutcome.step_limit),
                        jnp.int32(TaylorOutcome.time_limit),
                    ),
                ),
            )
            done = ~finite | te_hit | hit_step_limit | reached
            abs_h = jnp.abs(res["last_h"])

            def sel(new, old):
                # overflow: keep the pre-step carry (the step is replayed)
                return jnp.where(overflow, old, new)

            return dict(
                state=sel(res["state"], c["state"]),
                t_hi=sel(res["t_hi"], c["t_hi"]),
                t_lo=sel(res["t_lo"], c["t_lo"]),
                last_h=sel(res["last_h"], c["last_h"]),
                tc=sel(res["tc"], c["tc"]),
                nsteps=sel(nsteps, c["nsteps"]),
                min_h=sel(jnp.minimum(c["min_h"], abs_h), c["min_h"]),
                max_h=sel(jnp.maximum(c["max_h"], abs_h), c["max_h"]),
                outcome=sel(outcome, c["outcome"]),
                done=sel(done, c["done"]),
                cooldowns=sel(res["cooldowns"], c["cooldowns"]),
                te_idx=sel(
                    jnp.where(te_hit, res["te_idx"] if n_te else jnp.int32(0),
                              c["te_idx"]),
                    c["te_idx"],
                ),
                te_sgn=sel(
                    jnp.where(te_hit, res["te_sgn"] if n_te else jnp.int32(0),
                              c["te_sgn"]),
                    c["te_sgn"],
                ),
                rec_t=rec_t,
                rec_idx=rec_idx,
                rec_sgn=rec_sgn,
                rec_n=rec_n,
                overflow=overflow,
            )

        return lax.while_loop(cond, body, init)

    return pu


#: per-lane compact-record capacity of the batched driver (hits per chunk)
HIT_LCAP = 8


def make_propagate_until_ev_batch(ev_step_b, order, n_eq, n_te, n_nte,
                                  chunk=64):
    """Natively batched on-device propagate-until with events.

    The TPU redesign of the vmapped recording driver
    (:func:`make_propagate_until_ev`): the whole batch steps in lockstep
    through one ``lax.while_loop`` whose iteration counter is a *scalar*,
    so each step's nt hits are written to step-indexed rows of the record
    buffers with a scalar-index ``dynamic_update_slice`` — a contiguous
    row write instead of the per-lane scatters that dominated the round-1
    driver.  A chunk records at most ``chunk`` lockstep steps; the host
    re-enters until every lane is done (no hit is ever dropped — there is
    no overflow replay, every step's hits land in their own row).

    Terminal events are pure-stop, like the vmapped driver; the trailing
    ``active`` input keeps finished lanes frozen across re-entries, and
    ``last_h``/``tc`` seed the carry so frozen lanes return their stored
    step data (which lets the host chain chunk dispatches purely on device
    arrays — ``active = ~done`` of the previous chunk — and overlap each
    chunk's packed-summary download with the next chunk's execution; the
    sequential read-then-dispatch loop paid a full tunnel round trip per
    chunk).

    Returns a dict of final per-lane arrays plus ``rec_t`` (f64 hit
    times) and ``rec_sgn`` (int8: 0 = no hit, else crossing sign + 2),
    shaped ``(B, chunk, n_nte * MAX_ROOTS)``, and ``it`` — the number of
    recorded lockstep steps in this chunk, broadcast per lane so every
    output of the driver has a leading batch axis (uniform shard_map
    out_specs over the trajectory axis).  The record buffers are part of
    the while carry, so their size is a per-iteration copy cost — hence
    the int8 encoding (hit flag folded into the sign byte) and the small
    default chunk.
    """
    import jax.numpy as jnp
    from jax import lax

    from ..dfloat import dd_add_dd
    from .outcome import TaylorOutcome
    from .events_impl import MAX_ROOTS

    n_slots = n_nte * MAX_ROOTS

    # deferred-isolation hooks: for nt-only configurations the step
    # sequence does not depend on the event results, so the loop body
    # records the raw event-polynomial rows and ONE batched isolation
    # sweep runs per chunk over all (chunk * B * ne) rows — the per-step
    # isolation graph (tree matmul + two lax.conds + top_k + refinement)
    # leaves the while_loop entirely.  This is the TPU answer to the
    # reference's per-step SIMD ``ed_data_batch::detect_events``
    # (src/detail/event_detection.cpp:1733): same roots, amortized
    # dispatch.
    _plain_step = getattr(ev_step_b, "plain_step_b", None)
    _find_roots = getattr(ev_step_b, "find_roots_b", None)
    _nt_dirs = getattr(ev_step_b, "nt_dirs", None)
    _defer_ok = (n_te == 0 and n_nte > 0 and _plain_step is not None
                 and _find_roots is not None)
    #: record-buffer budget for the deferred path (bytes)
    _DEFER_BUDGET = 512 * 2**20
    #: the post-loop sweep materializes ~3-4x the record buffer in
    #: transients (neutralized-rows copy, times, top-k gathers), so the
    #: budget check scales ev_rec by this factor
    _DEFER_TRANSIENTS = 4

    def pu(state, pars, t_hi, t_lo, target_hi, target_lo, max_delta_t,
           max_steps, cooldowns, active, last_h=None, tc=None):
        import numpy as _np

        dtype = state.dtype
        B = state.shape[0]
        itemsize = _np.dtype(dtype).itemsize
        deferred = _defer_ok and (
            chunk * B * n_nte * (order + 1) * itemsize * _DEFER_TRANSIENTS
            <= _DEFER_BUDGET
        )
        zero = jnp.zeros((B,), dtype)
        if last_h is None:
            last_h = zero
        if tc is None:
            tc = jnp.zeros((B, order + 1, n_eq + n_te + n_nte), dtype)

        def remaining(th, tl):
            rh, _ = dd_add_dd(target_hi, target_lo, -th, -tl)
            return rh

        rem0 = remaining(t_hi, t_lo)
        fwd = rem0 > 0

        init = dict(
            state=state,
            t_hi=t_hi,
            t_lo=t_lo,
            last_h=last_h,
            tc=tc,
            nsteps=jnp.zeros((B,), jnp.int64),
            min_h=jnp.full((B,), jnp.inf, dtype),
            max_h=zero,
            outcome=jnp.full((B,), jnp.int32(TaylorOutcome.time_limit)),
            done=(rem0 == 0) | ~active,
            cooldowns=cooldowns,
            te_idx=jnp.full((B,), jnp.int32(-1)),
            te_sgn=jnp.zeros((B,), jnp.int32),
            it=jnp.int32(0),
        )
        if deferred:
            init.update(
                ev_rec=jnp.zeros((chunk, B, n_nte, order + 1), dtype),
                h_rec=jnp.zeros((chunk, B), dtype),
                t0_rec=jnp.zeros((chunk, B), dtype),
                live_rec=jnp.zeros((chunk, B), bool),
            )
        else:
            init.update(
                rec_t=jnp.zeros((chunk, B, n_slots), dtype),
                rec_sgn=jnp.zeros((chunk, B, n_slots), jnp.int8),
            )

        def cond(c):
            return jnp.any(~c["done"]) & (c["it"] < chunk)

        def body(c):
            rem = remaining(c["t_hi"], c["t_lo"])
            cap = jnp.minimum(jnp.abs(rem), max_delta_t)
            dt = jnp.where(fwd, cap, -cap)

            if deferred:
                res = _plain_step(c["state"], pars, c["t_hi"], c["t_lo"], dt)
                res = dict(
                    res,
                    te_idx=jnp.full((B,), jnp.int32(-1)),
                    te_sgn=jnp.zeros((B,), jnp.int32),
                    cooldowns=c["cooldowns"],
                )
            else:
                res = ev_step_b(
                    c["state"], pars, c["t_hi"], c["t_lo"], dt,
                    c["cooldowns"]
                )

            live = ~c["done"]
            finite = res["outcome"] != jnp.int32(TaylorOutcome.err_nf_state)
            te_hit = (res["te_idx"] >= 0) if n_te else jnp.zeros((B,), bool)
            nsteps = c["nsteps"] + live.astype(jnp.int64)
            rem_after = remaining(res["t_hi"], res["t_lo"])
            reached = jnp.where(fwd, rem_after <= 0, rem_after >= 0)
            hit_step_limit = (max_steps > 0) & (nsteps >= max_steps) \
                & ~reached

            outcome = jnp.where(
                ~finite,
                jnp.int32(TaylorOutcome.err_nf_state),
                jnp.where(
                    te_hit,
                    res["te_idx"],
                    jnp.where(
                        hit_step_limit,
                        jnp.int32(TaylorOutcome.step_limit),
                        jnp.int32(TaylorOutcome.time_limit),
                    ),
                ),
            )
            done_new = ~finite | te_hit | hit_step_limit | reached
            abs_h = jnp.abs(res["last_h"])

            def sel(new, old):
                lv = live
                if new.ndim > 1:
                    lv = live.reshape((B,) + (1,) * (new.ndim - 1))
                return jnp.where(lv, new, old)

            it = c["it"]
            rec = {}
            if deferred:
                # record the raw event-polynomial rows; isolation runs
                # once per chunk after the loop
                z = jnp.int32(0)
                rec["ev_rec"] = lax.dynamic_update_slice(
                    c["ev_rec"], res["ev_row"][None], (it, z, z, z)
                )
                rec["h_rec"] = lax.dynamic_update_slice(
                    c["h_rec"], res["last_h"][None], (it, z)
                )
                rec["t0_rec"] = lax.dynamic_update_slice(
                    c["t0_rec"], c["t_hi"][None], (it, z)
                )
                # mask with the step's finite flag: a rejected step
                # (err_nf_state; carry keeps the pre-step state) must not
                # emit nt hits from its garbage event rows
                rec["live_rec"] = lax.dynamic_update_slice(
                    c["live_rec"], (live & finite)[None], (it, z)
                )
            elif n_slots:
                # step-major record write: a dynamic index on the LEADING
                # dim lowers to a true in-place slice update; the lane-major
                # form was measured as a full-buffer masked write per step
                z = jnp.int32(0)
                hit = res["nt_mask"] & (live & finite)[:, None]
                sgn_row = jnp.where(
                    hit, (res["nt_sgn"] + 2).astype(jnp.int8),
                    jnp.int8(0),
                )
                rec["rec_t"] = lax.dynamic_update_slice(
                    c["rec_t"], res["nt_times"][None], (it, z, z)
                )
                rec["rec_sgn"] = lax.dynamic_update_slice(
                    c["rec_sgn"], sgn_row[None], (it, z, z)
                )
            else:
                rec["rec_t"] = c["rec_t"]
                rec["rec_sgn"] = c["rec_sgn"]

            return dict(
                state=sel(res["state"], c["state"]),
                t_hi=sel(res["t_hi"], c["t_hi"]),
                t_lo=sel(res["t_lo"], c["t_lo"]),
                last_h=sel(res["last_h"], c["last_h"]),
                tc=sel(res["tc"], c["tc"]),
                nsteps=nsteps,
                min_h=sel(jnp.minimum(c["min_h"], abs_h), c["min_h"]),
                max_h=sel(jnp.maximum(c["max_h"], abs_h), c["max_h"]),
                outcome=sel(outcome, c["outcome"]),
                done=c["done"] | (live & done_new),
                cooldowns=sel(res["cooldowns"], c["cooldowns"]),
                te_idx=sel(
                    jnp.where(te_hit, res["te_idx"], c["te_idx"]),
                    c["te_idx"],
                ),
                te_sgn=sel(
                    jnp.where(te_hit, res["te_sgn"], c["te_sgn"]),
                    c["te_sgn"],
                ),
                it=it + 1,
                **rec,
            )

        out = lax.while_loop(cond, body, init)
        if deferred:
            # one isolation sweep over every recorded (step, lane, event)
            # row of the chunk: the fast-exclusion check prunes the
            # non-crossing majority, the sparse working set gathers the
            # survivors, and the tree isolator's constant matmul runs at
            # chunk-size batch efficiency.
            R = chunk * B
            rows = out.pop("ev_rec").reshape(R, n_nte, order + 1)
            hs = out.pop("h_rec").reshape(R)
            t0s = out.pop("t0_rec").reshape(R)
            live = out.pop("live_rec").reshape(R)
            # neutralize dead/unrecorded rows: c0 = 1, rest 0 fails the
            # root-possible test, so they cost nothing downstream
            rows = jnp.where(live[:, None, None], rows, 0.0)
            rows = rows.at[:, :, 0].set(
                jnp.where(live[:, None], rows[:, :, 0], 1.0)
            )
            s_roots, valid, d_sgn = _find_roots(rows, hs)
            dir_ok = (_nt_dirs[None, :, None] == 0) | (
                d_sgn == _nt_dirs[None, :, None]
            )
            ok = valid & dir_ok & live[:, None, None]
            times = t0s[:, None, None] + s_roots * hs[:, None, None]
            out["rec_t"] = times.reshape(chunk, B, n_slots)
            out["rec_sgn"] = jnp.where(
                ok, (d_sgn + 2).astype(jnp.int8), jnp.int8(0)
            ).reshape(chunk, B, n_slots)
        # per-lane it broadcast: every driver output then has a leading
        # batch axis (shard_map-able with uniform out_specs)
        out["it"] = jnp.full((B,), out["it"], jnp.int32)
        if n_slots:
            # device-side hit compaction: the dense (chunk, B, n_slots)
            # record crosses the host tunnel at ~2.4 MB per re-entry;
            # per-lane top_k compresses it to the (rare) actual hits.
            # The transpose to lane-major runs once per chunk (the dense
            # buffer also ships lane-major for shard_map); the dense copy
            # stays in the output for the saturation fallback — jax arrays
            # only cross the tunnel when read.
            rec_t_l = out.pop("rec_t").transpose(1, 0, 2)
            rec_sgn_l = out.pop("rec_sgn").transpose(1, 0, 2)
            out["rec_t"] = rec_t_l
            out["rec_sgn"] = rec_sgn_l
            flat_sgn = rec_sgn_l.reshape(B, chunk * n_slots)
            flat_t = rec_t_l.reshape(B, chunk * n_slots)
            hitm = flat_sgn != 0
            keys = jnp.where(
                hitm, jnp.arange(chunk * n_slots, dtype=jnp.int32)[None, :],
                jnp.int32(-1),
            )
            lcap = min(HIT_LCAP, chunk * n_slots)
            pos = lax.top_k(keys, lcap)[0]  # (B, lcap), -1 = empty
            gi = jnp.maximum(pos, 0)
            hits_pos = pos
            hits_t = jnp.take_along_axis(flat_t, gi, axis=1)
            hits_sgn = jnp.take_along_axis(flat_sgn, gi, axis=1)
            nhits = jnp.sum(hitm, axis=1).astype(jnp.int32)
        else:
            lcap = 0
            hits_pos = jnp.zeros((B, 0), jnp.int32)
            hits_t = jnp.zeros((B, 0), dtype)
            hits_sgn = jnp.zeros((B, 0), jnp.int8)
            nhits = jnp.zeros((B,), jnp.int32)
        out["hits_pos"] = hits_pos
        out["hits_t"] = hits_t
        out["hits_sgn"] = hits_sgn
        out["nhits"] = nhits
        # single packed host summary: one tunnel round trip per chunk
        # instead of ~10 (each np.asarray is a separate synchronous
        # transfer at ~50 ms latency through the axon tunnel).  All values
        # are exactly representable in f64.
        cols = [
            out["min_h"], out["max_h"],
            out["nsteps"].astype(dtype), out["done"].astype(dtype),
            out["outcome"].astype(dtype), out["te_idx"].astype(dtype),
            out["te_sgn"].astype(dtype), out["it"].astype(dtype),
            nhits.astype(dtype),
        ]
        cols.append(hits_t.T.astype(dtype) if lcap else
                    jnp.zeros((0, B), dtype))
        cols.append(hits_pos.T.astype(dtype) if lcap else
                    jnp.zeros((0, B), dtype))
        cols.append(hits_sgn.T.astype(dtype) if lcap else
                    jnp.zeros((0, B), dtype))
        out["packed"] = jnp.concatenate(
            [jnp.stack(cols[:9], 0), cols[9], cols[10], cols[11]], 0
        ).T  # lane-major (B, 9 + 3*lcap) for shard_map out_specs
        return out

    return pu


def make_propagate_until_ev_batch_full(ev_step_b, order, n_eq, n_te, n_nte,
                                       chunk=64, gcap=256):
    """Whole-propagation batched event driver: ONE device program.

    The chunked driver (:func:`make_propagate_until_ev_batch`) returns to
    the host after every ``chunk`` lockstep steps so the recorded hits can
    be offloaded — measured at ~50-60 ms of tunnel round trip + decode per
    chunk on the HH Poincare workload, which kept the end-to-end batch
    event overhead at ~4x while the device-side cost is 2.0x (the
    reference's batch detection loop has no such latency,
    ``src/detail/event_detection.cpp:1733``).  Here the chunk machinery —
    inner while_loop, per-chunk isolation sweep, top-k hit compaction —
    runs inside an *outer* ``lax.while_loop`` that appends each chunk's
    compacted hits to a device-resident ``(B, gcap)`` global buffer; the
    host gets ONE result for the entire propagate_until.

    Bounded-buffer contract: a lane whose per-chunk hits exceed the
    compaction cap or whose total hits exceed ``gcap`` raises its
    ``overflow`` flag and the caller re-runs the propagation through the
    chunked driver (no hit is ever silently dropped).  Everything else —
    step semantics, isolation rigor, terminal pure-stop, per-lane
    outcomes — is byte-identical to the chunked driver, whose ``pu`` this
    driver invokes as its outer-loop body.
    """
    from jax import lax

    from ..dfloat import dd_add_dd
    from .outcome import TaylorOutcome
    from .events_impl import MAX_ROOTS

    n_slots = n_nte * MAX_ROOTS
    lcap = min(HIT_LCAP, chunk * n_slots) if n_slots else 0
    pu = make_propagate_until_ev_batch(
        ev_step_b, order, n_eq, n_te, n_nte, chunk=chunk,
    )

    def full(state, pars, t_hi, t_lo, target_hi, target_lo, max_delta_t,
             max_steps, cooldowns, active, last_h=None, tc=None):
        dtype = state.dtype
        B = state.shape[0]
        zero = jnp.zeros((B,), dtype)
        if last_h is None:
            last_h = zero
        if tc is None:
            tc = jnp.zeros((B, order + 1, n_eq + n_te + n_nte), dtype)

        rh, _ = dd_add_dd(target_hi, target_lo, -t_hi, -t_lo)
        carry = dict(
            state=state, t_hi=t_hi, t_lo=t_lo, last_h=last_h, tc=tc,
            cooldowns=cooldowns,
            done=(rh == 0) | ~active,
            nsteps=jnp.zeros((B,), jnp.int64),
            min_h=jnp.full((B,), jnp.inf, dtype),
            max_h=zero,
            outcome=jnp.full((B,), jnp.int32(TaylorOutcome.time_limit)),
            te_idx=jnp.full((B,), jnp.int32(-1)),
            te_sgn=jnp.zeros((B,), jnp.int32),
            steps_done=jnp.int64(0),
            counts=jnp.zeros((B,), jnp.int32),
            overflow=jnp.zeros((B,), bool),
            g_t=jnp.zeros((B, gcap), dtype),
            # slot*4 + (d_sgn+2); 0 = empty
            g_meta=jnp.zeros((B, gcap), jnp.int32),
        )

        def cond(c):
            return jnp.any(~c["done"])

        def body(c):
            rem_steps = jnp.where(
                max_steps > 0,
                jnp.maximum(jnp.int64(0), max_steps - c["steps_done"]),
                jnp.int64(0),
            )
            res = pu(
                c["state"], pars, c["t_hi"], c["t_lo"], target_hi,
                target_lo, max_delta_t, rem_steps, c["cooldowns"],
                ~c["done"], c["last_h"], c["tc"],
            )
            live = ~c["done"]
            newly = live & res["done"]

            def merge(new, old):
                lv = live
                if new.ndim > 1:
                    lv = live.reshape((B,) + (1,) * (new.ndim - 1))
                return jnp.where(lv, new, old)

            out = dict(
                state=merge(res["state"], c["state"]),
                t_hi=merge(res["t_hi"], c["t_hi"]),
                t_lo=merge(res["t_lo"], c["t_lo"]),
                last_h=merge(res["last_h"], c["last_h"]),
                tc=merge(res["tc"], c["tc"]),
                cooldowns=merge(res["cooldowns"], c["cooldowns"]),
                done=c["done"] | res["done"],
                nsteps=c["nsteps"] + jnp.where(live, res["nsteps"], 0),
                min_h=jnp.where(
                    live, jnp.minimum(c["min_h"], res["min_h"]), c["min_h"]
                ),
                max_h=jnp.where(
                    live, jnp.maximum(c["max_h"], res["max_h"]), c["max_h"]
                ),
                outcome=jnp.where(newly, res["outcome"], c["outcome"]),
                te_idx=jnp.where(newly, res["te_idx"], c["te_idx"]),
                te_sgn=jnp.where(newly, res["te_sgn"], c["te_sgn"]),
                steps_done=c["steps_done"]
                + res["it"][0].astype(jnp.int64),
            )
            if lcap:
                pos = res["hits_pos"]  # (B, lcap) flat chunk pos, -1 empty
                valid = pos >= 0
                nh = res["nhits"]
                # append positions: counts[lane] + rank within this chunk
                rank = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
                tgt = jnp.where(
                    valid, c["counts"][:, None] + rank, jnp.int32(gcap)
                )
                rows = jnp.broadcast_to(
                    jnp.arange(B, dtype=jnp.int32)[:, None], tgt.shape
                )
                slot = (pos % jnp.int32(max(n_slots, 1))).astype(jnp.int32)
                meta = slot * 4 + res["hits_sgn"].astype(jnp.int32)
                g_t = c["g_t"].at[rows, tgt].set(
                    res["hits_t"].astype(dtype), mode="drop"
                )
                g_meta = c["g_meta"].at[rows, tgt].set(
                    jnp.where(valid, meta, 0), mode="drop"
                )
                out.update(
                    counts=jnp.minimum(
                        c["counts"] + nh, jnp.int32(gcap)
                    ),
                    overflow=c["overflow"]
                    | (nh > lcap)
                    | (c["counts"] + nh > gcap),
                    g_t=g_t,
                    g_meta=g_meta,
                )
            else:
                out.update(
                    counts=c["counts"], overflow=c["overflow"],
                    g_t=c["g_t"], g_meta=c["g_meta"],
                )
            return out

        out = lax.while_loop(cond, body, carry)
        # one packed row per lane: a SINGLE host transfer carries every
        # scalar diagnostic AND the global hit buffers — on the tunneled
        # backend each separate np.asarray is a ~50 ms round trip, and the
        # three-transfer decode (packed, g_t, g_meta) was most of the
        # end-to-end batch-event overhead beyond the device-side 2.0x
        # (the reference's batch detection pass has no transfer at all,
        # src/detail/event_detection.cpp:1733).  meta values are tiny
        # integers (slot*4 + sgn), exact in any float dtype.
        out["packed"] = jnp.concatenate(
            [
                jnp.stack(
                    [
                        out["min_h"], out["max_h"],
                        out["nsteps"].astype(dtype),
                        out["outcome"].astype(dtype),
                        out["te_idx"].astype(dtype),
                        out["te_sgn"].astype(dtype),
                        out["counts"].astype(dtype),
                        out["overflow"].astype(dtype),
                    ],
                    1,
                ),
                out["g_t"],
                out["g_meta"].astype(dtype),
            ],
            axis=1,
        )
        return out

    return full
