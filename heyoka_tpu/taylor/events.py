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


def make_event_step(fns, tape, t_events, nt_events, dtype, tol):
    """Build the jitted single-step-with-events driver.  Implemented in
    ``events_impl.py`` (kept separate: it is the largest in-graph kernel)."""
    import jax

    from .events_impl import build_event_step

    make = build_event_step(fns, tape, t_events, nt_events, dtype)
    return jax.jit(make(float(tol)))


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
