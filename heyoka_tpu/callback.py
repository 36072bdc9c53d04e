"""Step callbacks and the angle reducer.

Reference parity: ``step_callback[_set]`` (``include/heyoka/step_callback.hpp``)
and ``callback::angle_reducer`` (``src/callback/angle_reducer.cpp``): a
callback invoked after every accepted step, with an optional ``pre_hook``
run once before a ``propagate_*`` starts; ``angle_reducer`` wraps selected
angle state variables into [0, 2pi) to avoid precision loss in long
integrations.

TPU-native design: callbacks come in two flavours —

- *in-graph* callables ``cb(state, pars, t_hi, t_lo, h, tc) ->
  (new_state, keep_going)`` that are traced into the propagate loops (no
  host round-trips; used by :class:`AngleReducer`);
- *host* callables ``cb(ta) -> bool`` for the stepwise drivers.

``StepCallbackSet`` composes several in-graph callbacks in order, exactly
like the reference's ``step_callback_set``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["AngleReducer", "StepCallbackSet", "angle_reducer"]


def adapt_host_callback(ta, callback):
    """Wrap an in-graph step callback into the host-driver signature.

    The stepwise (host-dispatch) drivers invoke ``cb(ta) -> bool``; in-graph
    callbacks have signature ``cb(state, pars, t_hi, t_lo, h, tc) ->
    (new_state, keep)``.  When events force a propagation onto a stepwise
    driver, this adapter lets the same in-graph callback keep working: it is
    applied to the integrator's current (possibly batched) buffers after
    each accepted step, the state update is written back, and the lane-wise
    ``keep`` flags are reduced with *all* (reference: a step callback
    returning false stops the whole propagation, ``step_callback.hpp``).
    """
    if callback is None or not (
        getattr(callback, "in_graph", False) or hasattr(callback, "pre_hook")
    ):
        return callback
    if hasattr(callback, "pre_hook"):
        callback.pre_hook(ta)

    batched = getattr(ta, "_batch", None) is not None and ta._state.ndim == 2

    def host_cb(t):
        if batched:
            import jax

            new_state, keep = jax.vmap(callback)(
                t._state, t._pars, t._t_hi, t._t_lo, t._last_h, t._tc
            )
            keep = bool(jnp.all(keep))
        else:
            new_state, keep = callback(
                t._state, t._pars, t._t_hi, t._t_lo, t._last_h, t._tc
            )
            keep = bool(keep)
        t._state = jnp.asarray(new_state)
        return keep

    return host_cb


class StepCallbackSet:
    """Execute several in-graph step callbacks in sequence; propagation
    continues only if all of them return True (reference
    ``step_callback_set``, ``step_callback.hpp``)."""

    def __init__(self, *callbacks):
        self._cbs = list(callbacks)

    def pre_hook(self, ta):
        for cb in self._cbs:
            if hasattr(cb, "pre_hook"):
                cb.pre_hook(ta)

    def __call__(self, state, pars, t_hi, t_lo, h, tc):
        keep = jnp.asarray(True)
        for cb in self._cbs:
            state, k = cb(state, pars, t_hi, t_lo, h, tc)
            keep = keep & jnp.asarray(k, bool)
        return state, keep


class AngleReducer:
    """Reduce selected state variables into [0, 2pi) after every step
    (reference ``callback::angle_reducer``).

    Construct with the variable names (or indices) to reduce, then pass as
    the ``callback=`` of ``propagate_*`` — the reduction happens in-graph.
    """

    def __init__(self, vars):
        self._vars = list(vars)
        self._idx = None

    def _resolve(self, var_names):
        idx = []
        for v in self._vars:
            if isinstance(v, int):
                idx.append(v)
            else:
                name = v if isinstance(v, str) else v.name
                if name not in var_names:
                    raise ValueError(
                        f"angle_reducer: {name!r} is not a state variable"
                    )
                idx.append(var_names.index(name))
        if not idx:
            raise ValueError("angle_reducer: empty variable selection")
        self._idx = jnp.asarray(idx)

    def pre_hook(self, ta):
        self._resolve(ta.decomposition.var_names)

    def __call__(self, state, pars, t_hi, t_lo, h, tc):
        if self._idx is None:
            raise RuntimeError(
                "angle_reducer used without pre_hook (pass it as a"
                " propagate callback, or call pre_hook(ta) first)"
            )
        twopi = 2.0 * math.pi
        vals = state[self._idx]
        vals = vals - twopi * jnp.floor(vals / twopi)
        return state.at[self._idx].set(vals), True


def angle_reducer(vars) -> AngleReducer:
    return AngleReducer(vars)
