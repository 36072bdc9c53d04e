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
