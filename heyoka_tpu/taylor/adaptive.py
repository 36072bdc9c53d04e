"""The adaptive Taylor integrator (scalar facade).

Reference parity: heyoka ``taylor_adaptive<T>`` (``include/heyoka/taylor.hpp:355-670``,
``src/taylor_adaptive.cpp``): ``step()``, ``step_backward()``, ``step(max_dt)``,
``propagate_for/until/grid``, ``update_d_output``, and the
state/pars/time/tc/last_h accessors.

Architecture (TPU-first): the integrator is a thin mutable facade over pure
jitted drivers (``loops.py``).  All device state lives in a pytree of arrays;
``propagate_*`` run entirely on-device inside ``lax.while_loop``.  The same
pure drivers, ``vmap``-ed, power the batch integrator and, ``shard_map``-ed,
the multi-chip ensembles.
"""

from __future__ import annotations

import math as _pymath
import os as _os
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from ..dfloat import dd_add_d, dd_add_dd, dd_normalize
from ..expr.core import Expr, Variable, expr
from ..expr.decompose import Tape, taylor_decompose_sys
from .outcome import TaylorOutcome
from . import loops as _loops
from . import stepper as _st


def _normalize_sys(sys_):
    out = []
    for item in sys_:
        lhs, rhs = item
        if isinstance(lhs, str):
            lhs = Variable(lhs)
        if not isinstance(lhs, Variable):
            raise TypeError("ODE system lhs entries must be variables")
        out.append((lhs, expr(rhs)))
    return out


class TaylorAdaptive:
    """Adaptive Taylor integrator for a single trajectory.

    Parameters mirror heyoka's kwargs (``taylor.hpp:393-397``): ``tol``
    (default: machine eps of ``dtype``), ``high_accuracy``, ``pars``,
    ``time``, ``t_events`` / ``nt_events``.  ``dtype`` replaces the
    C++ template parameter ``T`` (float32/float64 on TPU).
    """

    def __init__(
        self,
        sys,
        state,
        *,
        time=0.0,
        pars=None,
        tol=None,
        high_accuracy=False,
        compact_mode=False,
        dtype=jnp.float64,
        t_events=(),
        nt_events=(),
        backend="jax",
    ):
        # a var_ode_sys may be passed directly (reference
        # ``taylor_adaptive{vsys, ...}``): integrate its augmented system;
        # if only the original initial conditions are given, the variational
        # ICs are filled in automatically (setup_variational_ics)
        from ..varsys import var_ode_sys as _vsys_t

        self._vsys = sys if isinstance(sys, _vsys_t) else None
        if self._vsys is not None:
            state = np.asarray(state, dtype=np.float64)
            if state.shape == (self._vsys.n_orig,):
                state = self._vsys.initial_state(
                    state, pars=pars, t0=float(time)
                )
            sys = self._vsys.sys
        self._sys = _normalize_sys(sys)
        self._dtype = jnp.dtype(dtype)
        if tol is None:
            tol = float(np.finfo(self._dtype).eps)
        tol = float(tol)
        self._tol = tol
        self._order = _st.taylor_order_from_tol(tol)
        self._high_accuracy = bool(high_accuracy)
        self._compact_mode = bool(compact_mode)

        self._t_events = list(t_events)
        self._nt_events = list(nt_events)

        # decompose (event equations ride along as sv_funcs so that their
        # Taylor polynomials come out of the same jet, taylor.hpp:393-397)
        ev_eqs = [ev.expression for ev in self._t_events] + [
            ev.expression for ev in self._nt_events
        ]
        self._tape: Tape = taylor_decompose_sys(self._sys, extra_outputs=ev_eqs)

        n_eq = self._tape.n_eq
        state = np.asarray(state, dtype=self._dtype)
        if state.shape != (n_eq,):
            raise ValueError(
                f"state must have shape ({n_eq},), got {state.shape}"
            )
        self._state = jnp.asarray(state)

        n_pars = self._tape.n_pars
        if pars is None:
            pars = np.zeros((n_pars,), dtype=self._dtype)
        pars = np.asarray(pars, dtype=self._dtype)
        if pars.shape != (n_pars,) and n_pars > 0:
            raise ValueError(f"pars must have shape ({n_pars},), got {pars.shape}")
        self._pars = jnp.asarray(pars.reshape((n_pars,)))

        self._t_hi = jnp.asarray(float(time), self._dtype)
        self._t_lo = jnp.asarray(0.0, self._dtype)
        self._last_h = jnp.asarray(0.0, self._dtype)
        self._tc = jnp.zeros(
            (self._order + 1, n_eq + len(ev_eqs)), self._dtype
        )

        self._fns = _loops.make_step_fns(
            self._tape, self._order, self._dtype, self._high_accuracy,
            compact_mode=self._compact_mode,
        )
        if self._t_events or self._nt_events:
            from .events import make_event_step

            self._ev_step_raw = make_event_step(
                self._fns, self._tape, self._t_events, self._nt_events,
                self._dtype, self._tol, jit=False,
            )
            self._ev_step = jax.jit(self._ev_step_raw)
        else:
            self._ev_step = None
            self._ev_step_raw = None
        self._te_cooldowns = jnp.zeros((len(self._t_events),), self._dtype)
        self._event_stop = False

        # execution backend: "jax" (XLA/Pallas, the device path), "native"
        # (the C++ host runtime — low-latency scalar/low-batch work, the
        # regime where per-dispatch overhead dominates an O(us) step), or
        # "auto" (native when eligible: f64, no events, runtime available).
        # The reference's integrators are always native compiled steppers
        # (src/taylor_adaptive.cpp); here native is the host twin of the
        # XLA engines with identical tape semantics.
        if backend not in ("jax", "native", "auto"):
            raise ValueError(f"unknown backend {backend!r}")
        self._nrt = None
        if backend != "jax":
            from ..native import NativeRuntime, native_available

            eligible = (
                self._dtype == jnp.dtype(jnp.float64)
                and not self._t_events and not self._nt_events
            )
            if backend == "native":
                if not native_available():
                    raise RuntimeError(
                        "backend='native' requires a host C++ compiler"
                    )
                if not eligible:
                    raise ValueError(
                        "backend='native' supports dtype=float64 without "
                        "events (use the default jax backend otherwise)"
                    )
                self._nrt = NativeRuntime(self._tape)
            elif eligible and native_available():
                try:
                    self._nrt = NativeRuntime(self._tape)
                except NotImplementedError:
                    self._nrt = None  # tape op outside the native op set
        self._backend = "native" if self._nrt is not None else "jax"
        # AOT-compiled stepper (native_cg: heyoka's JIT analog, disk-cached
        # by tape hash): ~10x the interpreter; W=1 — a single trajectory
        # has no lanes to fill
        self._ncg = None
        if self._nrt is not None and _os.environ.get(
                "HEYOKA_NATIVE_CG", "1") != "0":
            from ..native_cg import CompiledTape

            try:
                self._ncg = CompiledTape(self._tape, self._order, W=1)
            except Exception as e:
                from ..logging import logger as _logger

                _logger.debug("native codegen unavailable (%s); using the "
                              "interpreter runtime", e)

    # -- introspection --------------------------------------------------------

    @property
    def sys(self):
        return list(self._sys)

    # -- variational API (reference taylor_adaptive, taylor_adaptive.cpp:1960-2100) --

    def is_variational(self) -> bool:
        return self._vsys is not None

    def _check_variational(self, fname):
        if self._vsys is None:
            raise ValueError(
                f"'{fname}()' cannot be invoked on non-variational integrators"
            )

    def get_vargs(self):
        self._check_variational("get_vargs")
        return list(self._vsys.vargs)

    def get_vorder(self) -> int:
        self._check_variational("get_vorder")
        return self._vsys.order

    def get_vslice(self, order: int, component: int | None = None) -> slice:
        self._check_variational("get_vslice")
        return self._vsys.get_vslice(order, component)

    def get_mindex(self, i: int):
        self._check_variational("get_mindex")
        return self._vsys.get_mindex(i)

    @cached_property
    def _taylor_map(self):
        return self._vsys.make_taylor_map(dtype=self._dtype)

    def eval_taylor_map(self, s):
        """Evaluate the Taylor map of the flow in the deviations ``s`` of
        the variational arguments (reference ``eval_taylor_map``,
        ``taylor_adaptive.cpp:2013``): the state polynomial built from the
        propagated variational derivatives, evaluated at ``s``."""
        self._check_variational("eval_taylor_map")
        s = np.asarray(s, dtype=self._dtype)
        if s.shape != (self._vsys.n_vargs,):
            raise ValueError(
                f"expected {self._vsys.n_vargs} deviation values, got "
                f"{s.shape}"
            )
        self._tstate = np.asarray(self._taylor_map(s, self.state))
        return self._tstate

    def get_tstate(self):
        self._check_variational("get_tstate")
        if not hasattr(self, "_tstate"):
            # reference semantics: m_tstate is a defined (zeroed) buffer
            # before the first eval_taylor_map() call
            self._tstate = np.zeros((self._vsys.n_orig,), dtype=self._dtype)
        return self._tstate

    @property
    def decomposition(self) -> Tape:
        return self._tape

    @property
    def order(self) -> int:
        return self._order

    @property
    def tol(self) -> float:
        return self._tol

    @property
    def dim(self) -> int:
        return self._tape.n_eq

    @property
    def high_accuracy(self) -> bool:
        return self._high_accuracy

    @property
    def compact_mode(self) -> bool:
        return self._compact_mode

    @property
    def backend(self) -> str:
        """The resolved execution backend: "jax" or "native"."""
        return self._backend

    @property
    def dtype(self):
        return self._dtype

    @property
    def state(self) -> np.ndarray:
        return np.asarray(self._state)

    @state.setter
    def state(self, v):
        v = np.asarray(v, dtype=self._dtype)
        if v.shape != (self.dim,):
            raise ValueError("bad state shape")
        self._state = jnp.asarray(v)

    @property
    def pars(self) -> np.ndarray:
        return np.asarray(self._pars)

    @pars.setter
    def pars(self, v):
        v = np.asarray(v, dtype=self._dtype).reshape(self._pars.shape)
        self._pars = jnp.asarray(v)

    @property
    def time(self) -> float:
        return float(self._t_hi) + float(self._t_lo)

    @time.setter
    def time(self, v):
        self._t_hi = jnp.asarray(float(v), self._dtype)
        self._t_lo = jnp.asarray(0.0, self._dtype)

    @property
    def dtime(self) -> tuple:
        """The (hi, lo) double-length time pair (heyoka ``get_dtime``)."""
        return float(self._t_hi), float(self._t_lo)

    def set_dtime(self, hi: float, lo: float):
        """Set the double-length time (heyoka ``set_dtime``,
        ``taylor_adaptive.cpp``): components must be finite and normalized
        (|lo| no larger than ulp-level of hi)."""
        if not (_pymath.isfinite(hi) and _pymath.isfinite(lo)):
            raise ValueError("the dtime components must be finite")
        h, l = dd_normalize(
            jnp.asarray(float(hi), self._dtype),
            jnp.asarray(float(lo), self._dtype),
        )
        self._t_hi, self._t_lo = h, l

    @property
    def last_h(self) -> float:
        return float(self._last_h)

    @property
    def tc(self) -> np.ndarray:
        """Taylor coefficients of the last step, shape (order+1, dim)."""
        return np.asarray(self._tc)[:, : self.dim]

    @property
    def with_events(self) -> bool:
        return self._ev_step is not None

    @property
    def t_events(self):
        return list(self._t_events)

    @property
    def nt_events(self):
        return list(self._nt_events)

    @property
    def te_cooldowns(self):
        """Current terminal-event cooldown values (heyoka
        ``get_te_cooldowns``; here a plain array, 0 = inactive)."""
        return np.asarray(self._te_cooldowns)

    def reset_cooldowns(self):
        """Zero all terminal-event cooldowns (heyoka ``reset_cooldowns``)."""
        self._te_cooldowns = jnp.zeros_like(self._te_cooldowns)

    # -- compiled drivers ------------------------------------------------------

    @cached_property
    def _step_jit(self):
        fns = self._fns

        @jax.jit
        def _step(state, pars, t_hi, t_lo, max_dt):
            new_state, h, tc = _loops.single_step(fns, state, pars, t_hi, max_dt)
            outcome = _loops.step_outcome(new_state, h, max_dt)
            nt_hi, nt_lo = dd_add_d(t_hi, t_lo, h)
            return new_state, h, tc, outcome, nt_hi, nt_lo

        return _step

    @cached_property
    def _pu_jit(self):
        return jax.jit(_loops.make_propagate_until(self._fns))

    @cached_property
    def _pg_jit(self):
        return jax.jit(_loops.make_propagate_grid(self._fns))

    #: device-side step-record buffer capacity per re-entry of the
    #: continuous-output driver (static shape; host accumulates chunks)
    _COUT_CHUNK = 1024

    @cached_property
    def _pu_ev_jit(self):
        from .events import make_propagate_until_ev

        pu = make_propagate_until_ev(
            self._ev_step_raw, self._order, self.dim,
            len(self._t_events), len(self._nt_events),
        )
        return jax.jit(pu)

    @cached_property
    def _pu_cout_jit(self):
        from .continuous import make_propagate_until_cout

        return jax.jit(make_propagate_until_cout(self._fns, self._COUT_CHUNK))

    @cached_property
    def _dout_jit(self):
        order = self._order

        @jax.jit
        def _dout(tc, rel):
            return _st.dense_output(tc, rel, order)

        return _dout

    # -- stepping ---------------------------------------------------------------

    def step(self, max_delta_t=None, write_tc: bool = False):
        """Take one adaptive step (forward), optionally capped at
        ``max_delta_t``; returns ``(outcome, h)`` like heyoka's ``step()``."""
        if max_delta_t is None:
            max_delta_t = _pymath.inf
        return self._do_step(float(max_delta_t))

    def step_backward(self, max_delta_t=None):
        if max_delta_t is None:
            max_delta_t = _pymath.inf
        return self._do_step(-abs(float(max_delta_t)))

    def _do_step(self, max_dt: float):
        if self._ev_step is not None:
            return self._do_step_events(max_dt)
        if self._nrt is not None:
            return self._do_step_native(max_dt)
        new_state, h, tc, outcome, nt_hi, nt_lo = self._step_jit(
            self._state, self._pars, self._t_hi, self._t_lo,
            jnp.asarray(max_dt, self._dtype),
        )
        self._state = new_state
        self._t_hi, self._t_lo = nt_hi, nt_lo
        self._last_h = h
        self._tc = tc
        return TaylorOutcome(int(outcome)), float(h)

    def _do_step_native(self, max_dt: float):
        st = np.asarray(self._state, np.float64).copy()
        if self._ncg is not None:
            st1 = st.reshape(1, -1)
            ths = np.array([float(self._t_hi)])
            tls = np.array([float(self._t_lo)])
            hs, ccs = self._ncg.step_batch(
                st1, np.asarray(self._pars, np.float64),
                ths, tls, np.array([max_dt]), self._high_accuracy,
            )
            h, th, tl, cc = float(hs[0]), ths[0], tls[0], ccs[0]
        else:
            h, th, tl, cc = self._nrt.step(
                st, np.asarray(self._pars, np.float64),
                float(self._t_hi), float(self._t_lo), max_dt, self._order,
                self._high_accuracy,
            )
        self._state = st
        self._t_hi = np.float64(th)
        self._t_lo = np.float64(tl)
        self._last_h = np.float64(h)
        self._tc = cc[:, : self.dim]
        if not (np.isfinite(st).all() and _pymath.isfinite(h)):
            return TaylorOutcome.err_nf_state, float(h)
        if abs(h) >= abs(max_dt):
            return TaylorOutcome.time_limit, float(h)
        return TaylorOutcome.success, float(h)

    def _do_step_events(self, max_dt: float):
        res = self._ev_step(
            self._state, self._pars, self._t_hi, self._t_lo,
            jnp.asarray(max_dt, self._dtype), self._te_cooldowns,
        )
        self._state = res["state"]
        self._t_hi, self._t_lo = res["t_hi"], res["t_lo"]
        self._last_h = res["last_h"]
        self._tc = res["tc"]
        self._te_cooldowns = res["cooldowns"]
        # fire host-side callbacks for detected events in chronological order
        from .events import dispatch_callbacks

        self._event_stop = dispatch_callbacks(self, res)
        oc = int(res["outcome"])
        return (
            TaylorOutcome(oc) if oc < 0 else oc,
            float(res["last_h"]),
        )

    # -- propagation -------------------------------------------------------------

    def propagate_until(
        self, t, *, max_delta_t=None, max_steps=0, callback=None, c_output=False
    ):
        """Propagate to time ``t``; returns (outcome, min_h, max_h, nsteps)
        — plus a :class:`ContinuousOutput` as 5th element when
        ``c_output=True`` (heyoka's ``kw::c_output``).

        Fully on-device (``lax.while_loop``); with events present, falls back
        to a per-step driver.  ``callback`` must be an in-graph step callback
        (see ``loops.make_propagate_until``).
        """
        t = float(t)
        if max_delta_t is None:
            max_delta_t = _pymath.inf
        if c_output:
            if (self._ev_step is not None or callback is not None
                    or self._nrt is not None):
                # events / host callbacks force per-step host dispatch, so
                # the recording happens in the stepwise driver (reference:
                # c_output recording is per accepted step regardless of
                # events, taylor_adaptive.cpp:1216); the native backend
                # records through its per-step driver too
                return self._propagate_until_cout_stepwise(
                    t, float(max_delta_t), int(max_steps), callback
                )
            return self._propagate_until_cout(t, float(max_delta_t), int(max_steps))
        if self._nrt is not None:
            if callback is not None:
                return self._propagate_until_stepwise(
                    t, float(max_delta_t), int(max_steps), callback
                )
            return self._propagate_until_native(
                t, float(max_delta_t), int(max_steps)
            )
        # in-graph callbacks (AngleReducer, StepCallbackSet, anything with
        # in_graph=True) are traced into the on-device loop; plain host
        # callables fall back to the stepwise driver
        in_graph_cb = callback is not None and (
            getattr(callback, "in_graph", False)
            or hasattr(callback, "pre_hook")
        )
        if in_graph_cb and self._ev_step is None:
            if hasattr(callback, "pre_hook"):
                callback.pre_hook(self)
            pu = jax.jit(
                _loops.make_propagate_until(self._fns, step_callback=callback)
            )
            res = pu(
                self._state, self._pars, self._t_hi, self._t_lo,
                jnp.asarray(t, self._dtype), jnp.asarray(0.0, self._dtype),
                jnp.asarray(float(max_delta_t), self._dtype),
                jnp.asarray(int(max_steps), jnp.int64),
            )
            self._state = res["state"]
            self._t_hi, self._t_lo = res["t_hi"], res["t_lo"]
            self._last_h = res["last_h"]
            self._tc = res["tc"]
            return (
                TaylorOutcome(int(res["outcome"])),
                float(res["min_h"]),
                float(res["max_h"]),
                int(res["nsteps"]),
            )
        if self._ev_step is not None or callback is not None:
            if (self._ev_step is not None and callback is None
                    and all(ev.callback is None for ev in self._t_events)):
                # events whose terminal members are pure-stop: whole
                # propagation on-device; nt callbacks are dispatched
                # chronologically afterwards (they observe the integrator at
                # its *final* state; the reference invokes them mid-flight
                # with the post-step state — identical for the common
                # (t, d_sgn)-only callbacks).  Terminal events with
                # callbacks (continue-vs-stop decided mid-flight) take the
                # stepwise driver below.
                return self._propagate_until_ev_fast(
                    t, float(max_delta_t), int(max_steps)
                )
            return self._propagate_until_stepwise(
                t, float(max_delta_t), int(max_steps), callback
            )
        res = self._pu_jit(
            self._state,
            self._pars,
            self._t_hi,
            self._t_lo,
            jnp.asarray(t, self._dtype),
            jnp.asarray(0.0, self._dtype),
            jnp.asarray(float(max_delta_t), self._dtype),
            jnp.asarray(int(max_steps), jnp.int64),
        )
        self._state = res["state"]
        self._t_hi, self._t_lo = res["t_hi"], res["t_lo"]
        self._last_h = res["last_h"]
        self._tc = res["tc"]
        return (
            TaylorOutcome(int(res["outcome"])),
            float(res["min_h"]),
            float(res["max_h"]),
            int(res["nsteps"]),
        )

    def _propagate_until_native(self, t, max_delta_t, max_steps):
        """Whole adaptive propagation in one native-runtime call (the C++
        host loop; no per-step Python or device dispatch)."""
        st = np.asarray(self._state, np.float64).copy()
        if self._ncg is not None:
            st1 = st.reshape(1, -1)
            ths = np.array([float(self._t_hi)])
            tls = np.array([float(self._t_lo)])
            stepsv, stats, ccs = self._ncg.propagate_until_batch(
                st1, np.asarray(self._pars, np.float64), ths, tls,
                np.array([t]), max_delta_t=max_delta_t,
                max_steps=max_steps, high_accuracy=self._high_accuracy,
            )
            steps, th, tl = int(stepsv[0]), ths[0], tls[0]
            min_h, max_h, last_h = stats[0]
            cc = ccs[0]
        else:
            steps, th, tl, min_h, max_h, last_h, cc = \
                self._nrt.propagate_until(
                    st, np.asarray(self._pars, np.float64),
                    float(self._t_hi), float(self._t_lo), t, self._order,
                    max_delta_t=max_delta_t, max_steps=max_steps,
                    high_accuracy=self._high_accuracy,
                )
        self._state = st
        self._t_hi = np.float64(th)
        self._t_lo = np.float64(tl)
        self._last_h = np.float64(last_h)
        if steps != 0:
            self._tc = cc[:, : self.dim]
        if steps < 0:
            return (TaylorOutcome.err_nf_state, min_h, max_h, -steps)
        # reference outcome semantics: time_limit when the target was
        # reached, step_limit when the step budget ran out first
        rem = t - (th + tl)
        fwd = last_h >= 0.0
        reached = rem <= 0.0 if fwd else rem >= 0.0
        if reached or not max_steps:
            return (TaylorOutcome.time_limit, min_h, max_h, steps)
        return (TaylorOutcome.step_limit, min_h, max_h, steps)

    def _propagate_until_cout(self, t, max_delta_t, max_steps):
        """Chunked continuous-output propagation: re-enter the bounded
        on-device recorder until the target is reached, concatenating the
        per-chunk step records host-side."""
        from .continuous import ContinuousOutput

        tgt_hi = jnp.asarray(t, self._dtype)
        tgt_lo = jnp.asarray(0.0, self._dtype)
        fwd = t >= self.time

        tcs, t_hi_list, t_lo_list = [], [], []
        min_h, max_h, nsteps = _pymath.inf, 0.0, 0
        while True:
            rem_steps = max(0, max_steps - nsteps) if max_steps else 0
            res = self._pu_cout_jit(
                self._state, self._pars, self._t_hi, self._t_lo,
                tgt_hi, tgt_lo,
                jnp.asarray(max_delta_t, self._dtype),
                jnp.asarray(rem_steps, jnp.int64),
            )
            n = int(res["rec_n"])
            if n:
                tcs.append(np.asarray(res["rec_tc"])[:n])
                rect = np.asarray(res["rec_t"])[:n]
                t_hi_list.append(rect[:, 0])
                t_lo_list.append(rect[:, 1])
            self._state = res["state"]
            self._t_hi, self._t_lo = res["t_hi"], res["t_lo"]
            self._last_h = res["last_h"]
            self._tc = res["tc"]
            min_h = min(min_h, float(res["min_h"]))
            max_h = max(max_h, float(res["max_h"]))
            nsteps += int(res["nsteps"])
            if bool(res["done"]) or int(res["nsteps"]) == 0:
                outcome = TaylorOutcome(int(res["outcome"]))
                break

        if tcs:
            all_tc = np.concatenate(tcs)[:, :, : self.dim]
            th = np.concatenate(t_hi_list + [np.asarray(self._t_hi)[None]])
            tl = np.concatenate(t_lo_list + [np.asarray(self._t_lo)[None]])
        else:
            all_tc = np.zeros((0, self._order + 1, self.dim), self._dtype)
            th = np.asarray(self._t_hi)[None]
            tl = np.asarray(self._t_lo)[None]
        c_out = ContinuousOutput(th, tl, all_tc, self._order, self.dim, fwd)
        return outcome, min_h, max_h, nsteps, c_out

    def _propagate_until_cout_stepwise(self, t, max_delta_t, max_steps,
                                       callback):
        """Continuous-output propagation through the stepwise driver (used
        when events or host callbacks require per-step dispatch): records
        each accepted step's start time and Taylor coefficients, mirroring
        the on-device recorder's conventions."""
        from ..callback import adapt_host_callback
        from .continuous import ContinuousOutput

        callback = adapt_host_callback(self, callback)

        fwd = t >= self.time
        th, tl, tcs = [], [], []
        min_h, max_h, nsteps = _pymath.inf, 0.0, 0
        outcome = TaylorOutcome.time_limit
        while True:
            rem = t - self.time
            if (rem <= 0 if fwd else rem >= 0):
                break
            cap = min(abs(rem), max_delta_t)
            th.append(float(self._t_hi))
            tl.append(float(self._t_lo))
            oc, h = self._do_step(cap if fwd else -cap)
            tcs.append(np.asarray(self._tc)[:, : self.dim])
            nsteps += 1
            min_h = min(min_h, abs(h))
            max_h = max(max_h, abs(h))
            if oc == TaylorOutcome.err_nf_state:
                outcome = oc
                break
            if isinstance(oc, int) and oc >= 0 and self._event_stop:
                outcome = oc  # stopping terminal event
                break
            if callback is not None and not callback(self):
                outcome = TaylorOutcome.cb_stop
                break
            if max_steps and nsteps >= max_steps:
                rem = t - self.time
                if not (rem <= 0 if fwd else rem >= 0):
                    outcome = TaylorOutcome.step_limit
                break
        if tcs:
            all_tc = np.stack(tcs)
            ths = np.asarray(th + [float(self._t_hi)])
            tls = np.asarray(tl + [float(self._t_lo)])
        else:
            all_tc = np.zeros((0, self._order + 1, self.dim), self._dtype)
            ths = np.asarray([float(self._t_hi)])
            tls = np.asarray([float(self._t_lo)])
        c_out = ContinuousOutput(ths, tls, all_tc, self._order, self.dim, fwd)
        return outcome, min_h, max_h, nsteps, c_out

    def _propagate_until_ev_fast(self, t, max_delta_t, max_steps):
        """On-device propagate-until with events (terminal ones pure-stop):
        chunked re-entry of the recording driver, then chronological nt
        callback dispatch (see ``events.make_propagate_until_ev``)."""
        min_h, max_h, nsteps = _pymath.inf, 0.0, 0
        fwd = t >= self.time
        hits_t, hits_i, hits_s = [], [], []
        while True:
            rem_steps = max(0, max_steps - nsteps) if max_steps else 0
            res = self._pu_ev_jit(
                self._state, self._pars, self._t_hi, self._t_lo,
                jnp.asarray(t, self._dtype), jnp.asarray(0.0, self._dtype),
                jnp.asarray(max_delta_t, self._dtype),
                jnp.asarray(rem_steps, jnp.int64),
                self._te_cooldowns,
                jnp.asarray(True),
            )
            n = int(res["rec_n"])
            if n:
                hits_t.append(np.asarray(res["rec_t"])[:n])
                hits_i.append(np.asarray(res["rec_idx"])[:n])
                hits_s.append(np.asarray(res["rec_sgn"])[:n])
            self._state = res["state"]
            self._t_hi, self._t_lo = res["t_hi"], res["t_lo"]
            self._last_h = res["last_h"]
            self._tc = res["tc"]
            self._te_cooldowns = res["cooldowns"]
            min_h = min(min_h, float(res["min_h"]))
            max_h = max(max_h, float(res["max_h"]))
            nsteps += int(res["nsteps"])
            if not bool(res["overflow"]):
                oc_val = int(res["outcome"])
                # non-negative = stopping terminal event index (outcome.py)
                outcome = TaylorOutcome(oc_val) if oc_val < 0 else oc_val
                break
        if hits_t:
            times = np.concatenate(hits_t)
            idxs = np.concatenate(hits_i)
            sgns = np.concatenate(hits_s)
            order_ = np.argsort(times) if fwd else np.argsort(-times)
            for k in order_:
                self._nt_events[int(idxs[k])].callback(
                    self, float(times[k]), int(sgns[k])
                )
        return outcome, min_h, max_h, nsteps

    def _propagate_until_stepwise(self, t, max_delta_t, max_steps, callback):
        # host-driven loop used when per-step host callbacks / events demand it
        from ..callback import adapt_host_callback

        callback = adapt_host_callback(self, callback)
        min_h, max_h = _pymath.inf, 0.0
        nsteps = 0
        fwd = t >= self.time
        while True:
            rem = t - self.time
            if (rem <= 0 if fwd else rem >= 0):
                return TaylorOutcome.time_limit, min_h, max_h, nsteps
            cap = min(abs(rem), max_delta_t)
            oc, h = self._do_step(cap if fwd else -cap)
            nsteps += 1
            min_h = min(min_h, abs(h))
            max_h = max(max_h, abs(h))
            if oc == TaylorOutcome.err_nf_state:
                return oc, min_h, max_h, nsteps
            if isinstance(oc, int) and oc >= 0 and self._event_stop:
                # stopping terminal event
                return oc, min_h, max_h, nsteps
            if callback is not None:
                if not callback(self):
                    return TaylorOutcome.cb_stop, min_h, max_h, nsteps
            if max_steps and nsteps >= max_steps:
                rem = t - self.time
                if (rem <= 0 if fwd else rem >= 0):
                    return TaylorOutcome.time_limit, min_h, max_h, nsteps
                return TaylorOutcome.step_limit, min_h, max_h, nsteps

    def propagate_for(self, delta_t, **kw):
        """Propagate for an amount of time (heyoka ``propagate_for``)."""
        hi, lo = dd_add_d(self._t_hi, self._t_lo, float(delta_t))
        # collapse dd target to (hi, lo) target handled by propagate_until
        target = float(hi) + float(lo)
        return self.propagate_until(target, **kw)

    def propagate_grid(self, grid, *, max_delta_t=None, max_steps=0,
                       callback=None):
        """Dense-output sampling at the points of a monotonic time grid;
        returns (outcome, min_h, max_h, nsteps, out[len(grid), dim]).

        With events present or a host ``callback`` (heyoka
        ``kw::callback``: invoked after every step, returning False stops
        with ``cb_stop``), a host-driven stepwise driver is used
        (reference: the event-aware ``propagate_grid_impl`` of
        taylor_adaptive.cpp); grid rows not reached before a stopping
        terminal event / callback stop / step limit / non-finite state are
        NaN.  In-graph callbacks trace into the on-device grid driver."""
        grid = np.asarray(grid, dtype=self._dtype)
        if grid.ndim != 1 or grid.size == 0:
            raise ValueError("grid must be a non-empty 1-D array")
        d = np.diff(grid)
        if not (np.all(d > 0) or np.all(d < 0)):
            if grid.size > 1:
                raise ValueError("grid must be strictly monotonic")
        if max_delta_t is None:
            max_delta_t = _pymath.inf
        in_graph_cb = callback is not None and (
            getattr(callback, "in_graph", False)
            or hasattr(callback, "pre_hook")
        )
        if in_graph_cb and self._ev_step is None:
            if hasattr(callback, "pre_hook"):
                callback.pre_hook(self)
            pg = jax.jit(
                _loops.make_propagate_grid(self._fns, step_callback=callback)
            )
            res = pg(
                self._state, self._pars, self._t_hi, self._t_lo,
                jnp.asarray(grid),
                jnp.asarray(float(max_delta_t), self._dtype),
                jnp.asarray(int(max_steps), jnp.int64),
            )
            self._state = res["state"]
            self._t_hi, self._t_lo = res["t_hi"], res["t_lo"]
            self._last_h = res["last_h"]
            self._tc = res["tc"]
            return (
                TaylorOutcome(int(res["outcome"])),
                float(res["min_h"]),
                float(res["max_h"]),
                int(res["nsteps"]),
                np.asarray(res["out"]),
            )
        if (self._ev_step is not None or callback is not None
                or self._nrt is not None):
            return self._propagate_grid_stepwise(
                grid, float(max_delta_t), int(max_steps), callback
            )
        res = self._pg_jit(
            self._state,
            self._pars,
            self._t_hi,
            self._t_lo,
            jnp.asarray(grid),
            jnp.asarray(float(max_delta_t), self._dtype),
            jnp.asarray(int(max_steps), jnp.int64),
        )
        self._state = res["state"]
        self._t_hi, self._t_lo = res["t_hi"], res["t_lo"]
        self._last_h = res["last_h"]
        self._tc = res["tc"]
        return (
            TaylorOutcome(int(res["outcome"])),
            float(res["min_h"]),
            float(res["max_h"]),
            int(res["nsteps"]),
            np.asarray(res["out"]),
        )

    def _propagate_grid_stepwise(self, grid, max_delta_t, max_steps,
                                 callback=None):
        """Event-aware propagate_grid: one adaptive step (with event
        detection) at a time; after each step, every grid point inside the
        step's span is evaluated with the dense-output kernel.  A stopping
        terminal event truncates the step at the event time, so dense output
        remains valid for the grid points it covers; later rows stay NaN."""
        from ..callback import adapt_host_callback

        callback = adapt_host_callback(self, callback)
        ngrid = grid.size
        out = np.full((ngrid, self.dim), np.nan, dtype=self._dtype)
        fwd = float(grid[-1]) >= self.time
        gi = 0
        # grid points exactly at the current time resolve to the current state
        while gi < ngrid and float(grid[gi]) == self.time:
            out[gi] = np.asarray(self._state)[: self.dim]
            gi += 1
        min_h, max_h, nsteps = _pymath.inf, 0.0, 0
        target = float(grid[-1])
        while gi < ngrid:
            rem = target - self.time
            if (rem <= 0 if fwd else rem >= 0):
                break
            cap = min(abs(rem), max_delta_t)
            oc, h = self._do_step(cap if fwd else -cap)
            nsteps += 1
            min_h = min(min_h, abs(h))
            max_h = max(max_h, abs(h))
            if oc == TaylorOutcome.err_nf_state:
                return oc, min_h, max_h, nsteps, out
            t_new = self.time
            while gi < ngrid and (
                float(grid[gi]) <= t_new if fwd else float(grid[gi]) >= t_new
            ):
                out[gi] = self.update_d_output(float(grid[gi]))
                gi += 1
            if isinstance(oc, int) and oc >= 0 and self._event_stop:
                return oc, min_h, max_h, nsteps, out
            if callback is not None and not callback(self):
                return TaylorOutcome.cb_stop, min_h, max_h, nsteps, out
            if max_steps and nsteps >= max_steps and gi < ngrid:
                return TaylorOutcome.step_limit, min_h, max_h, nsteps, out
        return TaylorOutcome.time_limit, min_h, max_h, nsteps, out

    # -- dense output ---------------------------------------------------------

    def update_d_output(self, t, rel_time: bool = False) -> np.ndarray:
        """Evaluate the dense output of the last step at absolute time ``t``
        (or at ``t`` relative to the last step's start when ``rel_time``)."""
        if rel_time:
            rel = jnp.asarray(float(t), self._dtype)
        else:
            # step start = current time - last_h (dd)
            sh, sl = dd_add_d(self._t_hi, self._t_lo, -float(self._last_h))
            rh, rl = dd_add_dd(
                jnp.asarray(float(t), self._dtype),
                jnp.asarray(0.0, self._dtype),
                -sh,
                -sl,
            )
            rel = rh + rl
        if self._nrt is not None:
            # host Horner over the stored coefficients (no device dispatch)
            tc = np.asarray(self._tc)
            res = tc[self._order]
            r = float(rel)
            for i in range(1, self._order + 1):
                res = tc[self._order - i] + res * r
            self._d_output = np.asarray(res[: self.dim])
            return self._d_output
        self._d_output = np.asarray(self._dout_jit(self._tc, rel))[: self.dim]
        return self._d_output

    @property
    def d_output(self) -> np.ndarray:
        """The last dense output computed by :meth:`update_d_output`
        (reference ``get_d_output``: zeros before the first call)."""
        if not hasattr(self, "_d_output"):
            self._d_output = np.zeros((self.dim,), dtype=self._dtype)
        return self._d_output

    def get_n_orig_sv(self) -> int:
        """Number of original (non-variational) state variables
        (reference ``get_n_orig_sv``)."""
        return self._vsys.n_orig if self._vsys is not None else self.dim

    # -- serialization (reference: Boost.Serialization of the integrator
    # mid-flight incl. dfloat time and cooldowns, taylor.hpp:1217-1240;
    # compiled drivers rebuild lazily, obj-code reuse comes from the jax
    # persistent compilation cache) ------------------------------------------

    def __getstate__(self):
        return {
            "vsys": self._vsys,
            "sys": self._sys,
            "tol": self._tol,
            "high_accuracy": self._high_accuracy,
            "compact_mode": self._compact_mode,
            "dtype": self._dtype.name,
            "t_events": self._t_events,
            "nt_events": self._nt_events,
            "state": np.asarray(self._state),
            "pars": np.asarray(self._pars),
            "t_hi": float(self._t_hi),
            "t_lo": float(self._t_lo),
            "last_h": float(self._last_h),
            "tc": np.asarray(self._tc),
            "cooldowns": np.asarray(self._te_cooldowns),
            "event_stop": self._event_stop,
            "backend": self._backend,
        }

    def __setstate__(self, st):
        self.__init__(
            st["sys"],
            st["state"],
            pars=st["pars"],
            tol=st["tol"],
            high_accuracy=st["high_accuracy"],
            compact_mode=st["compact_mode"],
            dtype=st["dtype"],
            t_events=st["t_events"],
            nt_events=st["nt_events"],
            # a pickled native-backend integrator degrades to jax when the
            # loading host has no compiler ("auto" semantics)
            backend="auto" if st.get("backend") == "native" else "jax",
        )
        self._t_hi = jnp.asarray(st["t_hi"], self._dtype)
        self._t_lo = jnp.asarray(st["t_lo"], self._dtype)
        self._last_h = jnp.asarray(st["last_h"], self._dtype)
        self._tc = jnp.asarray(st["tc"], self._dtype)
        self._te_cooldowns = jnp.asarray(st["cooldowns"], self._dtype)
        self._event_stop = st["event_stop"]
        self._vsys = st.get("vsys")

    def __repr__(self):
        return (
            f"TaylorAdaptive(order={self._order}, tol={self._tol}, "
            f"dim={self.dim}, time={self.time}, dtype={self._dtype.name}, "
            f"high_accuracy={self._high_accuracy})"
        )


def taylor_adaptive(sys, state, **kw) -> TaylorAdaptive:
    """Factory mirroring heyoka's ``taylor_adaptive<T>{...}`` ctor."""
    return TaylorAdaptive(sys, state, **kw)
