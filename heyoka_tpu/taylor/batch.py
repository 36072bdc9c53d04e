"""Batch-mode integrator: ``vmap`` over the scalar drivers.

Reference parity: heyoka ``taylor_adaptive_batch<T>``
(``include/heyoka/taylor.hpp:781-1121``, ``src/taylor_adaptive_batch.cpp``):
per-lane adaptive timesteps, per-lane times and outcomes, per-lane
``max_delta_t``, batch ``propagate_*`` with per-lane completion.

Where heyoka reaches SIMD lanes through LLVM vector types, here the scalar
step/propagate drivers are ``jax.vmap``-ed over a leading trajectory axis: the
batch dimension lands innermost in every elementwise op (batch-major layout on
the VPU), and the lockstep-with-masking semantics of the vmapped
``lax.while_loop`` reproduces the reference's per-lane step results exactly —
this collapses component #20 of the reference into #18 + a transform, the
design centerpiece called out in SURVEY.md §2.
"""

from __future__ import annotations

import math as _pymath
import os as _pyos
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from ..dfloat import dd_add_d
from ..expr.decompose import Tape, taylor_decompose_sys
from .adaptive import _normalize_sys
from .outcome import TaylorOutcome
from . import loops as _loops
from . import stepper as _st


class TaylorAdaptiveBatch:
    def __init__(
        self,
        sys,
        state,
        *,
        time=None,
        pars=None,
        tol=None,
        high_accuracy=False,
        compact_mode=False,
        dtype=jnp.float64,
        t_events=(),
        nt_events=(),
        mp_order=None,
        pallas_phase=False,
        fused_prop="auto",
        backend="jax",
    ):
        # a var_ode_sys may be passed directly, like the scalar integrator
        # (reference ``taylor_adaptive_batch{vsys, ...}``); original-only
        # per-lane ICs are augmented with the variational ICs automatically
        from ..varsys import var_ode_sys as _vsys_t

        self._vsys = sys if isinstance(sys, _vsys_t) else None
        if self._vsys is not None:
            state = np.asarray(state, dtype=np.float64)
            if state.ndim == 2 and state.shape[1] == self._vsys.n_orig:
                t0s = np.broadcast_to(
                    np.asarray(0.0 if time is None else time, np.float64),
                    (state.shape[0],),
                )
                pr = None if pars is None else np.asarray(pars)
                state = np.stack([
                    self._vsys.initial_state(
                        state[i],
                        pars=None if pr is None else pr[i],
                        t0=float(t0s[i]),
                    )
                    for i in range(state.shape[0])
                ])
            sys = self._vsys.sys
        self._sys = _normalize_sys(sys)
        self._dtype = jnp.dtype(dtype)
        if tol is None:
            tol = float(np.finfo(self._dtype).eps)
        self._tol = float(tol)
        self._order = _st.taylor_order_from_tol(self._tol)
        self._high_accuracy = bool(high_accuracy)
        # compact_mode: False (unrolled jet), True ("loop" engine),
        # "unrolled" (order-unrolled compact), or "flat" — the staged flat
        # engine (natively batched; step/propagate_until/for run through it,
        # the rest through the loop engine)
        self._compact_mode = (
            compact_mode if isinstance(compact_mode, str) else bool(compact_mode)
        )
        self._flat = compact_mode == "flat"
        # mixed precision for the flat engine: Taylor orders above mp_order
        # run in f32 (TPU-native extension; drift analysis in PERF.md).
        # Only meaningful with compact_mode="flat".
        self._mp_order = None if mp_order is None else int(mp_order)
        # pallas_phase: run the jet of the staged flat engine in a
        # VMEM-resident Pallas kernel.  "dd" = full jet in-kernel (orders
        # 1..mp_order in double-float two-f32, the rest f32 — the TPU fast
        # path, ~2M steps/s at the north-star workload), True = f32 phase
        # only, "auto" = "dd" on TPU when the tape qualifies else off,
        # "interpret"/"dd-interpret" for CPU tests.  Requires
        # compact_mode="flat" and mp_order.
        self._pallas_phase = pallas_phase
        # the pre-resolution user setting ("auto" stays "auto"): pickled so
        # that unpickling on a different backend re-resolves appropriately
        self._pallas_phase_setting = pallas_phase
        # fused_prop: run propagate_until/for through the multi-step Pallas
        # kernel (fused.py — the whole stepping loop in-kernel; exact f64
        # landing).  "auto" = on whenever the dd Pallas phase is active and
        # the tape qualifies (autonomous, in-kernel order-0 rules);
        # False = always the per-step XLA driver.
        self._fused_prop = fused_prop
        self._t_events = list(t_events)
        self._nt_events = list(nt_events)
        ev_eqs = [ev.expression for ev in self._t_events] + [
            ev.expression for ev in self._nt_events
        ]
        self._tape: Tape = taylor_decompose_sys(self._sys, extra_outputs=ev_eqs)

        if self._flat and self._mp_order is not None:
            # emulated-f64 backends (TPU) inherit the f32 exponent range:
            # cap mp_order so a dense-series tape's f64-phase coefficients
            # (~A rate^k/k!) stay representable (expr/series.mp_order_cap)
            import jax as _jax

            from ..expr.series import mp_order_cap as _mp_cap

            if _jax.default_backend() != "cpu":
                _cap = _mp_cap(self._tape)
                if _cap is not None and self._mp_order > _cap:
                    from ..logging import logger as _logger

                    _logger.info(
                        "capping mp_order %d -> %d: series coefficients "
                        "would leave the emulated-f64 range on this "
                        "backend", self._mp_order, _cap,
                    )
                    self._mp_order = _cap

        n_eq = self._tape.n_eq
        state = np.asarray(state, dtype=self._dtype)
        if state.ndim != 2 or state.shape[1] != n_eq:
            raise ValueError(
                f"batch state must have shape (batch, {n_eq}); got {state.shape}"
            )
        self._batch = state.shape[0]
        self._state = jnp.asarray(state)

        n_pars = self._tape.n_pars
        if pars is None:
            pars = np.zeros((self._batch, n_pars), dtype=self._dtype)
        pars = np.asarray(pars, dtype=self._dtype)
        if n_pars and pars.shape != (self._batch, n_pars):
            raise ValueError(
                f"batch pars must have shape ({self._batch}, {n_pars})"
            )
        self._pars = jnp.asarray(pars.reshape((self._batch, n_pars)))

        if time is None:
            time = np.zeros((self._batch,), dtype=self._dtype)
        time = np.broadcast_to(
            np.asarray(time, dtype=self._dtype), (self._batch,)
        )
        self._t_hi = jnp.asarray(time)
        self._t_lo = jnp.zeros((self._batch,), self._dtype)
        self._last_h = jnp.zeros((self._batch,), self._dtype)
        self._tc = jnp.zeros((self._batch, self._order + 1, n_eq), self._dtype)
        # per-lane power-of-two exponent of the SCALED stored tc
        # (d_i = c_i 2^(i sige); zero outside the flat mp engine)
        self._tc_sige = jnp.zeros((self._batch,), jnp.int32)
        # cross-step scale-feedback hint for the next step (32767 = none)
        self._sig_hint = jnp.full((self._batch,), jnp.int32(32767))

        # execution backend: "jax" (XLA/Pallas device engines), "native"
        # (the C++ host runtime, OpenMP over lanes — the low-latency choice
        # for small batches where per-dispatch overhead dominates), or
        # "auto" (native when eligible AND the batch is small; the
        # threshold — default 256 lanes — is where the device engines'
        # throughput overtakes the host cores, HEYOKA_NATIVE_BATCH_MAX).
        if backend not in ("jax", "native", "auto"):
            raise ValueError(f"unknown backend {backend!r}")
        self._backend_setting = backend
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
            else:
                thresh = int(_pyos.environ.get(
                    "HEYOKA_NATIVE_BATCH_MAX", "256"))
                if (eligible and self._batch <= thresh
                        and native_available()):
                    try:
                        self._nrt = NativeRuntime(self._tape)
                    except NotImplementedError:
                        self._nrt = None
        self._backend = "native" if self._nrt is not None else "jax"
        # AOT-compiled W=8-lane stepper (native_cg: the host analog of the
        # reference's SIMD batch mode; ~10x the interpreter runtime)
        self._ncg = None
        if self._nrt is not None and _pyos.environ.get(
                "HEYOKA_NATIVE_CG", "1") != "0":
            from ..native_cg import CompiledTape

            try:
                self._ncg = CompiledTape(self._tape, self._order, W=8)
            except Exception as e:
                from ..logging import logger as _logger

                _logger.debug("native codegen unavailable (%s); using the "
                              "interpreter runtime", e)

        # Stiff-tape auto-selection (emulated-f64 backends): XLA:TPU
        # emulates f64 with the f32 exponent range (~1e38), so tapes whose
        # Taylor coefficients grow like lam^k/k! (reference
        # benchmark/stiff_equation.cpp: ~8e77 at order 19) overflow every
        # unscaled engine on-chip.  Probe the initial jet on the host
        # runtime; when it leaves the representable range, promote the
        # scaled-carry flat engine (per-lane power-of-two coefficient
        # scaling, exact) with an mp_order that keeps the f64 phase in
        # range.  Native f64 backends (CPU, host runtime) are unaffected.
        if (self._backend == "jax" and self._compact_mode is False
                and self._dtype == jnp.dtype(jnp.float64)
                and _pyos.environ.get("HEYOKA_STIFF_AUTO", "1") != "0"
                and jax.default_backend() != "cpu"):
            probe = self._stiff_probe()
            if probe is not None:
                mx_by_order = probe
                if float(np.nanmax(mx_by_order)) > 1e30:
                    # largest f64-phase depth whose raw coefficients stay
                    # comfortably inside the emulated range
                    mp = 1
                    for k in range(1, min(8, self._order) + 1):
                        if float(np.nanmax(mx_by_order[: k + 1])) < 1e30:
                            mp = k
                    from ..logging import logger as _logger

                    _logger.warning(
                        "Taylor coefficients reach %.2e at order %d — "
                        "beyond this backend's emulated-f64 range; "
                        "auto-selecting the scaled-carry flat engine "
                        "(compact_mode='flat', mp_order=%d).  Pass "
                        "compact_mode explicitly or set "
                        "HEYOKA_STIFF_AUTO=0 to override.",
                        float(np.nanmax(mx_by_order)),
                        int(np.nanargmax(mx_by_order)), mp,
                    )
                    self._compact_mode = "flat"
                    self._flat = True
                    self._mp_order = mp

        self._fns = _loops.make_step_fns(
            self._tape, self._order, self._dtype, self._high_accuracy,
            compact_mode=True if self._flat else self._compact_mode,
        )
        if self._flat:
            # build (and so validate) the staged flat engine eagerly; raises
            # UnsupportedLoopOp for tapes outside its rule set
            from .compact_flat import make_batched_step_flat

            if self._pallas_phase == "auto":
                # "auto": the dd Pallas jet on TPU when mp_order is set and
                # the tape is inside the kernel's rule set; plain staged
                # XLA otherwise (CPU, unsupported ops, no mp_order)
                from .pallas_phase import UnsupportedPallasOp

                resolved = False
                if self._mp_order is not None and \
                        jax.default_backend() != "cpu":
                    try:
                        make_batched_step_flat(
                            self._tape, self._order, dtype=self._dtype,
                            high_accuracy=self._high_accuracy,
                            mp_order=self._mp_order,
                            layout="3d", unroll=True, staged=True,
                            return_tc=True, pallas_phase="dd",
                        )
                        resolved = "dd"
                    except UnsupportedPallasOp:
                        resolved = False
                self._pallas_phase = resolved
            self._flat_step = make_batched_step_flat(
                self._tape, self._order, dtype=self._dtype,
                high_accuracy=self._high_accuracy,
                mp_order=self._mp_order,
                layout="3d", unroll=True, staged=True,
                return_tc="scaled", pallas_phase=self._pallas_phase,
            )
        if self._t_events or self._nt_events:
            # natively batched event step (reference:
            # ed_data_batch::detect_events,
            # src/detail/event_detection.cpp:1733): the jet is vmapped but
            # root isolation runs dense over all batch*event rows through
            # the static subdivision tree (events_impl.py,
            # build_event_step_batch) — no per-lane isolator scatters
            from .compact_flat import jit_flat_step
            from .events_impl import build_event_step_batch

            flat_jet = None
            if self._flat:
                # the event jet rides the staged flat / dd-Pallas engine
                # (jet_mode): the vmapped loop-engine jet dominated the
                # batched event step (PERF.md round-2 events section)
                flat_jet = make_batched_step_flat(
                    self._tape, self._order, dtype=self._dtype,
                    high_accuracy=self._high_accuracy,
                    mp_order=self._mp_order,
                    layout="3d", unroll=True, staged=True,
                    pallas_phase=self._pallas_phase, jet_mode=True,
                )
            self._ev_step_raw = build_event_step_batch(
                self._fns, self._t_events, self._nt_events,
                self._dtype, self._tol, flat_jet=flat_jet,
            )
            # jit_flat_step: the flat jet's unrolled 3-D graph needs the
            # CPU pass workarounds (see compact_flat.jit_flat_step)
            self._ev_step = (
                jit_flat_step(self._ev_step_raw) if flat_jet is not None
                else jax.jit(self._ev_step_raw)
            )
        else:
            self._ev_step = None
            self._ev_step_raw = None
        self._te_cooldowns = jnp.zeros(
            (self._batch, len(self._t_events)), self._dtype
        )
        self._last_res = [(TaylorOutcome.success, 0.0)] * self._batch

    # -- introspection ---------------------------------------------------------

    def _stiff_probe(self):
        """Max |Taylor coefficient| per order of the initial jet, probed
        on the host runtime over <= 16 sampled lanes; None when the host
        runtime cannot evaluate this tape."""
        try:
            from ..native import native_available, native_jet

            if not native_available():
                return None
            idx = np.unique(np.linspace(
                0, self._batch - 1, min(16, self._batch)).astype(int))
            st = np.asarray(self._state, np.float64)
            pr = np.asarray(self._pars, np.float64)
            th = np.asarray(self._t_hi, np.float64)
            mx = np.zeros((self._order + 1,))
            for i in idx:
                cc = native_jet(self._tape, st[i],
                                pr[i] if pr.size else None,
                                float(th[i]), self._order)
                with np.errstate(invalid="ignore"):
                    mx = np.maximum(mx, np.nanmax(np.abs(cc), axis=1))
            return mx
        except Exception:
            return None

    @property
    def backend(self) -> str:
        """The resolved execution backend: "jax" or "native"."""
        return self._backend

    def engine_report(self) -> dict:
        """Resolved execution-engine provenance (the analog of the
        reference's IR-level opt_checks, ``test/opt_checks.cpp``): which
        backend, jet engine, Pallas phase and propagate driver this
        integrator will actually run — after all silent-fallback ladders
        (pallas "auto" resolution, fused->flat) have resolved.

        Keys: ``backend`` ("jax"/"native"), ``compact_mode``,
        ``pallas_phase`` (resolved: "dd", "dd-interpret", True, False),
        ``mp_order``, ``propagate_engine`` ("fused" — the multi-step
        Pallas kernel; "flat" — the per-step staged engine;
        "loop"/"events"/"native-cg"/"native-interp").
        """
        rep = dict(
            backend=self._backend,
            compact_mode=self._compact_mode,
            pallas_phase=self._pallas_phase,
            mp_order=self._mp_order,
        )
        meta = getattr(getattr(self, "_flat_step", None),
                       "_engine_meta", None)
        if meta is not None:
            rep["pallas_compact"] = meta["pallas_compact"]
            rep["pallas_rolled"] = meta["pallas_rolled"]
        if self._backend == "native":
            rep["propagate_engine"] = (
                "native-cg" if self._ncg is not None else "native-interp"
            )
        elif self._ev_step is not None:
            rep["propagate_engine"] = "events"
        else:
            self._pu_jit  # resolve the (cached) driver + fallback ladder
            rep["propagate_engine"] = self._pu_engine
        return rep

    def assert_engine(self, **expected):
        """Raise ``AssertionError`` unless :meth:`engine_report` matches
        every ``expected`` item — the user-facing guard against silent
        engine fallbacks (e.g. ``tb.assert_engine(propagate_engine="fused",
        pallas_phase="dd")`` after constructing a production integrator)."""
        rep = self.engine_report()
        for k, v in expected.items():
            if rep.get(k) != v:
                raise AssertionError(
                    f"engine check failed: {k}={rep.get(k)!r}, expected "
                    f"{v!r} (full report: {rep})"
                )
        return self

    @property
    def batch_size(self) -> int:
        return self._batch

    @property
    def compact_mode(self):
        return self._compact_mode

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
    def decomposition(self) -> Tape:
        return self._tape

    @property
    def sys(self):
        """The (normalized) ODE system (reference ``get_sys``)."""
        return self._sys

    @property
    def high_accuracy(self) -> bool:
        return self._high_accuracy

    # -- variational API (mirrors TaylorAdaptive; reference
    # taylor_adaptive_batch's variational members, taylor.hpp:958-1028) ---------

    def _check_variational(self, name):
        if self._vsys is None:
            raise ValueError(
                f"{name} requires an integrator built from a var_ode_sys"
            )

    @property
    def is_variational(self) -> bool:
        return self._vsys is not None

    def get_n_orig_sv(self) -> int:
        """Number of original (non-variational) state variables
        (reference ``get_n_orig_sv``)."""
        return self._vsys.n_orig if self._vsys is not None else self.dim

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
        """Evaluate the Taylor map at deviations ``s`` for every lane
        (reference ``taylor_adaptive_batch::eval_taylor_map``): ``s`` is
        ``(n_vargs,)`` (shared across lanes) or ``(batch, n_vargs)``;
        returns the ``(batch, n_orig)`` mapped states."""
        self._check_variational("eval_taylor_map")
        s = np.asarray(s, dtype=self._dtype)
        K = self._vsys.n_vargs
        if s.shape == (K,):
            s = np.broadcast_to(s, (self._batch, K))
        if s.shape != (self._batch, K):
            raise ValueError(
                f"expected deviations of shape ({K},) or "
                f"({self._batch}, {K}); got {s.shape}"
            )
        self._tstate = np.asarray(self._taylor_map(s, self.state))
        return self._tstate

    def get_tstate(self) -> np.ndarray:
        self._check_variational("get_tstate")
        if not hasattr(self, "_tstate"):
            self._tstate = np.zeros(
                (self._batch, self._vsys.n_orig), dtype=self._dtype
            )
        return self._tstate

    @property
    def state(self) -> np.ndarray:
        return np.asarray(self._state)

    @state.setter
    def state(self, v):
        v = np.asarray(v, dtype=self._dtype)
        if v.shape != (self._batch, self.dim):
            raise ValueError("bad state shape")
        self._state = jnp.asarray(v)

    @property
    def pars(self) -> np.ndarray:
        return np.asarray(self._pars)

    @pars.setter
    def pars(self, v):
        self._pars = jnp.asarray(
            np.asarray(v, dtype=self._dtype).reshape(self._pars.shape)
        )

    @property
    def time(self) -> np.ndarray:
        return np.asarray(self._t_hi + self._t_lo)

    def set_time(self, v):
        v = np.broadcast_to(np.asarray(v, dtype=self._dtype), (self._batch,))
        self._t_hi = jnp.asarray(v)
        self._t_lo = jnp.zeros((self._batch,), self._dtype)

    @property
    def dtime(self) -> tuple:
        """Per-lane (hi, lo) double-length times (heyoka ``get_dtime``)."""
        return np.asarray(self._t_hi), np.asarray(self._t_lo)

    def set_dtime(self, hi, lo):
        """Set the per-lane double-length times (heyoka ``set_dtime``)."""
        from ..dfloat import dd_normalize

        hi = np.broadcast_to(np.asarray(hi, self._dtype), (self._batch,))
        lo = np.broadcast_to(np.asarray(lo, self._dtype), (self._batch,))
        if not (np.isfinite(hi).all() and np.isfinite(lo).all()):
            raise ValueError("the dtime components must be finite")
        h, l = dd_normalize(jnp.asarray(hi), jnp.asarray(lo))
        self._t_hi, self._t_lo = h, l

    @property
    def last_h(self) -> np.ndarray:
        return np.asarray(self._last_h)

    @property
    def tc(self) -> np.ndarray:
        """Taylor coefficients of the last step, (batch, order+1, dim).

        The flat mp engine stores them scaled (d_i = c_i 2^(i sige)) so
        they stay within the f32 exponent range TPU's emulated f64
        inherits; reconstruction happens here on the host, where numpy
        is native f64 — the true coefficients are exact even when they
        exceed the device range (reference tc semantics)."""
        tc = np.asarray(self._tc)
        sge = np.asarray(self._tc_sige)
        if not sge.any():
            return tc
        i = np.arange(tc.shape[1], dtype=np.int64)
        return np.ldexp(tc, -i[None, :, None] * sge[:, None, None])

    @property
    def te_cooldowns(self) -> np.ndarray:
        """Per-lane terminal-event cooldowns (heyoka ``get_te_cooldowns``)."""
        return np.asarray(self._te_cooldowns)

    def reset_cooldowns(self, lane: int | None = None):
        """Zero terminal-event cooldowns, of one lane or all (heyoka
        ``reset_cooldowns``/``reset_cooldowns(i)``)."""
        if lane is None:
            self._te_cooldowns = jnp.zeros_like(self._te_cooldowns)
        else:
            self._te_cooldowns = self._te_cooldowns.at[int(lane)].set(0.0)

    # -- compiled drivers --------------------------------------------------------

    @cached_property
    def _step_jit(self):
        if self._flat:
            from .compact_flat import jit_flat_step
            from .outcome import TaylorOutcome as _TO

            stepf = self._flat_step

            def _batched(state, pars, t_hi, t_lo, max_dt, sig_hint):
                new_state, h, tc, sge, sig_next = stepf(
                    state, pars, t_hi, max_dt, sig_hint)
                finite = jnp.all(jnp.isfinite(new_state), axis=1) \
                    & jnp.isfinite(h)
                clamped = jnp.abs(h) >= jnp.abs(max_dt)
                outcome = jnp.where(
                    finite,
                    jnp.where(clamped, jnp.int32(_TO.time_limit),
                              jnp.int32(_TO.success)),
                    jnp.int32(_TO.err_nf_state),
                )
                nt_hi, nt_lo = dd_add_d(t_hi, t_lo, h)
                return (new_state, h, tc, sge, sig_next, outcome,
                        nt_hi, nt_lo)

            return jit_flat_step(_batched)
        fns = self._fns

        def _one(state, pars, t_hi, t_lo, max_dt, _sig_hint):
            new_state, h, tc = _loops.single_step(fns, state, pars, t_hi, max_dt)
            outcome = _loops.step_outcome(new_state, h, max_dt)
            nt_hi, nt_lo = dd_add_d(t_hi, t_lo, h)
            return (new_state, h, tc, jnp.int32(0), jnp.int32(32767),
                    outcome, nt_hi, nt_lo)

        return jax.jit(jax.vmap(_one))

    @cached_property
    def _pu_jit(self):
        if self._flat:
            from .compact_flat import (
                jit_flat_step, make_propagate_until_flat,
            )

            if (self._fused_prop in ("auto", True)
                    and self._pallas_phase in ("dd", "dd-interpret")):
                # fused multi-step kernel (fused.py): the whole stepping
                # loop in-kernel, exact f64 landing.  Falls back to the
                # per-step driver for tapes outside the kernel's rule set
                # (non-autonomous, ops without dd order-0 rules).
                from .pallas_phase import UnsupportedPallasOp
                from .fused import make_propagate_until_fused

                try:
                    pu = make_propagate_until_fused(
                        self._tape, self._order, dtype=self._dtype,
                        high_accuracy=self._high_accuracy,
                        mp_order=self._mp_order,
                        pallas_phase=self._pallas_phase,
                    )
                    self._pu_engine = "fused"
                    return jit_flat_step(pu)
                except UnsupportedPallasOp:
                    if self._fused_prop is True:
                        raise

            pu = make_propagate_until_flat(
                self._tape, self._order, dtype=self._dtype,
                high_accuracy=self._high_accuracy,
                mp_order=self._mp_order,
                pallas_phase=self._pallas_phase,
            )
            self._pu_engine = "flat"
            return jit_flat_step(pu)
        pu = _loops.make_propagate_until(self._fns)
        self._pu_engine = "native" if self._nrt is not None else "loop"
        return jax.jit(
            jax.vmap(pu, in_axes=(0, 0, 0, 0, 0, 0, 0, None))
        )

    @cached_property
    def _pg_jit(self):
        if self._flat:
            from .compact_flat import (
                jit_flat_step, make_propagate_grid_flat,
            )

            pg = make_propagate_grid_flat(
                self._tape, self._order, dtype=self._dtype,
                high_accuracy=self._high_accuracy,
                mp_order=self._mp_order,
                pallas_phase=self._pallas_phase,
            )
            return jit_flat_step(pg)
        pg = _loops.make_propagate_grid(self._fns)
        # shared grid across lanes (heyoka batch grid is shared too)
        return jax.jit(jax.vmap(pg, in_axes=(0, 0, 0, 0, None, 0, None)))

    def warmup(self, drivers=("step", "propagate_until"), grid_size=8):
        """Compile the requested jitted drivers now, concurrently.

        Each driver is invoked once with no-op arguments (``max_delta_t=0``
        for the step, ``target == t`` for the propagations) on its own
        thread; XLA releases the GIL while compiling, so the Mosaic/XLA
        compiles of the different enclosing programs overlap instead of
        serializing on first use (measured at the north-star workload:
        46 s + 44 s on first ``step()``/``propagate_until()`` vs ~33 s
        wall for both through ``warmup()``).  The analog of the
        reference's parallel multi-state JIT (`llvm_multi_state`,
        llvm_state.cpp) for cold-start latency.

        ``drivers`` may contain ``"step"``, ``"propagate_until"`` and
        ``"propagate_grid"`` (the grid driver's compile is specialized on
        the grid length, so pass the ``grid_size`` you will use).  Results
        are discarded; the integrator's state is not advanced.  Returns
        ``self`` so it chains: ``taylor_adaptive_batch(...).warmup()``.
        """
        import threading

        if self._nrt is not None:
            return self  # native backend: nothing to compile

        zero = jnp.zeros((self._batch,), self._dtype)
        ms0 = jnp.asarray(0, jnp.int64)
        calls = []
        if "step" in drivers:
            if self._ev_step is not None:
                calls.append(lambda: self._ev_step(
                    self._state, self._pars, self._t_hi, self._t_lo,
                    zero, self._te_cooldowns,
                ))
            else:
                calls.append(lambda: self._step_jit(
                    self._state, self._pars, self._t_hi, self._t_lo, zero,
                    self._sig_hint,
                ))
        if "propagate_until" in drivers:
            if self._ev_step is not None:
                calls.append(lambda: self._pu_ev_jit(
                    self._state, self._pars, self._t_hi, self._t_lo,
                    self._t_hi, self._t_lo, zero, ms0,
                    self._te_cooldowns,
                    jnp.zeros((self._batch,), bool),
                ))
            else:
                calls.append(lambda: self._pu_jit(
                    self._state, self._pars, self._t_hi, self._t_lo,
                    self._t_hi, self._t_lo, zero, ms0,
                ))
        if "propagate_grid" in drivers and self._ev_step is None:
            grid = jnp.broadcast_to(self._t_hi[0], (int(grid_size),))
            calls.append(lambda: self._pg_jit(
                self._state, self._pars, self._t_hi, self._t_lo,
                grid, zero, ms0,
            ))
        errs = []

        def run(fn):
            try:
                res = fn()
                jax.block_until_ready(res)
                # force a host read: on remote platforms (axon tunnel)
                # block_until_ready returns before the program actually
                # runs, and the backend defers the Mosaic kernel compile
                # to the first real execution — without this, warmup
                # "finishes" while the ~5-10 min kernel compile is still
                # pending and the user's first step()/propagate pays it
                # (measured: warmup 104 s then first step 640 s at
                # B=1024 without the read; ~0.07 s with it)
                leaf = jax.tree.leaves(res)[0]
                np.asarray(leaf).ravel()[:1]
            except Exception as e:  # surface compile errors to the caller
                errs.append(e)

        threads = [threading.Thread(target=run, args=(c,)) for c in calls]
        # the trace/lowering phases hold the GIL and only the backend
        # compiles overlap; a coarser switch interval keeps the
        # interleaved traces from thrashing (measured at the north-star
        # workload: 151 s -> ~84 s warmup wall)
        import sys as _sys
        _swi = _sys.getswitchinterval()
        _sys.setswitchinterval(0.05)
        try:
            for th in threads:
                th.start()
            for th in threads:
                th.join()
        finally:
            _sys.setswitchinterval(_swi)
        if errs:
            raise errs[0]
        return self

    # -- stepping ----------------------------------------------------------------

    def step(self, max_delta_t=None, write_tc: bool = False):
        """One adaptive step in every lane; per-lane results are available
        via ``get_step_res`` (heyoka ``taylor.hpp:1004``)."""
        if max_delta_t is None:
            mdt = jnp.full((self._batch,), _pymath.inf, self._dtype)
        else:
            mdt = jnp.broadcast_to(
                jnp.asarray(max_delta_t, self._dtype), (self._batch,)
            )
        if self._ev_step is not None:
            return self._step_events(mdt)
        if self._nrt is not None:
            return self._step_native(np.asarray(mdt, np.float64))
        new_state, h, tc, sge, sig_next, outcome, nt_hi, nt_lo = \
            self._step_jit(
                self._state, self._pars, self._t_hi, self._t_lo, mdt,
                self._sig_hint,
            )
        self._state, self._last_h, self._tc = new_state, h, tc
        self._tc_sige = jnp.broadcast_to(sge, (self._batch,))
        self._sig_hint = jnp.broadcast_to(sig_next, (self._batch,))
        self._t_hi, self._t_lo = nt_hi, nt_lo
        oc = np.asarray(outcome)
        hh = np.asarray(h)
        self._last_res = [
            (TaylorOutcome(int(oc[i])), float(hh[i])) for i in range(self._batch)
        ]

    def _step_native(self, mdt):
        sts = np.asarray(self._state, np.float64).copy()
        ths = np.asarray(self._t_hi, np.float64).copy()
        tls = np.asarray(self._t_lo, np.float64).copy()
        if self._ncg is not None:
            hs, ccs = self._ncg.step_batch(
                sts, np.asarray(self._pars, np.float64), ths, tls, mdt,
                self._high_accuracy,
            )
        else:
            hs, ccs = self._nrt.step_batch(
                sts, np.asarray(self._pars, np.float64), ths, tls, mdt,
                self._order, self._high_accuracy,
            )
        self._state = sts
        self._t_hi, self._t_lo = ths, tls
        self._last_h = hs
        self._tc = np.ascontiguousarray(ccs[:, :, : self.dim])
        self._tc_sige = np.zeros((self._batch,), np.int32)
        finite = np.isfinite(sts).all(axis=1) & np.isfinite(hs)
        clamped = np.abs(hs) >= np.abs(mdt)
        self._last_res = []
        for i in range(self._batch):
            if not finite[i]:
                oc = TaylorOutcome.err_nf_state
            elif clamped[i]:
                oc = TaylorOutcome.time_limit
            else:
                oc = TaylorOutcome.success
            self._last_res.append((oc, float(hs[i])))

    def _step_events(self, mdt):
        res = self._ev_step(
            self._state, self._pars, self._t_hi, self._t_lo, mdt,
            self._te_cooldowns,
        )
        self._state = res["state"]
        self._t_hi, self._t_lo = res["t_hi"], res["t_lo"]
        self._last_h = res["last_h"]
        self._tc = res["tc"]
        self._tc_sige = res.get("tc_sige", jnp.zeros((self._batch,), jnp.int32))
        self._te_cooldowns = res["cooldowns"]
        oc = np.asarray(res["outcome"])
        hh = np.asarray(res["last_h"])
        self._last_res = [
            (
                TaylorOutcome(int(oc[i])) if int(oc[i]) < 0 else int(oc[i]),
                float(hh[i]),
            )
            for i in range(self._batch)
        ]
        # chronological per-lane callback dispatch (reference:
        # taylor_adaptive_batch event branch)
        self._event_stop = np.zeros((self._batch,), bool)
        te_idx = np.asarray(res["te_idx"])
        nt_mask = np.asarray(res["nt_mask"])
        nt_times = np.asarray(res["nt_times"])
        nt_idx = np.asarray(res["nt_idx"])
        nt_sgn = np.asarray(res["nt_sgn"])
        for i in range(self._batch):
            if self._nt_events and nt_mask[i].any():
                t0 = float(np.asarray(self._t_hi)[i]) - float(hh[i])
                order = np.argsort(
                    np.abs(nt_times[i][nt_mask[i]] - t0), kind="stable"
                )
                sel_t = nt_times[i][nt_mask[i]]
                sel_i = nt_idx[i][nt_mask[i]]
                sel_s = nt_sgn[i][nt_mask[i]]
                for k in order:
                    ev = self._nt_events[int(sel_i[k])]
                    if ev.callback is not None:
                        ev.callback(self, float(sel_t[k]), int(sel_s[k]), i)
            ti = int(te_idx[i])
            if ti >= 0 and self._t_events:
                ev = self._t_events[ti]
                if ev.callback is None:
                    self._event_stop[i] = True
                else:
                    cont = ev.callback(self, int(np.asarray(res["te_sgn"])[i]), i)
                    self._event_stop[i] = cont is False

    @property
    def t_events(self):
        return list(self._t_events)

    @property
    def nt_events(self):
        return list(self._nt_events)

    def step_backward(self):
        self.step(max_delta_t=-_pymath.inf)

    def get_step_res(self):
        return list(self._last_res)

    def get_propagate_res(self):
        """Per-lane ``(outcome, min_h, max_h, nsteps)`` of the last
        ``propagate_*`` call (heyoka
        ``taylor_adaptive_batch::get_propagate_res``, ``taylor.hpp:1120``)."""
        if getattr(self, "_last_prop_res", None) is None:
            raise ValueError("no propagate_* call has completed yet")
        return list(self._last_prop_res)

    def _record_prop_res(self, res):
        oc, mn, mx, ns = res[0], res[1], res[2], res[3]
        mn, mx, ns = (np.asarray(a) for a in (mn, mx, ns))
        self._last_prop_res = [
            (oc[i], float(mn[i]), float(mx[i]), int(ns[i]))
            for i in range(len(oc))
        ]
        return res

    # -- dense output -----------------------------------------------------------

    def update_d_output(self, t, rel_time: bool = False) -> np.ndarray:
        """Per-lane dense output of the last step at time(s) ``t`` (scalar
        or per-lane array); shape (batch, dim) (reference
        ``taylor_adaptive_batch::update_d_output``)."""
        t = np.broadcast_to(np.asarray(t, dtype=self._dtype), (self._batch,))
        if rel_time:
            rel = jnp.asarray(t)
        else:
            start = self.time - self.last_h
            rel = jnp.asarray(t - start)
        order = self._order

        from .compact_flat import _ldexp2

        def one(tc, r, sge):
            # Horner over SCALED coefficients at u = r 2^-sge (exact):
            # never materializes the true c_i / r^i magnitudes on device
            u = _ldexp2(jnp, r, -sge)
            res = tc[order]
            for i in range(1, order + 1):
                res = tc[order - i] + res * u
            return res

        out = jax.vmap(one)(self._tc, rel, self._tc_sige)
        self._d_output = np.asarray(out)[:, : self.dim]
        return self._d_output

    @property
    def d_output(self) -> np.ndarray:
        """The last dense output computed by :meth:`update_d_output`
        (reference ``get_d_output``: zeros before the first call)."""
        if not hasattr(self, "_d_output"):
            self._d_output = np.zeros((self._batch, self.dim),
                                      dtype=self._dtype)
        return self._d_output

    # -- propagation ---------------------------------------------------------------

    @cached_property
    def _pu_cout_jit(self):
        from .continuous import make_propagate_until_cout

        pu = make_propagate_until_cout(self._fns, 1024)
        return jax.jit(jax.vmap(pu, in_axes=(0, 0, 0, 0, 0, 0, 0, None)))

    def propagate_until(self, t, *, max_delta_t=None, max_steps=0,
                        c_output=False, callback=None):
        """See :meth:`_propagate_until_impl`; the per-lane results are
        also stashed for :meth:`get_propagate_res`."""
        return self._record_prop_res(self._propagate_until_impl(
            t, max_delta_t=max_delta_t, max_steps=max_steps,
            c_output=c_output, callback=callback))

    def _propagate_until_impl(self, t, *, max_delta_t=None, max_steps=0,
                              c_output=False, callback=None):
        """Per-lane propagate-until; ``t`` may be scalar or per-lane.

        With ``c_output=True``, a :class:`ContinuousOutputBatch` is appended
        to the result tuple (heyoka ``taylor_adaptive_batch`` + c_output).
        ``callback`` (heyoka ``kw::callback``) is invoked after every
        lockstep step as ``cb(tb) -> bool``; False stops the still-running
        lanes with ``cb_stop``.  In-graph callbacks trace into the on-device
        driver (per lane), host callables take the stepwise driver.
        """
        t = np.broadcast_to(np.asarray(t, dtype=self._dtype), (self._batch,))
        if max_delta_t is None:
            max_delta_t = _pymath.inf
        mdt = np.broadcast_to(
            np.asarray(max_delta_t, dtype=self._dtype), (self._batch,)
        )
        if c_output:
            if self._ev_step is not None or callback is not None:
                return self._propagate_until_cout_stepwise(
                    t, mdt, int(max_steps), callback
                )
            return self._propagate_until_cout(t, mdt, int(max_steps))
        in_graph_cb = callback is not None and (
            getattr(callback, "in_graph", False)
            or hasattr(callback, "pre_hook")
        )
        if in_graph_cb and self._ev_step is None:
            if hasattr(callback, "pre_hook"):
                callback.pre_hook(self)
            pu = _loops.make_propagate_until(self._fns, step_callback=callback)
            fn = jax.jit(jax.vmap(pu, in_axes=(0, 0, 0, 0, 0, 0, 0, None)))
            res = fn(
                self._state, self._pars, self._t_hi, self._t_lo,
                jnp.asarray(t), jnp.zeros((self._batch,), self._dtype),
                jnp.asarray(mdt), jnp.asarray(int(max_steps), jnp.int64),
            )
            self._state = res["state"]
            self._t_hi, self._t_lo = res["t_hi"], res["t_lo"]
            self._last_h = res["last_h"]
            self._tc = res["tc"]
            self._tc_sige = res.get(
                "tc_sige", jnp.zeros((self._batch,), jnp.int32))
            oc = np.asarray(res["outcome"])
            self._last_res = [
                (TaylorOutcome(int(oc[i])),
                 float(np.asarray(res["last_h"])[i]))
                for i in range(self._batch)
            ]
            return (
                [TaylorOutcome(int(o)) for o in oc],
                np.asarray(res["min_h"]),
                np.asarray(res["max_h"]),
                np.asarray(res["nsteps"]),
            )
        if self._ev_step is not None or callback is not None:
            if (callback is None
                    and all(ev.callback is None for ev in self._t_events)):
                return self._propagate_until_ev_fast(t, mdt, int(max_steps))
            if callback is None and self._ev_step is not None:
                # terminal events WITH callbacks: detection + truncation
                # still run on device; callbacks dispatch between driver
                # re-entries (reference semantics: the callback decides
                # continue-vs-stop at the event time,
                # src/detail/event_detection.cpp:1733)
                return self._propagate_until_ev_cb(t, mdt, int(max_steps))
            return self._propagate_until_events(
                t, mdt, int(max_steps), callback
            )
        if self._nrt is not None:
            return self._propagate_until_native(t, mdt, int(max_steps))
        res = self._pu_jit(
            self._state,
            self._pars,
            self._t_hi,
            self._t_lo,
            jnp.asarray(t),
            jnp.zeros((self._batch,), self._dtype),
            jnp.asarray(mdt),
            jnp.asarray(int(max_steps), jnp.int64),
        )
        self._state = res["state"]
        self._t_hi, self._t_lo = res["t_hi"], res["t_lo"]
        self._last_h = res["last_h"]
        self._tc = res["tc"]
        self._tc_sige = res.get("tc_sige", jnp.zeros((self._batch,), jnp.int32))
        oc = np.asarray(res["outcome"])
        self._last_res = [
            (TaylorOutcome(int(oc[i])), float(np.asarray(res["last_h"])[i]))
            for i in range(self._batch)
        ]
        return (
            [TaylorOutcome(int(o)) for o in oc],
            np.asarray(res["min_h"]),
            np.asarray(res["max_h"]),
            np.asarray(res["nsteps"]),
        )

    def _propagate_until_native(self, t, mdt, max_steps):
        """Batched whole propagation through the native host runtime
        (one C++ call, OpenMP over lanes; no device dispatch)."""
        sts = np.asarray(self._state, np.float64).copy()
        ths = np.asarray(self._t_hi, np.float64).copy()
        tls = np.asarray(self._t_lo, np.float64).copy()
        if self._ncg is not None:
            steps, stats, ccs = self._ncg.propagate_until_batch(
                sts, np.asarray(self._pars, np.float64), ths, tls,
                np.asarray(t, np.float64),
                max_delta_t=mdt, max_steps=max_steps,
                high_accuracy=self._high_accuracy,
            )
        else:
            steps, stats, ccs = self._nrt.propagate_until_batch(
                sts, np.asarray(self._pars, np.float64), ths, tls,
                np.asarray(t, np.float64), self._order,
                max_delta_t=mdt, max_steps=max_steps,
                high_accuracy=self._high_accuracy,
            )
        self._state = sts
        self._t_hi, self._t_lo = ths, tls
        self._last_h = stats[:, 2].copy()
        took = steps != 0
        if took.any():
            tc = np.asarray(self._tc, np.float64).copy()
            tc[took] = ccs[took][:, :, : self.dim]
            self._tc = tc
            self._tc_sige = np.where(
                took, 0, np.asarray(self._tc_sige)).astype(np.int32)
        outcomes = []
        for i in range(self._batch):
            if steps[i] < 0:
                outcomes.append(TaylorOutcome.err_nf_state)
                continue
            rem = float(t[i]) - (ths[i] + tls[i])
            fwd = stats[i, 2] >= 0.0
            reached = rem <= 0.0 if fwd else rem >= 0.0
            if reached or not max_steps:
                outcomes.append(TaylorOutcome.time_limit)
            else:
                outcomes.append(TaylorOutcome.step_limit)
        nsteps = np.abs(steps)
        self._last_res = [
            (outcomes[i], float(stats[i, 2])) for i in range(self._batch)
        ]
        return outcomes, stats[:, 0].copy(), stats[:, 1].copy(), nsteps

    def _propagate_until_cout(self, t, mdt, max_steps):
        """Chunked per-lane continuous-output recording: re-enter the vmapped
        bounded recorder until every lane reaches its target, concatenating
        per-lane records host-side and padding to the longest lane."""
        from .continuous import ContinuousOutputBatch

        fwd = t >= self.time
        lane_tc = [[] for _ in range(self._batch)]
        lane_th = [[] for _ in range(self._batch)]
        lane_tl = [[] for _ in range(self._batch)]
        min_h = np.full((self._batch,), _pymath.inf)
        max_h = np.zeros((self._batch,))
        nsteps = np.zeros((self._batch,), np.int64)
        while True:
            res = self._pu_cout_jit(
                self._state, self._pars, self._t_hi, self._t_lo,
                jnp.asarray(t), jnp.zeros((self._batch,), self._dtype),
                jnp.asarray(mdt), jnp.asarray(int(max_steps), jnp.int64),
            )
            rec_n = np.asarray(res["rec_n"])
            rec_tc = np.asarray(res["rec_tc"])
            rec_t = np.asarray(res["rec_t"])
            for i in range(self._batch):
                n = int(rec_n[i])
                if n:
                    lane_tc[i].append(rec_tc[i, :n])
                    lane_th[i].append(rec_t[i, :n, 0])
                    lane_tl[i].append(rec_t[i, :n, 1])
            self._state = res["state"]
            self._t_hi, self._t_lo = res["t_hi"], res["t_lo"]
            self._last_h = res["last_h"]
            self._tc = res["tc"]
            self._tc_sige = res.get(
                "tc_sige", jnp.zeros((self._batch,), jnp.int32))
            min_h = np.minimum(min_h, np.asarray(res["min_h"]))
            max_h = np.maximum(max_h, np.asarray(res["max_h"]))
            chunk_steps = np.asarray(res["nsteps"])
            nsteps += chunk_steps
            if bool(np.all(np.asarray(res["done"]))) or int(chunk_steps.max()) == 0:
                oc = np.asarray(res["outcome"])
                break

        # pad lanes to the longest step count; pad boundaries at +-inf so the
        # searchsorted never selects a pad slot
        fin_th = np.asarray(self._t_hi)
        fin_tl = np.asarray(self._t_lo)
        counts = np.array([sum(a.shape[0] for a in lane_tc[i]) for i in range(self._batch)])
        cap = max(1, int(counts.max()))
        tcs = np.zeros((self._batch, cap, self._order + 1, self.dim), self._dtype)
        th = np.zeros((self._batch, cap + 1), self._dtype)
        tl = np.zeros((self._batch, cap + 1), self._dtype)
        for i in range(self._batch):
            n = int(counts[i])
            pad = np.inf if fwd[i] else -np.inf
            th[i, :] = pad
            tl[i, :] = 0.0
            if n:
                tcs[i, :n] = np.concatenate(lane_tc[i])
                th[i, :n] = np.concatenate(lane_th[i])
                tl[i, :n] = np.concatenate(lane_tl[i])
            th[i, n] = fin_th[i]
            tl[i, n] = fin_tl[i]
        c_out = ContinuousOutputBatch(
            th, tl, tcs, counts, self._order, self.dim, jnp.asarray(fwd)
        )
        outcomes = [TaylorOutcome(int(o)) for o in oc]
        self._last_res = [
            (outcomes[i], float(np.asarray(self._last_h)[i]))
            for i in range(self._batch)
        ]
        return outcomes, min_h, max_h, nsteps, c_out

    @cached_property
    def _pu_ev_jit(self):
        import os as _osm

        from .compact_flat import jit_flat_step
        from .events import make_propagate_until_ev_batch

        # steps per device chunk: larger chunks amortize the per-chunk
        # tunnel round trip + host hit decode (HEYOKA_EV_CHUNK to tune;
        # the deferred-isolation record budget caps it internally); default 96: measured 2.97x end-to-end on the HH Poincare bench vs 3.12x at 64 (PERF.md round 5)
        pu = make_propagate_until_ev_batch(
            self._ev_step_raw, self._order, self.dim,
            len(self._t_events), len(self._nt_events),
            chunk=int(_osm.environ.get("HEYOKA_EV_CHUNK", "96")),
        )
        # jit_flat_step: a flat-engine event jet inside the driver needs
        # the CPU pass workarounds (no-op on TPU)
        return jit_flat_step(pu) if self._flat else jax.jit(pu)

    @cached_property
    def _pu_ev_full_jit(self):
        import os as _osm

        from .compact_flat import jit_flat_step
        from .events import make_propagate_until_ev_batch_full

        pu = make_propagate_until_ev_batch_full(
            self._ev_step_raw, self._order, self.dim,
            len(self._t_events), len(self._nt_events),
            chunk=int(_osm.environ.get("HEYOKA_EV_CHUNK", "96")),
            gcap=int(_osm.environ.get("HEYOKA_EV_GCAP", "256")),
        )
        return jit_flat_step(pu) if self._flat else jax.jit(pu)

    def _propagate_until_ev_full(self, t, mdt, max_steps):
        """Whole-propagation event driver: ONE device dispatch for the
        entire propagate_until (events.make_propagate_until_ev_batch_full
        — the chunk machinery inside an outer while_loop with a
        device-resident global hit buffer).  Returns None when a lane
        overflowed its hit budget; the caller then re-runs the chunked
        driver from the (untouched) pre-call state."""
        from .events_impl import MAX_ROOTS as _MR

        n_sv = self.dim + len(self._t_events) + len(self._nt_events)
        tc0 = self._tc
        if tc0.shape[2] != n_sv:
            tc0 = jnp.concatenate(
                [tc0, jnp.zeros(
                    (self._batch, self._order + 1, n_sv - tc0.shape[2]),
                    self._dtype)],
                axis=2,
            )
        res = self._pu_ev_full_jit(
            self._state, self._pars, self._t_hi, self._t_lo,
            jnp.asarray(t), jnp.zeros((self._batch,), self._dtype),
            jnp.asarray(mdt), jnp.asarray(max_steps, jnp.int64),
            self._te_cooldowns, jnp.ones((self._batch,), bool),
            self._last_h, tc0,
        )
        # (B, 8 + 2*gcap): ONE transfer carries the summary and both
        # global hit buffers (each extra np.asarray is a ~50 ms tunnel
        # round trip on remote-attached backends)
        PF = np.asarray(res["packed"])
        P = PF[:, :8]
        gcap = (PF.shape[1] - 8) // 2
        if P[:, 7].any():  # overflow: hit budget exceeded somewhere
            return None
        fwd = t >= self.time
        self._state = res["state"]
        self._t_hi, self._t_lo = res["t_hi"], res["t_lo"]
        self._last_h = res["last_h"]
        self._tc = res["tc"]
        self._tc_sige = res.get("tc_sige", jnp.zeros((self._batch,), jnp.int32))
        self._te_cooldowns = res["cooldowns"]
        counts = P[:, 6].astype(np.int32)
        if counts.any() and self._nt_events:
            g_t = PF[:, 8:8 + gcap]
            g_meta = PF[:, 8 + gcap:].astype(np.int64)
            if all(getattr(ev.callback, "vectorized", False)
                   for ev in self._nt_events):
                # vectorized dispatch: ONE call per event with per-lane
                # chronologically ordered (t, sign, lane) arrays.  The
                # per-hit Python loop below costs ~20-40 us per hit —
                # ~1.3 s of the Henon-Heiles Poincare bench's 2.6 s at
                # 30k crossings — where the reference pays an inlined
                # C++ callback (doc/benchmarks.rst:105-160); opting a
                # callback in with `.vectorized = True` is the
                # array-native equivalent.
                G = g_t.shape[1]
                msk = np.arange(G)[None, :] < counts[:, None]
                lanes = np.broadcast_to(
                    np.arange(self._batch)[:, None], msk.shape)[msk]
                ts = g_t[msk]
                meta = g_meta[msk].astype(np.int64)
                tkey = np.where(fwd[lanes], ts, -ts)
                order_ = np.lexsort((tkey, lanes))
                lanes, ts, meta = lanes[order_], ts[order_], meta[order_]
                ev_idx = (meta // 4) // _MR
                sgn = (meta % 4 - 2).astype(np.int32)
                for j, ev in enumerate(self._nt_events):
                    m = ev_idx == j
                    if m.any():
                        ev.callback(self, ts[m], sgn[m], lanes[m])
            else:
                for i in range(self._batch):
                    n = int(counts[i])
                    if not n:
                        continue
                    ts = g_t[i, :n]
                    meta = g_meta[i, :n]
                    order_ = np.argsort(ts) if fwd[i] else np.argsort(-ts)
                    for k in order_:
                        sl = int(meta[k]) // 4
                        self._nt_events[sl // _MR].callback(
                            self, float(ts[k]), int(meta[k] % 4) - 2, i
                        )
        # packed layout (events.py): [min_h, max_h, nsteps, outcome,
        # te_idx, te_sgn, counts, overflow]
        oc = P[:, 3].astype(np.int32)
        self._last_te_sgn = P[:, 5].astype(np.int32)
        outcomes = [
            TaylorOutcome(int(o)) if int(o) < 0 else int(o) for o in oc
        ]
        last_h_np = np.asarray(self._last_h)
        self._last_res = [
            (outcomes[i], float(last_h_np[i])) for i in range(self._batch)
        ]
        return (
            outcomes, P[:, 0], P[:, 1], P[:, 2].astype(np.int64),
        )

    def _propagate_until_ev_cb(self, t, mdt, max_steps):
        """Terminal events with callbacks through the ON-DEVICE driver
        (lifting the host-stepwise fallback, VERDICT r4 item 7): each
        round runs the whole-propagation event driver (detection,
        truncation, cooldown setting all on device); lanes stopped by a
        terminal event then dispatch their callbacks on the host, and
        lanes whose callback elects to continue re-enter the driver from
        the (truncated) event state — the cooldown set on the hit
        prevents immediate re-detection, exactly the reference's resume
        protocol (taylor_adaptive.cpp:868-890)."""
        B = self._batch
        tgt = np.array(np.broadcast_to(t, (B,)), np.float64)
        fin_oc = [None] * B
        min_h = np.full((B,), _pymath.inf)
        max_h = np.zeros((B,))
        nsteps = np.zeros((B,), np.int64)
        self._event_stop = np.zeros((B,), bool)
        while True:
            rem_steps = (max(0, max_steps - int(nsteps.max()))
                         if max_steps else 0)
            oc, mn, mx, ns = self._propagate_until_ev_fast(
                tgt, mdt, rem_steps
            )
            min_h = np.minimum(min_h, mn)
            max_h = np.maximum(max_h, mx)
            nsteps += np.asarray(ns)
            te_sgn = np.asarray(
                getattr(self, "_last_te_sgn", np.zeros((B,), np.int32))
            )
            cur_t = np.asarray(self._t_hi) + np.asarray(self._t_lo)
            resumed = False
            for i in range(B):
                if fin_oc[i] is not None:
                    continue
                o = oc[i]
                if isinstance(o, (int, np.integer)) and int(o) >= 0:
                    ev = self._t_events[int(o)]
                    if ev.callback is None:
                        fin_oc[i] = int(o)
                        self._event_stop[i] = True
                        continue
                    cont = ev.callback(self, int(te_sgn[i]), i)
                    # False (incl. numpy bools) stops the lane; None (no
                    # return) or truthy continues — reference semantics
                    if cont is not None and not bool(cont):
                        fin_oc[i] = int(o)
                        self._event_stop[i] = True
                    else:
                        resumed = True  # lane continues toward its target
                else:
                    fin_oc[i] = o
            if not resumed:
                break
            # freeze finalized lanes: target = their current time
            for i in range(B):
                if fin_oc[i] is not None:
                    tgt[i] = cur_t[i]
        outcomes = [
            TaylorOutcome(o) if isinstance(o, (int, np.integer)) and o < 0
            else (int(o) if isinstance(o, (int, np.integer)) else o)
            for o in fin_oc
        ]
        last_h_np = np.asarray(self._last_h)
        self._last_res = [
            (outcomes[i], float(last_h_np[i])) for i in range(B)
        ]
        return outcomes, min_h, max_h, nsteps

    def _propagate_until_ev_fast(self, t, mdt, max_steps):
        """On-device lockstep propagate-until with events (terminal ones
        pure-stop): the natively batched recording driver of
        ``events.make_propagate_until_ev_batch``; per-lane nt callbacks
        ``cb(tb, t, d_sgn, lane)`` are dispatched chronologically (within
        each lane) after the loop.

        Chunk dispatches are *pipelined*: each chunk's inputs are device
        arrays from the previous chunk (``active = ~done``), so up to three
        chunks are in flight while the host decodes an earlier chunk's
        packed summary — the ~50 ms tunnel round trip per 64-step chunk
        dominated the sequential loop (the reference's batch driver has no
        such latency, src/detail/event_detection.cpp:1733).  A step limit
        needs host-side nsteps feedback per chunk and stays sequential.

        The whole-propagation driver (one device dispatch, global hit
        buffer) runs first; this chunked loop is its overflow fallback
        and the HEYOKA_EV_NO_FULL=1 escape hatch."""
        from collections import deque

        import os as _osm

        if not int(_osm.environ.get("HEYOKA_EV_NO_FULL", "0")):
            full = self._propagate_until_ev_full(t, mdt, max_steps)
            if full is not None:
                return full

        min_h = np.full((self._batch,), _pymath.inf)
        max_h = np.zeros((self._batch,))
        nsteps = np.zeros((self._batch,), np.int64)
        fwd = t >= self.time
        lane_hits = [[] for _ in range(self._batch)]
        lane_done = np.zeros((self._batch,), bool)
        oc = np.full((self._batch,), int(TaylorOutcome.time_limit), np.int32)
        te_sgns = np.zeros((self._batch,), np.int32)

        n_sv = self.dim + len(self._t_events) + len(self._nt_events)
        tc0 = self._tc
        if tc0.shape[2] != n_sv:
            tc0 = jnp.concatenate(
                [tc0, jnp.zeros(
                    (self._batch, self._order + 1, n_sv - tc0.shape[2]),
                    self._dtype)],
                axis=2,
            )
        dev = dict(
            state=self._state, t_hi=self._t_hi, t_lo=self._t_lo,
            cooldowns=self._te_cooldowns, last_h=self._last_h, tc=tc0,
            active=jnp.ones((self._batch,), bool),
        )
        t_j = jnp.asarray(t)
        mdt_j = jnp.asarray(mdt)
        zero_lo = jnp.zeros((self._batch,), self._dtype)
        max_depth = 1 if max_steps else 3
        inflight = deque()
        all_done = False

        def dispatch():
            nonlocal dev
            rem_steps = (
                max(0, max_steps - int(nsteps.max())) if max_steps else 0
            )
            res = self._pu_ev_jit(
                dev["state"], self._pars, dev["t_hi"], dev["t_lo"],
                t_j, zero_lo, mdt_j, jnp.asarray(rem_steps, jnp.int64),
                dev["cooldowns"], dev["active"], dev["last_h"], dev["tc"],
            )
            dev = dict(
                state=res["state"], t_hi=res["t_hi"], t_lo=res["t_lo"],
                cooldowns=res["cooldowns"], last_h=res["last_h"],
                tc=res["tc"], active=~res["done"],
            )
            # start the packed summary's device->host transfer now: by the
            # time this chunk is popped for decoding the copy has landed,
            # so np.asarray returns without a synchronous ~50 ms tunnel
            # round trip (the decode then overlaps the in-flight chunks)
            try:
                res["packed"].copy_to_host_async()
            except (AttributeError, TypeError):
                pass
            inflight.append(res)

        depth = 1  # ramp up: short propagations don't pay no-op chunks
        while True:
            while len(inflight) < depth and not all_done:
                dispatch()
            res = inflight.popleft()
            # one packed host transfer per chunk carries every summary
            # field (each np.asarray is a separate ~50 ms tunnel round trip)
            summary = unpack_ev_summary(res, len(self._nt_events))
            if summary["it"] and self._nt_events:
                _decode_hits(summary, res, len(self._nt_events), lane_hits)
            min_h = np.minimum(min_h, summary["min_h"])
            max_h = np.maximum(max_h, summary["max_h"])
            nsteps += summary["nsteps"]
            newly = ~lane_done & summary["done"]
            oc = np.where(newly, summary["outcome"], oc)
            te_sgns = np.where(newly, summary["te_sgn"], te_sgns)
            lane_done |= newly
            all_done = all_done or bool(lane_done.all())
            if all_done and not inflight:
                break
            depth = min(max_depth, depth + 1)
        # the last dispatched chunk's outputs are the final integrator
        # data (trailing no-op chunks pass frozen lanes through unchanged)
        self._state = dev["state"]
        self._t_hi, self._t_lo = dev["t_hi"], dev["t_lo"]
        self._last_h = dev["last_h"]
        self._tc = dev["tc"]
        self._tc_sige = jnp.zeros((self._batch,), jnp.int32)  # event jets: unscaled
        self._te_cooldowns = dev["cooldowns"]
        for i in range(self._batch):
            if not lane_hits[i]:
                continue
            times = np.array([h[0] for h in lane_hits[i]])
            idxs = np.array([h[1] for h in lane_hits[i]])
            sgns = np.array([h[2] for h in lane_hits[i]])
            order_ = np.argsort(times) if fwd[i] else np.argsort(-times)
            for k in order_:
                self._nt_events[int(idxs[k])].callback(
                    self, float(times[k]), int(sgns[k]), i
                )
        # non-negative lane outcome = stopping terminal event index
        self._last_te_sgn = te_sgns
        outcomes = [
            TaylorOutcome(int(o)) if int(o) < 0 else int(o) for o in oc
        ]
        self._last_res = [
            (outcomes[i], float(np.asarray(self._last_h)[i]))
            for i in range(self._batch)
        ]
        return outcomes, min_h, max_h, nsteps

    def _propagate_until_cout_stepwise(self, t, mdt, max_steps,
                                       callback=None):
        """Per-lane continuous-output recording through the stepwise driver
        (used with events or host callbacks: per-step host dispatch is
        already required); records each active lane's step start time +
        Taylor coefficients, padded to the longest lane like the on-device
        batch recorder."""
        from ..callback import adapt_host_callback
        from .continuous import ContinuousOutputBatch

        callback = adapt_host_callback(self, callback)

        fwd = t >= self.time
        lane_tc = [[] for _ in range(self._batch)]
        lane_th = [[] for _ in range(self._batch)]
        lane_tl = [[] for _ in range(self._batch)]
        min_h = np.full((self._batch,), _pymath.inf)
        max_h = np.zeros((self._batch,))
        nsteps = np.zeros((self._batch,), np.int64)
        outcomes = [TaylorOutcome.time_limit] * self._batch
        done = np.zeros((self._batch,), bool)
        while not done.all():
            rem = t - self.time
            arrived = np.where(fwd, rem <= 0, rem >= 0)
            done |= arrived
            if done.all():
                break
            cap = np.minimum(np.abs(rem), mdt)
            cap = np.where(done, 0.0, cap)
            step_mdt = np.where(fwd, cap, -cap)
            start_hi = np.asarray(self._t_hi)
            start_lo = np.asarray(self._t_lo)
            self.step(max_delta_t=step_mdt)
            tc_now = np.asarray(self._tc)[:, :, : self.dim]
            for i in range(self._batch):
                if done[i]:
                    continue
                oc, h = self._last_res[i]
                lane_th[i].append(start_hi[i])
                lane_tl[i].append(start_lo[i])
                lane_tc[i].append(tc_now[i])
                nsteps[i] += 1
                min_h[i] = min(min_h[i], abs(h))
                max_h[i] = max(max_h[i], abs(h))
                if oc == TaylorOutcome.err_nf_state:
                    outcomes[i] = oc
                    done[i] = True
                elif (self._ev_step is not None and isinstance(oc, int)
                        and oc >= 0 and self._event_stop[i]):
                    outcomes[i] = oc
                    done[i] = True
            if callback is not None and not callback(self):
                for i in range(self._batch):
                    if not done[i]:
                        outcomes[i] = TaylorOutcome.cb_stop
                break
            if max_steps and int(nsteps.max()) >= max_steps:
                for i in range(self._batch):
                    if not done[i]:
                        outcomes[i] = TaylorOutcome.step_limit
                break

        fin_th = np.asarray(self._t_hi)
        fin_tl = np.asarray(self._t_lo)
        counts = np.array([len(lane_tc[i]) for i in range(self._batch)])
        cap_n = max(1, int(counts.max()))
        tcs = np.zeros((self._batch, cap_n, self._order + 1, self.dim),
                       self._dtype)
        th = np.zeros((self._batch, cap_n + 1), self._dtype)
        tl = np.zeros((self._batch, cap_n + 1), self._dtype)
        for i in range(self._batch):
            n = int(counts[i])
            pad = np.inf if fwd[i] else -np.inf
            th[i, :] = pad
            tl[i, :] = 0.0
            if n:
                tcs[i, :n] = np.stack(lane_tc[i])
                th[i, :n] = np.asarray(lane_th[i])
                tl[i, :n] = np.asarray(lane_tl[i])
            th[i, n] = fin_th[i]
            tl[i, n] = fin_tl[i]
        c_out = ContinuousOutputBatch(
            th, tl, tcs, counts, self._order, self.dim, jnp.asarray(fwd)
        )
        self._last_res = [
            (outcomes[i], self._last_res[i][1]) for i in range(self._batch)
        ]
        return outcomes, min_h, max_h, nsteps, c_out

    def _propagate_until_events(self, t, mdt, max_steps, callback=None):
        """Host-driven per-lane propagate-until in the presence of events
        and/or a host step callback: lanes step in lockstep with per-lane
        caps; a lane stops at its target, a stopping terminal event,
        callback stop, or non-finite state."""
        from ..callback import adapt_host_callback

        callback = adapt_host_callback(self, callback)
        min_h = np.full((self._batch,), _pymath.inf)
        max_h = np.zeros((self._batch,))
        nsteps = np.zeros((self._batch,), np.int64)
        outcomes = [TaylorOutcome.time_limit] * self._batch
        fwd = t >= self.time
        done = np.zeros((self._batch,), bool)
        with_events = self._ev_step is not None
        while not done.all():
            rem = t - self.time
            arrived = np.where(fwd, rem <= 0, rem >= 0)
            done |= arrived
            if done.all():
                break
            cap = np.minimum(np.abs(rem), mdt)
            cap = np.where(done, 0.0, cap)
            step_mdt = np.where(fwd, cap, -cap)
            self.step(max_delta_t=step_mdt)
            for i in range(self._batch):
                if done[i]:
                    continue
                oc, h = self._last_res[i]
                nsteps[i] += 1
                min_h[i] = min(min_h[i], abs(h))
                max_h[i] = max(max_h[i], abs(h))
                if oc == TaylorOutcome.err_nf_state:
                    outcomes[i] = oc
                    done[i] = True
                elif (with_events and isinstance(oc, int)
                        and self._event_stop[i]):
                    outcomes[i] = oc
                    done[i] = True
            if callback is not None and not callback(self):
                for i in range(self._batch):
                    if not done[i]:
                        outcomes[i] = TaylorOutcome.cb_stop
                break
            if max_steps and int(nsteps.max()) >= max_steps:
                for i in range(self._batch):
                    if not done[i]:
                        outcomes[i] = TaylorOutcome.step_limit
                break
        self._last_res = [
            (outcomes[i], self._last_res[i][1]) for i in range(self._batch)
        ]
        return outcomes, min_h, max_h, nsteps

    def propagate_for(self, delta_t, **kw):
        target = self.time + np.broadcast_to(
            np.asarray(delta_t, dtype=self._dtype), (self._batch,)
        )
        return self.propagate_until(target, **kw)

    def propagate_grid(self, grid, *, max_delta_t=None, max_steps=0,
                       callback=None):
        return self._record_prop_res(self._propagate_grid_impl(
            grid, max_delta_t=max_delta_t, max_steps=max_steps,
            callback=callback))

    def _propagate_grid_impl(self, grid, *, max_delta_t=None, max_steps=0,
                             callback=None):
        """Shared time grid, per-lane dense output:
        returns (outcomes, min_h, max_h, nsteps, out[batch, len(grid), dim]).

        With events or a host ``callback`` present, a host-driven lockstep
        driver is used; grid rows a lane does not reach (stopping terminal
        event / callback stop / step limit / non-finite state) are NaN in
        that lane."""
        grid = np.asarray(grid, dtype=self._dtype)
        if max_delta_t is None:
            max_delta_t = _pymath.inf
        mdt = np.broadcast_to(
            np.asarray(max_delta_t, dtype=self._dtype), (self._batch,)
        )
        if (self._ev_step is not None or callback is not None
                or self._nrt is not None):
            return self._propagate_grid_stepwise(
                grid, mdt, int(max_steps), callback
            )
        res = self._pg_jit(
            self._state,
            self._pars,
            self._t_hi,
            self._t_lo,
            jnp.asarray(grid),
            jnp.asarray(mdt),
            jnp.asarray(int(max_steps), jnp.int64),
        )
        self._state = res["state"]
        self._t_hi, self._t_lo = res["t_hi"], res["t_lo"]
        self._last_h = res["last_h"]
        self._tc = res["tc"]
        self._tc_sige = res.get("tc_sige", jnp.zeros((self._batch,), jnp.int32))
        oc = np.asarray(res["outcome"])
        return (
            [TaylorOutcome(int(o)) for o in oc],
            np.asarray(res["min_h"]),
            np.asarray(res["max_h"]),
            np.asarray(res["nsteps"]),
            np.asarray(res["out"]),
        )

    def _propagate_grid_stepwise(self, grid, mdt, max_steps, callback=None):
        """Event-aware batch propagate_grid: lanes step in lockstep with
        per-lane caps (event detection per lane via the vmapped event step);
        after each step, each live lane fills the grid points inside its step
        span with a host-side Horner evaluation of its dense-output
        coefficients (dd-precise step-start subtraction)."""
        from ..callback import adapt_host_callback

        callback = adapt_host_callback(self, callback)
        ngrid = grid.shape[0]
        out = np.full((self._batch, ngrid, self.dim), np.nan, dtype=self._dtype)
        t_now = np.asarray(self.time)
        fwd = grid[-1] >= t_now
        target = float(grid[-1])
        gi = np.zeros((self._batch,), np.int64)
        st0 = np.asarray(self._state)
        for i in range(self._batch):
            while gi[i] < ngrid and float(grid[gi[i]]) == t_now[i]:
                out[i, gi[i]] = st0[i, : self.dim]
                gi[i] += 1
        min_h = np.full((self._batch,), _pymath.inf)
        max_h = np.zeros((self._batch,))
        nsteps = np.zeros((self._batch,), np.int64)
        outcomes = [TaylorOutcome.time_limit] * self._batch
        done = gi >= ngrid
        order = self._order
        while not done.all():
            t_now = np.asarray(self.time)
            rem = target - t_now
            arrived = np.where(fwd, rem <= 0, rem >= 0)
            done |= arrived
            if done.all():
                break
            cap = np.minimum(np.abs(rem), mdt)
            cap = np.where(done, 0.0, cap)
            self.step(max_delta_t=np.where(fwd, cap, -cap))
            th = np.asarray(self._t_hi)
            tl = np.asarray(self._t_lo)
            lh = np.asarray(self._last_h)
            tc = np.asarray(self._tc)
            for i in range(self._batch):
                if done[i]:
                    continue
                oc, h = self._last_res[i]
                nsteps[i] += 1
                min_h[i] = min(min_h[i], abs(h))
                max_h[i] = max(max_h[i], abs(h))
                if oc == TaylorOutcome.err_nf_state:
                    outcomes[i] = oc
                    done[i] = True
                    continue
                # dd-precise step start: (t_hi, t_lo) - last_h via two-sum
                s = th[i] - lh[i]
                bb = s - th[i]
                err = (th[i] - (s - bb)) + (-lh[i] - bb)
                s_lo = err + tl[i]
                t_new = th[i] + tl[i]
                while gi[i] < ngrid and (
                    float(grid[gi[i]]) <= t_new
                    if fwd[i]
                    else float(grid[gi[i]]) >= t_new
                ):
                    rel = (float(grid[gi[i]]) - s) - s_lo
                    res = tc[i, order].copy()
                    for k in range(1, order + 1):
                        res = tc[i, order - k] + res * rel
                    out[i, gi[i]] = res[: self.dim]
                    gi[i] += 1
                if (self._ev_step is not None and isinstance(oc, int)
                        and self._event_stop[i]):
                    outcomes[i] = oc
                    done[i] = True
                elif gi[i] >= ngrid:
                    done[i] = True
            if callback is not None and not callback(self):
                for i in range(self._batch):
                    if not done[i]:
                        outcomes[i] = TaylorOutcome.cb_stop
                break
            if max_steps and int(nsteps.max()) >= max_steps:
                for i in range(self._batch):
                    if not done[i]:
                        outcomes[i] = TaylorOutcome.step_limit
                break
        self._last_res = [
            (outcomes[i], self._last_res[i][1]) for i in range(self._batch)
        ]
        return outcomes, min_h, max_h, nsteps, out


def unpack_ev_summary(res, n_nte):
    """Decode the batched ev driver's packed per-chunk summary — one host
    transfer — into a dict of numpy arrays (see events.py ``packed``
    layout: min_h, max_h, nsteps, done, outcome, te_idx, te_sgn, it,
    nhits, then HIT_LCAP columns each of hit times/positions/signs)."""
    from .events import HIT_LCAP

    P = np.asarray(res["packed"])  # (B, 9 + 3*lcap)
    lcap = (P.shape[1] - 9) // 3
    out = {
        "min_h": P[:, 0],
        "max_h": P[:, 1],
        "nsteps": P[:, 2].astype(np.int64),
        "done": P[:, 3] > 0,
        "outcome": P[:, 4].astype(np.int32),
        "te_idx": P[:, 5].astype(np.int32),
        "te_sgn": P[:, 6].astype(np.int32),
        "it": int(P[0, 7]) if P.shape[0] else 0,
        "nhits": P[:, 8].astype(np.int32),
        "lcap": lcap,
    }
    if lcap:
        out["hits_t"] = P[:, 9:9 + lcap]
        out["hits_pos"] = P[:, 9 + lcap:9 + 2 * lcap].astype(np.int64)
        out["hits_sgn"] = P[:, 9 + 2 * lcap:9 + 3 * lcap].astype(np.int64)
    return out


def _decode_hits(summary, res, n_nte, lane_hits):
    """Append per-lane (time, event index, d_sgn) hit tuples from the
    unpacked chunk summary; falls back to the dense on-device buffers when
    a lane's per-chunk hit count saturated the compact capacity (rare —
    HIT_LCAP hits within one chunk)."""
    from .events import HIT_LCAP
    from .events_impl import MAX_ROOTS as _MR

    nh = summary["nhits"]
    if not nh.any():
        return
    n_slots = n_nte * _MR
    if int(nh.max()) <= summary["lcap"]:
        pos = summary["hits_pos"]
        ht = summary["hits_t"]
        hs = summary["hits_sgn"]
        lanes_i, slots_i = np.nonzero(pos >= 0)
        for li, k in zip(lanes_i, slots_i):
            sl = int(pos[li, k]) % n_slots
            lane_hits[li].append(
                (ht[li, k], sl // _MR, int(hs[li, k]) - 2)
            )
        return
    it = summary["it"]
    rsgn = np.asarray(res["rec_sgn"][:, :it])
    rtime = np.asarray(res["rec_t"][:, :it])
    lanes_i, steps_i, slots_i = np.nonzero(rsgn)
    for li, si, sl in zip(lanes_i, steps_i, slots_i):
        lane_hits[li].append(
            (rtime[li, si, sl], sl // _MR, int(rsgn[li, si, sl]) - 2)
        )


def taylor_adaptive_batch(sys, state, **kw) -> TaylorAdaptiveBatch:
    return TaylorAdaptiveBatch(sys, state, **kw)

    # -- serialization ---------------------------------------------------------


def _batch_getstate(self):
    return {
        "vsys": self._vsys,
        "sys": self._sys,
        "tol": self._tol,
        "high_accuracy": self._high_accuracy,
        "compact_mode": self._compact_mode,
        "mp_order": self._mp_order,
        "pallas_phase": getattr(
            self, "_pallas_phase_setting", self._pallas_phase
        ),
        "fused_prop": getattr(self, "_fused_prop", "auto"),
        "dtype": self._dtype.name,
        "t_events": self._t_events,
        "nt_events": self._nt_events,
        "state": np.asarray(self._state),
        "pars": np.asarray(self._pars),
        "t_hi": np.asarray(self._t_hi),
        "t_lo": np.asarray(self._t_lo),
        "last_h": np.asarray(self._last_h),
        "tc": np.asarray(self._tc),
        "tc_sige": np.asarray(self._tc_sige),
        "cooldowns": np.asarray(self._te_cooldowns),
        "backend": getattr(self, "_backend_setting", "jax"),
    }


def _batch_setstate(self, st):
    self.__init__(
        st["sys"], st["state"], pars=st["pars"], tol=st["tol"],
        high_accuracy=st["high_accuracy"], compact_mode=st["compact_mode"],
        dtype=st["dtype"], mp_order=st.get("mp_order"),
        pallas_phase=st.get("pallas_phase", False),
        fused_prop=st.get("fused_prop", "auto"),
        t_events=st.get("t_events", []),
        nt_events=st.get("nt_events", []),
        # explicit "native" degrades to "auto" so unpickling on a host
        # without a compiler falls back to jax instead of raising
        backend=("auto" if st.get("backend") == "native"
                 else st.get("backend", "jax")),
    )
    self._t_hi = jnp.asarray(st["t_hi"], self._dtype)
    self._t_lo = jnp.asarray(st["t_lo"], self._dtype)
    self._last_h = jnp.asarray(st["last_h"], self._dtype)
    self._tc = jnp.asarray(st["tc"], self._dtype)
    self._tc_sige = jnp.asarray(
        st.get("tc_sige", np.zeros(self._batch, np.int32)), jnp.int32)
    if "cooldowns" in st:
        self._te_cooldowns = jnp.asarray(st["cooldowns"], self._dtype)
    self._vsys = st.get("vsys")


TaylorAdaptiveBatch.__getstate__ = _batch_getstate
TaylorAdaptiveBatch.__setstate__ = _batch_setstate
