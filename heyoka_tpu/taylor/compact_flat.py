"""Flat-layout batched compact jet: the TPU speed-of-light variant.

Profiling the (order+1, width, batch) layout showed XLA inserting a full
coefficient-buffer *layout-conversion copy* after every per-group update
(the dynamic-update-slice produces {2,1,0} while the axis-1 gathers of the
next group prefer {2,0,1}) — ~60% of the step time.

This engine stores the coefficients as ``tc[(width), (K+1)*batch]``: column
u-var major, order-within-batch minor.  Every operation is then natural in
row-major layout:

- operand history reads: axis-0 slice (contiguous groups) or axis-0 gather
  (cheap), reshaped for free to (m, K+1, B);
- per-(order, group) writes: ``dynamic_update_slice`` at (col_start, k*B) —
  a contiguous block, updated in place;
- convolutions: elementwise multiplies with an order-axis mask + reduce over
  the middle axis.

Same recurrences/maths as :mod:`compact_loop` (dynamic-k masked
convolutions), independent rules specialized to the layout.
"""

from __future__ import annotations

import math as _pymath
import os as _os

import numpy as np

from ..expr.decompose import Tape
from ..expr import registry as _reg
from .compact import _EVAL_ARITY, _read_pieces, build_plan
from .compact_loop import UnsupportedLoopOp, _pow0_vec_b

_F_RULES: dict = {}


def _ldexp2(jnp, x, e):
    """Exact ``x * 2**e`` for per-element int32 ``e`` without bitcasts.

    ``jnp.ldexp`` lowers through ``frexp``'s s64 ``bitcast-convert``,
    which the TPU X64 rewriter rejects ("While rewriting computation to
    not contain X64 element types... not implemented") — so the sig-scaled
    engines could not compile on hardware.  This builds the shift out of
    exact power-of-two *factors*: chunks of ``2**±512`` plus a 9-bit
    remainder.  Each multiply is exact in binary FP (pure exponent
    arithmetic) and every applied factor has the sign of ``e``, so partial
    results move monotonically from ``|x|`` to the final magnitude —
    nothing transiently over/underflows that the true ``ldexp`` wouldn't.
    Covers |e| ≤ 3071 (the engines bound |e| ≤ K*126 ≈ 2.5k); subnormal /
    overflow endpoints round exactly like a plain multiply.
    """
    dt = x.dtype
    e = e.astype(jnp.int32)
    neg = e < 0
    rem = jnp.minimum(jnp.abs(e), 3071)
    one = jnp.asarray(1.0, dt)
    big = jnp.where(neg, jnp.asarray(2.0 ** -512, dt),
                    jnp.asarray(2.0 ** 512, dt))
    for _ in range(5):
        take = rem >= 512
        x = x * jnp.where(take, big, one)
        rem = rem - jnp.where(take, 512, 0)
    for j in range(9):
        p = 1 << j
        fac = jnp.where(neg, jnp.asarray(2.0 ** -p, dt),
                        jnp.asarray(2.0 ** p, dt))
        x = x * jnp.where((rem & p) != 0, fac, one)
    return x


def _rule(name):
    def deco(fn):
        _F_RULES[name] = fn
        return fn

    return deco


def jit_flat_step(step):
    """jit a flat-engine step with a backend-appropriate workaround.

    XLA:CPU (jax 0.9.0) miscompiles the unrolled 3-D dus/gather graph of
    ``layout="3d", unroll=True`` — the jitted result diverges from the
    eager one by O(1) at the highest orders; disabling either the
    ``algsimp`` or the ``fusion`` HLO pass (or all optimizations) restores
    agreement, so it is an optimizer interaction bug, not a tracing issue.
    TPU compiles the same graph correctly (verified against the flat
    layout bitwise for the staged engine).  On CPU this helper disables
    ``algsimp`` for the step only, plus the CPU fusion passes: the fusion
    emitter recomputes shared subexpressions with FMA contraction, which
    silently breaks the error-free transforms of the double-float Pallas
    jet kernel in interpret mode (pallas_phase.py; verified bit-level).
    """
    import jax

    if jax.default_backend() == "cpu":
        return jax.jit(
            step, compiler_options={
                "xla_disable_hlo_passes":
                    "algsimp,cpu-instruction-fusion,fusion",
            }
        )
    return jax.jit(step)


#: per-kind history reads (which column sets a rule passes to ctx["hist"]) —
#: used by the staged mode to pre-declare operand buffers
_HIST_KEYS: dict = {
    "mul": lambda g: [g.in_cols[:, 0], g.in_cols[:, 1]],
    "div": lambda g: [g.out_cols, g.in_cols[:, 1]],
    "sin": lambda g: [g.in_cols[:, 0], g.aux["pair"]],
    "cos": lambda g: [g.in_cols[:, 0], g.aux["pair"]],
    "sinh": lambda g: [g.in_cols[:, 0], g.aux["pair"]],
    "cosh": lambda g: [g.in_cols[:, 0], g.aux["pair"]],
    "exp": lambda g: [g.in_cols[:, 0], g.out_cols],
    "log": lambda g: [g.out_cols, g.in_cols[:, 0]],
    "sqrt": lambda g: [g.out_cols],
    "pow": lambda g: [g.out_cols, g.in_cols[:, 0]],
    "tan": lambda g: [g.aux["sq"], g.in_cols[:, 0]],
    "tanh": lambda g: [g.aux["sq"], g.in_cols[:, 0]],
    "sigmoid": lambda g: [g.out_cols, g.aux["sq"], g.in_cols[:, 0]],
    "asin": lambda g: [g.in_cols[:, 1], g.out_cols],
    "acos": lambda g: [g.in_cols[:, 1], g.out_cols],
    "atan": lambda g: [g.in_cols[:, 1], g.out_cols],
    "atanh": lambda g: [g.in_cols[:, 1], g.out_cols],
    "asinh": lambda g: [g.in_cols[:, 1], g.out_cols],
    "acosh": lambda g: [g.in_cols[:, 1], g.out_cols],
    "erf": lambda g: [g.in_cols[:, 1], g.in_cols[:, 0]],
    "atan2": lambda g: [g.in_cols[:, 0], g.in_cols[:, 1], g.in_cols[:, 2],
                        g.out_cols],
    "kepE": lambda g: [g.in_cols[:, 0], g.aux["sin"], g.aux["cos"],
                       g.out_cols],
    "kepF": lambda g: [g.in_cols[:, 0], g.in_cols[:, 1], g.aux["sin"],
                       g.aux["cos"], g.out_cols],
    "kepDE": lambda g: [g.in_cols[:, 0], g.in_cols[:, 1], g.aux["sin"],
                        g.aux["cos"], g.out_cols],
}


def _pieces_read_ax0(jnp_, lax_, x, pieces):
    """Assemble rows of ``x`` (axis 0) described by ``_read_pieces``
    output, using only slices / broadcasts / concat — no gather."""
    nd = x.ndim
    rest = x.shape[1:]
    outs = []
    for a, d, n, r in pieces:
        if n == 1:
            sl = lax_.slice_in_dim(x, a, a + 1, axis=0)
        elif d == 0:
            sl = jnp_.broadcast_to(
                lax_.slice_in_dim(x, a, a + 1, axis=0), (n,) + rest
            )
        elif d == 1:
            sl = lax_.slice_in_dim(x, a, a + n, axis=0)
        else:
            sl = lax_.slice(
                x, (a,) + (0,) * (nd - 1),
                (a + (n - 1) * d + 1,) + rest,
                (d,) + (1,) * (nd - 1),
            )
        if r > 1:
            sl = jnp_.repeat(sl, r, axis=0)
        outs.append(sl)
    return outs[0] if len(outs) == 1 else jnp_.concatenate(outs, axis=0)


def make_batched_step_flat(tape: Tape, order: int, *, dtype=None,
                           high_accuracy: bool = True, mp_order: int | None = None,
                           unroll: bool = False, layout: str = "flat",
                           staged: bool = False, return_tc: bool = False,
                           pallas_phase=False, jet_mode: bool = False,
                           _debug_tc: bool = False):
    """Whole-batch adaptive Taylor step over the flat layout.

    ``step(states (B, n), pars (B, p), t (B,), max_dt (B,)) ->
    (new_states (B, n), h (B,))``.  With ``mp_order`` set, orders above it
    run in float32 (see ``make_batched_step_mixed`` for the error analysis).

    With ``unroll=True`` the order loop is a Python loop over static ``k``:
    every convolution reads exactly the ``k+1`` history rows it needs (no
    masked full-window work — the dynamic-``k`` ``fori_loop`` does ~2x the
    necessary MACs on average) at the cost of a larger graph / longer
    compile.

    With ``layout="3d"`` the coefficient carry is (W, K+1, B) so history
    gathers need no flat->3D reshape (a physical re-tile on TPU).

    With ``staged=True`` (requires unroll + 3d), scattered operand
    histories are maintained incrementally in per-operand contiguous
    buffers: one gathered (m, B) row is appended per order instead of
    re-gathering the whole (m, k+1, B) history — on the profile of the
    north-star workload, whole-history gathers were 54% of the step.

    With ``jet_mode=True`` the update phase is skipped and the function
    becomes ``jet(states, pars, t, max_dt) -> (tc (B, order+1, n_sv),
    h (B,))`` where ``n_sv = n_eq + len(tape.outputs)`` — the natively
    batched analog of the reference's ``step_e`` event jet
    (``taylor_00.cpp:592``): the state-variable AND sv-func (event
    equation) Taylor coefficients, plus the adaptive h each lane
    *would* take.  Callers (``events_impl.build_event_step_batch``)
    isolate event roots in ``[0, h)`` and run the state update at the
    possibly-truncated step themselves.
    """
    if layout not in ("flat", "3d"):
        raise ValueError(f"unknown layout {layout!r}; expected 'flat' or '3d'")
    if staged and not (unroll and layout == "3d"):
        raise ValueError("staged=True requires unroll=True and layout='3d'")
    import jax.numpy as jnp
    from jax import lax

    if dtype is None:
        dtype = jnp.float64
    if tape.rhs is None:
        raise ValueError("requires an ODE tape")
    plan = build_plan(tape, order)
    n_eq = plan.n_eq
    K = order
    W = plan.width

    for lv in plan.levels:
        for g in lv:
            if g.name in _F_RULES:
                continue
            if g.name.startswith("trigseries%") and unroll:
                # dense-series op (expr/series.py): supported by the
                # unrolled engines — the closed-form jet needs static
                # orders (see _f_trigseries)
                continue
            raise UnsupportedLoopOp(g.name)

    _kep = any(
        g.name in ("kepE", "kepF", "kepDE") for lv in plan.levels for g in lv
    )

    def _tri_tensor(Kw):
        S_np = np.zeros((Kw + 1, Kw + 1, Kw + 1))
        for m in range(Kw + 1):
            for a in range(m + 1):
                S_np[m, a, m - a] = 1.0
        return S_np

    const_cols = np.array([c for c, _ in plan.const_cols], dtype=np.int64)
    const_vals = np.array([v for _, v in plan.const_cols])
    par_cols = np.array([c for c, _ in plan.par_cols], dtype=np.int64)
    par_idx = np.array([j for _, j in plan.par_cols], dtype=np.int64)

    # contiguity cache for history reads
    _contig: dict = {}

    def _rng(cols):
        key = cols.tobytes()
        r = _contig.get(key)
        if r is None:
            a = int(cols[0])
            r = (a, a + int(cols.size)) if np.array_equal(
                cols, np.arange(a, a + cols.size)
            ) else False
            _contig[key] = r
        return r

    # piecewise-pattern cache: non-contiguous sets that still decompose
    # into slice/stride/repeat pieces (instance-regular tapes) read
    # gather-free via _pieces_read_ax0
    _pcache: dict = {}

    _no_pieces = bool(int(_os.environ.get("HEYOKA_FLAT_NO_PIECES", "0")))

    def _pcs(cols):
        if _no_pieces:  # A/B knob: fall back to gathers/staging
            return None
        cols = np.asarray(cols)
        key = cols.tobytes()
        p = _pcache.get(key, False)
        if p is False:
            p = _read_pieces(cols)
            _pcache[key] = p
        return p

    # staged mode: pre-declare every scattered history read, with the level
    # after which all of its columns are written at each order (appends must
    # happen before the consuming group, which is always at a later level)
    stage_cols: dict = {}
    if staged:
        prod_level = np.full(W, -1, np.int64)
        for _li, _lv in enumerate(plan.levels):
            for _g in _lv:
                prod_level[_g.out_start:_g.out_start + _g.out_cols.size] = _li
        for _lv in plan.levels:
            for _g in _lv:
                getter = _HIST_KEYS.get(_g.name)
                if getter is None:
                    continue
                for _cols in getter(_g):
                    _cols = np.asarray(_cols)
                    if _rng(_cols):
                        continue  # contiguous: a free slice, no staging
                    if _pcs(_cols) is not None:
                        continue  # piecewise-regular: gather-free read
                    stage_cols[_cols.tobytes()] = (
                        _cols, int(prod_level[_cols].max())
                    )

    def _mkctx(jnp_, dt, B, Kw, kwin=None, three_d=False, stage=None,
               rmeta=None):
        """Context over a history *window* of Kw+1 order rows: the low-order
        (f64) phase runs on a truncated buffer, since orders <= mp never
        read rows above mp — nearly halving the emulated-f64 work.

        With ``kwin`` set (unrolled mode, static order k), the window is
        exactly the ``kwin+1`` rows order ``kwin`` reads: histories are
        prefix-sliced and the reversal is a static flip — no masked
        full-window work.

        With ``three_d`` the coefficient carry is (W, Kw+1, B): history
        gathers keep their shape (no flat->3D reshape, which is a physical
        re-tile on TPU — see the profile notes in PERF.md)."""
        win = Kw if kwin is None else kwin
        jv = jnp_.arange(win + 1)

        def hist(tc, cols):
            # (m, win+1, B) view of the history of `cols`
            if stage is not None:
                buf = stage.get(np.asarray(cols).tobytes())
                if buf is not None:
                    return buf[:, : win + 1, :] if win < Kw else buf
            r = _rng(cols)
            if three_d:
                # window-slice BEFORE the gather: slice-of-gather triggers
                # an XLA CPU algsimp+fusion miscompile (jax 0.9.0) in the
                # unrolled graph, and the pre-slice also shrinks the gather
                tcw = tc[:, : win + 1, :] if win < Kw else tc
                if r:
                    return tcw[r[0] : r[1]]
                p = _pcs(cols)
                if p is not None:
                    return _pieces_read_ax0(jnp_, lax, tcw, p)
                return tcw[cols]
            if r:
                sl = tc[r[0] : r[1]]
            else:
                p = _pcs(cols)
                sl = (_pieces_read_ax0(jnp_, lax, tc, p)
                      if p is not None else tc[cols])
            full = sl.reshape(cols.size, Kw + 1, B)
            return full[:, : win + 1, :] if win < Kw else full

        def rows(row, cols):
            # (m, B) rows of a (W, B) order block, gather-free when the
            # column set is contiguous or decomposes into slice pieces
            r = _rng(np.asarray(cols))
            if r:
                return row[r[0] : r[1]]
            p = _pcs(cols)
            if p is not None:
                return _pieces_read_ax0(jnp_, lax, row, p)
            return row[cols]

        def blk(tc, k):
            # current-order (W, B) block
            if three_d:
                if kwin is not None:
                    return tc[:, k, :]
                return lax.dynamic_slice(tc, (0, k, 0), (tc.shape[0], 1, B))[:, 0, :]
            return lax.dynamic_slice(tc, (0, k * B), (tc.shape[0], B))

        def mrow(x, mask):
            # apply an order-axis mask/weight to a (m, win+1, B) history
            return x * mask.reshape(1, win + 1, 1)

        def rows_rev(Bh, k):
            if kwin is not None:
                return Bh[:, ::-1, :]
            idx = jnp_.clip(k - jv, 0, win)
            return Bh[:, idx, :] * (jv <= k).reshape(1, win + 1, 1)

        def conv(Ah, Bh, k, wA=None, wB_rev=None):
            term = Ah * rows_rev(Bh, k)
            if wA is not None:
                term = mrow(term, wA)
            if wB_rev is not None:
                term = mrow(term, wB_rev(k - jv))
            return term.sum(1)

        def at_order(Hh, k):
            # order-k row of a history: (m, B)
            return lax.dynamic_slice_in_dim(Hh, k, 1, axis=1)[:, 0, :]

        tri = None
        if _kep:
            S_j = jnp_.asarray(_tri_tensor(win), dt)

            def tri(Ah, Ch, _S=S_j):
                return jnp_.einsum("cax,cbx,mab->cmx", Ah, Ch, _S)

        return dict(jv=jv, hist=hist, mrow=mrow, rows_rev=rows_rev, conv=conv,
                    at=at_order, tri=tri, jnp=jnp_, dtype=dt, blk=blk,
                    rows=rows, rmeta=rmeta)

    three_d = layout == "3d"

    # optional Pallas jet kernels (pallas_phase.py):
    #   True / "interpret"      — f32 phase (orders mp_order+1..K) in-kernel
    #   "dd" / "dd-interpret"   — FULL jet in-kernel: orders 1..mp_order in
    #                             double-float (two-f32), the rest in f32;
    #                             the XLA side only evaluates order 0 (f64)
    # validated eagerly so unsupported tapes fail at build, like the staged
    # engine's own rule check
    _pp_cache: dict = {}
    _pp_dd = pallas_phase in ("dd", "dd-interpret")
    _pp_interp = pallas_phase in ("interpret", "dd-interpret")
    _pp_o0 = False
    if pallas_phase:
        from .pallas_phase import (
            UnsupportedPallasOp as _UPO,
            make_phase_kernel as _mk_pp, make_dd_jet_kernel as _mk_dd,
            order0_supported as _o0_ok,
        )

        if mp_order is None or not three_d:
            raise ValueError(
                "pallas_phase requires mp_order and layout='3d'"
            )
        # order 0 moves in-kernel (double-float) when every tape op has a
        # dd order-0 rule; otherwise the XLA side evaluates order 0 in f64
        _pp_o0 = _pp_dd and _o0_ok(plan)
        _pp_o0_mode = "dd" if _pp_o0 else "xla"
        # jet_mode needs the sv-func (event-equation) coefficient rows
        # out of the slim kernel too
        _pp_extra = plan.out_cols if (jet_mode and plan.out_cols.size) \
            else None
        if _pp_dd:  # validation build (slim unless the debug path needs tc)
            _mk_dd(plan, mp_order, K, 128, interpret=_pp_interp,
                   slim=not _debug_tc, order0=_pp_o0_mode,
                   sv_extra=_pp_extra)
        else:
            _mk_pp(plan, mp_order + 1, K, 128, interpret=_pp_interp)

    #: batch-tile width (lanes per kernel invocation); 128 is the VPU lane
    #: width — overridable for tuning via HEYOKA_PALLAS_BT.  Mosaic
    #: requires the tile to be a multiple of 128, so huge tapes
    #: (mascon-class, SURVEY #24) cannot shrink it — instead the kernel
    #: switches to row-split VMEM scratch (H/C/V history classes,
    #: pallas_phase._row_classes) when the dense (W, K+1) scratch
    #: doesn't fit.
    _pp_compact = False
    _pp_rolled = False
    _bt_env = _os.environ.get("HEYOKA_PALLAS_BT")
    if _bt_env is not None:
        _bt = int(_bt_env)
    elif _pp_dd:
        from .pallas_phase import (
            auto_bt as _auto_bt,
            auto_bt_rolled as _auto_bt_r,
            rolled_supported as _rolled_ok,
        )

        try:
            _bt = _auto_bt(plan, mp_order, K, None, 128)
        except _UPO:
            # dense scratch does not fit: huge-tape regime.  Default to
            # the ROLLED row-split kernel (O(#groups) Mosaic statements —
            # the unrolled row-split kernel's compile was measured at
            # 1,401 s at mascon-256, PERF.md round 4); the unrolled
            # row-split kernel stays reachable with HEYOKA_PALLAS_ROLLED=0
            # and remains the fallback for ops the rolled rules lack.
            # Raises again (propagating to the auto-resolution fallback /
            # the caller) if even the split scratch is too wide.
            if (_os.environ.get("HEYOKA_PALLAS_ROLLED", "1") != "0"
                    and _rolled_ok(plan)):
                _bt = _auto_bt_r(plan, mp_order, K, None, 128)
                _pp_rolled = True
            else:
                _bt = _auto_bt(plan, mp_order, K, None, 128, compact=True)
            _pp_compact = True
    else:
        _bt = 128
    if _pp_dd and _os.environ.get("HEYOKA_PALLAS_COMPACT") == "1":
        _pp_compact = True  # test/experiment knob
    if _pp_dd and _os.environ.get("HEYOKA_PALLAS_ROLLED") == "1":
        from .pallas_phase import rolled_supported as _rolled_ok2

        if _rolled_ok2(plan):
            _pp_compact = _pp_rolled = True  # force-rolled knob
    if _pp_compact and not (_pp_o0 and not _debug_tc):
        raise _UPO(
            "tape too wide for the dense VMEM scratch and the row-split "
            "kernel needs slim outputs + in-kernel dd order 0"
        )
    if _pp_compact:
        # compact-seed template: the row-split kernel takes only
        # (n_eq + 1 + n_const_par, 2, B) seed blocks — state rows, one
        # time row, and the const/par order-0 values in tape-column
        # order (see pallas_phase.make_dd_jet_kernel).  Const hi/lo
        # splits are precomputed here; par rows are filled per call.
        _cs_entries = sorted(
            [(int(c), "c", float(v)) for c, v in plan.const_cols]
            + [(int(c), "p", int(j)) for c, j in plan.par_cols]
        )
        _cs_hi = np.array([np.float32(v) if kind == "c" else 0.0
                           for _, kind, v in _cs_entries], np.float32)
        _cs_lo = np.array([
            np.float32(v - np.float64(np.float32(v)))
            if kind == "c" else 0.0
            for _, kind, v in _cs_entries], np.float32)
        _cs_par_rows = [(i, v) for i, (_, kind, v)
                        in enumerate(_cs_entries) if kind == "p"]
        _cs_n = len(_cs_entries)

    def _get_pallas(B):
        # batch tiles are _bt lanes; for the dd kernel, batches that do
        # not tile are padded up to the next multiple (callers pad inputs
        # / slice outputs); the f32-phase kernel falls back to the XLA
        # phase instead
        if _pp_dd:
            Bp = B if B <= _bt else ((B + _bt - 1) // _bt) * _bt
        else:
            if B % _bt != 0 and B != min(_bt, B):
                return None, B
            Bp = B
        fn = _pp_cache.get(Bp)
        if fn is None:
            if _pp_dd and _pp_rolled:
                from .pallas_phase import (
                    make_dd_jet_kernel_rolled as _mk_dd_r,
                )

                fn = _mk_dd_r(plan, mp_order, K, Bp, bt=_bt,
                              interpret=_pp_interp, sv_extra=_pp_extra)
            elif _pp_dd:
                fn = _mk_dd(plan, mp_order, K, Bp, bt=_bt,
                            interpret=_pp_interp,
                            slim=not _debug_tc, order0=_pp_o0_mode,
                            sv_extra=_pp_extra,
                            compact_rows=_pp_compact)
            else:
                fn = _mk_pp(plan, mp_order + 1, K, Bp, bt=_bt,
                            interpret=_pp_interp)
            _pp_cache[Bp] = fn
        return fn, Bp

    # norms over the state variables and sv-func outputs, like the
    # reference (taylor_00.cpp:168-195)
    norm_cols = np.concatenate([np.arange(n_eq), plan.out_cols]) \
        if plan.out_cols.size else np.arange(n_eq)

    def step(states, pars, t, max_dt, sig_hint=None):
        B = states.shape[0]
        _pallas_fn, _pallas_B = \
            _get_pallas(B) if pallas_phase else (None, B)
        f32 = jnp.float32
        use_mp = mp_order is not None and jnp.dtype(dtype) == jnp.float64

        def init_tc(dt, Kw):
            if three_d:
                # dynamic_update_slice, not .at[..].set: the scattered-index
                # variants lower to HLO scatter, which blows the scoped-vmem
                # budget on TPU at large batch sizes
                tc = jnp.zeros((W, Kw + 1, B), dt)
                tc = lax.dynamic_update_slice(
                    tc, states.T.astype(dt)[:, None, :], (0, 0, 0)
                )
                for _ci, _cv in plan.const_cols:
                    tc = lax.dynamic_update_slice(
                        tc, jnp.full((1, 1, B), _cv, dt), (_ci, 0, 0)
                    )
                for _pi, _pj in plan.par_cols:
                    tc = lax.dynamic_update_slice(
                        tc, pars[:, _pj].astype(dt)[None, None, :],
                        (_pi, 0, 0),
                    )
                if plan.time_col is not None:
                    tc = lax.dynamic_update_slice(
                        tc, t.astype(dt)[None, None, :],
                        (plan.time_col, 0, 0),
                    )
                    tc = lax.dynamic_update_slice(
                        tc, jnp.ones((1, 1, B), dt), (plan.time_col, 1, 0)
                    )
                return tc
            tc = jnp.zeros((W, (Kw + 1) * B), dt)
            tc = tc.at[:n_eq, 0:B].set(states.T.astype(dt))
            if const_cols.size:
                tc = tc.at[const_cols, 0:B].set(
                    jnp.asarray(const_vals, dt)[:, None]
                )
            if par_cols.size:
                tc = tc.at[par_cols, 0:B].set(pars[:, par_idx].T.astype(dt))
            if plan.time_col is not None:
                tc = tc.at[plan.time_col, 0:B].set(t.astype(dt))
                tc = tc.at[plan.time_col, B : 2 * B].set(jnp.ones((B,), dt))
            return tc

        def _put(tc, vals, col, k):
            # write an (m, B) order-k block at column `col`
            if three_d:
                return lax.dynamic_update_slice(tc, vals[:, None, :], (col, k, 0))
            return lax.dynamic_update_slice(tc, vals, (col, k * B))

        def order0(tc, ctx):
            dt = ctx["dtype"]
            row0 = tc[:, 0, :] if three_d else tc[:, 0:B]
            for lv in plan.levels:
                for g in lv:
                    ar = _EVAL_ARITY.get(g.name, None)
                    nin = g.in_cols.shape[1] if ar is None else ar
                    ins = ([] if g.name == "sum" else
                           [ctx["rows"](row0, g.in_cols[:, c])
                            for c in range(nin)])
                    if g.name == "sum":
                        vals = _sum_rows(ctx, row0, g)
                    elif g.name == "pow":
                        vals = _pow0_vec_b(jnp, ins[0], g.alpha)
                    elif g.name == "mul":
                        vals = ins[0] * ins[1]
                    else:
                        vals = _reg.opdef(g.name).evaluate(*ins)
                    tc = _put(tc, vals.astype(dt), g.out_start, 0)
                    row0 = lax.dynamic_update_slice(
                        row0, vals.astype(dt), (g.out_start, 0)
                    )
            return tc

        def order0_row(dt, states, pars, t, eval_groups=True):
            """Order-0 values of all W tape columns as one (W, B) array,
            built from per-group pieces and a single concatenate — no
            (W, ..., B) f64 buffer churn (each big-buffer DUS of the
            buffer-based order0 ran at ~34 GB/s effective; see PERF.md)."""
            pieces = {0: states.T.astype(dt)}  # start col -> (m, B)
            colmap = {}  # col -> (start, offset)
            for i in range(n_eq):
                colmap[i] = (0, i)

            def add(start, arr):
                pieces[start] = arr
                for i in range(arr.shape[0]):
                    colmap[start + i] = (start, i)

            for ci, cv in plan.const_cols:
                add(ci, jnp.full((1, B), cv, dt))
            for pi, pj in plan.par_cols:
                add(pi, pars[:, pj].astype(dt)[None, :])
            if plan.time_col is not None:
                add(plan.time_col, t.astype(dt)[None, :])

            def vrows(cols):
                # assemble requested rows from the pieces, merging runs
                # that are contiguous inside one piece
                out = []
                i = 0
                cols = np.asarray(cols)
                while i < cols.size:
                    s, off = colmap[int(cols[i])]
                    j = i + 1
                    while (j < cols.size and colmap.get(int(cols[j]),
                           (None,))[0] == s
                           and colmap[int(cols[j])][1] == off + (j - i)):
                        j += 1
                    out.append(pieces[s][off:off + (j - i)])
                    i = j
                return out[0] if len(out) == 1 else jnp.concatenate(out, 0)

            for lv in plan.levels:
                for g in lv:
                    if not eval_groups:
                        # in-kernel order 0: group rows are zero seeds
                        add(g.out_start,
                            jnp.zeros((g.out_cols.size, B), dt))
                        continue
                    ar = _EVAL_ARITY.get(g.name, None)
                    nin = g.in_cols.shape[1] if ar is None else ar
                    ins = [vrows(g.in_cols[:, c]) for c in range(nin)]
                    if g.name == "sum":
                        vals = ins[0]
                        for a in range(1, g.in_cols.shape[1]):
                            vals = vals + vrows(g.in_cols[:, a])
                    elif g.name == "pow":
                        vals = _pow0_vec_b(jnp, ins[0], g.alpha)
                    elif g.name == "mul":
                        vals = ins[0] * ins[1]
                    else:
                        vals = _reg.opdef(g.name).evaluate(*ins)
                    add(g.out_start, vals.astype(dt))

            row = jnp.concatenate(
                [pieces[s] for s in sorted(pieces)], axis=0
            )
            return row, vrows

        stage: dict = {}

        def _stage_init(dt, Kw, row0):
            for key, (cols, _al) in stage_cols.items():
                buf = jnp.zeros((cols.size, Kw + 1, B), dt)
                stage[key] = lax.dynamic_update_slice(
                    buf, row0[cols].astype(dt)[:, None, :], (0, 0, 0)
                )

        def _stage_widen(dt, Kw, sig_e=None):
            for key, buf in stage.items():
                if sig_e is not None:
                    # scaled f32 phase: the f64-phase history rows become
                    # d_k = c_k sig^k (exact power-of-two shifts)
                    buf = jnp.stack(
                        [_ldexp2(jnp, buf[:, k_, :], k_ * sig_e)
                         for k_ in range(buf.shape[1])], axis=1,
                    )
                nbuf = jnp.zeros((buf.shape[0], Kw + 1, B), dt)
                stage[key] = lax.dynamic_update_slice(
                    nbuf, buf.astype(dt), (0, 0, 0)
                )

        def _stage_append(k, level, rowk, dt):
            for key, (cols, al) in stage_cols.items():
                if al == level:
                    stage[key] = lax.dynamic_update_slice(
                        stage[key], rowk[cols][:, None, :].astype(dt),
                        (0, k, 0),
                    )

        def body(k, tc, ctx):
            dt = ctx["dtype"]
            kf = jnp.asarray(k).astype(dt)
            off = k * B
            # state variables from the rhs at order k-1 (times the
            # coefficient scale in the scaled f32 phase — see the
            # scaled-carry note at the seeding site below)
            prev = ctx["blk"](tc, k - 1)
            sv = prev[plan.rhs_cols] / kf
            sg = ctx.get("sigma")
            if sg is not None:
                sv = sv * sg
            tc = _put(tc, sv, 0, k)
            rowk = ctx["blk"](tc, k) if staged else None
            if staged:
                _stage_append(k, -1, rowk, dt)
            for li, lv in enumerate(plan.levels):
                for g in lv:
                    vals = _frule(g.name)(ctx, tc, k, kf, g, B, off)
                    vals = jnp.asarray(vals, dt)
                    tc = _put(tc, vals, g.out_start, k)
                    if staged:
                        rowk = lax.dynamic_update_slice(
                            rowk, vals, (g.out_start, 0)
                        )
                if staged:
                    _stage_append(k, li, rowk, dt)
            return tc

        lo_end = (mp_order if use_mp else K)
        rmeta = {}  # per-trace cross-order rule state (trigseries jets)
        ctx64 = _mkctx(jnp, dtype, B, lo_end, three_d=three_d, rmeta=rmeta)
        dd_run = _pp_dd and use_mp and _pallas_fn is not None
        if dd_run and _pp_compact:
            # row-split kernel, compact seed: (n_eq + 1 + n_const_par,
            # 2, B) blocks — no full-width (W, 2, B) HBM->VMEM copies
            # (those cost ~19 MiB of VMEM at mascon-512 scale)
            sh = states.T.astype(f32)
            sl = (states.T - sh.astype(dtype)).astype(f32)
            zs = jnp.zeros((n_eq, B), f32)
            sb_hi = jnp.stack([sh, zs], axis=1)
            sb_lo = jnp.stack([sl, zs], axis=1)
            if plan.time_col is not None:
                th = t.astype(f32)
                tl = (t - th.astype(dtype)).astype(f32)
                tb_hi = jnp.stack([th, jnp.ones((B,), f32)])[None]
                tb_lo = jnp.stack([tl, jnp.zeros((B,), f32)])[None]
            else:
                tb_hi = jnp.zeros((1, 2, B), f32)
                tb_lo = tb_hi
            vh = jnp.broadcast_to(
                jnp.asarray(_cs_hi)[:, None], (_cs_n, B))
            vl = jnp.broadcast_to(
                jnp.asarray(_cs_lo)[:, None], (_cs_n, B))
            for vr, pj in _cs_par_rows:
                ph = pars[:, pj].astype(f32)
                plo = (pars[:, pj] - ph.astype(dtype)).astype(f32)
                vh = lax.dynamic_update_slice(vh, ph[None], (vr, 0))
                vl = lax.dynamic_update_slice(vl, plo[None], (vr, 0))
            zv = jnp.zeros((_cs_n, B), f32)
            vb_hi = jnp.stack([vh, zv], axis=1)
            vb_lo = jnp.stack([vl, zv], axis=1)
            hi0 = jnp.concatenate([sb_hi, tb_hi, vb_hi], axis=0)
            lo0 = jnp.concatenate([sb_lo, tb_lo, vb_lo], axis=0)
            # order-0 state rows only: coeff(0)/m0 come from the kernel
            tc = states.T[:, None, :]
            if _pallas_B != B:
                pad = ((0, 0), (0, 0), (0, _pallas_B - B))
                hi0 = jnp.pad(hi0, pad, constant_values=1.0)
                lo0 = jnp.pad(lo0, pad)
            tc_hi, tc_lo, dd_norms = _pallas_fn(hi0, lo0)
            if _pallas_B != B:
                tc_hi = tc_hi[:, :, :B]
                tc_lo = tc_lo[:, :, :B]
                dd_norms = dd_norms[:, :B]
            tc32 = None
        elif dd_run:
            # full jet in one Pallas kernel: the XLA side evaluates only
            # order 0 (f64, piece-wise — no big-buffer DUS churn), splits
            # it into (hi, lo) f32 pairs, and the kernel runs orders
            # 1..mp_order in double-float + the rest in f32
            row0, _vrows0 = order0_row(dtype, states, pars, t,
                                       eval_groups=not _pp_o0)
            hi_row = row0.astype(f32)
            lo_row = (row0 - hi_row.astype(dtype)).astype(f32)
            # row 1 seed: zeros except the time column's 1.0
            r1 = jnp.zeros((W, B), f32)
            if plan.time_col is not None:
                r1 = lax.dynamic_update_slice(
                    r1, jnp.ones((1, B), f32), (plan.time_col, 0)
                )
            hi0 = jnp.stack([hi_row, r1], axis=1)
            lo0 = jnp.stack([lo_row, jnp.zeros((W, B), f32)], axis=1)
            tc = row0[:, None, :]  # (W, 1, B): order-0 for m0/coeff(0)
            if _pallas_B != B:
                # pad lanes to the kernel's 128-lane tiling (padded lanes
                # compute garbage — div by the zero pad — and are sliced
                # away below)
                pad = ((0, 0), (0, 0), (0, _pallas_B - B))
                hi0 = jnp.pad(hi0, pad, constant_values=1.0)
                lo0 = jnp.pad(lo0, pad)
            if _debug_tc:
                return _pallas_fn(hi0, lo0)
            # slim kernel: (n_eq, K+1, B) hi block, (n_eq, mp+1, B) lo
            # block and the order-(K-1)/K infinity norms — the full
            # coefficient buffer never leaves VMEM
            tc_hi, tc_lo, dd_norms = _pallas_fn(hi0, lo0)
            if _pallas_B != B:
                tc_hi = tc_hi[:, :, :B]
                tc_lo = tc_lo[:, :, :B]
                dd_norms = dd_norms[:, :B]
            tc32 = None
        else:
            tc = order0(init_tc(dtype, lo_end), ctx64)
            if staged:
                _stage_init(dtype, lo_end, tc[:, 0, :])
            if unroll:
                for k_ in range(1, lo_end + 1):
                    tc = body(k_, tc, _mkctx(jnp, dtype, B, lo_end, kwin=k_,
                                             three_d=three_d, stage=stage,
                                             rmeta=rmeta))
            else:
                tc = lax.fori_loop(
                    1, lo_end + 1, lambda k, a: body(k, a, ctx64), tc
                )

        scale32 = False
        sig_e32 = None
        if use_mp and not dd_run:
            # widen the window to the full order for the f32 phase
            ctx32 = _mkctx(jnp, f32, B, K, three_d=three_d, rmeta=rmeta)
            # the scale estimate needs at least one exact f64 order
            # (mp_order=0 keeps the pre-existing unscaled behavior)
            scale32 = _pallas_fn is None and lo_end >= 1
            if scale32:
                # scaled-coefficient carry for the f32 phase (see
                # pallas_phase._jet_refs): seed d_k = c_k sig^k with a
                # per-lane power-of-two sig estimated from the exact f64
                # phase (radius of convergence from orders 0/mp), so
                # problems with natural timescales far from 1 in the
                # user's units don't under/overflow the f32 range.  The
                # scaling is exact; everything is shifted back out below.
                tcv64 = tc if three_d else tc.reshape(W, lo_end + 1, B)
                m0v = jnp.max(jnp.abs(tcv64[norm_cols, 0, :]), axis=0)
                mmp = jnp.max(jnp.abs(tcv64[norm_cols, lo_end, :]), axis=0)
                # Per-order growth estimate = least-squares slope of the
                # log2 norms over orders 1..lo_end, minus a 2-bit safety
                # margin.  Design history (round 4, all failure modes
                # observed on-chip):
                # - the lo_end-th ROOT of c_0/c_mp under-scales
                #   factorially-damped series tapes (amplitude prefactor
                #   bias) -> rows overflow by order ~14 (ELP2000);
                # - the top-order RATIO collapses when a single norm
                #   crosses zero -> over/under-downscale by +-4 bits
                #   per step; too small underflows the top rows (mo = 0
                #   -> rho = inf -> h = inf), too large overflows the
                #   f32 CONVOLUTION PRODUCTS (max_k d_k must stay below
                #   sqrt(f32_max) ~ 1.8e19: pairwise conv terms square
                #   the row magnitude) — VSOP2013 showed both within 20
                #   steps.
                # The LS slope is insensitive to isolated zero crossings
                # (measured spread 2.2 bits over 120 VSOP steps vs 4.2
                # for the pair ratio), and the margin biases toward
                # decaying rows — the safe side, since the bottom rows
                # sit ~20 decimal digits above the f32 denormal floor
                # while the top rows have only a few digits of product
                # headroom.
                est_root = (jnp.maximum(m0v, 1.0)
                            / jnp.maximum(mmp, 1e-300)) ** (1.0 / lo_end)
                if lo_end >= 2:
                    mall = jnp.max(jnp.abs(
                        tcv64[norm_cols, 1:lo_end + 1, :]), axis=0)  # (lo,B)
                    wv = (mall > 0.0).astype(dtype)
                    lm = jnp.log2(jnp.maximum(mall, 1e-300))
                    ks = jnp.arange(1, lo_end + 1, dtype=dtype)[:, None]
                    wsum = jnp.maximum(jnp.sum(wv, axis=0), 1e-30)
                    kb = jnp.sum(wv * ks, axis=0) / wsum
                    lb = jnp.sum(wv * lm, axis=0) / wsum
                    den = jnp.maximum(
                        jnp.sum(wv * (ks - kb) ** 2, axis=0), 1e-30)
                    slope = jnp.sum(wv * (ks - kb) * (lm - lb), axis=0) / den
                    est_ls = 2.0 ** (-slope - 2.0)
                    # fall back to the root when <2 valid norms
                    est = jnp.where(jnp.sum(wv, axis=0) >= 2.0,
                                    est_ls, est_root)
                else:
                    est = est_root
                _sig_force = _os.environ.get("HEYOKA_SIG_FORCE")
                if _sig_force is not None:  # debug/experiment knob
                    est = jnp.full_like(est, 2.0 ** float(_sig_force))
                sig_e32 = jnp.clip(
                    jnp.round(jnp.log2(jnp.maximum(est, 1e-300))),
                    -60.0, 60.0,
                ).astype(jnp.int32)
                if sig_hint is not None:
                    # cross-step feedback: the previous step's realized
                    # full-range slope (emitted as sig_next below) is a
                    # near-oracle scale — measured +-0.08 bits across
                    # steps on the VSOP tape, where any single-window
                    # bootstrap estimate wanders by bits (the log-norm
                    # curve's curvature is invisible from orders <= mp).
                    # 32767 marks "no hint yet" (first step: bootstrap).
                    sig_e32 = jnp.where(sig_hint < jnp.int32(30000),
                                        sig_hint, sig_e32).astype(jnp.int32)
                sig32 = _ldexp2(jnp, jnp.ones_like(sig_e32, f32), sig_e32)
                seed32 = jnp.stack(
                    [_ldexp2(jnp, tcv64[:, k_, :], k_ * sig_e32).astype(f32)
                     for k_ in range(lo_end + 1)], axis=1,
                )
                ctx32["sigma"] = sig32
            else:
                seed32 = tc.astype(f32) if three_d else None
            if three_d:
                tc32 = jnp.zeros((W, K + 1, B), f32)
                tc32 = lax.dynamic_update_slice(tc32, seed32, (0, 0, 0))
            else:
                tc32 = jnp.zeros((W, (K + 1) * B), f32)
                tc32 = lax.dynamic_update_slice(
                    tc32,
                    (seed32.reshape(W, (lo_end + 1) * B)
                     if scale32 else tc.astype(f32)),
                    (0, 0),
                )
            if _pallas_fn is not None:
                # whole f32 phase in one VMEM-resident Pallas kernel
                # (pallas_phase.py; ~3x the XLA phase at the north-star
                # workload, PERF.md)
                tc32 = _pallas_fn(tc32)
            else:
                if staged:
                    _stage_widen(f32, K, sig_e=sig_e32 if scale32 else None)
                if unroll:
                    for k_ in range(mp_order + 1, K + 1):
                        c32 = _mkctx(jnp, f32, B, K, kwin=k_,
                                     three_d=three_d, stage=stage,
                                     rmeta=rmeta)
                        if scale32:
                            c32["sigma"] = sig32
                        tc32 = body(k_, tc32, c32)
                else:
                    tc32 = lax.fori_loop(
                        mp_order + 1, K + 1, lambda k, a: body(k, a, ctx32),
                        tc32,
                    )

        if _debug_tc:
            return tc, (tc32 if use_mp else None)

        # step control + update: norms over the state variables (and
        # sv-func outputs) only, like the reference (taylor_00.cpp:168-195)
        tcv = tc if three_d else tc.reshape(W, lo_end + 1, B)
        sig_e = sig_e32  # log2 of the coefficient scale (int32) or None
        if dd_run:
            hiv = None
            if _pp_o0:
                # group-output order-0 values only exist in-kernel
                m0 = dd_norms[2].astype(dtype)
                sig64 = dd_norms[3].astype(dtype)
            else:
                m0 = jnp.max(jnp.abs(tcv[norm_cols, 0, :]), axis=0)
                sig64 = dd_norms[2].astype(dtype)
            # the kernel carries d_k = c_k sig^k (pallas_phase._jet_refs
            # scaled-coefficient carry): norms come out in sig units
            sig_e = jnp.round(jnp.log2(sig64)).astype(jnp.int32)
            mo1 = dd_norms[0].astype(dtype)
            mo = dd_norms[1].astype(dtype)
        else:
            hiv = ((tc32 if three_d else tc32.reshape(W, K + 1, B))
                   if use_mp else tcv)
            m0 = jnp.max(jnp.abs(tcv[norm_cols, 0, :]), axis=0)
            mo = jnp.max(jnp.abs(hiv[norm_cols, K, :]), axis=0).astype(dtype)
            mo1 = jnp.max(
                jnp.abs(hiv[norm_cols, K - 1, :]), axis=0
            ).astype(dtype)
        num = jnp.where(m0 <= 1.0, 1.0, m0)
        rho = jnp.minimum(
            (num / mo) ** (1.0 / K), (num / mo1) ** (1.0 / (K - 1))
        )
        if sig_e is not None:
            # rho in sig units -> real units (exact exponent shift; sig^K
            # itself may exceed the f64 range, so never form it)
            rho = _ldexp2(jnp, rho, sig_e)
        fac = _pymath.exp(-0.7 / (K - 1)) / (_pymath.e * _pymath.e)
        h = jnp.minimum(rho * fac, jnp.abs(max_dt))
        h = jnp.where(max_dt < 0, -h, h)

        # cross-step scale feedback (scale32 XLA path): the realized
        # full-range log-norm slope over orders 1..K is a near-oracle
        # sig for the NEXT step (measured +-0.08 bits step to step on
        # the VSOP tape, where bootstrap estimates from orders <= mp
        # wander by bits and stray outside the f32 safety window —
        # max_k d_k must stay under sqrt(f32_max) for the convolution
        # products while the top rows must not underflow).
        sig_next = None
        if return_tc == "scaled":
            if (not dd_run) and scale32:
                m1v = jnp.max(jnp.abs(tcv[norm_cols, 1, :]), axis=0)
                okf = (mo > 0.0) & (m1v > 0.0) & jnp.isfinite(mo)
                slope_full = (
                    jnp.log2(jnp.maximum(mo, 1e-300))
                    - sig_e.astype(dtype) * K
                    - jnp.log2(jnp.maximum(m1v, 1e-300))
                ) / (K - 1)
                sig_next = jnp.where(
                    okf,
                    jnp.clip(jnp.round(-slope_full - 2.0), -60.0, 60.0),
                    sig_e.astype(dtype),
                ).astype(jnp.int32)
            elif sig_e is not None:
                sig_next = jnp.broadcast_to(sig_e, (B,)).astype(jnp.int32)
            else:
                sig_next = jnp.zeros((B,), jnp.int32)

        def coeff(i):
            if dd_run:
                # double-float reconstruction: exact f64 order 0, hi+lo for
                # the dd orders, hi only above; the kernel rows are scaled
                # (d_i = c_i sig^i) — shift the exponent back out exactly
                if i == 0:
                    return tcv[:n_eq, 0, :]
                c = tc_hi[:n_eq, i, :].astype(dtype)
                if i <= mp_order:
                    c = c + tc_lo[:n_eq, i, :].astype(dtype)
                return _ldexp2(jnp, c, -i * sig_e)
            if use_mp and i > mp_order:
                c = hiv[:n_eq, i, :].astype(dtype)
                return _ldexp2(jnp, c, -i * sig_e) if scale32 else c
            return tcv[:n_eq, i, :].astype(dtype)

        if jet_mode:
            # (B, K+1, n_sv) coefficients over state vars + sv-func
            # outputs (the event-equation polynomials), plus the
            # natural adaptive h — no state update
            ev_ex = plan.out_cols

            def coeff_sv(i):
                st = coeff(i)
                if not ev_ex.size:
                    return st
                if dd_run:
                    if i == 0 and not _pp_o0:
                        ex = row0[ev_ex]  # exact f64 (XLA order 0)
                    else:
                        ex = tc_hi[n_eq:, i, :].astype(dtype)
                        if i <= mp_order:
                            ex = ex + tc_lo[n_eq:, i, :].astype(dtype)
                        if i > 0:
                            ex = _ldexp2(jnp, ex, -i * sig_e)
                elif use_mp and i > mp_order:
                    ex = hiv[ev_ex, i, :].astype(dtype)
                    if scale32:
                        ex = _ldexp2(jnp, ex, -i * sig_e)
                else:
                    ex = tcv[ev_ex, i, :].astype(dtype)
                return jnp.concatenate([st, ex], axis=0)

            tc_sv = jnp.stack([coeff_sv(i) for i in range(K + 1)], 0)
            return tc_sv.transpose(2, 0, 1), h

        # State update: evaluate in SCALED space when a coefficient scale
        # exists — sum d_i u^i with u = h 2^-sig_e and d_i = c_i 2^(i
        # sig_e), exactly equal to sum c_i h^i (power-of-two shifts) but
        # never materializing c_i or h^i.  XLA:TPU emulates f64 with the
        # f32 exponent range, so for problems whose natural step is large
        # in the user's units (config-5 geopot: h ~ 366 s) h^16 overflows
        # to inf while the unscaled c_12.. underflow to zero — the
        # compensated sum then computes inf * 0 = NaN (round-4 audit;
        # the reference's native f64 never sees this,
        # /root/reference/benchmark/geopot.cpp runs clean).
        if sig_e is not None:
            h_ev = _ldexp2(jnp, h, -sig_e)

            def ucoeff(i):
                # scaled d_i = c_i sig^i as the work dtype (order 0 is
                # unscaled by definition; magnitudes stay within the
                # f32 exponent range by the carry's construction)
                if i == 0:
                    return coeff(0)
                if dd_run:
                    c = tc_hi[:n_eq, i, :].astype(dtype)
                    if i <= mp_order:
                        c = c + tc_lo[:n_eq, i, :].astype(dtype)
                    return c
                if use_mp and i > mp_order:
                    # scale32: the f32 rows already carry d_i
                    return (hiv[:n_eq, i, :].astype(dtype) if scale32
                            else tcv[:n_eq, i, :].astype(dtype))
                return _ldexp2(jnp, tcv[:n_eq, i, :].astype(dtype),
                               i * sig_e)
        else:
            h_ev = h
            ucoeff = coeff
        if high_accuracy:
            res = ucoeff(0)
            comp = jnp.zeros_like(res)
            cur_h = h_ev
            for i in range(1, K + 1):
                tmp = ucoeff(i) * cur_h[None, :]
                y = tmp - comp
                tt = res + y
                comp = (tt - res) - y
                res = tt
                if i < K:
                    cur_h = cur_h * h_ev
        else:
            res = ucoeff(K)
            for i in range(1, K + 1):
                res = ucoeff(K - i) + res * h_ev[None, :]
        if return_tc == "scaled":
            # (B, K+1, n_eq) SCALED coefficients d_i = c_i 2^(i sig_e)
            # plus the per-lane exponent: always within the f32 exponent
            # range emulated f64 inherits on TPU (the true c_i need not
            # be — geopot h ~ 366 flushes c_12.., ELP2000 rates overflow
            # to inf at order ~14).  Consumers evaluate dense output
            # with u = dt 2^-sig_e, or reconstruct exactly on the host
            # (numpy is native f64) — see batch.TaylorAdaptiveBatch.tc.
            tc_b = jnp.stack([ucoeff(i) for i in range(K + 1)], 0)
            sge = (jnp.broadcast_to(sig_e, (B,)).astype(jnp.int32)
                   if sig_e is not None else jnp.zeros((B,), jnp.int32))
            return res.T, h, tc_b.transpose(2, 0, 1), sge, sig_next
        if return_tc:
            # (B, K+1, n_eq) state-column coefficients (integrator tc
            # convention; f32 high orders widened back to the work dtype)
            tc_b = jnp.stack([coeff(i) for i in range(K + 1)], 0)
            return res.T, h, tc_b.transpose(2, 0, 1)
        return res.T, h

    # engine provenance for engine_report()/assert_engine (opt_checks
    # analog): which kernel variant the huge-tape ladder resolved to
    step._engine_meta = dict(
        pallas_phase=pallas_phase, pallas_compact=_pp_compact,
        pallas_rolled=_pp_rolled, bt=_bt,
    )
    return step


def make_propagate_until_flat(tape: Tape, order: int, *, dtype=None,
                              high_accuracy: bool = True,
                              mp_order: int | None = None,
                              pallas_phase=False):
    """On-device lockstep propagate-until over the staged flat engine.

    ``pu(state (B,n), pars (B,p), t_hi (B,), t_lo (B,), target_hi (B,),
    target_lo (B,), max_delta_t (B,), max_steps) -> dict`` with per-lane
    fields — the batched analog of :func:`loops.make_propagate_until`
    (same masked-lane semantics as its vmapped form, but stepping the
    whole batch through one staged flat step: ~4.5x the throughput of
    the vmapped scalar jet on TPU at the north-star workload).
    """
    import jax.numpy as jnp
    from jax import lax

    from ..dfloat import dd_add_d, dd_add_dd
    from .outcome import TaylorOutcome

    if dtype is None:
        dtype = jnp.float64
    step = make_batched_step_flat(
        tape, order, dtype=dtype, high_accuracy=high_accuracy,
        mp_order=mp_order, layout="3d", unroll=True, staged=True,
        return_tc="scaled", pallas_phase=pallas_phase,
    )
    n_eq = tape.n_eq

    def pu(state, pars, t_hi, t_lo, target_hi, target_lo, max_delta_t,
           max_steps):
        B = state.shape[0]
        zero = jnp.zeros((B,), dtype)
        inf = jnp.full((B,), jnp.inf, dtype)

        rem0, _ = dd_add_dd(target_hi, target_lo, -t_hi, -t_lo)
        fwd = rem0 > 0.0

        init = dict(
            state=state,
            t_hi=t_hi,
            t_lo=t_lo,
            last_h=zero,
            tc=jnp.zeros((B, order + 1, n_eq), dtype),
            tc_sige=jnp.zeros((B,), jnp.int32),
            sig_hint=jnp.full((B,), jnp.int32(32767)),
            nsteps=jnp.zeros((B,), jnp.int64),
            min_h=inf,
            max_h=zero,
            outcome=jnp.full((B,), jnp.int32(TaylorOutcome.time_limit)),
            done=rem0 == 0.0,
        )
        return _pu_while(step, pars, target_hi, target_lo,
                         max_delta_t, max_steps, fwd, init)

    return pu


def _pu_while(step, pars, target_hi, target_lo, max_delta_t,
              max_steps, fwd, init):
    """The lockstep propagate-until while loop over a batched ``step``.

    Shared by :func:`make_propagate_until_flat` (fresh ``init``) and the
    fused-kernel driver (:mod:`.fused`), whose exact f64 landing phase
    enters mid-flight with the kernel's state/time/statistics as
    ``init``."""
    import jax.numpy as jnp
    from jax import lax

    from ..dfloat import dd_add_d, dd_add_dd
    from .outcome import TaylorOutcome

    def remaining(th, tl):
        rh, _ = dd_add_dd(target_hi, target_lo, -th, -tl)
        return rh

    def cond(c):
        return ~jnp.all(c["done"])

    def body(c):
        rem = remaining(c["t_hi"], c["t_lo"])
        cap = jnp.minimum(jnp.abs(rem), max_delta_t)
        # finished lanes step with dt = 0 (their results are masked out)
        cap = jnp.where(c["done"], 0.0, cap)
        dt = jnp.where(fwd, cap, -cap)

        new_state, h, tc, sge, sig_next = step(
            c["state"], pars, c["t_hi"], dt, c["sig_hint"])
        nt_hi, nt_lo = dd_add_d(c["t_hi"], c["t_lo"], h)

        finite = jnp.all(jnp.isfinite(new_state), axis=1) & jnp.isfinite(h)
        nsteps = c["nsteps"] + 1
        rem_after = remaining(nt_hi, nt_lo)
        reached = jnp.where(fwd, rem_after <= 0.0, rem_after >= 0.0)
        hit_step_limit = (max_steps > 0) & (nsteps >= max_steps) & ~reached

        outcome = jnp.where(
            ~finite,
            jnp.int32(TaylorOutcome.err_nf_state),
            jnp.where(
                hit_step_limit,
                jnp.int32(TaylorOutcome.step_limit),
                jnp.int32(TaylorOutcome.time_limit),
            ),
        )
        done = ~finite | hit_step_limit | reached

        alive = ~c["done"]

        def sel(new, old):
            return jnp.where(alive, new, old)

        abs_h = jnp.abs(h)
        return dict(
            state=jnp.where(alive[:, None], new_state, c["state"]),
            t_hi=sel(nt_hi, c["t_hi"]),
            t_lo=sel(nt_lo, c["t_lo"]),
            last_h=sel(h, c["last_h"]),
            tc=jnp.where(alive[:, None, None], tc, c["tc"]),
            tc_sige=jnp.where(alive, sge, c["tc_sige"]),
            sig_hint=jnp.where(alive, sig_next, c["sig_hint"]),
            nsteps=sel(nsteps, c["nsteps"]),
            min_h=sel(jnp.minimum(c["min_h"], abs_h), c["min_h"]),
            max_h=sel(jnp.maximum(c["max_h"], abs_h), c["max_h"]),
            outcome=sel(outcome, c["outcome"]),
            done=sel(done, c["done"]),
        )

    return lax.while_loop(cond, body, init)


# ---------------------------------------------------------------------------
# flat-layout dynamic-k rules: histories are (m, K+1, B); `off = k * B`
# ---------------------------------------------------------------------------

def _row(ctx, tc, cols, B, off):
    """order-k values of `cols`: (m, B)."""
    return ctx["rows"](ctx["blk"](tc, off // B), cols)


def _sum_rows(ctx, row, g):
    """Order-block sum over a group's args: per-arg slice-piece reads for
    low-arity wide groups (the instance-regular shape — N subtractions per
    mascon/centre/pair), one fused gather otherwise."""
    nargs = g.in_cols.shape[1]
    if nargs <= 8 and g.out_cols.size >= nargs:
        tot = None
        for c in range(nargs):
            v = ctx["rows"](row, g.in_cols[:, c])
            tot = v if tot is None else tot + v
        return tot
    return row[g.in_cols].sum(axis=1)


@_rule("sum")
def _f_sum(ctx, tc, k, kf, g, B, off):
    return _sum_rows(ctx, ctx["blk"](tc, k), g)


@_rule("mul")
def _f_mul(ctx, tc, k, kf, g, B, off):
    A = ctx["hist"](tc, g.in_cols[:, 0])
    C = ctx["hist"](tc, g.in_cols[:, 1])
    return ctx["conv"](A, C, k)


@_rule("div")
def _f_div(ctx, tc, k, kf, g, B, off):
    jv = ctx["jv"]
    A = ctx["mrow"](ctx["hist"](tc, g.out_cols), jv < k)
    C = ctx["hist"](tc, g.in_cols[:, 1])
    num = ctx["conv"](A, C, k)
    bk = _row(ctx, tc, g.in_cols[:, 0], B, off)
    return (bk - num) / C[:, 0, :]


def _f_pair(sign):
    def impl(ctx, tc, k, kf, g, B, off):
        jv = ctx["jv"]
        Bh = ctx["mrow"](ctx["hist"](tc, g.in_cols[:, 0]), jv.astype(tc.dtype))
        P = ctx["hist"](tc, g.aux["pair"])
        return sign / kf * ctx["conv"](Bh, P, k)

    return impl


_F_RULES["sin"] = _f_pair(1.0)
_F_RULES["sinh"] = _f_pair(1.0)
_F_RULES["cosh"] = _f_pair(1.0)
_F_RULES["cos"] = _f_pair(-1.0)


@_rule("exp")
def _f_exp(ctx, tc, k, kf, g, B, off):
    jv = ctx["jv"]
    Bh = ctx["mrow"](ctx["hist"](tc, g.in_cols[:, 0]), jv.astype(tc.dtype))
    E = ctx["hist"](tc, g.out_cols)
    return ctx["conv"](Bh, E, k) / kf


@_rule("log")
def _f_log(ctx, tc, k, kf, g, B, off):
    jv = ctx["jv"]
    A = ctx["mrow"](ctx["hist"](tc, g.out_cols), (jv * (jv < k)).astype(tc.dtype))
    Bh = ctx["hist"](tc, g.in_cols[:, 0])
    s = ctx["conv"](A, Bh, k)
    bk = _row(ctx, tc, g.in_cols[:, 0], B, off)
    return (bk - s / kf) / Bh[:, 0, :]


@_rule("sqrt")
def _f_sqrt(ctx, tc, k, kf, g, B, off):
    jv = ctx["jv"]
    A = ctx["hist"](tc, g.out_cols)
    Am = ctx["mrow"](A, ((jv >= 1) & (jv < k)))
    s = ctx["conv"](Am, A, k)
    bk = _row(ctx, tc, g.in_cols[:, 0], B, off)
    return (bk - s) / (2.0 * A[:, 0, :])


@_rule("pow")
def _f_pow(ctx, tc, k, kf, g, B, off):
    jnp = ctx["jnp"]
    jv = ctx["jv"]
    alpha = jnp.asarray(g.alpha, tc.dtype)
    A = ctx["mrow"](ctx["hist"](tc, g.out_cols), jv < k)
    Bh = ctx["hist"](tc, g.in_cols[:, 0])
    t1 = ctx["conv"](A, Bh, k, wB_rev=lambda r: r) * alpha[:, None]
    t2 = ctx["conv"](ctx["mrow"](A, jv.astype(tc.dtype)), Bh, k)
    return (t1 - t2) / (kf * Bh[:, 0, :])


def _f_sq(sign):
    def impl(ctx, tc, k, kf, g, B, off):
        jv = ctx["jv"]
        Q = ctx["mrow"](ctx["hist"](tc, g.aux["sq"]), jv < k)
        Bh = ctx["hist"](tc, g.in_cols[:, 0])
        s = ctx["conv"](Q, Bh, k, wB_rev=lambda r: r)
        bk = _row(ctx, tc, g.in_cols[:, 0], B, off)
        return bk + sign * s / kf

    return impl


_F_RULES["tan"] = _f_sq(1.0)
_F_RULES["tanh"] = _f_sq(-1.0)


def _f_trigseries(ctx, tc, k, kf, g, B, off):
    """Dense trig-series op (``expr/series.py``) on the flat staged
    engine — the path that gives ephemeris tapes the scaled-carry
    mixed-precision treatment on TPU (the unscaled loops engine cannot
    represent ELP2000-class coefficients ``~rate^k/k!`` within the f32
    exponent range emulated f64 inherits).

    The input is affine in time, so only its order-0/1 rows matter; the
    per-term jet is built once per phase and cached in the step trace's
    ``rmeta``.  In the scaled f32 phase the input's order-1 row carries
    ``d_1 = c_1 sig``, and the jet's order-homogeneity then yields
    ``c_k sig^k`` — exactly the scaled-carry contract.
    """
    from ..expr import series as _series

    jnp_ = ctx["jnp"]
    rmeta = ctx.get("rmeta")
    if rmeta is None:  # pragma: no cover — guarded at build time
        raise UnsupportedLoopOp(g.name)
    H = ctx["hist"](tc, g.in_cols[:, 0])
    u0 = H[:, 0, :]
    u1 = H[:, 1, :] if H.shape[1] > 1 else jnp_.zeros_like(u0)
    cache = rmeta.setdefault(("ts", g.name), {})
    return _series.jet_order(jnp_, g.name.split("%", 1)[1], u0, u1, k,
                             cache, str(ctx["dtype"]))


def _frule(name: str):
    fn = _F_RULES.get(name)
    if fn is None and name.startswith("trigseries%"):
        return _f_trigseries
    return fn


@_rule("sigmoid")
def _f_sigmoid(ctx, tc, k, kf, g, B, off):
    jv = ctx["jv"]
    A0 = ctx["hist"](tc, g.out_cols) - ctx["hist"](tc, g.aux["sq"])
    A = ctx["mrow"](A0, jv < k)
    Bh = ctx["hist"](tc, g.in_cols[:, 0])
    return ctx["conv"](A, Bh, k, wB_rev=lambda r: r) / kf


def _f_inv(sign):
    def impl(ctx, tc, k, kf, g, B, off):
        jv = ctx["jv"]
        C = ctx["mrow"](ctx["hist"](tc, g.in_cols[:, 1]), jv >= 1)
        A = ctx["hist"](tc, g.out_cols)
        s = ctx["conv"](C, A, k, wB_rev=lambda r: r)
        bk = _row(ctx, tc, g.in_cols[:, 0], B, off)
        c0 = ctx["hist"](tc, g.in_cols[:, 1])[:, 0, :]
        return (sign * kf * bk - s) / (kf * c0)

    return impl


for _n in ("asin", "atan", "atanh", "asinh", "acosh"):
    _F_RULES[_n] = _f_inv(1.0)
_F_RULES["acos"] = _f_inv(-1.0)


@_rule("erf")
def _f_erf(ctx, tc, k, kf, g, B, off):
    E = ctx["hist"](tc, g.in_cols[:, 1])
    Bh = ctx["hist"](tc, g.in_cols[:, 0])
    s = ctx["conv"](E, Bh, k, wB_rev=lambda r: r)
    return (2.0 / _pymath.sqrt(_pymath.pi)) * s / kf


@_rule("atan2")
def _f_atan2(ctx, tc, k, kf, g, B, off):
    jv = ctx["jv"]
    Y = ctx["hist"](tc, g.in_cols[:, 0])
    X = ctx["hist"](tc, g.in_cols[:, 1])
    D = ctx["hist"](tc, g.in_cols[:, 2])
    r1 = ctx["conv"](X, Y, k, wB_rev=lambda r: r)
    r2 = ctx["conv"](Y, X, k, wB_rev=lambda r: r)
    Dm = ctx["mrow"](D, jv >= 1)
    A = ctx["hist"](tc, g.out_cols)
    s = ctx["conv"](Dm, A, k, wB_rev=lambda r: r)
    return (r1 - r2 - s) / (kf * D[:, 0, :])


@_rule("relu")
def _f_relu(ctx, tc, k, kf, g, B, off):
    jnp = ctx["jnp"]
    b0 = ctx["hist"](tc, g.in_cols[:, 0])[:, 0, :]
    bk = _row(ctx, tc, g.in_cols[:, 0], B, off)
    return jnp.where(b0 > 0.0, bk, 0.0)


@_rule("relup")
def _f_relup(ctx, tc, k, kf, g, B, off):
    return ctx["jnp"].zeros((g.out_cols.size, B), tc.dtype)


@_rule("select")
def _f_select(ctx, tc, k, kf, g, B, off):
    jnp = ctx["jnp"]
    blk = ctx["blk"](tc, k)
    c0 = ctx["hist"](tc, g.in_cols[:, 0])[:, 0, :]
    return jnp.where(c0 != 0.0, blk[g.in_cols[:, 1]], blk[g.in_cols[:, 2]])


def _f_const(ctx, tc, k, kf, g, B, off):
    return ctx["jnp"].zeros((g.out_cols.size, B), tc.dtype)


for _n in ("lt", "le", "gt", "ge", "eq", "ne",
           "logical_and", "logical_or", "logical_not"):
    _F_RULES[_n] = _f_const


@_rule("kepE")
def _f_kepE(ctx, tc, k, kf, g, B, off):
    jv = ctx["jv"]
    E_ = ctx["hist"](tc, g.in_cols[:, 0])
    Sh = ctx["hist"](tc, g.aux["sin"])
    Ch = ctx["hist"](tc, g.aux["cos"])
    F = ctx["hist"](tc, g.out_cols)
    Q = ctx["tri"](E_, Ch)  # (m, K+1, B): Q[:, m] = (e*cos)_m
    Mk = _row(ctx, tc, g.in_cols[:, 1], B, off)
    t1 = kf * Mk
    t2 = ctx["conv"](ctx["mrow"](E_, jv.astype(tc.dtype)), Sh, k)
    Qm = ctx["mrow"](Q, jv >= 1)
    t3 = ctx["conv"](Qm, F, k, wB_rev=lambda r: r)
    return (t1 + t2 + t3) / (kf * (1.0 - Q[:, 0, :]))


@_rule("kepF")
def _f_kepF(ctx, tc, k, kf, g, B, off):
    jv = ctx["jv"]
    H = ctx["hist"](tc, g.in_cols[:, 0])
    Kk = ctx["hist"](tc, g.in_cols[:, 1])
    Sh = ctx["hist"](tc, g.aux["sin"])
    Ch = ctx["hist"](tc, g.aux["cos"])
    F = ctx["hist"](tc, g.out_cols)
    Wt = ctx["tri"](H, Sh) + ctx["tri"](Kk, Ch)
    lamk = _row(ctx, tc, g.in_cols[:, 2], B, off)
    t1 = kf * lamk
    t2 = -ctx["conv"](ctx["mrow"](H, jv.astype(tc.dtype)), Ch, k)
    t3 = ctx["conv"](ctx["mrow"](Kk, jv.astype(tc.dtype)), Sh, k)
    Wm = ctx["mrow"](Wt, jv >= 1)
    t4 = ctx["conv"](Wm, F, k, wB_rev=lambda r: r)
    return (t1 + t2 + t3 + t4) / (kf * (1.0 - Wt[:, 0, :]))


@_rule("kepDE")
def _f_kepDE(ctx, tc, k, kf, g, B, off):
    jv = ctx["jv"]
    S0 = ctx["hist"](tc, g.in_cols[:, 0])
    C0 = ctx["hist"](tc, g.in_cols[:, 1])
    Sh = ctx["hist"](tc, g.aux["sin"])
    Ch = ctx["hist"](tc, g.aux["cos"])
    F = ctx["hist"](tc, g.out_cols)
    Wt = ctx["tri"](S0, Sh) - ctx["tri"](C0, Ch)
    omc = -Ch
    omc = omc.at[:, 0, :].set(1.0 - Ch[:, 0, :])
    DMk = _row(ctx, tc, g.in_cols[:, 2], B, off)
    t1 = kf * DMk
    t2 = -ctx["conv"](ctx["mrow"](S0, jv.astype(tc.dtype)), omc, k)
    t3 = ctx["conv"](ctx["mrow"](C0, jv.astype(tc.dtype)), Sh, k)
    Wm = ctx["mrow"](Wt, jv >= 1)
    t4 = -ctx["conv"](Wm, F, k, wB_rev=lambda r: r)
    return (t1 + t2 + t3 + t4) / (kf * (1.0 + Wt[:, 0, :]))


def make_propagate_grid_flat(tape: Tape, order: int, *, dtype=None,
                             high_accuracy: bool = True,
                             mp_order: int | None = None,
                             pallas_phase=False):
    """On-device lockstep propagate-grid over the staged flat engine.

    ``pg(state (B,n), pars (B,p), t_hi (B,), t_lo (B,), grid (ngrid,),
    max_delta_t (B,), max_steps) -> dict`` — the batched analog of
    :func:`loops.make_propagate_grid` (shared monotonic grid, per-lane
    dense output), stepping the whole batch through one staged flat step.
    The per-lane grid cursor advances in a vectorized inner while loop
    (one (B, n_eq) scatter row-write per filled point).
    """
    import jax.numpy as jnp
    from jax import lax

    from ..dfloat import dd_add_d, dd_add_dd
    from .outcome import TaylorOutcome

    if dtype is None:
        dtype = jnp.float64
    step = make_batched_step_flat(
        tape, order, dtype=dtype, high_accuracy=high_accuracy,
        mp_order=mp_order, layout="3d", unroll=True, staged=True,
        return_tc="scaled", pallas_phase=pallas_phase,
    )
    n_eq = tape.n_eq
    K = order

    def dense(tc, rel, sge):
        # Horner over per-lane SCALED coefficients d_i = c_i 2^(i sge):
        # evaluate at u = rel 2^-sge (exact shift), never materializing
        # the true c_i / rel^i magnitudes (TPU emulated-f64 range)
        u = _ldexp2(jnp, rel, -sge)
        res = tc[:, K, :]
        for i in range(1, K + 1):
            res = tc[:, K - i, :] + res * u[:, None]
        return res

    def pg(state, pars, t_hi, t_lo, grid, max_delta_t, max_steps):
        B = state.shape[0]
        ngrid = grid.shape[0]
        target = grid[-1]
        fwd = target - t_hi >= 0.0
        lanes = jnp.arange(B)
        zero = jnp.zeros((B,), dtype)

        out0 = jnp.zeros((B, ngrid, n_eq), dtype)

        # grid points exactly at the current time resolve to current state
        def f0_cond(c):
            gi, _ = c
            tg = grid[jnp.minimum(gi, ngrid - 1)]
            return jnp.any((gi < ngrid) & (tg == t_hi))

        def f0_body(c):
            gi, out = c
            idx = jnp.minimum(gi, ngrid - 1)
            m = (gi < ngrid) & (grid[idx] == t_hi)
            cur = out[lanes, idx]
            out = out.at[lanes, idx].set(
                jnp.where(m[:, None], state, cur)
            )
            return gi + m.astype(gi.dtype), out

        gi0, out0 = lax.while_loop(
            f0_cond, f0_body, (jnp.zeros((B,), jnp.int64), out0)
        )

        init = dict(
            state=state,
            t_hi=t_hi,
            t_lo=t_lo,
            last_h=zero,
            tc=jnp.zeros((B, K + 1, n_eq), dtype),
            tc_sige=jnp.zeros((B,), jnp.int32),
            sig_hint=jnp.full((B,), jnp.int32(32767)),
            nsteps=jnp.zeros((B,), jnp.int64),
            min_h=jnp.full((B,), jnp.inf, dtype),
            max_h=zero,
            outcome=jnp.full((B,), jnp.int32(TaylorOutcome.time_limit)),
            done=gi0 >= ngrid,
            gi=gi0,
            out=out0,
        )

        def cond(c):
            return ~jnp.all(c["done"])

        def body(c):
            alive = ~c["done"]
            rem = target - c["t_hi"]
            cap = jnp.minimum(jnp.abs(rem), max_delta_t)
            cap = jnp.where(alive, cap, 0.0)
            dt = jnp.where(fwd, cap, -cap)

            new_state, h, tc, sge, sig_next = step(
                c["state"], pars, c["t_hi"], dt, c["sig_hint"])
            t_prev_hi, t_prev_lo = c["t_hi"], c["t_lo"]
            nt_hi, nt_lo = dd_add_d(t_prev_hi, t_prev_lo, h)

            finite = jnp.all(jnp.isfinite(new_state), axis=1) \
                & jnp.isfinite(h)

            # vectorized fill of grid points inside each lane's step span
            def gmask(gi):
                idx = jnp.minimum(gi, ngrid - 1)
                tg = grid[idx]
                inb = jnp.where(fwd, tg <= nt_hi, tg >= nt_hi)
                return (gi < ngrid) & inb & finite & alive

            def gcond(g):
                gi, _ = g
                return jnp.any(gmask(gi))

            def gbody(g):
                gi, out = g
                idx = jnp.minimum(gi, ngrid - 1)
                m = gmask(gi)
                rel, _ = dd_add_dd(
                    grid[idx], jnp.zeros_like(grid[idx]),
                    -t_prev_hi, -t_prev_lo,
                )
                vals = dense(tc, rel, sge)
                cur = out[lanes, idx]
                out = out.at[lanes, idx].set(
                    jnp.where(m[:, None], vals, cur)
                )
                return gi + m.astype(gi.dtype), out

            gi, out = lax.while_loop(gcond, gbody, (c["gi"], c["out"]))

            nsteps = c["nsteps"] + 1
            reached = gi >= ngrid
            hit_step_limit = (max_steps > 0) & (nsteps >= max_steps) \
                & ~reached
            outcome = jnp.where(
                ~finite,
                jnp.int32(TaylorOutcome.err_nf_state),
                jnp.where(
                    hit_step_limit,
                    jnp.int32(TaylorOutcome.step_limit),
                    jnp.int32(TaylorOutcome.time_limit),
                ),
            )
            done = ~finite | hit_step_limit | reached

            def sel(new, old):
                return jnp.where(alive, new, old)

            abs_h = jnp.abs(h)
            return dict(
                state=jnp.where(alive[:, None], new_state, c["state"]),
                t_hi=sel(nt_hi, c["t_hi"]),
                t_lo=sel(nt_lo, c["t_lo"]),
                last_h=sel(h, c["last_h"]),
                tc=jnp.where(alive[:, None, None], tc, c["tc"]),
                tc_sige=jnp.where(alive, sge, c["tc_sige"]),
                sig_hint=jnp.where(alive, sig_next, c["sig_hint"]),
                nsteps=sel(nsteps, c["nsteps"]),
                min_h=sel(jnp.minimum(c["min_h"], abs_h), c["min_h"]),
                max_h=sel(jnp.maximum(c["max_h"], abs_h), c["max_h"]),
                outcome=sel(outcome, c["outcome"]),
                done=sel(done, c["done"]),
                gi=jnp.where(alive, gi, c["gi"]),
                out=out,
            )

        return lax.while_loop(cond, body, init)

    return pg
