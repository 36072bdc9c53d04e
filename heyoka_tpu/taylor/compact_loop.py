"""Looped compact-mode jet engine: ``fori_loop`` over the Taylor orders.

The compact engine in :mod:`compact` unrolls the order loop at trace time
(XLA graph ~ order x groups).  For big systems/orders the compile time is
still minutes on a cold cache; this variant wraps the per-order update in a
single ``lax.fori_loop`` body, shrinking the graph to O(groups) — the full
analog of heyoka's compact mode, whose IR loops over orders at *runtime*
(``taylor_compute_jet_compact_mode``, ``src/taylor_02.cpp:1194``).

The recurrences here are dynamic-k: convolutions run over the full
coefficient history with masks (rows at orders > current k hold zeros, so
full-length contractions truncate automatically).  Selected with
``make_jet_fn_compact(..., loop_orders=True)`` / integrator kwarg
``compact_mode="loop"``.

Ops without a vectorized dynamic rule (the dataset-backed interpolants) are
not supported here — the builder raises and callers fall back to the
unrolled compact engine.
"""

from __future__ import annotations

import math as _pymath

import numpy as np

from ..expr.decompose import Tape
from ..expr import registry as _reg
from .compact import _EVAL_ARITY, _pow0_vec, build_plan


class UnsupportedLoopOp(Exception):
    pass


def _gcol_factory(jnp):
    """Contiguity-aware history reader: contiguous column sets load as a
    static slice (cheap), arbitrary sets as a gather.

    The plan's column permutation makes every group's outputs (and hence
    every aux/pair/self set and many operand sets) contiguous, so most of
    the big per-(order, group) history reads avoid XLA gather->copy.
    """
    import numpy as np

    cache = {}

    def gcol(tc, cols):
        key = cols.tobytes()
        rng = cache.get(key)
        if rng is None:
            a = int(cols[0])
            if np.array_equal(cols, np.arange(a, a + cols.size)):
                rng = (a, a + int(cols.size))
            else:
                rng = False
            cache[key] = rng
        if rng is False:
            return tc[:, cols]
        return tc[:, rng[0] : rng[1]]

    return gcol


def _helpers(jnp, K: int):
    """Dynamic-k contraction helpers over (K+1, m[, batch]) histories.

    All masks/weights are 1-D over the order axis and broadcast over any
    trailing axes, so the same rules serve both the per-trajectory layout
    (K+1, m) and the batched layout (K+1, m, batch).
    """
    j = jnp.arange(K + 1)

    def bc(x, ref):
        # reshape a length-(K+1) vector for broadcasting against ref
        return x.reshape((K + 1,) + (1,) * (ref.ndim - 1))

    def rows_rev(B, k):
        # R[i] = B[k - i] for i <= k else 0
        idx = jnp.clip(k - j, 0, K)
        return B[idx] * bc(j <= k, B)

    def conv(A, B, k, wA=None, wB_rev=None):
        # sum_{i=0..k} wA[i] * A[i] * wB(k-i) * B[k-i]
        term = A * rows_rev(B, k)
        if wA is not None:
            term = term * bc(wA, term)
        if wB_rev is not None:
            # weight as a function of (k - i), applied to the reversed rows
            term = term * bc(wB_rev(k - j), term)
        return term.sum(0)

    return j, bc, rows_rev, conv


def make_jet_fn_compact_loop(tape: Tape, order: int, *, dtype=None):
    import jax.numpy as jnp
    from jax import lax

    if dtype is None:
        dtype = jnp.float64
    if tape.rhs is None:
        raise ValueError("requires an ODE tape")
    plan = build_plan(tape, order)
    n_eq = plan.n_eq
    K = order

    # triangular convolution tensor for the Kepler solvers:
    # S[m, a, b] = 1 iff a + b == m
    _kep_groups = any(
        g.name in ("kepE", "kepF", "kepDE") for lv in plan.levels for g in lv
    )
    if _kep_groups:
        S = np.zeros((K + 1, K + 1, K + 1))
        for m in range(K + 1):
            for a in range(m + 1):
                S[m, a, m - a] = 1.0
        S_j = jnp.asarray(S, dtype)

    for lv in plan.levels:
        for g in lv:
            if g.name not in _LOOP_RULES:
                raise UnsupportedLoopOp(g.name)

    const_cols = np.array([c for c, _ in plan.const_cols], dtype=np.int64)
    const_vals = np.array([v for _, v in plan.const_cols])
    par_cols = np.array([c for c, _ in plan.par_cols], dtype=np.int64)
    par_idx = np.array([j for _, j in plan.par_cols], dtype=np.int64)

    def jet(state, pars, t):
        jv, bc, rows_rev, conv = _helpers(jnp, K)

        def tri(A, B):
            # full triangular convolution: Q[m] = sum_{a<=m} A[a] B[m-a]
            return jnp.einsum("ac,bc,mab->mc", A, B, S_j)

        tc = jnp.zeros((K + 1, plan.width), dtype)
        tc = tc.at[0, :n_eq].set(state.astype(dtype))
        if const_cols.size:
            tc = tc.at[0, const_cols].set(jnp.asarray(const_vals, dtype))
        if par_cols.size:
            tc = tc.at[0, par_cols].set(pars[par_idx].astype(dtype))
        if plan.time_col is not None:
            tc = tc.at[0, plan.time_col].set(jnp.asarray(t, dtype))
            tc = tc.at[1, plan.time_col].set(jnp.asarray(1.0, dtype))

        # order 0 (level by level, identical to the unrolled engine)
        for lv in plan.levels:
            for g in lv:
                ar = _EVAL_ARITY.get(g.name, None)
                ins = [
                    tc[0, g.in_cols[:, c]]
                    for c in range(g.in_cols.shape[1] if ar is None else ar)
                ]
                if g.name == "sum":
                    vals = tc[0, g.in_cols].sum(axis=1)
                elif g.name == "pow":
                    vals = _pow0_vec(jnp, ins[0], g.alpha)
                elif g.name == "mul":
                    vals = ins[0] * ins[1]
                else:
                    vals = _reg.opdef(g.name).evaluate(*ins)
                m = g.out_cols.size
                tc = tc.at[0, g.out_start : g.out_start + m].set(
                    vals.astype(dtype)
                )

        ctx = dict(jv=jv, bc=bc, rows_rev=rows_rev, conv=conv, jnp=jnp,
                   dtype=dtype, tri=tri if _kep_groups else None,
                   gcol=_gcol_factory(jnp))

        def body(k, tc):
            kf = k.astype(dtype)
            sv = tc[k - 1, plan.rhs_cols] / kf
            tc = tc.at[k, :n_eq].set(sv)
            for lv in plan.levels:
                for g in lv:
                    vals = _LOOP_RULES[g.name](ctx, tc, k, kf, g)
                    m = g.out_cols.size
                    tc = tc.at[k, g.out_start : g.out_start + m].set(
                        jnp.asarray(vals, dtype)
                    )
            return tc

        tc = lax.fori_loop(1, K + 1, body, tc)
        cols = np.concatenate([np.arange(n_eq), plan.out_cols]) \
            if plan.out_cols.size else np.arange(n_eq)
        return tc[:, cols]

    return jet


# ---------------------------------------------------------------------------
# dynamic-k rules (k traced; kf = float(k))
# ---------------------------------------------------------------------------

_LOOP_RULES: dict = {}


def _rule(name):
    def deco(fn):
        _LOOP_RULES[name] = fn
        return fn

    return deco


@_rule("sum")
def _l_sum(ctx, tc, k, kf, g):
    return tc[k, g.in_cols].sum(axis=1)


@_rule("mul")
def _l_mul(ctx, tc, k, kf, g):
    return ctx["conv"](ctx["gcol"](tc, g.in_cols[:, 0]), ctx["gcol"](tc, g.in_cols[:, 1]), k)


@_rule("div")
def _l_div(ctx, tc, k, kf, g):
    b, c = g.in_cols[:, 0], g.in_cols[:, 1]
    jv = ctx["jv"]
    # sum_{i=0..k-1} a_i c_{k-i}: mask out the i == k term
    A = ctx["gcol"](tc, g.out_cols) * ctx["bc"](jv < k, ctx["gcol"](tc, g.out_cols))
    num = ctx["conv"](A, ctx["gcol"](tc, c), k)
    return (tc[k, b] - num) / tc[0, c]


def _l_pair(sign):
    def impl(ctx, tc, k, kf, g):
        b = g.in_cols[:, 0]
        jv = ctx["jv"]
        A = ctx["gcol"](tc, b) * ctx["bc"](jv, ctx["gcol"](tc, b))  # j * b_j (j=0 vanishes)
        s = ctx["conv"](A, ctx["gcol"](tc, g.aux["pair"]), k)
        return sign * s / kf

    return impl


_LOOP_RULES["sin"] = _l_pair(1.0)
_LOOP_RULES["sinh"] = _l_pair(1.0)
_LOOP_RULES["cosh"] = _l_pair(1.0)
_LOOP_RULES["cos"] = _l_pair(-1.0)


@_rule("exp")
def _l_exp(ctx, tc, k, kf, g):
    jv = ctx["jv"]
    A0 = ctx["gcol"](tc, g.in_cols[:, 0])
    A = A0 * ctx["bc"](jv, A0)
    return ctx["conv"](A, ctx["gcol"](tc, g.out_cols), k) / kf


@_rule("log")
def _l_log(ctx, tc, k, kf, g):
    b = g.in_cols[:, 0]
    jv = ctx["jv"]
    # sum_{i=1..k-1} i a_i b_{k-i}
    A = ctx["gcol"](tc, g.out_cols) * ctx["bc"](jv * (jv < k), ctx["gcol"](tc, g.out_cols))
    s = ctx["conv"](A, ctx["gcol"](tc, b), k)
    # the i = k term of conv is a_k * k * b_0, but a_k is still 0 at this
    # point of order k's computation, so no correction needed
    return (tc[k, b] - s / kf) / tc[0, b]


@_rule("sqrt")
def _l_sqrt(ctx, tc, k, kf, g):
    b = g.in_cols[:, 0]
    jv = ctx["jv"]
    A = ctx["gcol"](tc, g.out_cols) * ctx["bc"]((jv >= 1) & (jv < k), ctx["gcol"](tc, g.out_cols))
    s = ctx["conv"](A, ctx["gcol"](tc, g.out_cols), k)
    return (tc[k, b] - s) / (2.0 * tc[0, g.out_cols])


@_rule("pow")
def _l_pow(ctx, tc, k, kf, g):
    b = g.in_cols[:, 0]
    jv = ctx["jv"]
    jnp = ctx["jnp"]
    alpha = jnp.asarray(g.alpha, ctx["dtype"])
    # sum_{i=0..k-1} (alpha (k-i) - i) a_i b_{k-i}
    A = ctx["gcol"](tc, g.out_cols) * ctx["bc"](jv < k, ctx["gcol"](tc, g.out_cols))
    t1 = ctx["conv"](A, ctx["gcol"](tc, b), k, wB_rev=lambda r: r)
    t1 = t1 * (alpha if t1.ndim == 1 else alpha[:, None])
    t2 = ctx["conv"](A * ctx["bc"](jv, A), ctx["gcol"](tc, b), k)
    return (t1 - t2) / (kf * tc[0, b])


def _l_sq(sign):
    def impl(ctx, tc, k, kf, g):
        b = g.in_cols[:, 0]
        jv = ctx["jv"]
        A = ctx["gcol"](tc, g.aux["sq"]) * ctx["bc"](jv < k, ctx["gcol"](tc, g.aux["sq"]))
        s = ctx["conv"](A, ctx["gcol"](tc, b), k, wB_rev=lambda r: r)
        return tc[k, b] + sign * s / kf

    return impl


_LOOP_RULES["tan"] = _l_sq(1.0)
_LOOP_RULES["tanh"] = _l_sq(-1.0)


@_rule("sigmoid")
def _l_sigmoid(ctx, tc, k, kf, g):
    b = g.in_cols[:, 0]
    jv = ctx["jv"]
    A0 = ctx["gcol"](tc, g.out_cols) - ctx["gcol"](tc, g.aux["sq"])
    A = A0 * ctx["bc"](jv < k, A0)
    return ctx["conv"](A, ctx["gcol"](tc, b), k, wB_rev=lambda r: r) / kf


def _l_inv(sign):
    def impl(ctx, tc, k, kf, g):
        b, c = g.in_cols[:, 0], g.in_cols[:, 1]
        jv = ctx["jv"]
        # sum_{m=1..k-1} c_m (k-m) a_{k-m}; mask m==0 (weight (k-m)=k) and
        # m==k (a_0 weight 0 via (k-m)=0)
        C = ctx["gcol"](tc, c) * ctx["bc"](jv >= 1, ctx["gcol"](tc, c))
        s = ctx["conv"](C, ctx["gcol"](tc, g.out_cols), k, wB_rev=lambda r: r)
        return (sign * kf * tc[k, b] - s) / (kf * tc[0, c])

    return impl


for _n in ("asin", "atan", "atanh", "asinh", "acosh"):
    _LOOP_RULES[_n] = _l_inv(1.0)
_LOOP_RULES["acos"] = _l_inv(-1.0)


@_rule("erf")
def _l_erf(ctx, tc, k, kf, g):
    b, e = g.in_cols[:, 0], g.in_cols[:, 1]
    s = ctx["conv"](ctx["gcol"](tc, e), ctx["gcol"](tc, b), k, wB_rev=lambda r: r)
    return (2.0 / _pymath.sqrt(_pymath.pi)) * s / kf


@_rule("atan2")
def _l_atan2(ctx, tc, k, kf, g):
    y, x, d = g.in_cols[:, 0], g.in_cols[:, 1], g.in_cols[:, 2]
    jv = ctx["jv"]
    r1 = ctx["conv"](ctx["gcol"](tc, x), ctx["gcol"](tc, y), k, wB_rev=lambda r: r)
    r2 = ctx["conv"](ctx["gcol"](tc, y), ctx["gcol"](tc, x), k, wB_rev=lambda r: r)
    D = ctx["gcol"](tc, d) * ctx["bc"](jv >= 1, ctx["gcol"](tc, d))
    s = ctx["conv"](D, ctx["gcol"](tc, g.out_cols), k, wB_rev=lambda r: r)
    return (r1 - r2 - s) / (kf * tc[0, d])


@_rule("relu")
def _l_relu(ctx, tc, k, kf, g):
    jnp = ctx["jnp"]
    b = g.in_cols[:, 0]
    return jnp.where(tc[0, b] > 0.0, tc[k, b], 0.0)


@_rule("relup")
def _l_relup(ctx, tc, k, kf, g):
    return ctx["jnp"].zeros(g.out_cols.size, tc.dtype)


@_rule("select")
def _l_select(ctx, tc, k, kf, g):
    jnp = ctx["jnp"]
    c, a, b = g.in_cols[:, 0], g.in_cols[:, 1], g.in_cols[:, 2]
    return jnp.where(tc[0, c] != 0.0, tc[k, a], tc[k, b])


def _l_const(ctx, tc, k, kf, g):
    return ctx["jnp"].zeros(g.out_cols.size, tc.dtype)


for _n in ("lt", "le", "gt", "ge", "eq", "ne",
           "logical_and", "logical_or", "logical_not"):
    _LOOP_RULES[_n] = _l_const


@_rule("kepE")
def _l_kepE(ctx, tc, k, kf, g):
    jv = ctx["jv"]
    e, M = g.in_cols[:, 0], g.in_cols[:, 1]
    s_i, c_i = g.aux["sin"], g.aux["cos"]
    Q = ctx["tri"](ctx["gcol"](tc, e), ctx["gcol"](tc, c_i))  # Q[m] = (e*cos)_m for all m
    t1 = kf * tc[k, M]
    t2 = ctx["conv"](ctx["gcol"](tc, e) * ctx["bc"](jv, ctx["gcol"](tc, e)), ctx["gcol"](tc, s_i), k)
    Qm = Q * ctx["bc"](jv >= 1, Q)
    t3 = ctx["conv"](Qm, ctx["gcol"](tc, g.out_cols), k, wB_rev=lambda r: r)
    return (t1 + t2 + t3) / (kf * (1.0 - Q[0]))


@_rule("kepF")
def _l_kepF(ctx, tc, k, kf, g):
    jv = ctx["jv"]
    h, kk, lam = g.in_cols[:, 0], g.in_cols[:, 1], g.in_cols[:, 2]
    s_i, c_i = g.aux["sin"], g.aux["cos"]
    W = ctx["tri"](ctx["gcol"](tc, h), ctx["gcol"](tc, s_i)) + ctx["tri"](ctx["gcol"](tc, kk), ctx["gcol"](tc, c_i))
    t1 = kf * tc[k, lam]
    t2 = -ctx["conv"](ctx["gcol"](tc, h) * ctx["bc"](jv, ctx["gcol"](tc, h)), ctx["gcol"](tc, c_i), k)
    t3 = ctx["conv"](ctx["gcol"](tc, kk) * ctx["bc"](jv, ctx["gcol"](tc, kk)), ctx["gcol"](tc, s_i), k)
    Wm = W * ctx["bc"](jv >= 1, W)
    t4 = ctx["conv"](Wm, ctx["gcol"](tc, g.out_cols), k, wB_rev=lambda r: r)
    return (t1 + t2 + t3 + t4) / (kf * (1.0 - W[0]))


@_rule("kepDE")
def _l_kepDE(ctx, tc, k, kf, g):
    jv = ctx["jv"]
    jnp = ctx["jnp"]
    s0, c0, DM = g.in_cols[:, 0], g.in_cols[:, 1], g.in_cols[:, 2]
    s_i, c_i = g.aux["sin"], g.aux["cos"]
    W = ctx["tri"](ctx["gcol"](tc, s0), ctx["gcol"](tc, s_i)) - ctx["tri"](ctx["gcol"](tc, c0), ctx["gcol"](tc, c_i))
    # (1 - cos)_i series: i==0 -> 1 - c_0, else -c_i
    omc = -ctx["gcol"](tc, c_i)
    omc = omc.at[0].set(1.0 - tc[0, c_i])
    t1 = kf * tc[k, DM]
    t2 = -ctx["conv"](ctx["gcol"](tc, s0) * ctx["bc"](jv, ctx["gcol"](tc, s0)), omc, k)
    t3 = ctx["conv"](ctx["gcol"](tc, c0) * ctx["bc"](jv, ctx["gcol"](tc, c0)), ctx["gcol"](tc, s_i), k)
    Wm = W * ctx["bc"](jv >= 1, W)
    t4 = -ctx["conv"](Wm, ctx["gcol"](tc, g.out_cols), k, wB_rev=lambda r: r)
    return (t1 + t2 + t3 + t4) / (kf * (1.0 + W[0]))


# ---------------------------------------------------------------------------
# batched-native jet: tc layout (order+1, width, batch)
# ---------------------------------------------------------------------------

def make_jet_fn_compact_batched(tape: Tape, order: int, *, dtype=None):
    """Batched compact jet with the batch axis *minor*:
    ``jet(states (B, n_eq), pars (B, n_pars), t (B,)) -> tc (K+1, cols, B)``.

    This is the SURVEY §7 batch-major layout: every per-(order, group)
    update touches a contiguous (m, B) block whose minor dimension feeds the
    TPU's 128-wide vector lanes, instead of vmap's batch-outermost layout
    whose strided slice updates force whole-buffer copies.
    """
    import jax.numpy as jnp
    from jax import lax

    if dtype is None:
        dtype = jnp.float64
    if tape.rhs is None:
        raise ValueError("requires an ODE tape")
    plan = build_plan(tape, order)
    n_eq = plan.n_eq
    K = order

    _kep_groups = any(
        g.name in ("kepE", "kepF", "kepDE") for lv in plan.levels for g in lv
    )
    if _kep_groups:
        S = np.zeros((K + 1, K + 1, K + 1))
        for m in range(K + 1):
            for a in range(m + 1):
                S[m, a, m - a] = 1.0
        S_j = jnp.asarray(S, dtype)

    for lv in plan.levels:
        for g in lv:
            if g.name not in _LOOP_RULES:
                raise UnsupportedLoopOp(g.name)

    const_cols = np.array([c for c, _ in plan.const_cols], dtype=np.int64)
    const_vals = np.array([v for _, v in plan.const_cols])
    par_cols = np.array([c for c, _ in plan.par_cols], dtype=np.int64)
    par_idx = np.array([j for _, j in plan.par_cols], dtype=np.int64)

    def jet(states, pars, t):
        B = states.shape[0]
        jv, bc, rows_rev, conv = _helpers(jnp, K)

        def tri(A, C):
            return jnp.einsum("acx,bcx,mab->mcx", A, C, S_j)

        tc = jnp.zeros((K + 1, plan.width, B), dtype)
        tc = tc.at[0, :n_eq, :].set(states.T.astype(dtype))
        if const_cols.size:
            tc = tc.at[0, const_cols, :].set(
                jnp.asarray(const_vals, dtype)[:, None]
            )
        if par_cols.size:
            tc = tc.at[0, par_cols, :].set(pars[:, par_idx].T.astype(dtype))
        if plan.time_col is not None:
            tc = tc.at[0, plan.time_col, :].set(t.astype(dtype))
            tc = tc.at[1, plan.time_col, :].set(jnp.ones((B,), dtype))

        for lv in plan.levels:
            for g in lv:
                ar = _EVAL_ARITY.get(g.name, None)
                ins = [
                    tc[0, g.in_cols[:, c], :]
                    for c in range(g.in_cols.shape[1] if ar is None else ar)
                ]
                if g.name == "sum":
                    vals = tc[0][g.in_cols].sum(axis=1)
                elif g.name == "pow":
                    vals = _pow0_vec_b(jnp, ins[0], g.alpha)
                elif g.name == "mul":
                    vals = ins[0] * ins[1]
                else:
                    vals = _reg.opdef(g.name).evaluate(*ins)
                m = g.out_cols.size
                tc = tc.at[0, g.out_start : g.out_start + m, :].set(
                    vals.astype(dtype)
                )

        ctx = dict(jv=jv, bc=bc, rows_rev=rows_rev, conv=conv, jnp=jnp,
                   dtype=dtype, tri=tri if _kep_groups else None,
                   gcol=_gcol_factory(jnp))

        def body(k, tc):
            kf = k.astype(dtype)
            sv = tc[k - 1][plan.rhs_cols] / kf  # (n_eq, B)
            tc = tc.at[k, :n_eq, :].set(sv)
            for lv in plan.levels:
                for g in lv:
                    vals = _LOOP_RULES[g.name](ctx, tc, k, kf, g)
                    m = g.out_cols.size
                    tc = tc.at[k, g.out_start : g.out_start + m, :].set(
                        jnp.asarray(vals, dtype)
                    )
            return tc

        tc = lax.fori_loop(1, K + 1, body, tc)
        cols = np.concatenate([np.arange(n_eq), plan.out_cols]) \
            if plan.out_cols.size else np.arange(n_eq)
        return tc[:, cols, :]

    return jet


def _pow0_vec_b(jnp, b, alpha):
    """Order-0 pow for (m, B) operands with per-row exponents."""
    uniq = np.unique(alpha)
    from .jet import _pow0

    if uniq.size == 1:
        return _pow0(b, float(uniq[0]))
    out = jnp.zeros_like(b)
    for a in uniq:
        mask = jnp.asarray(alpha == a)[:, None]
        out = jnp.where(mask, _pow0(b, float(a)), out)
    return out


def make_batched_step(tape: Tape, order: int, *, dtype=None,
                      high_accuracy: bool = True):
    """Whole-batch adaptive Taylor step in the batch-minor layout:
    ``step(states (B, n), pars (B, p), t (B,), max_dt (B,)) ->
    (new_states (B, n), h (B,))`` — the hot kernel of the batch/ensemble
    benchmarks."""
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float64
    jet = make_jet_fn_compact_batched(tape, order, dtype=dtype)
    n_eq = tape.n_eq
    K = order

    def step(states, pars, t, max_dt):
        tc = jet(states, pars, t)  # (K+1, n_eq+, B)

        # Jorba rho control, batched over the minor axis
        abs_tc = jnp.abs(tc)
        m0 = jnp.max(abs_tc[0], axis=0)
        mo = jnp.max(abs_tc[K], axis=0)
        mo1 = jnp.max(abs_tc[K - 1], axis=0)
        num = jnp.where(m0 <= 1.0, 1.0, m0)
        rho = jnp.minimum(
            (num / mo) ** (1.0 / K), (num / mo1) ** (1.0 / (K - 1))
        )
        fac = _pymath.exp(-0.7 / (K - 1)) / (_pymath.e * _pymath.e)
        h = jnp.minimum(rho * fac, jnp.abs(max_dt))
        h = jnp.where(max_dt < 0, -h, h)

        if high_accuracy:
            # compensated-summation monomial evaluation
            res = tc[0, :n_eq, :]
            comp = jnp.zeros_like(res)
            cur_h = h
            for i in range(1, K + 1):
                tmp = tc[i, :n_eq, :] * cur_h[None, :]
                y = tmp - comp
                tt = res + y
                comp = (tt - res) - y
                res = tt
                if i < K:
                    cur_h = cur_h * h
            new = res
        else:
            new = tc[K, :n_eq, :]
            for i in range(1, K + 1):
                new = tc[K - i, :n_eq, :] + new * h[None, :]
        return new.T, h

    return step


def make_batched_step_mixed(tape: Tape, order: int, *, mp_order: int = 10,
                            high_accuracy: bool = True):
    """Mixed-precision whole-batch step: Taylor orders <= ``mp_order`` in
    f64, higher orders in f32.

    Error analysis: the order-k coefficient contributes |h^k a_k| ~
    tol^(k/p) |x| to the update, so a relative f32 error of ~1e-7 on
    coefficients with k >= ~10 (tol 1e-15, p 19) lands below 1e-15 |x| —
    f64-parity accuracy at a fraction of the emulated-f64 work, since the
    high orders carry most of the convolution cost (sum k ~ k^2/2).
    TPUs have no native f64 (PERF.md), making this the cheapest 2x.
    """
    import jax.numpy as jnp
    from jax import lax

    plan = build_plan(tape, order)
    n_eq = plan.n_eq
    K = order
    mp = int(mp_order)
    if not 1 <= mp < K:
        raise ValueError("mp_order must be in [1, order)")

    for lv in plan.levels:
        for g in lv:
            if g.name not in _LOOP_RULES:
                raise UnsupportedLoopOp(g.name)
    _kep_groups = any(
        g.name in ("kepE", "kepF", "kepDE") for lv in plan.levels for g in lv
    )
    S_j = None
    if _kep_groups:
        S = np.zeros((K + 1, K + 1, K + 1))
        for m in range(K + 1):
            for a in range(m + 1):
                S[m, a, m - a] = 1.0

    const_cols = np.array([c for c, _ in plan.const_cols], dtype=np.int64)
    const_vals = np.array([v for _, v in plan.const_cols])
    par_cols = np.array([c for c, _ in plan.par_cols], dtype=np.int64)
    par_idx = np.array([j for _, j in plan.par_cols], dtype=np.int64)

    def _order_body(ctx, plan_, k, kf, tc):
        sv = tc[k - 1][plan_.rhs_cols] / kf
        tc = tc.at[k, :n_eq, :].set(sv)
        for lv in plan_.levels:
            for g in lv:
                vals = _LOOP_RULES[g.name](ctx, tc, k, kf, g)
                m = g.out_cols.size
                tc = tc.at[k, g.out_start : g.out_start + m, :].set(
                    jnp.asarray(vals, tc.dtype)
                )
        return tc

    def _mkctx(dtype):
        jv, bc, rows_rev, conv = _helpers(jnp, K)
        tri = None
        if _kep_groups:
            Sd = jnp.asarray(S, dtype)

            def tri(A, C, _Sd=Sd):
                return jnp.einsum("acx,bcx,mab->mcx", A, C, _Sd)

        return dict(jv=jv, bc=bc, rows_rev=rows_rev, conv=conv, jnp=jnp,
                    dtype=dtype, tri=tri, gcol=_gcol_factory(jnp))

    def step(states, pars, t, max_dt):
        B = states.shape[0]
        f64 = jnp.float64
        f32 = jnp.float32

        tc = jnp.zeros((K + 1, plan.width, B), f64)
        tc = tc.at[0, :n_eq, :].set(states.T.astype(f64))
        if const_cols.size:
            tc = tc.at[0, const_cols, :].set(
                jnp.asarray(const_vals, f64)[:, None]
            )
        if par_cols.size:
            tc = tc.at[0, par_cols, :].set(pars[:, par_idx].T.astype(f64))
        if plan.time_col is not None:
            tc = tc.at[0, plan.time_col, :].set(t.astype(f64))
            tc = tc.at[1, plan.time_col, :].set(jnp.ones((B,), f64))

        ctx64 = _mkctx(f64)
        for lv in plan.levels:
            for g in lv:
                ar = _EVAL_ARITY.get(g.name, None)
                ins = [
                    tc[0, g.in_cols[:, c], :]
                    for c in range(g.in_cols.shape[1] if ar is None else ar)
                ]
                if g.name == "sum":
                    vals = tc[0][g.in_cols].sum(axis=1)
                elif g.name == "pow":
                    vals = _pow0_vec_b(jnp, ins[0], g.alpha)
                elif g.name == "mul":
                    vals = ins[0] * ins[1]
                else:
                    vals = _reg.opdef(g.name).evaluate(*ins)
                m = g.out_cols.size
                tc = tc.at[0, g.out_start : g.out_start + m, :].set(
                    vals.astype(f64)
                )

        tc = lax.fori_loop(
            1, mp + 1, lambda k, a: _order_body(ctx64, plan, k, k.astype(f64), a), tc
        )

        # high orders in f32 over a downcast shadow of the history
        ctx32 = _mkctx(f32)
        tc32 = tc.astype(f32)
        tc32 = lax.fori_loop(
            mp + 1, K + 1,
            lambda k, a: _order_body(ctx32, plan, k, k.astype(f32), a), tc32,
        )

        # step-size control: norms over the state (+output) columns only
        norm_cols = np.concatenate([np.arange(n_eq), plan.out_cols]) \
            if plan.out_cols.size else np.arange(n_eq)
        m0 = jnp.max(jnp.abs(tc[0, norm_cols, :]), axis=0)
        mo = jnp.max(jnp.abs(tc32[K][norm_cols]), axis=0).astype(f64)
        mo1 = jnp.max(jnp.abs(tc32[K - 1][norm_cols]), axis=0).astype(f64)
        num = jnp.where(m0 <= 1.0, 1.0, m0)
        rho = jnp.minimum(
            (num / mo) ** (1.0 / K), (num / mo1) ** (1.0 / (K - 1))
        )
        fac = _pymath.exp(-0.7 / (K - 1)) / (_pymath.e * _pymath.e)
        h = jnp.minimum(rho * fac, jnp.abs(max_dt))
        h = jnp.where(max_dt < 0, -h, h)

        # compensated-summation update: f64 coefficients for k <= mp, f32
        # (upcast) beyond
        res = tc[0, :n_eq, :]
        comp = jnp.zeros_like(res)
        cur_h = h
        for i in range(1, K + 1):
            ci = tc[i, :n_eq, :] if i <= mp else tc32[i, :n_eq, :].astype(f64)
            tmp = ci * cur_h[None, :]
            y = tmp - comp
            tt = res + y
            comp = (tt - res) - y
            res = tt
            if i < K:
                cur_h = cur_h * h
        return res.T, h

    return step
