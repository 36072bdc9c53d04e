"""In-graph event detection: the step-with-events driver.

Reference parity: heyoka ``taylor_add_adaptive_step_with_events``
(``src/taylor_00.cpp:592``) + ``ed_data::detect_events``
(``src/detail/event_detection.cpp:1069``):

- the Taylor polynomials of the event equations ride along in the jet as
  sv_funcs columns and participate in the timestep-control norms;
- roots are isolated inside [0, h), the step is truncated at the earliest
  terminal root, non-terminal roots before it are recorded for chronological
  callback dispatch;
- terminal events carry a cooldown, auto-deduced as ``g_eps/|g'| * 10``
  (``event_detection.cpp:519-596``) with
  ``g_eps = max(tol * max(1, ||state||_inf), eps * ||state||_inf)``
  (``taylor_adaptive.cpp:812-840``).

Root isolation is the reference's rigorous Collins-Akritas scheme
(recursive working list + Descartes' rule of signs on the
Möbius-transformed polynomial, ``event_detection.cpp:1284-1414``),
re-designed for XLA: a *bounded* working list of intervals processed by a
``lax.while_loop`` with static shapes, vmapped over the event equations.
Per interval, the coefficients of ``p(a + (b-a)x)`` come from one
binomial-matrix matvec (Taylor shift) + a power scaling, and the Descartes
bound is the sign-variation count of ``(1+x)^n q(1/(1+x))`` (reverse +
translate-by-1 matvec).  V==0 prunes, V==1 isolates (guaranteed single
odd-multiplicity root -> bisection), V>=2 splits; intervals narrower than
~16 eps with V>0 are emitted as (possibly even-multiplicity / tangential)
root clusters — these are exactly the roots the earlier sampled isolation
could miss.  The list capacity (16) and iteration budget (100) bound
pathological inputs; real event polynomials isolate in a handful of
iterations.
"""

from __future__ import annotations

import math as _pymath

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..dfloat import dd_add_d
from .outcome import TaylorOutcome
from . import stepper as _st

#: max roots tracked per event equation per step
MAX_ROOTS = 4
#: bisection iterations before Newton polishing (2^-26 interval width)
BISECT_ITERS = 26
#: guarded Newton polish iterations (quadratic: 2^-26 -> f64 floor)
NEWTON_ITERS = 3


def _poly_eval(coeffs, x):
    """Horner evaluation of polynomials.

    coeffs: (..., p+1) ascending order; x: broadcastable to (...).
    """
    p = coeffs.shape[-1] - 1
    res = coeffs[..., p]
    for k in range(p - 1, -1, -1):
        res = res * x + coeffs[..., k]
    return res


def _poly_deriv_eval(coeffs, x):
    p = coeffs.shape[-1] - 1
    res = coeffs[..., p] * float(p)
    for k in range(p - 1, 0, -1):
        res = res * x + coeffs[..., k] * float(k)
    return res


#: working-list capacity of the Collins-Akritas isolator
CA_QUEUE = 16
#: iteration budget of the isolator loop
CA_MAXIT = 100


def _make_isolator(p, dtype, max_roots):
    """Build ``isolate(c) -> (root_lo, root_hi, valid)`` for one degree-``p``
    polynomial ``c`` (ascending coefficients) on the unit interval.

    Collins-Akritas with a bounded working list (see module docstring);
    returns up to ``max_roots`` isolating sub-intervals of [0, 1].
    """
    idx = np.arange(p + 1)
    comb = np.zeros((p + 1, p + 1))
    for j in range(p + 1):
        for i in range(j + 1):
            comb[i, j] = _pymath.comb(j, i)
    COMB = jnp.asarray(comb, dtype)  # C(j, i) for j >= i, else 0
    EXPI = np.clip(idx[None, :] - idx[:, None], 0, p)  # static int j - i
    eps = float(np.finfo(np.dtype(dtype)).eps)
    tiny = 16.0 * eps  # width floor: emit unresolved V>=2 clusters

    def powvec(x):
        # [1, x, x^2, ..., x^p] via cumprod — jnp.power lowers through
        # exp/log on TPU, where 0^0 -> NaN and (negative)^k -> NaN
        return jnp.concatenate(
            [jnp.ones((1,), dtype), jnp.cumprod(jnp.full((p,), x, dtype))]
        )

    def shift_scale(c, a, w):
        # coefficients of q(x) = p(a + w*x):
        # Taylor shift by a (b_i = sum_j C(j,i) a^(j-i) c_j), then scale by w
        M = COMB * jnp.take(powvec(a), EXPI)
        return (M @ c) * powvec(w)

    def descartes(q):
        # sign variations of (1+x)^p q(1/(1+x)): reverse + translate by 1;
        # translation by 1 is the pure-binomial matvec (a = 1).  The
        # variation count is unrolled (p is small and static): a lax.scan
        # here would nest a sequential sub-loop inside the isolator's
        # while_loop body — p+1 extra kernel dispatches per iteration.
        v = COMB @ q[::-1]
        s = jnp.sign(v)
        prev = jnp.asarray(0.0, dtype)
        cnt = jnp.int32(0)
        for k in range(p + 1):
            sk = s[k]
            cnt = cnt + ((prev * sk) < 0).astype(jnp.int32)
            prev = jnp.where(sk == 0, prev, sk)
        return cnt

    def isolate(c):
        # a root exactly at s = 0 (e.g. an event that just fired): record it
        # and deflate by one power of s
        root0 = c[0] == 0.0
        c = jnp.where(
            root0, jnp.concatenate([c[1:], jnp.zeros((1,), dtype)]), c
        )
        qlo = jnp.zeros((CA_QUEUE,), dtype)
        qhi = jnp.zeros((CA_QUEUE,), dtype).at[0].set(1.0)
        qact = jnp.zeros((CA_QUEUE,), bool).at[0].set(True)
        rlo = jnp.full((max_roots,), 2.0, dtype)
        rhi = jnp.full((max_roots,), 2.0, dtype)
        rlo = jnp.where(root0, rlo.at[0].set(0.0), rlo)
        rhi = jnp.where(root0, rhi.at[0].set(0.0), rhi)
        rn = jnp.where(root0, jnp.int32(1), jnp.int32(0))

        def cond(st):
            _, _, qact_, _, _, rn_, it_ = st
            return jnp.any(qact_) & (rn_ < max_roots) & (it_ < CA_MAXIT)

        def body(st):
            qlo_, qhi_, qact_, rlo_, rhi_, rn_, it_ = st
            i = jnp.argmax(qact_)
            a, b = qlo_[i], qhi_[i]
            qact_ = qact_.at[i].set(False)
            w = b - a
            V = descartes(shift_scale(c, a, w))
            emit = (V == 1) | ((V >= 2) & (w < tiny))
            slot = jnp.minimum(rn_, max_roots - 1)
            rlo_ = jnp.where(emit, rlo_.at[slot].set(a), rlo_)
            rhi_ = jnp.where(emit, rhi_.at[slot].set(b), rhi_)
            rn_ = jnp.where(emit, rn_ + 1, rn_)
            split = (V >= 2) & (w >= tiny)
            m = a + 0.5 * w
            # if the split point is itself a root, nudge it off-center so
            # the root falls strictly inside one half
            m = jnp.where(_poly_eval(c, m) == 0.0, a + 0.46193376 * w, m)
            f1 = jnp.argmin(qact_)
            can1 = split & ~qact_[f1]
            qlo_ = jnp.where(can1, qlo_.at[f1].set(a), qlo_)
            qhi_ = jnp.where(can1, qhi_.at[f1].set(m), qhi_)
            qact_ = jnp.where(can1, qact_.at[f1].set(True), qact_)
            f2 = jnp.argmin(qact_)
            can2 = split & ~qact_[f2]
            qlo_ = jnp.where(can2, qlo_.at[f2].set(m), qlo_)
            qhi_ = jnp.where(can2, qhi_.at[f2].set(b), qhi_)
            qact_ = jnp.where(can2, qact_.at[f2].set(True), qact_)
            return qlo_, qhi_, qact_, rlo_, rhi_, rn_, it_ + 1

        _, _, _, rlo, rhi, rn, _ = lax.while_loop(
            cond, body, (qlo, qhi, qact, rlo, rhi, rn, jnp.int32(0))
        )
        return rlo, rhi, jnp.arange(max_roots) < rn

    return isolate


#: subdivision depth of the static tree isolator (intervals of width 2^-D)
TREE_DEPTH = 5


def _make_tree_isolator(p, dtype, max_roots, depth=TREE_DEPTH):
    """Dense, fixed-shape root isolation over a batch of rows.

    TPU-native redesign of the Collins-Akritas working list: the while-loop
    isolator processes one interval per iteration with per-lane queue
    scatters — on TPU those serialize.  Here the *entire* binary
    subdivision tree of depth ``depth`` over [0, 1] is evaluated at once:
    for every node ``[a, b]`` the Descartes transform
    ``(1+x)^p q(1/(1+x))`` with ``q(x) = poly(a + (b-a) x)`` is a *constant*
    linear map of the input coefficients, so all node transforms collapse
    into one precomputed ``(p+1, n_nodes*(p+1))`` matrix — a single MXU
    matmul per batch — followed by unrolled sign-variation counts.

    Emission is rigorous: a node with V==1 and a sign change over an
    ancestor-free interval isolates exactly one (odd-multiplicity) root
    (Vincent/Obreshkov: child counts never exceed the parent's); exact
    zeros at subdivision grid points are detected directly.  Anything the
    tree cannot certify (V>=2 at max depth — possible root cluster tighter
    than 2^-depth — or a rounding-degenerate V==1 without sign change)
    sets ``fallback``; callers re-run those batches through the rigorous
    while-loop isolator under a *scalar* ``lax.cond`` (cheap: no vmap).

    Returns ``isolate_tree(cs (R, p+1)) -> (rlo, rhi, valid, fallback)``
    with ``rlo/rhi/valid`` shaped ``(R, max_roots)`` and ``fallback`` a
    per-row bool.
    """
    import jax.numpy as jnp

    # node table: (a, w) for every tree node, breadth-first
    nodes = []
    for d in range(depth + 1):
        wd = 1.0 / (1 << d)
        for i in range(1 << d):
            nodes.append((i * wd, wd, d))
    n_nodes = len(nodes)

    # ancestor mask: anc[m, n] = node m is a strict ancestor of node n
    def _node_id(d, i):
        return (1 << d) - 1 + i

    anc = np.zeros((n_nodes, n_nodes), bool)
    for d in range(depth + 1):
        for i in range(1 << d):
            n = _node_id(d, i)
            dd_, ii = d, i
            while dd_ > 0:
                dd_ -= 1
                ii //= 2
                anc[_node_id(dd_, ii), n] = True

    comb = np.zeros((p + 1, p + 1))
    for j in range(p + 1):
        for i in range(j + 1):
            comb[i, j] = _pymath.comb(j, i)

    # T[n] = COMB @ reverse @ diag(w^i) @ Shift(a): v = T[n] @ c gives the
    # Descartes-transform coefficients of node n
    T = np.zeros((n_nodes, p + 1, p + 1))
    for n, (a, w, _d) in enumerate(nodes):
        M = np.zeros((p + 1, p + 1))
        for j in range(p + 1):
            for i in range(j + 1):
                M[i, j] = comb[i, j] * a ** (j - i)
        M = (w ** np.arange(p + 1))[:, None] * M
        T[n] = comb @ M[::-1, :]
    # fold into a single (p+1, n_nodes*(p+1)) matmul operand
    TM = jnp.asarray(
        T.transpose(2, 0, 1).reshape(p + 1, n_nodes * (p + 1)), dtype
    )

    # depth-``depth`` grid: node endpoints all lie on it
    ngrid = (1 << depth) + 1
    grid = np.arange(ngrid) / float(1 << depth)
    # Vandermonde for direct evaluation at the grid points
    VG = jnp.asarray(grid[None, :] ** np.arange(p + 1)[:, None], dtype)
    node_a = np.array([a for a, w, _d in nodes])
    node_b = np.array([a + w for a, w, _d in nodes])
    node_leaf = np.array([d == depth for _a, _w, d in nodes])
    # endpoint indices on the grid
    gi_a = np.rint(node_a * (1 << depth)).astype(int)
    gi_b = np.rint(node_b * (1 << depth)).astype(int)

    ANC = jnp.asarray(anc)
    NA = jnp.asarray(node_a, dtype)
    NB = jnp.asarray(node_b, dtype)
    LEAF = jnp.asarray(node_leaf)
    GRID = jnp.asarray(grid, dtype)

    def isolate_tree(cs):
        R = cs.shape[0]
        # all Descartes transforms in one matmul
        q = (cs @ TM).reshape(R, n_nodes, p + 1)
        s = jnp.sign(q)
        prev = jnp.zeros((R, n_nodes), dtype)
        V = jnp.zeros((R, n_nodes), jnp.int32)
        for k in range(p + 1):
            sk = s[:, :, k]
            V = V + ((prev * sk) < 0).astype(jnp.int32)
            prev = jnp.where(sk == 0, prev, sk)

        # grid values (R, ngrid) and exact zeros
        gv = cs @ VG
        g_a = gv[:, gi_a]
        g_b = gv[:, gi_b]
        sign_change = g_a * g_b < 0.0
        v1 = V == 1
        anc_v1 = (v1.astype(jnp.int32) @ ANC.astype(jnp.int32)) > 0
        emit = v1 & sign_change & ~anc_v1
        # uncertified: V==1 without a sign change (zero endpoint or
        # rounding-degenerate count) or a possible cluster at max depth —
        # exact grid-point roots are still emitted directly below, but the
        # caller re-runs fallback rows through the rigorous isolator
        bad_v1 = v1 & ~anc_v1 & ~sign_change
        bad_leaf = (V >= 2) & LEAF[None, :] & ~anc_v1
        fallback = jnp.any(bad_v1 | bad_leaf, axis=1)

        # exact roots at grid points (including s=0), as width-0 intervals
        gz = gv == 0.0
        cand_lo = jnp.concatenate(
            [jnp.where(emit, NA[None, :], 2.0),
             jnp.where(gz, GRID[None, :], 2.0)], axis=1
        )
        cand_hi = jnp.concatenate(
            [jnp.where(emit, NB[None, :], 2.0),
             jnp.where(gz, GRID[None, :], 2.0)], axis=1
        )
        # up to max_roots earliest candidates (top_k on negated keys)
        neg, idx = jax.lax.top_k(-cand_lo, max_roots)
        rlo = -neg
        rhi = jnp.take_along_axis(cand_hi, idx, axis=1)
        valid = rlo <= 1.0
        rlo = jnp.where(valid, rlo, 2.0)
        rhi = jnp.where(valid, rhi, 2.0)
        return rlo, rhi, valid, fallback

    return isolate_tree


def _make_tree_isolator_f32(p, max_roots, depth=TREE_DEPTH, head=12):
    """Certified-f32 front tier of the subdivision-tree isolator.

    The f64 tree isolator's cost is one (R, p+1) x (p+1, n_nodes*(p+1))
    matmul — in emulated f64 that is the dominant cost of batched event
    detection on TPU (measured 162 ms of a 173 ms HH chunk,
    tools/profile_ev_sweep.py).  This tier evaluates the same constant
    tree in f32 on the MXU with RIGOROUS forward error bounds: a
    transformed coefficient or grid value whose |value| does not exceed
    its bound has an uncertain sign, and any row touched by uncertainty
    is reported ``unsure`` — the caller routes those rows (plus the
    structural fallbacks the f64 tree also has) through the f64 tier.
    Certified rows are isolated rigorously: interval endpoints are exact
    binary fractions (f32-exact), and the sign-variation counts use only
    certified +-1 signs.

    f32 range handling: step-polynomial coefficients span ~1e-15 of
    dynamic range and the node maps scale order i by w^i (down to
    2^-100), so a plain f32 transform would underflow.  Orders 0..head
    go through the f32 matmul (their scaled magnitudes stay in normal
    f32 range for depth<=5); the orders-above-head tail contributes only
    to the error bound, via max_i>head |c_i| times per-column constant
    sums (an elementwise outer product, no matmul).

    Reference: the rigor contract of ``event_detection.cpp:1069`` —
    never a missed root; speed may degrade (rows fall back), correctness
    may not.
    """
    import jax.numpy as jnp

    f32 = jnp.float32
    kh = min(head, p)

    nodes = []
    for d in range(depth + 1):
        wd = 1.0 / (1 << d)
        for i in range(1 << d):
            nodes.append((i * wd, wd, d))
    n_nodes = len(nodes)

    def _node_id(d, i):
        return (1 << d) - 1 + i

    anc = np.zeros((n_nodes, n_nodes), bool)
    for d in range(depth + 1):
        for i in range(1 << d):
            n = _node_id(d, i)
            dd_, ii = d, i
            while dd_ > 0:
                dd_ -= 1
                ii //= 2
                anc[_node_id(dd_, ii), n] = True

    comb = np.zeros((p + 1, p + 1))
    for j in range(p + 1):
        for i in range(j + 1):
            comb[i, j] = _pymath.comb(j, i)
    T = np.zeros((n_nodes, p + 1, p + 1))
    for n, (a, w, _d) in enumerate(nodes):
        M = np.zeros((p + 1, p + 1))
        for j in range(p + 1):
            for i in range(j + 1):
                M[i, j] = comb[i, j] * a ** (j - i)
        M = (w ** np.arange(p + 1))[:, None] * M
        T[n] = comb @ M[::-1, :]
    Tm = T.transpose(2, 0, 1).reshape(p + 1, n_nodes * (p + 1))
    TM_H = jnp.asarray(Tm[: kh + 1], f32)
    TM_HA = jnp.asarray(np.abs(Tm[: kh + 1]), f32)
    #: per-output-column tail magnitude sums (f64 constants, cast once)
    TS = jnp.asarray(np.abs(Tm[kh + 1:]).sum(axis=0), f32)

    ngrid = (1 << depth) + 1
    grid = np.arange(ngrid) / float(1 << depth)
    VGn = grid[None, :] ** np.arange(p + 1)[:, None]
    VG_H = jnp.asarray(VGn[: kh + 1], f32)
    VG_HA = jnp.asarray(np.abs(VGn[: kh + 1]), f32)
    VS = jnp.asarray(np.abs(VGn[kh + 1:]).sum(axis=0), f32)

    node_a = np.array([a for a, w, _d in nodes])
    node_b = np.array([a + w for a, w, _d in nodes])
    node_leaf = np.array([d == depth for _a, _w, d in nodes])
    gi_a = np.rint(node_a * (1 << depth)).astype(int)
    gi_b = np.rint(node_b * (1 << depth)).astype(int)
    ANC32 = jnp.asarray(anc, f32)
    NA = jnp.asarray(node_a, f32)
    NB = jnp.asarray(node_b, f32)
    LEAF = jnp.asarray(node_leaf)

    #: forward error constant: (p+1)-term dot products in f32 plus the
    #: f64->f32 input rounding; 64 eps32 over-covers n*eps/(1-n*eps) at
    #: n = p+2 <= 34 with a 2x safety margin
    CEPS = np.float32(64.0 * np.finfo(np.float32).eps)

    def isolate32(cs):
        """cs (R, p+1) f64 -> (rlo, rhi, valid, unsure); rlo/rhi f32
        exact binary fractions, valid only meaningful where ~unsure."""
        R = cs.shape[0]
        ac = jnp.abs(cs)
        scale = jnp.maximum(jnp.max(ac, axis=1), 1e-300)
        csn = (cs / scale[:, None])
        h32 = csn[:, : kh + 1].astype(f32)
        ah32 = jnp.abs(h32)
        mtail = (
            jnp.max(jnp.abs(csn[:, kh + 1:]), axis=1).astype(f32)
            if p > kh else jnp.zeros((R,), f32)
        )

        q = h32 @ TM_H  # (R, n_nodes*(p+1)) on the MXU
        qerr = CEPS * (ah32 @ TM_HA) + mtail[:, None] * TS[None, :]
        unc_q = jnp.abs(q) <= qerr
        s = jnp.where(q > 0, jnp.float32(1), jnp.float32(-1)).reshape(
            R, n_nodes, p + 1
        )
        # certified sign-variation count: signs are strictly +-1, so
        # V = (p - sum_k s_k s_{k+1}) / 2
        V = ((p - jnp.sum(s[:, :, :-1] * s[:, :, 1:], axis=-1).astype(
            jnp.int32)) // 2)
        node_unc = jnp.any(unc_q.reshape(R, n_nodes, p + 1), axis=-1)

        gv = h32 @ VG_H
        gerr = CEPS * (ah32 @ VG_HA) + mtail[:, None] * VS[None, :]
        unc_g = jnp.abs(gv) <= gerr
        g_a = gv[:, gi_a]
        g_b = gv[:, gi_b]
        sign_change = g_a * g_b < 0.0

        v1 = V == 1
        anc_v1 = (v1.astype(f32) @ ANC32) > 0
        emit = v1 & sign_change & ~anc_v1
        bad_v1 = v1 & ~anc_v1 & ~sign_change
        bad_leaf = (V >= 2) & LEAF[None, :] & ~anc_v1
        unsure = (
            jnp.any(node_unc | bad_v1 | bad_leaf, axis=1)
            | jnp.any(unc_g, axis=1)
        )

        cand_lo = jnp.where(emit, NA[None, :], jnp.float32(2.0))
        cand_hi = jnp.where(emit, NB[None, :], jnp.float32(2.0))
        neg, idx = jax.lax.top_k(-cand_lo, max_roots)
        rlo = -neg
        rhi = jnp.take_along_axis(cand_hi, idx, axis=1)
        valid = rlo <= 1.0
        rlo = jnp.where(valid, rlo, jnp.float32(2.0))
        rhi = jnp.where(valid, rhi, jnp.float32(2.0))
        return rlo, rhi, valid, unsure

    return isolate32


def _refine_roots(cs, rlo, rhi, valid):
    """Bisection + Newton refinement, duplicate-root merging and
    crossing-direction extraction on the isolating intervals.
    Shape-generic: rows may be events (scalar step) or
    batch*events (batched step)."""
    dtype = cs.dtype
    max_roots = rlo.shape[-1]

    g_lo = _poly_eval(cs[:, None, :], rlo)
    g_hi = _poly_eval(cs[:, None, :], rhi)
    has_sc = g_lo * g_hi < 0.0

    # unrolled bisection (static trip count, fuses into one kernel —
    # a fori_loop here costs one dispatch per iteration), then guarded
    # Newton polishing: quadratic convergence takes the 2^-26 bracket
    # to the f64 floor for simple roots; steps leaving the isolating
    # interval (near-tangential roots) are rejected and keep the
    # bisection value
    lo_f, hi_f, glo_ = rlo, rhi, g_lo
    for _ in range(BISECT_ITERS):
        mid = 0.5 * (lo_f + hi_f)
        gm = _poly_eval(cs[:, None, :], mid)
        go_left = glo_ * gm > 0.0
        lo_f = jnp.where(go_left, mid, lo_f)
        hi_f = jnp.where(go_left, hi_f, mid)
        glo_ = jnp.where(go_left, gm, glo_)
    s_root = jnp.where(has_sc, 0.5 * (lo_f + hi_f), 0.5 * (rlo + rhi))
    for _ in range(NEWTON_ITERS):
        g = _poly_eval(cs[:, None, :], s_root)
        gder = _poly_deriv_eval(cs[:, None, :], s_root)
        cand = s_root - g / gder
        okn = jnp.isfinite(cand) & (cand >= lo_f) & (cand <= hi_f)
        s_root = jnp.where(has_sc & okn, cand, s_root)
    # half-open [0, h): exclude a root exactly at the step end
    valid = valid & (s_root < 1.0)

    # near an even-multiplicity root, coefficient rounding noise makes
    # Descartes report V==1 for adjacent intervals of width ~sqrt(eps)
    # (the polynomial values there are O(eps * ||p||)): merge roots
    # closer than 16 sqrt(eps) in s — far below any step-size-relative
    # separation of physically distinct events
    merge_eps = 16.0 * _pymath.sqrt(float(np.finfo(np.dtype(dtype)).eps))
    cols = [valid[:, 0]]
    for i in range(1, max_roots):
        dup = jnp.zeros_like(cols[0])
        for j_ in range(i):
            dup = dup | (
                cols[j_]
                & (jnp.abs(s_root[:, i] - s_root[:, j_]) < merge_eps)
            )
        cols.append(valid[:, i] & ~dup)
    valid = jnp.stack(cols, axis=1)

    # direction of the crossing *in time*: sign of g after the root in s
    # (isolation guarantees no other root before the interval end);
    # tangential clusters keep the common sign, exact-zero endpoints
    # fall back to the derivative
    gd = _poly_deriv_eval(cs[:, None, :], s_root)
    d_sgn_s = jnp.where(
        g_hi != 0.0,
        jnp.sign(g_hi),
        jnp.where(g_lo != 0.0, -jnp.sign(g_lo), jnp.sign(gd)),
    )
    return s_root, valid, d_sgn_s


def build_event_step(fns, tape, t_events, nt_events, dtype):
    """Build ``ev_step(state, pars, t_hi, t_lo, max_dt, cooldowns) -> dict``.

    The sv_funcs column layout of the jet is [t_events..., nt_events...]
    (set up by the TaylorAdaptive ctor).
    """
    n_te = len(t_events)
    n_nte = len(nt_events)
    n_ev = n_te + n_nte
    n_eq = fns.n_eq
    order = fns.order

    te_dirs = jnp.asarray(
        np.array([int(ev.direction) for ev in t_events], dtype=np.int32)
        if n_te
        else np.zeros((0,), np.int32)
    )
    nt_dirs = jnp.asarray(
        np.array([int(ev.direction) for ev in nt_events], dtype=np.int32)
        if n_nte
        else np.zeros((0,), np.int32)
    )
    # user cooldowns; nan = auto-deduce
    te_cd_user = jnp.asarray(
        np.array(
            [
                _pymath.nan if ev.cooldown is None else float(ev.cooldown)
                for ev in t_events
            ],
            dtype=np.float64,
        ).astype(dtype)
        if n_te
        else np.zeros((0,), np.float64).astype(dtype)
    )

    isolate = _make_isolator(order, dtype, MAX_ROOTS)

    def find_roots(gcoeffs, h):
        """Roots of each event polynomial in s = tau/h over [0, 1).

        gcoeffs: (n_events, order+1) ascending coefficients in tau;
        returns (s_roots (n_events, MAX_ROOTS), valid mask, d_sgn in time).

        Collins-Akritas isolation (``_make_isolator``), then branch-free
        bisection refinement on the isolating intervals (sign change
        guaranteed for odd-multiplicity roots; even-multiplicity clusters
        resolve to the interval midpoint).
        """
        # polynomial in s: c_k = g_k * h^k (powers via cumprod: jnp.power
        # lowers through exp/log on TPU, NaN for negative h)
        hp = jnp.concatenate(
            [jnp.ones((1,), h.dtype),
             jnp.cumprod(jnp.full((order,), h, h.dtype))]
        )
        cs = gcoeffs * hp[None, :]  # (ne, order+1)

        # fast exclusion check (the analog of ``llvm_add_fex_check``,
        # ``event_detection.cpp:704``): |c_0| > sum_{k>=1} |c_k| implies
        # |p(s)| >= |c_0| - sum |c_k| s^k > 0 on [0, 1] — no root possible.
        # When every event polynomial is excluded, the whole isolator is
        # skipped via lax.cond: in the (unvmapped) scalar driver the
        # expensive branch then costs nothing on the vast majority of steps
        # (under vmap cond lowers to select and both branches run — the
        # batch driver's win comes from the isolator optimizations instead).
        no_root = jnp.abs(cs[:, 0]) > jnp.sum(jnp.abs(cs[:, 1:]), axis=1)
        n_ev_l = cs.shape[0]

        def _isolate_all(cs_):
            rlo_, rhi_, valid_ = jax.vmap(isolate)(cs_)
            return _refine_roots(cs_, rlo_, rhi_, valid_)

        def _no_roots(cs_):
            return (
                jnp.full((n_ev_l, MAX_ROOTS), 2.0, dtype),
                jnp.zeros((n_ev_l, MAX_ROOTS), bool),
                jnp.zeros((n_ev_l, MAX_ROOTS), dtype),
            )

        s_root, valid, d_sgn_s = lax.cond(
            jnp.all(no_root), _no_roots, _isolate_all, cs
        )
        # direction of the crossing *in time*: flip the in-s sign for
        # backward steps
        d_sgn = jnp.where(h >= 0, d_sgn_s, -d_sgn_s).astype(jnp.int32)
        return s_root, valid, d_sgn


    def make(tol_val: float):
        eps = float(np.finfo(np.dtype(dtype)).eps)

        def ev_step(state, pars, t_hi, t_lo, max_dt, cooldowns):
            tc = fns.jet(state, pars, t_hi)  # (order+1, n_eq + n_ev)
            h = _st.determine_h(tc, order, n_eq, max_dt)

            # g_eps for auto-cooldown (taylor_adaptive.cpp:812-840)
            max_abs_state = jnp.max(jnp.abs(tc[0]))
            max_r = jnp.where(
                max_abs_state < 1.0, tol_val, tol_val * max_abs_state
            )
            g_eps = jnp.maximum(max_r, eps * max_abs_state)

            ev_coeffs = tc[:, n_eq:].T  # (n_ev, order+1)
            s_roots, valid, d_sgn = find_roots(ev_coeffs, h)
            tau = s_roots * h  # signed time offsets of the roots
            abs_tau = jnp.abs(tau)

            # ---- terminal events ----
            if n_te:
                te_s = s_roots[:n_te]
                te_valid = valid[:n_te]
                te_sgn = d_sgn[:n_te]
                te_tau_abs = abs_tau[:n_te]
                # direction filter
                dir_ok = (te_dirs[:, None] == 0) | (
                    te_sgn == te_dirs[:, None]
                )
                # cooldown filter: skip roots inside the cooldown window
                cd_ok = te_tau_abs >= cooldowns[:, None]
                ok = te_valid & dir_ok & cd_ok
                s_masked = jnp.where(ok, te_s, jnp.asarray(2.0, dtype))
                per_ev_s = jnp.min(s_masked, axis=1)  # earliest per event
                te_best = jnp.argmin(per_ev_s)
                te_s_star = per_ev_s[te_best]
                te_found = te_s_star <= 1.0
                # d_sgn of the chosen root
                root_slot = jnp.argmin(s_masked[te_best])
                te_d = te_sgn[te_best, root_slot]
            else:
                te_found = jnp.asarray(False)
                te_s_star = jnp.asarray(2.0, dtype)
                te_best = jnp.int32(0)
                te_d = jnp.int32(0)

            h_eff = jnp.where(te_found, te_s_star * h, h)

            # ---- state update at h_eff ----
            new_state = fns.update(tc, h_eff)
            nt_hi, nt_lo = dd_add_d(t_hi, t_lo, h_eff)
            finite = jnp.all(jnp.isfinite(new_state)) & jnp.isfinite(h_eff)

            # ---- non-terminal events ----
            if n_nte:
                ntau = tau[n_te:]
                nvalid = valid[n_te:]
                nsgn = d_sgn[n_te:]
                ns = s_roots[n_te:]
                dir_ok = (nt_dirs[:, None] == 0) | (nsgn == nt_dirs[:, None])
                before_te = jnp.where(te_found, ns < te_s_star, True)
                ok = nvalid & dir_ok & before_te
                nt_mask = ok.reshape(-1)
                nt_times = (t_hi + ntau).reshape(-1)
                nt_idx = jnp.broadcast_to(
                    jnp.arange(n_nte, dtype=jnp.int32)[:, None],
                    (n_nte, MAX_ROOTS),
                ).reshape(-1)
                nt_sgn = nsgn.reshape(-1)
            else:
                nt_mask = jnp.zeros((0,), bool)
                nt_times = jnp.zeros((0,), dtype)
                nt_idx = jnp.zeros((0,), jnp.int32)
                nt_sgn = jnp.zeros((0,), jnp.int32)

            # ---- cooldown bookkeeping ----
            if n_te:
                new_cd = jnp.maximum(cooldowns - jnp.abs(h_eff), 0.0)
                # derivative of the triggered event poly at the root
                gd = _poly_deriv_eval(ev_coeffs[te_best], te_s_star * h)
                auto_cd = g_eps / jnp.abs(gd) * 10.0
                auto_cd = jnp.where(jnp.isfinite(auto_cd), auto_cd, 0.0)
                trig_cd = jnp.where(
                    jnp.isnan(te_cd_user[te_best]), auto_cd, te_cd_user[te_best]
                )
                new_cd = jnp.where(
                    te_found
                    & (jnp.arange(n_te) == te_best),
                    trig_cd,
                    new_cd,
                )
            else:
                new_cd = cooldowns

            clamped = jnp.abs(h) >= jnp.abs(max_dt)
            outcome = jnp.where(
                ~finite,
                jnp.int32(TaylorOutcome.err_nf_state),
                jnp.where(
                    te_found,
                    te_best.astype(jnp.int32),
                    jnp.where(
                        clamped,
                        jnp.int32(TaylorOutcome.time_limit),
                        jnp.int32(TaylorOutcome.success),
                    ),
                ),
            )

            return dict(
                state=new_state,
                t_hi=nt_hi,
                t_lo=nt_lo,
                last_h=h_eff,
                tc=tc,
                outcome=outcome,
                cooldowns=new_cd,
                te_idx=jnp.where(te_found, te_best.astype(jnp.int32), jnp.int32(-1)),
                te_time=t_hi + te_s_star * h,
                te_sgn=te_d,
                nt_mask=nt_mask,
                nt_times=nt_times,
                nt_idx=nt_idx,
                nt_sgn=nt_sgn,
            )

        return ev_step

    return make

# ---------------------------------------------------------------------------
# natively batched event step (TPU fast path)
# ---------------------------------------------------------------------------


def build_event_step_batch(fns, t_events, nt_events, dtype, tol,
                           flat_jet=None):
    """Whole-batch step-with-events: the TPU-native counterpart of the
    reference's SIMD ``ed_data_batch::detect_events``
    (``src/detail/event_detection.cpp:1733``).

    Differences from ``jax.vmap(build_event_step(...))`` (the round-1
    path, 133x overhead on the batched Henon-Heiles Poincare workload):

    - root isolation runs through the *static subdivision tree*
      (:func:`_make_tree_isolator`): one constant-matrix matmul + dense
      sign-variation counts over all ``batch * n_events`` rows — no
      vmapped while_loop, no per-lane queue scatters;
    - the rigorous Collins-Akritas isolator remains as a whole-batch
      fallback behind a *scalar* ``lax.cond`` — it only runs on the rare
      steps where the tree cannot certify a row (possible root cluster
      tighter than 2^-5, zero endpoints);
    - everything else (te selection, cooldowns, state update) is plain
      batched arithmetic.

    ``ev_step_b(state (B,n), pars (B,p), t_hi (B,), t_lo (B,), max_dt
    (B,), cooldowns (B,n_te)) -> dict`` of batched results; nt hits are
    reported per slot (``n_nte * MAX_ROOTS`` static slots per lane).

    ``flat_jet`` (optional): a natively batched
    ``jet(state, pars, t, max_dt) -> (tc (B, order+1, n_sv), h (B,))``
    from ``compact_flat.make_batched_step_flat(..., jet_mode=True)`` —
    the staged flat / dd-Pallas engine replaces the vmapped loop-engine
    jet (the round-2 path's dominant cost on the batched Henon-Heiles
    workload; the reference's batch event step shares its jet with the
    plain stepper for the same reason, ``taylor_00.cpp:592``).
    """
    n_te = len(t_events)
    n_nte = len(nt_events)
    n_ev = n_te + n_nte
    n_eq = fns.n_eq
    order = fns.order
    eps = float(np.finfo(np.dtype(dtype)).eps)
    tol_val = float(tol)

    te_dirs = jnp.asarray(
        np.array([int(ev.direction) for ev in t_events], dtype=np.int32)
        if n_te else np.zeros((0,), np.int32)
    )
    nt_dirs = jnp.asarray(
        np.array([int(ev.direction) for ev in nt_events], dtype=np.int32)
        if n_nte else np.zeros((0,), np.int32)
    )
    te_cd_user = jnp.asarray(
        np.array(
            [_pymath.nan if ev.cooldown is None else float(ev.cooldown)
             for ev in t_events], dtype=np.float64,
        ).astype(dtype)
        if n_te else np.zeros((0,), np.float64).astype(dtype)
    )

    isolate_tree = _make_tree_isolator(order, dtype, MAX_ROOTS)
    isolate_ca = _make_isolator(order, dtype, MAX_ROOTS)
    # certified-f32 front tier: only meaningful when the working dtype is
    # (emulated) f64 — it cuts the dominant f64 tree matmul to one MXU
    # f32 matmul with rigorous error bounds (uncertain rows fall back)
    isolate32 = (
        _make_tree_isolator_f32(order, MAX_ROOTS)
        if jnp.dtype(dtype) == jnp.float64 else None
    )

    jet_b = jax.vmap(fns.jet)

    def find_roots_b(gcoeffs, h):
        """gcoeffs (B, ne, order+1), h (B,) ->
        (s_roots, valid, d_sgn) each (B, ne, MAX_ROOTS)."""
        B = gcoeffs.shape[0]
        hp = jnp.concatenate(
            [jnp.ones((B, 1), h.dtype),
             jnp.cumprod(jnp.broadcast_to(h[:, None], (B, order)), axis=1)],
            axis=1,
        )
        cs = (gcoeffs * hp[:, None, :]).reshape(B * n_ev, order + 1)

        # fast exclusion: rows that cannot have a root skip emission
        no_root = jnp.abs(cs[:, 0]) > jnp.sum(jnp.abs(cs[:, 1:]), axis=1)
        need = ~no_root
        R = cs.shape[0]

        def _isolate_refine(cs_, fexed):
            """Tree isolation (+ rigorous CA fallback behind a scalar
            cond) and refinement over a row block."""
            rlo_t, rhi_t, valid_t, fb = isolate_tree(cs_)
            need_fb = jnp.any(fb & fexed)

            def _ca(args):
                csx, rlo0, rhi0, val0, fb_ = args
                rlo_c, rhi_c, val_c = jax.vmap(isolate_ca)(csx)
                sel = fb_[:, None]
                return (jnp.where(sel, rlo_c, rlo0),
                        jnp.where(sel, rhi_c, rhi0),
                        jnp.where(sel, val_c, val0))

            def _keep(args):
                _csx, rlo0, rhi0, val0, _fb = args
                return rlo0, rhi0, val0

            rlo, rhi, valid = lax.cond(
                need_fb, _ca, _keep, (cs_, rlo_t, rhi_t, valid_t, fb)
            )
            valid = valid & fexed[:, None]
            return _refine_roots(cs_, rlo, rhi, valid)

        import os as _osd

        _dbg = _osd.environ.get("HEYOKA_EV_DEBUG", "")
        if isolate32 is not None and R >= 256:
            # three-tier isolation over the GATHERED fex survivors
            # (tools/profile_ev_sweep.py + /tmp tier measurements: the
            # f32 tree over all R rows was 13.9 ms of the 35.7 ms HH
            # chunk sweep — it is HBM-bound on the (R, n_nodes*(p+1))
            # transients, so shrinking rows 3x shrinks the time ~3x;
            # fex survival is 27% on HH, so a R/3 budget covers it with
            # a dense-fallback cond for pathological steps):
            #   0. gather rows that survive the exclusion check
            #      (budget ~R/3, top_k compaction);
            #   1. certified-f32 tree over the gathered rows (MXU
            #      matmuls + rigorous error bounds);
            #   2. f64 refinement of the certified isolating intervals,
            #      gathered sparsely (only rows with roots);
            #   3. the f64 tree/CA/refine pipeline on the `unsure` rows
            #      (uncertain signs, possible clusters, zero endpoints),
            #      gathered sparsely.
            # Budgets overflow to dense behind scalar conds — rigor and
            # results are identical to the pure-f64 path by construction.
            # row-tiled tree evaluation: the (tile, n_nodes*(p+1)) f32
            # transients are ~25x the input rows, so one whole-R call at
            # large deferred chunks exhausts HBM (measured: chunk=192,
            # B=1024 wanted 30 GB); lax.map caps the live footprint at
            # one tile while keeping the MXU matmuls large
            _TILE = 65536

            if "norefine" in _dbg:  # profiling knob: midpoint "roots"
                def _refine_sub(csx, rlox, rhix, vx):
                    mid = (0.5 * (rlox + rhix)).astype(dtype)
                    return mid, vx, jnp.ones_like(mid)
            else:
                def _refine_sub(csx, rlox, rhix, vx):
                    return _refine_roots(
                        csx, rlox.astype(dtype), rhix.astype(dtype), vx
                    )

            def _three_tier(cs_, need_):
                """tiers 1-3 over a row block; (Rs, MAX_ROOTS) flat."""
                Rs = cs_.shape[0]
                if Rs > _TILE and Rs % _TILE == 0:
                    outs = lax.map(
                        isolate32,
                        cs_.reshape(Rs // _TILE, _TILE, cs_.shape[1])
                    )
                    rlo32, rhi32, v32, unsure = (
                        o.reshape((Rs,) + o.shape[2:]) for o in outs
                    )
                else:
                    rlo32, rhi32, v32, unsure = isolate32(cs_)
                unsure = unsure & need_
                if "nounsure" in _dbg:  # profiling: drop the f64 tier
                    unsure = jnp.zeros_like(unsure)
                certified = need_ & ~unsure
                v32 = v32 & certified[:, None]
                rooted = jnp.any(v32, axis=1)

                Mr = min(Rs, max(64, Rs // 2))
                if Mr < Rs:
                    over_r = jnp.sum(rooted) > Mr

                    def _sp_r(args):
                        csx, rlo_, rhi_, v_, rt = args
                        keys, idx = lax.top_k(rt.astype(jnp.float32), Mr)
                        s_s, v_s, d_s = _refine_sub(
                            csx[idx], rlo_[idx], rhi_[idx],
                            v_[idx] & (keys > 0)[:, None],
                        )
                        s_r = jnp.full((Rs, MAX_ROOTS), 2.0,
                                       dtype).at[idx].set(s_s)
                        v_r = jnp.zeros((Rs, MAX_ROOTS),
                                        bool).at[idx].set(v_s)
                        d_r = jnp.zeros((Rs, MAX_ROOTS),
                                        dtype).at[idx].set(d_s)
                        return s_r, v_r, d_r

                    def _dn_r(args):
                        csx, rlo_, rhi_, v_, rt = args
                        return _refine_sub(csx, rlo_, rhi_,
                                           v_ & rt[:, None])

                    s_c, v_c, d_c = lax.cond(
                        over_r, _dn_r, _sp_r,
                        (cs_, rlo32, rhi32, v32, rooted)
                    )
                else:
                    s_c, v_c, d_c = _refine_sub(cs_, rlo32, rhi32, v32)

                Mu = min(Rs, max(32, Rs // 4))
                if Mu < Rs:
                    over_u = jnp.sum(unsure) > Mu

                    def _sp_u(args):
                        csx, un = args
                        keys, idx = lax.top_k(un.astype(jnp.float32), Mu)
                        s_s, v_s, d_s = _isolate_refine(csx[idx],
                                                        keys > 0)
                        s_r = jnp.full((Rs, MAX_ROOTS), 2.0,
                                       dtype).at[idx].set(s_s)
                        v_r = jnp.zeros((Rs, MAX_ROOTS),
                                        bool).at[idx].set(v_s)
                        d_r = jnp.zeros((Rs, MAX_ROOTS),
                                        dtype).at[idx].set(d_s)
                        return s_r, v_r, d_r

                    def _dn_u(args):
                        csx, un = args
                        return _isolate_refine(csx, un)

                    s_u, v_u, d_u = lax.cond(over_u, _dn_u, _sp_u,
                                             (cs_, unsure))
                else:
                    s_u, v_u, d_u = _isolate_refine(cs_, unsure)

                tu = unsure[:, None]
                return (jnp.where(tu, s_u, s_c),
                        jnp.where(tu, v_u, v_c),
                        jnp.where(tu, d_u, d_c))

            # tier 0: gather the fex survivors (multiple-of-128 budget
            # keeps the MXU tiles aligned)
            M1 = min(R, ((max(256, R // 3) + 127) // 128) * 128)
            if M1 < R:
                over1 = jnp.sum(need) > M1

                def _sp1(args):
                    cs_, need_ = args
                    keys, idx = lax.top_k(need_.astype(jnp.float32), M1)
                    s_s, v_s, d_s = _three_tier(cs_[idx], keys > 0)
                    s_r = jnp.full((R, MAX_ROOTS), 2.0,
                                   dtype).at[idx].set(s_s)
                    v_r = jnp.zeros((R, MAX_ROOTS), bool).at[idx].set(v_s)
                    d_r = jnp.zeros((R, MAX_ROOTS), dtype).at[idx].set(d_s)
                    return s_r, v_r, d_r

                def _dn1(args):
                    cs_, need_ = args
                    return _three_tier(cs_, need_)

                s_root, valid, d_sgn_s = lax.cond(
                    over1, _dn1, _sp1, (cs, need)
                )
            else:
                s_root, valid, d_sgn_s = _three_tier(cs, need)

            s_root = s_root.reshape(B, n_ev, MAX_ROOTS)
            valid = valid.reshape(B, n_ev, MAX_ROOTS)
            d_sgn_s = d_sgn_s.reshape(B, n_ev, MAX_ROOTS)
            d_sgn = jnp.where(
                h[:, None, None] >= 0, d_sgn_s, -d_sgn_s
            ).astype(jnp.int32)
            return s_root, valid, d_sgn

        # sparse working set: f64 polynomial arithmetic is emulated on the
        # TPU, and on a typical step only ~1% of the batch*event rows pass
        # the exclusion check — gather those rows (static budget M), run
        # the full isolate+refine pipeline on the small block, and scatter
        # the results back.  If the budget ever overflows (an
        # every-lane-crossing step), a scalar cond re-runs the dense path.
        M = min(R, max(32, R // 8))
        if M < R:
            over = jnp.sum(need) > M

            def _sparse(args):
                cs_, need_ = args
                keys, idx = lax.top_k(need_.astype(jnp.float32), M)
                sub = cs_[idx]
                s_sub, v_sub, d_sub = _isolate_refine(sub, keys > 0)
                s_r = jnp.full((R, MAX_ROOTS), 2.0, dtype).at[idx].set(s_sub)
                v_r = jnp.zeros((R, MAX_ROOTS), bool).at[idx].set(v_sub)
                d_r = jnp.zeros((R, MAX_ROOTS), dtype).at[idx].set(d_sub)
                return s_r, v_r, d_r

            def _dense(args):
                cs_, need_ = args
                return _isolate_refine(cs_, need_)

            s_root, valid, d_sgn_s = lax.cond(
                over, _dense, _sparse, (cs, need)
            )
        else:
            s_root, valid, d_sgn_s = _isolate_refine(cs, need)
        s_root = s_root.reshape(B, n_ev, MAX_ROOTS)
        valid = valid.reshape(B, n_ev, MAX_ROOTS)
        d_sgn_s = d_sgn_s.reshape(B, n_ev, MAX_ROOTS)
        d_sgn = jnp.where(
            h[:, None, None] >= 0, d_sgn_s, -d_sgn_s
        ).astype(jnp.int32)
        return s_root, valid, d_sgn

    def ev_step_b(state, pars, t_hi, t_lo, max_dt, cooldowns):
        B = state.shape[0]
        if flat_jet is not None:
            tc, h = flat_jet(state, pars, t_hi, max_dt)
        else:
            tc = jet_b(state, pars, t_hi)  # (B, order+1, n_eq + n_ev)
            h = jax.vmap(lambda c, m: _st.determine_h(c, order, n_eq, m))(
                tc, max_dt
            )

        max_abs_state = jnp.max(jnp.abs(tc[:, 0, :]), axis=1)
        max_r = jnp.where(
            max_abs_state < 1.0, tol_val, tol_val * max_abs_state
        )
        g_eps = jnp.maximum(max_r, eps * max_abs_state)

        ev_coeffs = tc[:, :, n_eq:].transpose(0, 2, 1)  # (B, ne, order+1)
        s_roots, valid, d_sgn = find_roots_b(ev_coeffs, h)
        tau = s_roots * h[:, None, None]
        abs_tau = jnp.abs(tau)

        # ---- terminal events ----
        if n_te:
            te_s = s_roots[:, :n_te]
            te_valid = valid[:, :n_te]
            te_sgn = d_sgn[:, :n_te]
            te_tau_abs = abs_tau[:, :n_te]
            dir_ok = (te_dirs[None, :, None] == 0) | (
                te_sgn == te_dirs[None, :, None]
            )
            cd_ok = te_tau_abs >= cooldowns[:, :, None]
            ok = te_valid & dir_ok & cd_ok
            s_masked = jnp.where(ok, te_s, jnp.asarray(2.0, dtype))
            per_ev_s = jnp.min(s_masked, axis=2)  # (B, n_te)
            te_best = jnp.argmin(per_ev_s, axis=1)  # (B,)
            te_s_star = jnp.min(per_ev_s, axis=1)
            te_found = te_s_star <= 1.0
            bi = jnp.arange(B)
            root_slot = jnp.argmin(s_masked[bi, te_best], axis=1)
            te_d = te_sgn[bi, te_best, root_slot]
        else:
            te_found = jnp.zeros((B,), bool)
            te_s_star = jnp.full((B,), 2.0, dtype)
            te_best = jnp.zeros((B,), jnp.int32)
            te_d = jnp.zeros((B,), jnp.int32)

        h_eff = jnp.where(te_found, te_s_star * h, h)

        # ---- state update at h_eff (same kernel as the scalar step:
        # compensated Horner when high_accuracy) ----
        new_state = jax.vmap(fns.update)(tc, h_eff)
        nt_hi, nt_lo = dd_add_d(t_hi, t_lo, h_eff)
        finite = jnp.all(jnp.isfinite(new_state), axis=1) \
            & jnp.isfinite(h_eff)

        # ---- non-terminal events ----
        if n_nte:
            ntau = tau[:, n_te:]
            nvalid = valid[:, n_te:]
            nsgn = d_sgn[:, n_te:]
            ns = s_roots[:, n_te:]
            dir_ok = (nt_dirs[None, :, None] == 0) | (
                nsgn == nt_dirs[None, :, None]
            )
            before_te = jnp.where(
                te_found[:, None, None], ns < te_s_star[:, None, None], True
            )
            ok = nvalid & dir_ok & before_te
            nt_mask = ok.reshape(B, -1)
            nt_times = (t_hi[:, None, None] + ntau).reshape(B, -1)
            nt_sgn = nsgn.reshape(B, -1)
            nt_idx = jnp.broadcast_to(
                jnp.repeat(jnp.arange(n_nte, dtype=jnp.int32), MAX_ROOTS)[
                    None, :
                ],
                (B, n_nte * MAX_ROOTS),
            )
        else:
            nt_mask = jnp.zeros((B, 0), bool)
            nt_times = jnp.zeros((B, 0), dtype)
            nt_sgn = jnp.zeros((B, 0), jnp.int32)
            nt_idx = jnp.zeros((B, 0), jnp.int32)

        # ---- cooldown bookkeeping ----
        if n_te:
            new_cd = jnp.maximum(cooldowns - jnp.abs(h_eff)[:, None], 0.0)
            bi = jnp.arange(B)
            gd = _poly_deriv_eval(
                ev_coeffs[bi, te_best], te_s_star * h
            )
            auto_cd = g_eps / jnp.abs(gd) * 10.0
            auto_cd = jnp.where(jnp.isfinite(auto_cd), auto_cd, 0.0)
            trig_cd = jnp.where(
                jnp.isnan(te_cd_user[te_best]), auto_cd,
                te_cd_user[te_best],
            )
            new_cd = jnp.where(
                te_found[:, None]
                & (jnp.arange(n_te)[None, :] == te_best[:, None]),
                trig_cd[:, None],
                new_cd,
            )
        else:
            new_cd = cooldowns

        clamped = jnp.abs(h) >= jnp.abs(max_dt)
        outcome = jnp.where(
            ~finite,
            jnp.int32(TaylorOutcome.err_nf_state),
            jnp.where(
                te_found,
                te_best.astype(jnp.int32),
                jnp.where(
                    clamped,
                    jnp.int32(TaylorOutcome.time_limit),
                    jnp.int32(TaylorOutcome.success),
                ),
            ),
        )

        return dict(
            state=new_state,
            t_hi=nt_hi,
            t_lo=nt_lo,
            last_h=h_eff,
            tc=tc,
            outcome=outcome,
            cooldowns=new_cd,
            te_idx=jnp.where(
                te_found, te_best.astype(jnp.int32), jnp.int32(-1)
            ),
            te_time=t_hi + te_s_star * h,
            te_sgn=te_d,
            nt_mask=nt_mask,
            nt_times=nt_times,
            nt_idx=nt_idx,
            nt_sgn=nt_sgn,
        )

    def plain_step_b(state, pars, t_hi, t_lo, max_dt):
        """The event step minus isolation: jet + h + state update only,
        with the event-equation coefficient rows returned raw
        (``ev_row`` (B, ne, order+1)) for *deferred* per-chunk isolation
        (see ``events.make_propagate_until_ev_batch``).  Only valid for
        nt-only configurations: terminal events and cooldowns make the
        step sequence depend on the isolation results."""
        if flat_jet is not None:
            tc, h = flat_jet(state, pars, t_hi, max_dt)
        else:
            tc = jet_b(state, pars, t_hi)
            h = jax.vmap(lambda c, m: _st.determine_h(c, order, n_eq, m))(
                tc, max_dt
            )
        new_state = jax.vmap(fns.update)(tc, h)
        nt_hi, nt_lo = dd_add_d(t_hi, t_lo, h)
        finite = jnp.all(jnp.isfinite(new_state), axis=1) & jnp.isfinite(h)
        clamped = jnp.abs(h) >= jnp.abs(max_dt)
        outcome = jnp.where(
            ~finite,
            jnp.int32(TaylorOutcome.err_nf_state),
            jnp.where(
                clamped,
                jnp.int32(TaylorOutcome.time_limit),
                jnp.int32(TaylorOutcome.success),
            ),
        )
        return dict(
            state=new_state,
            t_hi=nt_hi,
            t_lo=nt_lo,
            last_h=h,
            tc=tc,
            outcome=outcome,
            ev_row=tc[:, :, n_eq:].transpose(0, 2, 1),
        )

    # deferred-isolation hooks (consumed by the chunked batch driver for
    # nt-only configurations)
    ev_step_b.plain_step_b = plain_step_b
    ev_step_b.find_roots_b = find_roots_b
    ev_step_b.nt_dirs = nt_dirs

    return ev_step_b
