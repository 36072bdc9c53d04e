"""Compact-mode jet engine: index-table-driven Taylor-coefficient kernels.

Reference parity: heyoka's compact mode (``taylor_compute_jet_compact_mode``,
``src/taylor_02.cpp:1194``): instead of unrolling one IR instruction sequence
per u-variable (the non-compact ``jet.py`` path — O(order * n_uvars) XLA ops,
compile time grows with the tape), the tape is segmented into dependency
levels and, within each level, ops of the same kind are batched into single
vectorized updates driven by static index tables.  The emitted XLA graph has
O(order * n_groups) ops — independent of the number of u-variables — while
the runtime work is identical; the batched convolutions become (m, k)
contractions that map onto the TPU's vector/matrix units.

Layout: the coefficient matrix ``tc[(order+1), width]`` carries one column
per u-variable plus "virtual" columns for literals, params and time, whose
Taylor coefficients are fixed — this makes every operand gather uniform (the
analog of heyoka's number->param promotion for uniformity,
``taylor_01.cpp:788``).

Use :func:`make_jet_fn_compact` as a drop-in replacement for
``jet.make_jet_fn`` (selected by ``compact_mode=True`` on the integrators).
"""

from __future__ import annotations

import math as _pymath
from dataclasses import dataclass, field

import numpy as np

from ..expr.decompose import Tape
from ..expr import registry as _reg
from . import recurrences as _rec


@dataclass
class _Group:
    """Ops of one kind within one dependency level."""

    name: str
    out_cols: np.ndarray  # (m,)
    in_cols: np.ndarray  # (m, nargs) column indices
    aux: dict = field(default_factory=dict)  # name -> (m,) column arrays
    alpha: np.ndarray | None = None  # pow exponents
    ops: list = field(default_factory=list)  # original (op, out_col) for fallback
    out_start: int = -1  # first column of the (contiguous) output range


@dataclass
class _Plan:
    width: int
    n_eq: int
    order: int
    rhs_cols: np.ndarray
    out_cols: np.ndarray
    const_cols: list  # [(col, value)]
    par_cols: list  # [(col, par_idx)]
    time_col: int | None
    zero_col: int
    levels: list  # list[list[_Group]]


def _read_pieces(cols, max_pieces=8):
    """Decompose an index vector into <= ``max_pieces`` gather-free read
    pieces ``[(a, d, n, r), ...]``: each piece is ``repeat(a + d*arange(n),
    r)`` (n stride-``d`` columns from ``a``, every value repeated ``r``
    times), concatenated in order.  ``build_plan``'s instance-regular
    entry sort makes the operand sets of repetitive tapes (mascons, fixed
    centres, N-body pairs, ffnn layers) decompose this way, so their
    history reads lower to slices + broadcasts instead of the vmapped
    gathers that serialize on TPU (SURVEY hard part #4, the reference's
    ``parallel_mode`` workloads).  Returns None for genuinely scattered
    sets (the caller falls back to a gather / staged buffer)."""
    cols = np.asarray(cols, dtype=np.int64)
    m = cols.size
    if m == 0:
        return None
    # run-length encode: a uniform run length r factors out per-instance
    # repeats (e.g. one r^-3/2 column consumed by the x/y/z rows)
    brk = np.flatnonzero(np.diff(cols) != 0)
    starts = np.concatenate([np.zeros(1, np.int64), brk + 1])
    counts = np.diff(np.concatenate([starts, np.array([m])]))
    vals = cols[starts]
    if counts.size and counts[0] > 1 and np.all(counts == counts[0]):
        r = int(counts[0])
    else:
        r = 1
        vals = cols
    pieces = []
    i = 0
    mv = vals.size
    while i < mv:
        if len(pieces) >= max_pieces:
            return None
        if i + 1 < mv:
            d = int(vals[i + 1] - vals[i])
            if d >= 0:
                j = i + 1
                while j + 1 < mv and vals[j + 1] - vals[j] == d:
                    j += 1
                n = j - i + 1
            else:
                d, n = 1, 1
        else:
            d, n = 1, 1
        pieces.append((int(vals[i]), d, n, r))
        i += n
    return pieces


#: ops whose numeric evaluation takes fewer inputs than the tape op carries
#: (auxiliary operands participate only in the recurrences) — mirrors the
#: special cases in jet.make_jet_fn
_EVAL_ARITY = {
    "asin": 1, "acos": 1, "atan": 1, "asinh": 1, "acosh": 1, "atanh": 1,
    "erf": 1, "atan2": 2,
}


def build_plan(tape: Tape, order: int) -> _Plan:
    n_eq = tape.n_eq
    n_u = tape.n_uvars

    # -- virtual columns -----------------------------------------------------
    const_map: dict[float, int] = {}
    par_map: dict[int, int] = {}
    time_col = None
    next_col = n_u

    def col_of(operand) -> int:
        nonlocal next_col, time_col
        kind = operand[0]
        if kind == "u":
            return operand[1]
        if kind == "c":
            v = float(operand[1])
            if v not in const_map:
                const_map[v] = next_col
                next_col += 1
            return const_map[v]
        if kind == "p":
            j = int(operand[1])
            if j not in par_map:
                par_map[j] = next_col
                next_col += 1
            return par_map[j]
        if kind == "t":
            if time_col is None:
                time_col = next_col
                next_col += 1
            return time_col
        raise ValueError(operand)

    # zero padding column (for n-ary sum padding)
    zero_col = col_of(("c", 0.0))

    # -- dependency levels ---------------------------------------------------
    # level of a column: state vars and virtual columns are level 0; an op is
    # 1 + max(level of its input/aux columns).  Aux columns (sin/cos pairs,
    # tan's square, ...) are same-order dependencies, so they count like
    # inputs — except self-references, which recurrences handle via history.
    # NOTE: meta auxiliaries (sin/cos pairs, tan's square, Kepler sin/cos
    # companions) are *not* level dependencies: every recurrence reads its
    # companions only at strictly lower orders (see recurrences.py), so equal
    # or later levels are sound — only the *real* inputs order the levels.
    level = np.zeros(n_u, dtype=np.int64)
    for oi, op in enumerate(tape.ops):
        u = n_eq + oi
        lv = 0
        for operand in op.inputs:
            if operand[0] == "u" and operand[1] != u:
                d = operand[1]
                lv = max(lv, (level[d] + 1) if d >= n_eq else 0)
        level[u] = max(lv, 1)

    n_levels = int(level[n_eq:].max()) if tape.ops else 0

    # -- grouping ------------------------------------------------------------
    raw: dict[tuple, list] = {}
    for oi, op in enumerate(tape.ops):
        u = n_eq + oi
        lv = int(level[u])
        if op.op == "sum":
            key = (lv, "sum")
        elif op.op == "pow":
            key = (lv, "pow")
        else:
            key = (lv, op.op, len(op.inputs))
        raw.setdefault(key, []).append((oi, op, u))

    levels: list[list[_Group]] = [[] for _ in range(n_levels)]
    for key, entries in raw.items():
        lv = key[0]
        name = key[1]
        m = len(entries)
        if name == "sum":
            max_ar = max(len(op.inputs) for _, op, _ in entries)
            in_cols = np.full((m, max_ar), zero_col, dtype=np.int64)
            for r, (_, op, _) in enumerate(entries):
                for c, operand in enumerate(op.inputs):
                    in_cols[r, c] = col_of(operand)
        else:
            nargs = len(entries[0][1].inputs)
            in_cols = np.zeros((m, nargs), dtype=np.int64)
            for r, (_, op, _) in enumerate(entries):
                for c, operand in enumerate(op.inputs):
                    in_cols[r, c] = col_of(operand)
        out_cols = np.array([u for _, _, u in entries], dtype=np.int64)
        aux = {}
        for mk in ("pair", "sq", "sin", "cos"):
            if mk in entries[0][1].meta:
                aux[mk] = np.array(
                    [int(op.meta[mk]) for _, op, _ in entries], dtype=np.int64
                )
        alpha = None
        if name == "pow":
            alpha = np.array(
                [float(op.meta["alpha"]) for _, op, _ in entries]
            )
        levels[lv - 1].append(
            _Group(
                name, out_cols, in_cols, aux, alpha,
                [
                    (op, u, [col_of(o) for o in op.inputs])
                    for _, op, u in entries
                ],
            )
        )

    rhs_cols = np.array([col_of(o) for o in tape.rhs], dtype=np.int64) \
        if tape.rhs is not None else np.zeros(0, np.int64)
    out_cols = np.array([col_of(o) for o in tape.outputs], dtype=np.int64)

    # -- column permutation: contiguous groups ---------------------------------
    # Renumber the op u-vars so every group's outputs occupy a contiguous
    # column range: the per-order updates become static slice stores instead
    # of scatters (the layout freedom heyoka gets from its index tables,
    # exploited here for the TPU's preference for dense slices).
    #
    # Within each group, entries are first SORTED by their input columns
    # (mapped through the renumbering of the already-laid-out earlier
    # levels).  For instance-regular tapes — N mascons, N fixed centres,
    # N-body pairs, ffnn neurons — this aligns every group's instance
    # order with its producers', so operand reads become arithmetic
    # progressions (plain/strided slices, repeats, tiles) instead of
    # scattered gathers; compact_flat._col_pattern turns those into
    # gather-free reads.  The reference gets this layout freedom from its
    # compact-mode index tables (taylor_02.cpp); on TPU the win is that
    # slice reads fuse while vmapped gathers serialize.
    import os as _osm

    # Entry-sort gate: only groups at least this large are sorted.  The
    # payoff (gather-free piecewise reads) matters for instance-regular
    # groups of hundreds+ entries; for small groups the gathers are cheap
    # AND the dd-Pallas kernel turned out to be schedule-sensitive to
    # within-group column order (the full sort cost the outer-SS fused
    # kernel 2.4x on-chip with bitwise-identical results — same staged
    # sets, same slice counts; Mosaic VMEM packing/scheduling is the
    # remaining suspect).  Gating at 256 keeps every tape with only
    # small groups (outer-SS 135 max, HH, pendulum, series tapes)
    # bit-identical to the tuned round-2 layout.
    _sort_min = int(_osm.environ.get("HEYOKA_PLAN_SORT_MIN", "256"))
    if bool(int(_osm.environ.get("HEYOKA_PLAN_NO_SORT", "0"))):
        _sort_min = 1 << 62

    # producer-region id per column: -1 state vars, -2 virtual
    # (const/par/time), group id >= 0 for op outputs.  Used to split a
    # group's entries into *families* — entries whose operands come from
    # the same producer regions — before sorting: a (level, op) group can
    # mix several instance-regular populations (e.g. the mascon L2 muls:
    # dx_i*dx_i squares alongside Gm_i*dx_i scalings) whose interleaving
    # under a single lexsort leaves one family's operands as 2-level
    # affine patterns no piecewise read can express.
    region = np.full(next_col, -2, dtype=np.int64)
    region[:n_eq] = -1
    gid = 0
    for lv in levels:
        for g in lv:
            region[g.out_cols] = gid
            gid += 1

    def _best_family_perm(in_cols_f, alpha_f):
        """Choose, among per-operand-major lexsorts of one family, the
        permutation whose sorted operand sets decompose into the fewest
        read pieces (scattered operands count as +10k each)."""
        nargs = in_cols_f.shape[1]
        base_keys = [in_cols_f[:, c] for c in range(nargs)]
        if alpha_f is not None:
            base_keys.append(np.asarray(alpha_f))
        best = None
        for primary in range(nargs):
            keys = ([base_keys[primary]]
                    + [k for i, k in enumerate(base_keys) if i != primary])
            perm = np.lexsort(tuple(keys[::-1]))
            cost = 0
            for c in range(nargs):
                p = _read_pieces(in_cols_f[perm, c])
                cost += len(p) if p is not None else 10_000
            if best is None or cost < best[0]:
                best = (cost, perm)
            if best[0] <= nargs:  # already optimal: 1 piece per operand
                break
        return best[1]

    old2new = np.arange(next_col, dtype=np.int64)
    nxt = n_eq
    for lv in levels:
        for g in lv:
            m = g.out_cols.size
            if m >= _sort_min:
                mapped = old2new[g.in_cols]
                fam_keys = [tuple(region[g.in_cols[r]])
                            for r in range(m)]
                fams: dict = {}
                for r, fk in enumerate(fam_keys):
                    fams.setdefault(fk, []).append(r)
                perm_parts = []
                for fk in sorted(fams):
                    rows = np.asarray(fams[fk], dtype=np.int64)
                    sub = _best_family_perm(
                        mapped[rows],
                        None if g.alpha is None else
                        np.asarray(g.alpha)[rows],
                    )
                    perm_parts.append(rows[sub])
                perm = np.concatenate(perm_parts)
                if not np.array_equal(perm, np.arange(m)):
                    g.out_cols = g.out_cols[perm]
                    g.in_cols = g.in_cols[perm]
                    g.aux = {k: v[perm] for k, v in g.aux.items()}
                    if g.alpha is not None:
                        g.alpha = g.alpha[perm]
                    g.ops = [g.ops[i] for i in perm]
            for u in g.out_cols:
                old2new[u] = nxt
                nxt += 1
    assert nxt == n_u

    def remap(a):
        return old2new[a]

    for lv in levels:
        for g in lv:
            g.out_start = int(old2new[g.out_cols[0]])
            g.out_cols = remap(g.out_cols)
            assert np.array_equal(
                g.out_cols,
                np.arange(g.out_start, g.out_start + g.out_cols.size),
            )
            g.in_cols = remap(g.in_cols)
            g.aux = {k: remap(v) for k, v in g.aux.items()}
            g.ops = [
                (
                    _remap_op_meta(op, old2new), int(old2new[u]),
                    [int(old2new[c]) for c in incols],
                )
                for op, u, incols in g.ops
            ]
    rhs_cols = remap(rhs_cols)
    out_cols = remap(out_cols)

    return _Plan(
        width=next_col,
        n_eq=n_eq,
        order=order,
        rhs_cols=rhs_cols,
        out_cols=out_cols,
        const_cols=[(c, v) for v, c in const_map.items()],
        par_cols=[(c, j) for j, c in par_map.items()],
        time_col=time_col,
        zero_col=zero_col,
        levels=levels,
    )


# ---------------------------------------------------------------------------
# vectorized order-k recurrences
# ---------------------------------------------------------------------------

def _remap_op_meta(op, old2new):
    from ..expr.decompose import TapeOp

    if not op.meta:
        return op
    meta = dict(op.meta)
    for mk in ("pair", "sq", "sin", "cos"):
        if mk in meta:
            meta[mk] = int(old2new[int(meta[mk])])
    return TapeOp(op.op, op.inputs, meta)


def _conv(A, B, k):
    """sum_{j=0..k} A[j] * B[k-j] over (K+1, m) histories; static k."""
    import jax.numpy as jnp

    return jnp.einsum("jm,jm->m", A[: k + 1], B[k::-1] if k > 0 else B[:1])


def _jweights(k, lo, hi):
    return np.arange(lo, hi, dtype=np.float64)


def _vec_rule(name):
    def deco(fn):
        _VEC_RULES[name] = fn
        return fn

    return deco


_VEC_RULES: dict = {}


@_vec_rule("sum")
def _v_sum(jnp, tc, k, g):
    return tc[k, g.in_cols].sum(axis=1)


@_vec_rule("mul")
def _v_mul(jnp, tc, k, g):
    A = tc[:, g.in_cols[:, 0]]
    B = tc[:, g.in_cols[:, 1]]
    return _conv(A, B, k)


@_vec_rule("div")
def _v_div(jnp, tc, k, g):
    b = g.in_cols[:, 0]
    c = g.in_cols[:, 1]
    S = tc[:, g.out_cols]
    C = tc[:, c]
    # sum_{j=0..k-1} a_j c_{k-j}
    num = jnp.einsum("jm,jm->m", S[:k], C[k:0:-1]) if k > 0 else 0.0
    return (tc[k, b] - num) / tc[0, c]


def _pair_rule(sign):
    def impl(jnp, tc, k, g):
        b = g.in_cols[:, 0]
        comp = g.aux["pair"]
        j = np.arange(1, k + 1, dtype=np.float64)
        A = tc[1 : k + 1, b] * j[:, None]
        B = tc[k - 1 :: -1, comp][:k] if k > 0 else tc[:0, comp]
        s = jnp.einsum("jm,jm->m", A, B)
        return sign / k * s

    return impl


_VEC_RULES["sin"] = _pair_rule(1.0)
_VEC_RULES["sinh"] = _pair_rule(1.0)
_VEC_RULES["cosh"] = _pair_rule(1.0)
_VEC_RULES["cos"] = _pair_rule(-1.0)


@_vec_rule("exp")
def _v_exp(jnp, tc, k, g):
    b = g.in_cols[:, 0]
    j = np.arange(1, k + 1, dtype=np.float64)
    A = tc[1 : k + 1, b] * j[:, None]
    B = tc[k - 1 :: -1, g.out_cols][:k]
    return jnp.einsum("jm,jm->m", A, B) / k


@_vec_rule("log")
def _v_log(jnp, tc, k, g):
    b = g.in_cols[:, 0]
    if k > 1:
        j = np.arange(1, k, dtype=np.float64)
        A = tc[1:k, g.out_cols] * j[:, None]
        B = tc[k - 1 : 0 : -1, b]
        s = jnp.einsum("jm,jm->m", A, B) / k
    else:
        s = 0.0
    return (tc[k, b] - s) / tc[0, b]


@_vec_rule("sqrt")
def _v_sqrt(jnp, tc, k, g):
    b = g.in_cols[:, 0]
    if k > 1:
        A = tc[1:k, g.out_cols]
        B = tc[k - 1 : 0 : -1, g.out_cols]
        s = jnp.einsum("jm,jm->m", A, B)
    else:
        s = 0.0
    return (tc[k, b] - s) / (2.0 * tc[0, g.out_cols])


@_vec_rule("pow")
def _v_pow(jnp, tc, k, g):
    b = g.in_cols[:, 0]
    alpha = g.alpha  # (m,)
    j = np.arange(0, k, dtype=np.float64)  # j = 0..k-1
    # weights w_{j} = alpha*(k-j) - j  -> (k, m)
    W = alpha[None, :] * (k - j)[:, None] - j[:, None]
    A = tc[:k, g.out_cols]  # a_j
    B = tc[k:0:-1, b]  # b_{k-j}
    s = jnp.einsum("jm,jm->m", A * W, B)
    return s / (k * tc[0, b])


def _sq_rule(sign):
    def impl(jnp, tc, k, g):
        b = g.in_cols[:, 0]
        q = g.aux["sq"]
        w = np.arange(k, 0, -1, dtype=np.float64)  # (k-m) for m=0..k-1
        A = tc[:k, q]
        B = tc[k:0:-1, b] * w[:, None]
        s = jnp.einsum("jm,jm->m", A, B)
        return tc[k, b] + sign * s / k

    return impl


_VEC_RULES["tan"] = _sq_rule(1.0)
_VEC_RULES["tanh"] = _sq_rule(-1.0)


@_vec_rule("sigmoid")
def _v_sigmoid(jnp, tc, k, g):
    b = g.in_cols[:, 0]
    q = g.aux["sq"]
    w = np.arange(k, 0, -1, dtype=np.float64)
    A = tc[:k, g.out_cols] - tc[:k, q]
    B = tc[k:0:-1, b] * w[:, None]
    return jnp.einsum("jm,jm->m", A, B) / k


def _inv_rule(sign):
    # a' = sign * b' / c (c = aux operand input #1)
    def impl(jnp, tc, k, g):
        b = g.in_cols[:, 0]
        c = g.in_cols[:, 1]
        if k > 1:
            w = np.arange(k - 1, 0, -1, dtype=np.float64)  # (k-m), m=1..k-1
            A = tc[1:k, c]
            B = tc[k - 1 : 0 : -1, g.out_cols] * w[:, None]
            s = jnp.einsum("jm,jm->m", A, B)
        else:
            s = 0.0
        return (sign * k * tc[k, b] - s) / (k * tc[0, c])

    return impl


for _n in ("asin", "atan", "atanh", "asinh", "acosh"):
    _VEC_RULES[_n] = _inv_rule(1.0)
_VEC_RULES["acos"] = _inv_rule(-1.0)


@_vec_rule("erf")
def _v_erf(jnp, tc, k, g):
    b = g.in_cols[:, 0]
    e = g.in_cols[:, 1]
    w = np.arange(k, 0, -1, dtype=np.float64)
    A = tc[:k, e]
    B = tc[k:0:-1, b] * w[:, None]
    s = jnp.einsum("jm,jm->m", A, B)
    return (2.0 / _pymath.sqrt(_pymath.pi)) * s / k


@_vec_rule("atan2")
def _v_atan2(jnp, tc, k, g):
    y = g.in_cols[:, 0]
    x = g.in_cols[:, 1]
    d = g.in_cols[:, 2]
    w = np.arange(k, 0, -1, dtype=np.float64)  # (k-m), m=0..k-1
    X = tc[:k, x]
    Yw = tc[k:0:-1, y] * w[:, None]
    rhs = jnp.einsum("jm,jm->m", X, Yw)
    Y = tc[:k, y]
    Xw = tc[k:0:-1, x] * w[:, None]
    rhs2 = jnp.einsum("jm,jm->m", Y, Xw)
    if k > 1:
        w2 = np.arange(k - 1, 0, -1, dtype=np.float64)
        D = tc[1:k, d]
        Aw = tc[k - 1 : 0 : -1, g.out_cols] * w2[:, None]
        s = jnp.einsum("jm,jm->m", D, Aw)
    else:
        s = 0.0
    return (rhs - rhs2 - s) / (k * tc[0, d])


@_vec_rule("relu")
def _v_relu(jnp, tc, k, g):
    b = g.in_cols[:, 0]
    return jnp.where(tc[0, b] > 0.0, tc[k, b], 0.0)


@_vec_rule("relup")
def _v_relup(jnp, tc, k, g):
    return jnp.zeros(g.out_cols.shape[0], tc.dtype)


@_vec_rule("select")
def _v_select(jnp, tc, k, g):
    c = g.in_cols[:, 0]
    a = g.in_cols[:, 1]
    b = g.in_cols[:, 2]
    return jnp.where(tc[0, c] != 0.0, tc[k, a], tc[k, b])


def _v_const(jnp, tc, k, g):
    return jnp.zeros(g.out_cols.shape[0], tc.dtype)


for _n in ("lt", "le", "gt", "ge", "eq", "ne",
           "logical_and", "logical_or", "logical_not"):
    _VEC_RULES[_n] = _v_const


@_vec_rule("kepE")
def _v_kepE(jnp, tc, k, g):
    e = g.in_cols[:, 0]
    M = g.in_cols[:, 1]
    s_i, c_i = g.aux["sin"], g.aux["cos"]
    E = tc[:, g.out_cols]

    def q(lo, hi_excl):
        # q_m = conv(e, cos)_m for m in [lo, hi_excl)
        return jnp.stack([
            _conv(tc[:, e], tc[:, c_i], m) for m in range(lo, hi_excl)
        ]) if hi_excl > lo else None

    t1 = k * tc[k, M]
    j = np.arange(1, k + 1, dtype=np.float64)
    t2 = jnp.einsum("jm,jm->m", tc[1 : k + 1, e] * j[:, None],
                    tc[k - 1 :: -1, s_i][:k])
    if k > 1:
        qs = q(1, k)  # (k-1, m)
        w = np.arange(k - 1, 0, -1, dtype=np.float64)
        t3 = jnp.einsum("jm,jm->m", qs, E[k - 1 : 0 : -1] * w[:, None])
    else:
        t3 = 0.0
    q0 = _conv(tc[:, e], tc[:, c_i], 0)
    return (t1 + t2 + t3) / (k * (1.0 - q0))


@_vec_rule("kepF")
def _v_kepF(jnp, tc, k, g):
    h = g.in_cols[:, 0]
    kk = g.in_cols[:, 1]
    lam = g.in_cols[:, 2]
    s_i, c_i = g.aux["sin"], g.aux["cos"]
    F = tc[:, g.out_cols]

    def w_m(m):
        return _conv(tc[:, h], tc[:, s_i], m) + _conv(tc[:, kk], tc[:, c_i], m)

    t1 = k * tc[k, lam]
    j = np.arange(1, k + 1, dtype=np.float64)
    t2 = -jnp.einsum("jm,jm->m", tc[1 : k + 1, h] * j[:, None],
                     tc[k - 1 :: -1, c_i][:k])
    t3 = jnp.einsum("jm,jm->m", tc[1 : k + 1, kk] * j[:, None],
                    tc[k - 1 :: -1, s_i][:k])
    if k > 1:
        ws = jnp.stack([w_m(m) for m in range(1, k)])
        wgt = np.arange(k - 1, 0, -1, dtype=np.float64)
        t4 = jnp.einsum("jm,jm->m", ws, F[k - 1 : 0 : -1] * wgt[:, None])
    else:
        t4 = 0.0
    return (t1 + t2 + t3 + t4) / (k * (1.0 - w_m(0)))


@_vec_rule("kepDE")
def _v_kepDE(jnp, tc, k, g):
    s0 = g.in_cols[:, 0]
    c0 = g.in_cols[:, 1]
    DM = g.in_cols[:, 2]
    s_i, c_i = g.aux["sin"], g.aux["cos"]
    DE = tc[:, g.out_cols]

    def w_m(m):
        return _conv(tc[:, s0], tc[:, s_i], m) - _conv(tc[:, c0], tc[:, c_i], m)

    def one_minus_c(i):
        return (1.0 - tc[0, c_i]) if i == 0 else -tc[i, c_i]

    t1 = k * tc[k, DM]
    j = np.arange(1, k + 1, dtype=np.float64)
    omc = jnp.stack([one_minus_c(k - jj) for jj in range(1, k + 1)])
    t2 = -jnp.einsum("jm,jm->m", tc[1 : k + 1, s0] * j[:, None], omc)
    t3 = jnp.einsum("jm,jm->m", tc[1 : k + 1, c0] * j[:, None],
                    tc[k - 1 :: -1, s_i][:k])
    if k > 1:
        ws = jnp.stack([w_m(m) for m in range(1, k)])
        wgt = np.arange(k - 1, 0, -1, dtype=np.float64)
        t4 = -jnp.einsum("jm,jm->m", ws, DE[k - 1 : 0 : -1] * wgt[:, None])
    else:
        t4 = 0.0
    return (t1 + t2 + t3 + t4) / (k * (1.0 + w_m(0)))


# ---------------------------------------------------------------------------
# the jet function
# ---------------------------------------------------------------------------

def _fallback_rule(jnp, tc, k, g):
    """Per-op scalar-rule fallback for ops without a vectorized form (e.g.
    the data-driven EOP/SW interpolants, whose groups have size ~1).

    Every operand — including literals, params and time — resolves through
    its virtual column, so the scalar recurrences see plain history reads.
    """
    outs = []
    for op, u, incols in g.ops:
        cmap = {id(o): c for o, c in zip(op.inputs, incols)}

        def G(operand, j, _tc=tc, _cmap=cmap):
            return _tc[j, _cmap[id(operand)]]

        def U(i, j, _tc=tc):
            return _tc[j, i]

        rule = _rec.get_rule(op.op)
        outs.append(rule(k, op.inputs, op.meta, G, U, u))
    return jnp.stack([jnp.asarray(o, tc.dtype) for o in outs])


def make_jet_fn_compact(tape: Tape, order: int, *, dtype=None):
    """Build ``jet(state, pars, t) -> tc[(order+1, n_eq + n_outputs)]`` via
    the compact index-table engine (drop-in for ``jet.make_jet_fn``)."""
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float64
    if tape.rhs is None:
        raise ValueError("make_jet_fn_compact requires an ODE tape")
    plan = build_plan(tape, order)
    n_eq = plan.n_eq
    K = order

    const_cols = np.array([c for c, _ in plan.const_cols], dtype=np.int64)
    const_vals = np.array([v for _, v in plan.const_cols])
    par_cols = np.array([c for c, _ in plan.par_cols], dtype=np.int64)
    par_idx = np.array([j for _, j in plan.par_cols], dtype=np.int64)

    def jet(state, pars, t):
        tc = jnp.zeros((K + 1, plan.width), dtype)
        # order 0 / fixed coefficient columns
        tc = tc.at[0, :n_eq].set(state.astype(dtype))
        if const_cols.size:
            tc = tc.at[0, const_cols].set(jnp.asarray(const_vals, dtype))
        if par_cols.size:
            tc = tc.at[0, par_cols].set(pars[par_idx].astype(dtype))
        if plan.time_col is not None:
            tc = tc.at[0, plan.time_col].set(jnp.asarray(t, dtype))
            tc = tc.at[1, plan.time_col].set(jnp.asarray(1.0, dtype))

        # order-0 evaluation, level by level
        for lv in plan.levels:
            for g in lv:
                ar = _EVAL_ARITY.get(g.name, None)
                ins = [tc[0, g.in_cols[:, c]] for c in range(
                    g.in_cols.shape[1] if ar is None else ar
                )]
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

        # orders 1..K
        for k in range(1, K + 1):
            # state variables from the rhs coefficients of order k-1
            tc = tc.at[k, :n_eq].set(tc[k - 1, plan.rhs_cols] / k)
            for lv in plan.levels:
                for g in lv:
                    rule = _VEC_RULES.get(g.name, _fallback_rule)
                    vals = rule(jnp, tc, k, g)
                    m = g.out_cols.size
                    tc = tc.at[k, g.out_start : g.out_start + m].set(
                        jnp.asarray(vals, dtype)
                    )

        cols = np.concatenate([np.arange(n_eq), plan.out_cols]) \
            if plan.out_cols.size else np.arange(n_eq)
        return tc[:, cols]

    return jet


def _pow0_vec(jnp, b, alpha):
    """Vectorized order-0 pow with fast paths for the common exponents."""
    uniq = np.unique(alpha)
    if uniq.size == 1:
        from .jet import _pow0

        return _pow0(b, float(uniq[0]))
    out = jnp.zeros_like(b)
    from .jet import _pow0

    for a in uniq:
        mask = alpha == a
        out = jnp.where(jnp.asarray(mask), _pow0(b, float(a)), out)
    return out
