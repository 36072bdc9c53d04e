"""Dense trigonometric-series op: the TPU-native huge-tape design.

Reference context: heyoka expands VSOP2013/ELP2000 ephemeris theories into
tens of thousands of expression u-vars and leans on compact-mode codegen
(``taylor_02.cpp:1194``) — cheap on a CPU, where the per-u-var index-table
loads are L1 hits.  On a TPU those index tables become vmapped gathers
over 10^4-row tables, ~1000x slower than the dense math they fetch.

TPU-native redesign: an entire Poisson/trig series

    f(u) = sum_i  A_i(u) * sin(P_i(u))

(per-term *polynomial* amplitudes ``A_i`` — they absorb Poisson t-powers —
and polynomial phase arguments ``P_i``; cosine terms fold in via a +pi/2
phase shift) is ONE tape op carrying its coefficient tables as dense
``(n_terms, deg+1)`` arrays.  Evaluation and the Taylor-jet recurrence are
pure elementwise/reduction work over the term axis — VPU/MXU shaped, no
gathers, and the surrounding tape stays O(10) u-vars, so compile time is
flat.

The Taylor rule requires the op input ``u`` to be *affine in time*
(``u_k = 0`` for k >= 2): ephemeris arguments are polynomials in TDB time
which the factory folds into the per-term tables, leaving ``u = c0 +
c1*t`` (possibly par-shifted).  The rule recomputes the per-term jet from
scratch at each order; XLA CSE collapses the shared prefixes, so the
compiled cost is one jet.  The class is closed under differentiation
(``d/du`` maps to another series with shifted phases), so symbolic diff /
variational equations work.
"""

from __future__ import annotations

import hashlib
import math as _pymath

import numpy as np

from . import registry as _reg
from .core import Expr, Func, expr
from . import diff as _diff
from ..taylor import recurrences as _rec

#: series data store: key -> dict(amp (n, q+1), ph (n, d+1))
_STORE: dict = {}

#: max Taylor order supported by a single rule trace (safety bound only)
_MAX_K = 64


def _key_for(amp: np.ndarray, ph: np.ndarray) -> str:
    h = hashlib.sha1()
    h.update(amp.tobytes())
    h.update(ph.tobytes())
    h.update(str(amp.shape).encode())
    h.update(str(ph.shape).encode())
    return h.hexdigest()[:16]


def _op_name(key: str) -> str:
    return f"trigseries%{key}"


def trig_series(u, amp, ph) -> Expr:
    """Expression ``sum_i amp_i(u) * sin(ph_i(u))`` as one dense tape op.

    ``amp``: (n_terms, q+1) ascending amplitude-polynomial coefficients;
    ``ph``: (n_terms, d+1) ascending phase-polynomial coefficients.
    ``u`` must be affine in time for Taylor integration (checked at
    integration time, not here — cfunc evaluation has no restriction).
    """
    amp = np.atleast_2d(np.asarray(amp, np.float64))
    ph = np.atleast_2d(np.asarray(ph, np.float64))
    if amp.shape[0] != ph.shape[0]:
        raise ValueError(
            f"amp/ph term counts differ: {amp.shape[0]} vs {ph.shape[0]}"
        )
    key = _key_for(amp, ph)
    if key not in _STORE:
        _STORE[key] = {"amp": amp, "ph": ph}
        _register(key)
    return Func(_op_name(key), (expr(u),))


def _evaluate(key: str):
    def ev(u):
        import jax.numpy as jnp

        d = _STORE[key]
        amp, ph = d["amp"], d["ph"]
        uu = jnp.asarray(u)[..., None]  # broadcast over the term axis
        a = jnp.asarray(amp[:, -1]) + 0.0 * uu
        for j in range(amp.shape[1] - 2, -1, -1):
            a = a * uu + jnp.asarray(amp[:, j])
        p = jnp.asarray(ph[:, -1]) + 0.0 * uu
        for j in range(ph.shape[1] - 2, -1, -1):
            p = p * uu + jnp.asarray(ph[:, j])
        return jnp.sum(a * jnp.sin(p), axis=-1)

    return ev


def _shifted_tables(jnp, tab, u0, u1):
    """Coefficients of ``Q(dt) = P(u0 + u1*dt)`` per term.

    tab (n, m+1) ascending in u; u0/u1 scalars (tracers under vmap);
    returns the list ``q_j`` (j = 0..m) of (n,) values:
    ``q_j = sum_{r>=j} C(r, j) p_r u0^(r-j) u1^j``.
    """
    m = tab.shape[1] - 1
    u0p = [1.0]
    for _ in range(m):
        u0p.append(u0p[-1] * u0)
    u1p = [1.0]
    for _ in range(m):
        u1p.append(u1p[-1] * u1)
    out = []
    for j in range(m + 1):
        acc = None
        for r in range(j, m + 1):
            term = jnp.asarray(_pymath.comb(r, j) * tab[:, r]) * u0p[r - j]
            acc = term if acc is None else acc + term
        out.append(acc * u1p[j])
    return out


def _taylor_rule(key: str):
    """Order-k Taylor rule: per-term jet of amp(u(t)) * sin(ph(u(t))) with
    u affine in t.

    The per-term sin/cos jet is built *incrementally* and cached per trace
    on the op's metadata dict, keyed by the identity of the traced input
    coefficients (the tracer objects are held in the cache entry, so ids
    cannot be recycled while the entry lives) — the jet engines call the
    rule once per order, and recomputing the full jet each time was
    measured to blow the XLA graph (and compile time) up quadratically.
    """

    def rule(k, ins, meta, G, U, self_idx):
        import jax.numpy as jnp

        d = _STORE[key]
        amp_t, ph_t = d["amp"], d["ph"]
        u0 = G(ins[0], 0)
        u1 = G(ins[0], 1)
        if isinstance(u1, float) and u1 == 0.0:
            return 0.0  # constant input: all higher coefficients vanish
        if k > _MAX_K:  # pragma: no cover
            raise ValueError("trigseries: order too high")

        cache = meta.setdefault("_ts_cache", {})
        ck = (id(u0), id(u1))
        ent = cache.get(ck)
        if ent is None or len(ent["f"]) < k:
            if ent is None and len(cache) > 4:  # bound growth across traces
                cache.clear()
            ent = _series_jet(jnp, amp_t, ph_t, u0, u1, k, ent)
            cache[ck] = ent
        return ent["f"][k - 1]

    return rule


#: orders computed per scan chunk (covers tol=1e-15's order 20 in one go)
_SCAN_CHUNK = 24


def _series_jet(jnp, amp_t, ph_t, u0, u1, k, ent):
    """Orders 1..ceil(k / chunk)*chunk of the series jet via ONE lax.scan
    over orders.

    An eager per-order formulation traces ~60 (n_terms,) vector eqns per
    order; XLA fuses the whole chain into a single cluster whose CPU/TPU
    codegen time explodes (measured 400 s for the ELP2000 tape).  The scan
    compiles its body once; the carry is the (window, n) rolling sin/cos
    history the recurrence needs, plus the per-order amplitude-window
    index bookkeeping, and the stacked outputs are the already
    term-reduced coefficients f_m — tiny.
    """
    from jax import lax

    dph = ph_t.shape[1] - 1
    qam = amp_t.shape[1] - 1
    w = max(dph, qam) + 1

    if ent is None:
        u0j = jnp.asarray(u0)
        u1j = jnp.asarray(u1)
        a = _shifted_tables(jnp, amp_t, u0j, u1j)  # len qam+1, (n,)
        p = _shifted_tables(jnp, ph_t, u0j, u1j)   # len dph+1
        s0 = jnp.sin(p[0])
        c0 = jnp.cos(p[0])
        # windows hold orders m-1, m-2, ... (row 0 = most recent)
        swin = jnp.zeros((w,) + s0.shape, s0.dtype).at[0].set(s0)
        cwin = jnp.zeros((w,) + c0.shape, c0.dtype).at[0].set(c0)
        start = 1
        f = []
        pv = jnp.stack([p[j] if j <= dph else jnp.zeros_like(p[0])
                        for j in range(1, w + 1)])  # (w, n): p_1..p_w
        av = jnp.stack([a[j] if j <= qam else jnp.zeros_like(a[0])
                        for j in range(0, w)])      # (w, n): a_0..a_{w-1}
        ent = {"refs": (u0, u1), "pv": pv, "av": av, "f": f,
               "swin": swin, "cwin": cwin, "start": 1}
    pv, av = ent["pv"], ent["av"]
    swin, cwin, start = ent["swin"], ent["cwin"], ent["start"]
    f = ent["f"]

    n_more = ((k - start) // _SCAN_CHUNK + 1) * _SCAN_CHUNK

    def body(carry, m):
        sw, cw = carry
        mf = m.astype(sw.dtype)
        jv = jnp.arange(1, w + 1, dtype=sw.dtype)
        wts = jnp.where(jv <= jnp.minimum(w * 1.0, mf), jv / mf, 0.0)
        # s_m = (1/m) sum_j j p_j c_{m-j}; rows of cw are c_{m-1}, c_{m-2}..
        s_m = jnp.sum(wts[:, None] * pv * cw, axis=0)
        c_m = -jnp.sum(wts[:, None] * pv * sw, axis=0)
        sw = jnp.roll(sw, 1, axis=0).at[0].set(s_m)
        cw = jnp.roll(cw, 1, axis=0).at[0].set(c_m)
        # f_m = sum_{j<=qam} a_j s_{m-j}: s_{m} is row 0 after the roll
        f_m = jnp.sum(jnp.sum(av * sw[:w], axis=0), axis=-1)
        return (sw, cw), f_m

    ms = jnp.arange(start, start + n_more)
    (swin, cwin), fs = lax.scan(body, (swin, cwin), ms)
    f = f + [fs[i] for i in range(n_more)]
    return {"refs": ent["refs"], "pv": pv, "av": av, "f": f,
            "swin": swin, "cwin": cwin, "start": start + n_more}


def _grad(key: str):
    """d/du sum A(u) sin(P(u)) = sum [A' sin(P) + A P' cos(P)] — two
    derived series (cos via +pi/2 phase)."""

    def g(t):
        d = _STORE[key]
        amp, ph = d["amp"], d["ph"]
        n, q1 = amp.shape
        _n, d1 = ph.shape
        parts = []
        if q1 > 1:
            damp = amp[:, 1:] * np.arange(1, q1)[None, :]
            parts.append(trig_series(t, damp, ph))
        # A * P' * cos(P): P' has degree d-1; the product A*P' is a
        # polynomial amplitude of degree (q1-1)+(d1-2)
        if d1 > 1:
            dph = ph[:, 1:] * np.arange(1, d1)[None, :]
            qa = q1 - 1
            qb = d1 - 2
            prod = np.zeros((n, qa + qb + 1))
            for i in range(qa + 1):
                for j in range(qb + 1):
                    prod[:, i + j] += amp[:, i] * dph[:, j]
            ph_shift = ph.copy()
            ph_shift[:, 0] += _pymath.pi / 2.0
            parts.append(trig_series(t, prod, ph_shift))
        if not parts:
            from .core import ZERO

            return (ZERO,)
        out = parts[0]
        for pp in parts[1:]:
            out = out + pp
        return (out,)

    return g


def affine_in_time(e) -> bool:
    """True when ``e`` is (symbolically) c0 + c1*t with c0/c1 free of time
    and state variables — the condition for the Taylor rule's closed form."""
    d = _time_degree(expr(e))
    return d is not None and d <= 1


def _time_degree(e):
    from .core import Number, Param, TimeExpr, Variable

    if isinstance(e, (Number, Param)):
        return 0
    if isinstance(e, TimeExpr):
        return 1
    if isinstance(e, Variable):
        return None
    if isinstance(e, Func):
        degs = [_time_degree(a) for a in e.fargs]
        if e.op == "sum":
            return None if any(d is None for d in degs) else max(degs)
        if e.op in ("mul", "prod"):
            return None if any(d is None for d in degs) else sum(degs)
        if all(d == 0 for d in degs):
            return 0  # time-free subtree
        return None
    return None


def _register(key: str):
    name = _op_name(key)
    if _reg.have_op(name):
        return
    _reg.register(_reg.OpDef(name, 1, _evaluate(key)))
    _diff._GRAD[name] = _grad(key)
    _rec._RULES[name] = _taylor_rule(key)


def _resolver(name: str) -> None:
    # after unpickling, the tables must be re-created by re-building the
    # model expression (same caveat as custom eop/sw datasets)
    return None


_reg.register_resolver(_resolver)
