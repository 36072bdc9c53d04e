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
import os as _os

import numpy as np

from . import registry as _reg
from .core import Expr, Func, expr
from . import diff as _diff
from ..taylor import recurrences as _rec

#: series data store: key -> dict(amp (n, q+1), ph (n, d+1))
_STORE: dict = {}

#: max Taylor order supported by a single rule trace (safety bound only)
_MAX_K = 64

# -- round-4 two-f32 fast path (VERDICT r3 item 5) ------------------------
#
# The series math dominates ephemeris-driven tapes, and on TPU it used to
# run entirely in emulated f64 (~VPU-f32/15).  The fast path splits each
# series statically by amplitude:
#
# - HEAD terms (|amp| >= HEYOKA_SERIES_SPLIT * max|amp|, ~1-5% of terms)
#   keep the original full-precision path — their error budget is the
#   result's error budget;
# - TAIL terms run in f32 with a double-float (two-f32) phase argument:
#   the phase P(u) (thousands of radians for ephemeris arguments) is
#   evaluated and range-reduced mod 2pi in dd, then sin/cos and the jet
#   recurrence run in plain f32.  A tail term's absolute error is
#   ~order * 2^-24 * |amp| <= K * 6e-8 * SPLIT * max|amp| (~5e-11 of the
#   series magnitude at the default split) — below the reference's own
#   series-truncation thresholds (vsop2013's `thresh`).
#
# The tail jet runs one lax.scan over fixed-size TERM BLOCKS with the
# order recurrence unrolled inside the body: each block's tables are read
# once and all K orders accumulate in registers/VMEM, so the pass is
# compute-bound f32 instead of bandwidth-bound emulated f64.  In-block
# magnitudes are kept in f32 range by an exact per-lane power-of-two
# scale 2^-lam_e of the step variable (same scaled-carry idea as
# taylor/compact_flat): the recurrence computes f_m 2^-m lam_e and the
# requested order is shifted back out lazily, so huge phase rates
# (ELP2000: ~8e4 rad/millennium) never overflow.
_FAST = _os.environ.get("HEYOKA_SERIES_DD", "1") != "0"
_SPLIT = float(_os.environ.get("HEYOKA_SERIES_SPLIT", "1e-4"))
_BLK = int(_os.environ.get("HEYOKA_SERIES_BLK", "1024"))
#: below this many tail terms the split overhead isn't worth it
_TAIL_MIN = 256


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


def _split_store(d):
    """Static head/tail amplitude split, cached on the store entry."""
    if "head" in d:
        return d
    amp, ph = d["amp"], d["ph"]
    a = np.abs(amp).max(axis=1)
    A = float(a.max()) if a.size else 0.0
    hm = a >= _SPLIT * A
    if (~hm).sum() < _TAIL_MIN or not _FAST:
        hm = np.ones_like(hm)
    d["head"] = (amp[hm], ph[hm])
    tm = ~hm
    if tm.any():
        ta, tp = amp[tm], ph[tm]
        n = ta.shape[0]
        pad = (-n) % _BLK
        if pad:
            ta = np.concatenate([ta, np.zeros((pad, ta.shape[1]))])
            tp = np.concatenate([tp, np.zeros((pad, tp.shape[1]))])
        nb = ta.shape[0] // _BLK
        tph = tp.astype(np.float32)
        d["tail"] = {
            "amp32": ta.astype(np.float32).reshape(nb, _BLK, -1),
            "ph_hi": tph.reshape(nb, _BLK, -1),
            "ph_lo": (tp - tph.astype(np.float64)).astype(
                np.float32).reshape(nb, _BLK, -1),
            # tail phase-rate bound for the power-of-two step scale
            "p1max": (float(np.abs(tp[:, 1]).max())
                      if tp.shape[1] > 1 else 0.0),
        }
    else:
        d["tail"] = None
    return d


_TWO_PI = 2.0 * _pymath.pi


def _dd_consts(jnp):
    f32 = np.float32
    tp_h = f32(_TWO_PI)
    tp_l = f32(_TWO_PI - float(tp_h))
    ip_h = f32(1.0 / _TWO_PI)
    ip_l = f32(1.0 / _TWO_PI - float(ip_h))
    return (tp_h, tp_l), (ip_h, ip_l)


def _dd_reduced_phase(jnp, D, phh, phl, u0dd):
    """sin/cos of P(u0) for one table block: dd Horner + mod-2pi
    reduction, f32 trig on the reduced argument with a first-order lo
    correction.

    ``phh/phl`` (blk, d1) static f32 split tables; ``u0dd`` a dd pair of
    lane-shaped arrays.  Returns ``(s0, c0)`` shaped ``lane + (blk,)``.
    """
    d1 = phh.shape[1]
    uh = u0dd[0][..., None]
    ul = u0dd[1][..., None]
    p = (phh[:, -1] + 0.0 * uh, phl[:, -1] + 0.0 * uh)
    for j in range(d1 - 2, -1, -1):
        p = D.mul(p, (uh, ul))
        p = D.add(p, (phh[:, j] + 0.0 * uh, phl[:, j] + 0.0 * uh))
    (tp_h, tp_l), (ip_h, ip_l) = _dd_consts(jnp)
    t = D.mul(p, (jnp.float32(ip_h) + 0.0 * uh, jnp.float32(ip_l) + 0.0 * uh))
    k = jnp.round(t[0])
    r = D.sub(p, D.mul((k, jnp.zeros_like(k)),
                       (jnp.float32(tp_h) + 0.0 * k,
                        jnp.float32(tp_l) + 0.0 * k)))
    sh, ch = jnp.sin(r[0]), jnp.cos(r[0])
    return sh + r[1] * ch, ch - r[1] * sh


def _shift32(jnp, tab, u0h, u1s):
    """f32 per-step shifted tables: coefficients of ``Q(dt) = T(u0 +
    u1s*dt)`` (``u1s`` already carries the power-of-two step scale)."""
    m = tab.shape[1] - 1
    u0p = [None, u0h]
    for _ in range(m - 1):
        u0p.append(u0p[-1] * u0h)
    u1p = [None, u1s]
    for _ in range(m - 1):
        u1p.append(u1p[-1] * u1s)
    out = []
    for j in range(m + 1):
        acc = None
        for r in range(j, m + 1):
            term = jnp.float32(_pymath.comb(r, j)) * tab[:, r]
            if r > j:
                term = term * u0p[r - j]
            acc = term if acc is None else acc + term
        if j > 0:
            acc = acc * u1p[j]
        out.append(acc)
    return out


def _tail_eval32(jnp, D, tail, u):
    """Order-0 tail sum in f32 with dd phases (flat, non-blocked)."""
    nb, blk, d1 = tail["ph_hi"].shape
    phh = jnp.asarray(tail["ph_hi"].reshape(nb * blk, d1))
    phl = jnp.asarray(tail["ph_lo"].reshape(nb * blk, d1))
    a32 = jnp.asarray(tail["amp32"].reshape(nb * blk, -1))
    uh = u.astype(jnp.float32)
    ul = (u - uh.astype(u.dtype)).astype(jnp.float32)
    s0, _ = _dd_reduced_phase(jnp, D, phh, phl, (uh, ul))
    uu = uh[..., None]
    a = a32[:, -1] + 0.0 * uu
    for j in range(a32.shape[1] - 2, -1, -1):
        a = a * uu + a32[:, j]
    return jnp.sum(a * s0, axis=-1)


def _evaluate(key: str):
    def ev(u):
        import jax.numpy as jnp

        d = _split_store(_STORE[key])
        amp, ph = d["head"]
        uj = jnp.asarray(u)
        uu = uj[..., None]  # broadcast over the term axis
        a = jnp.asarray(amp[:, -1]) + 0.0 * uu
        for j in range(amp.shape[1] - 2, -1, -1):
            a = a * uu + jnp.asarray(amp[:, j])
        p = jnp.asarray(ph[:, -1]) + 0.0 * uu
        for j in range(ph.shape[1] - 2, -1, -1):
            p = p * uu + jnp.asarray(ph[:, j])
        res = jnp.sum(a * jnp.sin(p), axis=-1)
        if d["tail"] is not None:
            from ..taylor.pallas_phase import _mk_arith

            _, D = _mk_arith(jnp, barriers=True)
            res = res + _tail_eval32(jnp, D, d["tail"], uj).astype(res.dtype)
        return res

    return ev


def _shifted_tables(jnp, tab, u0, u1):
    """Coefficients of ``Q(dt) = P(u0 + u1*dt)`` per term.

    tab (n, m+1) ascending in u; u0/u1 scalars (tracers under vmap) or
    lane-shaped arrays (the flat engine's (m, B) rows); returns the list
    ``q_j`` (j = 0..m) of ``lane + (n,)`` values:
    ``q_j = sum_{r>=j} C(r, j) p_r u0^(r-j) u1^j``.
    """
    m = tab.shape[1] - 1
    u0e = jnp.asarray(u0)[..., None]  # trailing term axis
    u1e = jnp.asarray(u1)[..., None]
    u0p = [1.0, u0e]
    for _ in range(m - 1):
        u0p.append(u0p[-1] * u0e)
    u1p = [1.0, u1e]
    for _ in range(m - 1):
        u1p.append(u1p[-1] * u1e)
    out = []
    for j in range(m + 1):
        acc = None
        for r in range(j, m + 1):
            term = jnp.asarray(_pymath.comb(r, j) * tab[:, r])
            if r > j:
                term = term * u0p[r - j]
            acc = term if acc is None else acc + term
        if j > 0:
            acc = acc * u1p[j]
        out.append(acc + 0.0 * u0e)  # broadcast j=0/static rows to lane shape
    return out


def _tail_jet32(jnp, D, tail, u0, u1, ncap, lam_e):
    """Tail-series jet: orders ``1..ncap`` of ``sum a(u(t)) sin(P(u(t)))``
    over the tail terms, in f32 with dd phases.

    One ``lax.scan`` over term blocks; the order recurrence is unrolled
    inside the body, so each block's tables stream through VMEM once and
    the per-order coefficients accumulate in registers (compute-bound
    f32, vs the bandwidth-bound per-order pass of the full-precision
    path).  Returns ``(fs, lam_e)`` where ``fs[m-1]`` is
    ``f_m * 2^(-m lam_e)`` in f32 — the caller shifts the requested
    order back out (exact power-of-two scale; keeps the in-scan
    magnitudes finite for huge phase rates like ELP2000's ~8e4
    rad/millennium, where unscaled s_m ~ rate^m/m! overflows f32 at
    m >= 9)."""
    from jax import lax

    from ..taylor.compact_flat import _ldexp2

    f32 = jnp.float32
    amp32 = jnp.asarray(tail["amp32"])  # (nb, blk, q1)
    phh = jnp.asarray(tail["ph_hi"])    # (nb, blk, d1)
    phl = jnp.asarray(tail["ph_lo"])
    dp = phh.shape[2] - 1
    qam = amp32.shape[2] - 1

    u0j = jnp.asarray(u0)
    u1j = jnp.asarray(u1)
    uh = u0j.astype(f32)
    ul = (u0j - uh.astype(u0j.dtype)).astype(f32)
    u1_32 = u1j.astype(f32)

    # lam_e: the shared per-lane power-of-two step scale (computed by the
    # caller over the FULL series' phase-rate bound, so head and tail
    # orders unscale with one shift)
    lam = _ldexp2(jnp, jnp.ones_like(u1_32), -lam_e)
    u1s = u1_32 * lam

    base = uh * 0.0 + u1s * 0.0  # broadcast lane shape
    init = tuple(base for _ in range(ncap))

    def body(acc, tabs):
        a32, ph_, pl_ = tabs
        s0, c0 = _dd_reduced_phase(jnp, D, ph_, pl_, (uh, ul))
        q = _shift32(jnp, ph_, uh[..., None], u1s[..., None])
        a = _shift32(jnp, a32, uh[..., None], u1s[..., None])
        s = [s0]
        c = [c0]
        outs = []
        for m in range(1, ncap + 1):
            sm = jnp.zeros_like(s0)
            cm = jnp.zeros_like(c0)
            for j in range(1, min(m, dp) + 1):
                w = f32(j / m)
                sm = sm + (w * q[j]) * c[m - j]
                cm = cm + (w * q[j]) * s[m - j]
            s.append(sm)
            c.append(-cm)
            fm = None
            for j in range(0, min(m, qam) + 1):
                t = a[j] * s[m - j]
                fm = t if fm is None else fm + t
            outs.append(jnp.sum(fm, axis=-1))
        return tuple(x + y for x, y in zip(acc, outs)), None

    fs, _ = lax.scan(body, init, (amp32, phh, phl))
    return list(fs), lam_e


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

        u0 = G(ins[0], 0)
        u1 = G(ins[0], 1)
        if isinstance(u1, float) and u1 == 0.0:
            return 0.0  # constant input: all higher coefficients vanish
        cache = meta.setdefault("_ts_cache", {})
        return jet_order(jnp, key, u0, u1, k, cache, (id(u0), id(u1)))

    return rule


def jet_order(jnp, key, u0, u1, k, cache, ck):
    """Order-``k`` Taylor coefficient of series ``key`` at the affine
    input ``u(t) = u0 + u1 t`` — head full-precision + f32 tail, with the
    jet built once per trace and cached under ``cache[ck]``.

    Shared by the generic recurrence rule (loops/unrolled engines, which
    key the cache on the traced input ids) and the flat staged engine's
    rule (``compact_flat._f_trigseries``, which keys on the phase dtype —
    its history buffers are rebuilt functionally every order, so ids are
    not stable there)."""
    d = _split_store(_STORE[key])
    amp_t, ph_t = d["head"]
    if k > _MAX_K:  # pragma: no cover
        raise ValueError("trigseries: order too high")
    ent = cache.get(ck)
    if ent is None or len(ent["f"]) < k:
        if ent is None and len(cache) > 4:  # bound growth across traces
            cache.clear()
        # one power-of-two step scale for head and tail, sized from
        # the FULL series' phase-rate bound
        p1full = d.get("p1max_full")
        if p1full is None:
            ph_all = d["ph"]
            p1full = (float(np.abs(ph_all[:, 1]).max())
                      if ph_all.shape[1] > 1 else 0.0)
            d["p1max_full"] = p1full
        ent = _series_jet(jnp, amp_t, ph_t, u0, u1, k, ent, p1max=p1full)
        if d["tail"] is not None:
            # tail orders are recomputed whole at the (chunked) head
            # length — one scan per trace, results cached
            from ..taylor.pallas_phase import _mk_arith

            _, D = _mk_arith(jnp, barriers=True)
            ent["tail_f"] = _tail_jet32(
                jnp, D, d["tail"], u0, u1, len(ent["f"]),
                ent["lam_e"])[0]
        cache[ck] = ent
    out = ent["f"][k - 1]
    if d["tail"] is not None:
        out = out + ent["tail_f"][k - 1].astype(out.dtype)
    from ..taylor.compact_flat import _ldexp2

    return _ldexp2(jnp, out, jnp.int32(k) * ent["lam_e"])


#: orders computed per scan chunk (covers tol=1e-15's order 20 in one go)
_SCAN_CHUNK = 24


def _series_jet(jnp, amp_t, ph_t, u0, u1, k, ent, p1max=None):
    """Orders 1..ceil(k / chunk)*chunk of the series jet via ONE lax.scan
    over orders.

    An eager per-order formulation traces ~60 (n_terms,) vector eqns per
    order; XLA fuses the whole chain into a single cluster whose CPU/TPU
    codegen time explodes (measured 400 s for the ELP2000 tape).  The scan
    compiles its body once; the carry is the (window, n) rolling sin/cos
    history the recurrence needs, plus the per-order amplitude-window
    index bookkeeping, and the stacked outputs are the already
    term-reduced coefficients f_m — tiny.

    The jet is computed in an internally rescaled step variable: ``u1``
    is multiplied by an exact per-lane power of two ``2^-lam_e`` sized
    from ``p1max`` (the series' max |phase rate|), so the in-scan
    sin/cos coefficients ``s_m ~ (rate)^m/m!`` stay bounded — on TPU,
    emulated f64 inherits the f32 exponent range and ELP2000-class rates
    (~8e4 rad/millennium) otherwise overflow at m >= 9.  ``ent["f"]``
    therefore holds ``f_m 2^(-m lam_e)``; callers shift the requested
    order back out (exact), see ``_taylor_rule``.
    """
    from jax import lax

    dph = ph_t.shape[1] - 1
    qam = amp_t.shape[1] - 1
    w = max(dph, qam) + 1

    if ent is None:
        from ..taylor.compact_flat import _ldexp2

        u0j = jnp.asarray(u0)
        u1j = jnp.asarray(u1)
        if p1max is None:
            p1max = float(np.abs(ph_t[:, 1]).max()) if ph_t.shape[1] > 1 \
                else 0.0
        lam_e = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(
            jnp.abs(u1j) * max(p1max, 1e-30), 1.0))), 0.0, 120.0
        ).astype(jnp.int32)
        u1j = u1j * _ldexp2(jnp, jnp.ones_like(u1j), -lam_e)
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
               "swin": swin, "cwin": cwin, "start": 1, "lam_e": lam_e}
    pv, av = ent["pv"], ent["av"]
    swin, cwin, start = ent["swin"], ent["cwin"], ent["start"]
    f = ent["f"]

    n_more = ((k - start) // _SCAN_CHUNK + 1) * _SCAN_CHUNK

    def body(carry, m):
        sw, cw = carry
        mf = m.astype(sw.dtype)
        jv = jnp.arange(1, w + 1, dtype=sw.dtype)
        wts = jnp.where(jv <= jnp.minimum(w * 1.0, mf), jv / mf, 0.0)
        wts = wts.reshape((w,) + (1,) * (pv.ndim - 1))
        # s_m = (1/m) sum_j j p_j c_{m-j}; rows of cw are c_{m-1}, c_{m-2}..
        s_m = jnp.sum(wts * pv * cw, axis=0)
        c_m = -jnp.sum(wts * pv * sw, axis=0)
        sw = jnp.roll(sw, 1, axis=0).at[0].set(s_m)
        cw = jnp.roll(cw, 1, axis=0).at[0].set(c_m)
        # f_m = sum_{j<=qam} a_j s_{m-j}: s_{m} is row 0 after the roll
        f_m = jnp.sum(jnp.sum(av * sw[:w], axis=0), axis=-1)
        return (sw, cw), f_m

    ms = jnp.arange(start, start + n_more)
    (swin, cwin), fs = lax.scan(body, (swin, cwin), ms)
    f = f + [fs[i] for i in range(n_more)]
    return {"refs": ent["refs"], "pv": pv, "av": av, "f": f,
            "swin": swin, "cwin": cwin, "start": start + n_more,
            "lam_e": ent["lam_e"]}


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


def mp_order_cap(tape, limit: float = 1e37):
    """Largest safe ``mp_order`` for a tape containing series ops on an
    emulated-f64 backend (TPU), or ``None`` if the tape has none.

    The f64 phase materializes true coefficients ``c_m ~ A rate^m/m!``;
    on TPU emulated f64 inherits the f32 exponent range, so ``mp_order``
    must stop before ``c_m`` crosses ~1e38.  Assumes the series input's
    time rate is ~1 in tape units (the ephemeris factories' convention).
    """
    cap = None
    for op in getattr(tape, "ops", []):
        name = getattr(op, "op", "")
        if not name.startswith("trigseries%"):
            continue
        d = _STORE.get(name.split("%", 1)[1])
        if d is None:
            continue
        A = float(np.abs(d["amp"]).max()) if d["amp"].size else 0.0
        rate = (float(np.abs(d["ph"][:, 1]).max())
                if d["ph"].shape[1] > 1 else 0.0)
        if A <= 0.0 or rate <= 1.0:
            continue
        m, c = 0, A
        while m < 64 and c * rate / (m + 1) < limit:
            m += 1
            c = c * rate / m
        cap = m if cap is None else min(cap, m)
    return cap


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
