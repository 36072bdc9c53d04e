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
            return _refine(cs_, rlo_, rhi_, valid_)

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

    def _refine(cs, rlo, rhi, valid):
        """Bisection + Newton refinement, duplicate-root merging and
        crossing-direction extraction on the isolating intervals."""

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
        for i in range(1, MAX_ROOTS):
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
