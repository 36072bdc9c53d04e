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

TPU-native delta (round 1): root isolation uses dense sampling of the event
polynomial on a static grid (8*order+1 points) followed by branch-free
bisection — fixed shapes, no host round-trips.  The reference's rigorous
Collins-Akritas sign-change isolation (recursive working list,
``event_detection.cpp:1284-1414``) guarantees even-multiplicity roots are
never missed; the sampled variant can miss tangential roots between grid
points and is tracked for replacement by a vectorized working-list kernel.
"""

from __future__ import annotations

import math as _pymath

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..dfloat import dd_add_d
from .outcome import TaylorOutcome
from . import stepper as _st

#: max roots tracked per event equation per step
MAX_ROOTS = 4
#: bisection iterations (enough for f64 on [0,1])
BISECT_ITERS = 63


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
    S = max(32, 8 * order)  # sample intervals on [0, 1]

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

    s_grid = jnp.linspace(0.0, 1.0, S + 1).astype(dtype)

    def find_roots(gcoeffs, h):
        """Roots of each event polynomial in s = tau/h over [0, 1).

        gcoeffs: (n_events, order+1) ascending coefficients in tau;
        returns (s_roots (n_events, MAX_ROOTS), valid mask, d_sgn in time).
        """
        ne = gcoeffs.shape[0]
        # evaluate on the grid in tau = s*h
        taus = s_grid[None, :] * h  # (1, S+1)
        g = _poly_eval(gcoeffs[:, None, :], taus)  # (ne, S+1)

        sg = jnp.sign(g)
        left, right = sg[:, :-1], sg[:, 1:]
        crossing = (left * right <= 0.0) & ~((left == 0.0) & (right == 0.0))
        # a zero exactly at s=0 counts as a root at tau=0 only if sign
        # actually changes across the first interval; exclude s=1 roots
        # (half-open [0, h))
        idx = jnp.where(
            crossing,
            jnp.arange(S, dtype=jnp.int32)[None, :],
            jnp.int32(S + 1),
        )
        first = jnp.sort(idx, axis=1)[:, :MAX_ROOTS]  # (ne, MAX_ROOTS)
        valid = first <= S - 1

        j = jnp.minimum(first, S - 1)
        lo = jnp.take_along_axis(
            jnp.broadcast_to(s_grid[None, :-1], (ne, S)), j, axis=1
        )
        hi = jnp.take_along_axis(
            jnp.broadcast_to(s_grid[None, 1:], (ne, S)), j, axis=1
        )
        g_lo = jnp.take_along_axis(g[:, :-1], j, axis=1)

        def bisect_body(_, carry):
            lo_, hi_, glo_ = carry
            mid = 0.5 * (lo_ + hi_)
            gm = _poly_eval(gcoeffs[:, None, :], mid * h)
            go_left = glo_ * gm > 0.0
            lo_n = jnp.where(go_left, mid, lo_)
            hi_n = jnp.where(go_left, hi_, mid)
            glo_n = jnp.where(go_left, gm, glo_)
            return lo_n, hi_n, glo_n

        lo_f, hi_f, _ = lax.fori_loop(
            0, BISECT_ITERS, bisect_body, (lo, hi, g_lo)
        )
        s_root = 0.5 * (lo_f + hi_f)

        # direction of the crossing *in time*: sign of g after the root in s,
        # flipped when stepping backward
        g_right = jnp.take_along_axis(g[:, 1:], j, axis=1)
        g_left = jnp.take_along_axis(g[:, :-1], j, axis=1)
        d_sgn_s = jnp.where(g_right != 0.0, jnp.sign(g_right), -jnp.sign(g_left))
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
