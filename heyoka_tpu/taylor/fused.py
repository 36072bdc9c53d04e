"""Fused adaptive propagation: the whole ``propagate_until`` stepping
loop rides the multi-step Pallas kernel.

Reference parity: ``taylor_adaptive_batch::propagate_until``
(``taylor_01.cpp``, ``propagate_until_impl``) — but instead of one
device dispatch per adaptive step (the XLA stepper of
``compact_flat.make_propagate_until_flat``), the driver here calls
:func:`..taylor.pallas_phase.make_dd_prop_kernel`, which takes up to
``chunk_steps`` whole adaptive steps per lane per kernel launch: the dd
order 0, the Taylor jet, the step-size control and the double-float
Horner state update never leave VMEM.  The XLA side only merges
statistics, folds the kernel's double-float time accumulator into the
f64 dd clock and refreshes the remaining-time rows between launches.

Lane landing stays *exact*: the kernel freezes a lane when its natural
step would reach the target (see the lane protocol in
``pallas_phase.make_dd_prop_kernel``), and the final step(s) of every
lane run through the plain f64 stepper (`_pu_while`) — so the terminal
``t`` equals the target bit-for-bit and the last step's Taylor
coefficients / outcomes match the unfused driver's semantics.

Semantics deltas vs the unfused driver (documented, PERF.md):

- step sizes are selected in f32 (vs emulated f64): each lane walks a
  slightly different — equally valid — adaptive step sequence;
- ``min_h``/``max_h``/``last_h`` for in-kernel steps are f32 values;
- a state magnitude beyond f32 range (~3.4e38) freezes the lane's
  kernel phase; the f64 landing loop then continues it (slower) or
  produces the reference ``err_nf_state`` outcome.
"""

from __future__ import annotations

import math as _pymath
import os as _os

import numpy as np

from ..expr.decompose import Tape
from .compact import build_plan
from .compact_flat import make_batched_step_flat, _pu_while
from .stepper import taylor_order_from_tol  # noqa: F401  (re-export)


def make_propagate_until_fused(tape: Tape, order: int, *, dtype=None,
                               high_accuracy: bool = True,
                               mp_order: int = 8,
                               pallas_phase="dd",
                               chunk_steps: int = 64):
    """Build the fused ``pu(state, pars, t_hi, t_lo, target_hi,
    target_lo, max_delta_t, max_steps) -> dict`` driver (same signature
    and result fields as :func:`compact_flat.make_propagate_until_flat`).

    Requires an autonomous tape whose ops all have in-kernel dd rules
    (``pallas_phase.prop_supported``); raises ``UnsupportedPallasOp``
    otherwise so callers can fall back to the unfused driver.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..dfloat import dd_add_d, dd_add_dd
    from .pallas_phase import make_dd_prop_kernel

    if dtype is None:
        dtype = jnp.float64
    f32 = jnp.float32
    K = order
    interp = pallas_phase in ("dd-interpret", "interpret", True)

    plan = build_plan(tape, order)
    n_eq = tape.n_eq
    W = plan.width

    _bt_env = _os.environ.get("HEYOKA_PALLAS_BT")
    if _bt_env is not None:
        bt = int(_bt_env)
    else:
        # huge tapes shrink the batch tile to fit the (W, K+1) VMEM
        # scratch; margin covers the prop kernel's extra carries
        from .pallas_phase import auto_bt

        bt = auto_bt(plan, mp_order, K, None, 128, margin=0.85)

    # exact landing phase: the single-step engine with the configured
    # Pallas phase (usually already compiled for step()/propagate_grid)
    land_step = make_batched_step_flat(
        tape, order, dtype=dtype, high_accuracy=high_accuracy,
        mp_order=mp_order, layout="3d", unroll=True, staged=True,
        return_tc="scaled", pallas_phase=pallas_phase,
    )

    _kern_cache: dict = {}

    def _get_kernel(B):
        Bp = B if B <= bt else ((B + bt - 1) // bt) * bt
        fn = _kern_cache.get(Bp)
        if fn is None:
            fn = make_dd_prop_kernel(plan, mp_order, K, Bp, chunk_steps,
                                     bt=bt, interpret=interp)
            _kern_cache[Bp] = fn
        return fn, Bp

    # validation build (fail at construction, like the other engines)
    _get_kernel(bt)

    ibig = np.int32(2**31 - 1)

    def pu(state, pars, t_hi, t_lo, target_hi, target_lo, max_delta_t,
           max_steps):
        B = state.shape[0]
        kernel, Bp = _get_kernel(B)
        pad = Bp - B

        rem0, _ = dd_add_dd(target_hi, target_lo, -t_hi, -t_lo)
        fwd = rem0 > 0.0
        dirv = jnp.where(fwd, 1.0, -1.0).astype(f32)

        # f32 step cap, rounded *down* so in-kernel steps never exceed
        # the caller's f64 bound
        mdt32 = max_delta_t.astype(f32)
        mdt32 = jnp.where(mdt32.astype(dtype) > max_delta_t,
                          jnp.nextafter(mdt32, f32(0.0)), mdt32)

        # static seed rows: const / par order-0 values as dd f32 pairs
        # (state rows are refreshed from the carried dd state each chunk)
        seed_hi0 = jnp.zeros((W, Bp), f32)
        seed_lo0 = jnp.zeros((W, Bp), f32)
        for ci, cv in plan.const_cols:
            chi = np.float32(cv)
            seed_hi0 = lax.dynamic_update_slice(
                seed_hi0, jnp.full((1, Bp), chi, f32), (ci, 0))
            seed_lo0 = lax.dynamic_update_slice(
                seed_lo0, jnp.full((1, Bp), np.float32(float(cv) - float(chi)),
                                   f32), (ci, 0))
        for pi, pj in plan.par_cols:
            pv = pars[:, pj]
            if pad:
                pv = jnp.concatenate([pv, jnp.ones((pad,), dtype)])
            ph = pv.astype(f32)
            seed_hi0 = lax.dynamic_update_slice(seed_hi0, ph[None, :], (pi, 0))
            seed_lo0 = lax.dynamic_update_slice(
                seed_lo0, (pv - ph.astype(dtype)).astype(f32)[None, :], (pi, 0))

        sh0 = state.T.astype(f32)
        sl0 = (state.T - sh0.astype(dtype)).astype(f32)
        if pad:
            sh0 = jnp.pad(sh0, ((0, 0), (0, pad)), constant_values=1.0)
            sl0 = jnp.pad(sl0, ((0, 0), (0, pad)))

        def _pad_row(x, cval=0.0):
            return (jnp.concatenate([x, jnp.full((pad,), cval, x.dtype)])
                    if pad else x)

        zero = jnp.zeros((B,), dtype)
        init = dict(
            sh=lax.dynamic_update_slice(seed_hi0, sh0, (0, 0)),
            sl=lax.dynamic_update_slice(seed_lo0, sl0, (0, 0)),
            t_hi=t_hi, t_lo=t_lo,
            nsteps=jnp.zeros((B,), jnp.int64),
            min_h=jnp.full((B,), jnp.inf, dtype),
            max_h=zero, last_h=zero,
            near=jnp.zeros((B,), bool),
            err=jnp.zeros((B,), bool),
            act=rem0 != 0.0,
        )

        def cond(c):
            return jnp.any(c["act"])

        def body(c):
            rh64, rl64 = dd_add_dd(target_hi, target_lo,
                                   -c["t_hi"], -c["t_lo"])
            # remaining time in the direction of travel (positive), as a
            # double-float f32 pair
            sgn = jnp.where(fwd, 1.0, -1.0)
            rh64, rl64 = rh64 * sgn, rl64 * sgn
            r32h = rh64.astype(f32)
            r32l = ((rh64 - r32h.astype(dtype)) + rl64).astype(f32)

            left = jnp.where(
                max_steps > 0,
                jnp.clip(max_steps - 1 - c["nsteps"], 0, int(ibig)),
                jnp.int64(int(ibig)),
            ).astype(jnp.int32)

            aux = jnp.stack([
                _pad_row(mdt32), _pad_row(dirv), _pad_row(r32h),
                _pad_row(r32l),
                _pad_row(c["act"].astype(f32)),
            ])
            auxi = _pad_row(left)[None, :]

            osh, osl, of, oi = kernel(c["sh"], c["sl"], aux, auxi)
            of = of[:, :B]
            oi = oi[:, :B]

            ns = oi[0].astype(jnp.int64)
            took = ns > 0
            dh = of[0].astype(dtype) + of[1].astype(dtype)
            nt_hi, nt_lo = dd_add_d(c["t_hi"], c["t_lo"], dh)
            near = c["near"] | (oi[1] > 0)
            err = c["err"] | (oi[2] > 0)
            nsteps = c["nsteps"] + ns
            left_after = jnp.where(max_steps > 0,
                                   max_steps - 1 - nsteps,
                                   jnp.int64(int(ibig)))
            return dict(
                sh=lax.dynamic_update_slice(c["sh"], osh, (0, 0)),
                sl=lax.dynamic_update_slice(c["sl"], osl, (0, 0)),
                t_hi=nt_hi, t_lo=nt_lo,
                nsteps=nsteps,
                min_h=jnp.minimum(c["min_h"], of[2].astype(dtype)),
                max_h=jnp.maximum(c["max_h"], of[3].astype(dtype)),
                last_h=jnp.where(took, of[4].astype(dtype), c["last_h"]),
                near=near, err=err,
                act=c["act"] & ~near & ~err & (left_after > 0),
            )

        c = lax.while_loop(cond, body, init)

        # exact f64 landing through the plain stepper: every lane that
        # stepped in-kernel still has |remaining| > 0 here
        st_k = (c["sh"][0:n_eq, :B].astype(dtype)
                + c["sl"][0:n_eq, :B].astype(dtype)).T
        stepped = c["nsteps"] > 0
        st_land = jnp.where(stepped[:, None], st_k, state)
        rem_l, _ = dd_add_dd(target_hi, target_lo, -c["t_hi"], -c["t_lo"])
        from .outcome import TaylorOutcome
        land_init = dict(
            state=st_land,
            t_hi=c["t_hi"], t_lo=c["t_lo"],
            last_h=c["last_h"],
            tc=jnp.zeros((B, order + 1, n_eq), dtype),
            tc_sige=jnp.zeros((B,), jnp.int32),
            sig_hint=jnp.full((B,), jnp.int32(32767)),
            nsteps=c["nsteps"],
            min_h=c["min_h"], max_h=c["max_h"],
            outcome=jnp.full((B,), jnp.int32(TaylorOutcome.time_limit)),
            done=rem_l == 0.0,
        )
        return _pu_while(land_step, pars, target_hi, target_lo,
                         max_delta_t, max_steps, fwd, land_init)

    return pu
