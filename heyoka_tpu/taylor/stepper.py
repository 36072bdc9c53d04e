"""Adaptive step assembly: timestep control + state update + dense output.

Reference parity: heyoka ``src/taylor_00.cpp`` —
- ``taylor_determine_h`` (:``taylor_00.cpp:102-273``): Jorba's rho
  prescription with the ``exp(-0.7/(order-1))/e^2`` scaling+safety factor and
  the absolute/relative tolerance-mode switch on the state infinity norm;
- ``taylor_run_multihorner`` (``:279``) / ``taylor_run_ceval`` (``:355``):
  Horner evaluation of the Taylor polynomials, or compensated-summation
  monomial evaluation in ``high_accuracy`` mode;
- ``taylor_order_from_tol`` (``detail/taylor_common.hpp:165-191``).

All functions are pure jnp over the jet output ``tc[order+1, n]``; under
``vmap`` they become per-lane (the batch-mode per-lane h of
``taylor_adaptive_batch``, ``src/taylor_adaptive_batch.cpp``).
"""

from __future__ import annotations

import math as _pymath

import jax.numpy as jnp


def taylor_order_from_tol(tol: float) -> int:
    """order = max(2, ceil(-log(tol)/2 + 1)) (Jorba; ``taylor_common.hpp:165``)."""
    tol = float(tol)
    if not (tol > 0.0) or not _pymath.isfinite(tol):
        raise ValueError("the tolerance must be a positive finite number")
    order_f = _pymath.ceil(-_pymath.log(tol) / 2.0 + 1.0)
    return int(max(2, order_f))


def determine_h(tc, order: int, n_eq: int, max_delta_t):
    """Adaptive timestep from the jet, Jorba's prescription.

    ``tc``: (order+1, >= n_eq) normalized Taylor coefficients; columns beyond
    the state variables (sv_funcs) participate in the norms exactly like the
    reference (``taylor_00.cpp:168-190``).  ``max_delta_t`` may be signed;
    a negative value propagates backward.  Returns the signed h.
    """
    abs_tc = jnp.abs(tc)
    max_abs_state = jnp.max(abs_tc[0])
    max_abs_diff_o = jnp.max(abs_tc[order])
    max_abs_diff_om1 = jnp.max(abs_tc[order - 1])

    dtype = tc.dtype
    one = jnp.asarray(1.0, dtype)

    # absolute vs relative error control on the state norm
    num_rho = jnp.where(max_abs_state <= one, one, max_abs_state)

    rho_o = (num_rho / max_abs_diff_o) ** (1.0 / order)
    rho_om1 = (num_rho / max_abs_diff_om1) ** (1.0 / (order - 1))
    rho_m = jnp.minimum(rho_o, rho_om1)

    # scaling + safety factor: exp(-7/10 / (order-1)) / e^2
    rhofac = _pymath.exp(-0.7 / (order - 1)) / (_pymath.e * _pymath.e)
    h = rho_m * jnp.asarray(rhofac, dtype)

    # clamp to |max_delta_t|, carry its sign (backward integration)
    max_h = jnp.asarray(max_delta_t, dtype)
    h = jnp.minimum(h, jnp.abs(max_h))
    h = jnp.where(max_h < 0.0, -h, h)
    return h


def horner_update(tc, h, order: int, n_eq: int):
    """New state via Horner evaluation of the Taylor polynomials
    (``taylor_run_multihorner``, ``taylor_00.cpp:279``)."""
    res = tc[order, :n_eq]
    for i in range(1, order + 1):
        res = tc[order - i, :n_eq] + res * h
    return res


def ceval_update(tc, h, order: int, n_eq: int):
    """New state via compensated-summation monomial evaluation — the
    ``high_accuracy`` mode (``taylor_run_ceval``, ``taylor_00.cpp:355``)."""
    res = tc[0, :n_eq]
    comp = jnp.zeros_like(res)
    cur_h = h
    for i in range(1, order + 1):
        tmp = tc[i, :n_eq] * cur_h
        y = tmp - comp
        t = res + y
        comp = (t - res) - y
        res = t
        if i < order:
            cur_h = cur_h * h
    return res


def dense_output(tc, h_rel, order: int):
    """Evaluate the Taylor polynomials of the last step at relative time
    ``h_rel`` from the step's start (``taylor_add_d_out_function``,
    ``src/taylor_01.cpp:1015``).  Works on all tc columns."""
    res = tc[order]
    for i in range(1, order + 1):
        res = tc[order - i] + res * h_rel
    return res
