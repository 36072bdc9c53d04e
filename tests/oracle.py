"""Independent Taylor-coefficient oracle for tests.

Computes the normalized Taylor coefficients of an ODE solution by repeated
*symbolic* total time-derivatives (chain rule through ``heyoka_tpu.diff``) and
plain numeric evaluation — a completely different code path from the jet
engine's per-op recurrences, mirroring how the reference tests check each
op's recurrence against closed forms (``test/taylor_sin.cpp`` etc.).
"""

import math

import numpy as np

from heyoka_tpu.expr.core import TimeExpr, expr
from heyoka_tpu.expr.diff import diff
from heyoka_tpu.cfunc import make_cfunc


def taylor_coeffs_oracle(sys, state0, order, pars=None, t0=0.0):
    """Return array (order+1, n_eq) of normalized Taylor coefficients."""
    xs = [lhs for lhs, _ in sys]
    fs = [expr(rhs) for _, rhs in sys]
    n = len(xs)

    # successive total derivatives of the state: d^k x / dt^k as expressions
    rows = [None] * (order + 1)
    cur = fs  # d^1
    all_exprs = []
    ks = []
    for k in range(1, order + 1):
        all_exprs.extend(cur)
        ks.append(cur)
        if k < order:
            nxt = []
            for g in cur:
                d = sum(
                    (diff(g, x) * f for x, f in zip(xs, fs)), start=expr(0.0)
                )
                d = d + diff_time(g)
                nxt.append(d)
            cur = nxt

    # Evaluate the tape *eagerly* (no jit): oracle tapes can reach 10^4 ops
    # from derivative swell, and XLA compilation of such a one-shot graph
    # costs tens of seconds, while eager evaluation is instant.
    from heyoka_tpu.cfunc import tape_eval

    cf = make_cfunc(all_exprs, vars=xs)
    p = np.zeros((cf.n_pars,)) if pars is None else np.asarray(pars, dtype=float)
    outs = tape_eval(
        cf.tape,
        np.asarray(state0, dtype=float),
        p,
        np.asarray(t0, dtype=float),
    )
    vals = np.asarray([float(v) for v in outs]).reshape(order, n)

    out = np.empty((order + 1, n))
    out[0] = np.asarray(state0, dtype=float)
    for k in range(1, order + 1):
        out[k] = vals[k - 1] / math.factorial(k)
    return out


def diff_time(g):
    return diff_wrt_time(g)


def diff_wrt_time(g):
    # diff() accepts vars/params only; handle explicit time dependence here
    from heyoka_tpu.expr.core import Func, Number, Param, Variable, postorder
    from heyoka_tpu.expr.diff import _GRAD
    from heyoka_tpu.expr.core import prod_expr, sum_expr, ZERO, ONE

    deriv = {}
    for node in postorder(g):
        if isinstance(node, TimeExpr):
            d = ONE
        elif isinstance(node, (Number, Variable, Param)):
            d = ZERO
        else:
            rule = _GRAD[node.op]
            grads = rule(*node.fargs)
            terms = []
            for gr, a in zip(grads, node.fargs):
                da = deriv[id(a)]
                if isinstance(da, Number) and da.value == 0.0:
                    continue
                terms.append(prod_expr((gr, da)))
            d = sum_expr(terms) if terms else ZERO
        deriv[id(node)] = d
    return deriv[id(g)]
