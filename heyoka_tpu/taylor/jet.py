"""Jet engine: normalized Taylor coefficients of the state as one XLA graph.

Reference parity: heyoka ``taylor_compute_jet`` (``src/taylor_02.cpp:1306``) in
its *non-compact* form — the recurrences are unrolled at trace time into a
single jaxpr (the analog of heyoka's straight-line LLVM IR), so that each
convolution has its exact static length and XLA fuses the whole order
recursion.  The compact-mode analog (index-table-driven scan / Pallas kernel,
``taylor_02.cpp:1194``) is a separate engine for very large tapes.

Layout: scalar-state in, ``tc[order+1, n_eq (+ n_outputs)]`` out.  Batch mode
is ``jax.vmap`` over this function (the batch axis lands innermost, giving the
batch-major layout that heyoka achieves with SIMD vectors).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..expr.decompose import Tape
from ..expr import registry as _reg
from . import recurrences as _rec


def make_jet_fn(tape: Tape, order: int, *, dtype=jnp.float64):
    """Build ``jet(state, pars, t) -> tc`` for an ODE tape.

    ``tc`` has shape ``(order+1, n_eq + len(tape.outputs))``: normalized
    Taylor coefficients of every state variable (and of each extra output
    expression — heyoka's sv_funcs) at orders ``0..order``.

    Matching heyoka (``taylor_02.cpp:1045``), the final order of non-state
    u-variables is only computed when extra outputs require it.
    """
    if tape.rhs is None:
        raise ValueError("make_jet_fn requires an ODE tape (with rhs)")
    n_eq = tape.n_eq
    n_ops = len(tape.ops)
    order = int(order)
    assert order >= 1

    has_outputs = len(tape.outputs) > 0
    # output operands that are plain state variables need no op evaluation
    out_needs_ops = any(
        (o[0] == "u" and o[1] >= n_eq) for o in tape.outputs
    )

    def jet(state, pars, t):
        # coeffs[i][k]: order-k coefficient of u-var i; entries are traced jnp
        # scalars or literal Python 0.0 (propagated through the recurrences).
        coeffs = [[None] * (order + 1) for _ in range(tape.n_uvars)]

        def G(operand, j):
            kind = operand[0]
            if kind == "c":
                return operand[1] if j == 0 else 0.0
            if kind == "p":
                return pars[operand[1]] if j == 0 else 0.0
            if kind == "t":
                # the independent variable: t, 1, 0, 0, ...
                if j == 0:
                    return t
                return 1.0 if j == 1 else 0.0
            v = coeffs[operand[1]][j]
            assert v is not None, (operand, j)
            return v

        def U(i, j):
            v = coeffs[i][j]
            assert v is not None, (i, j)
            return v

        # ---- order 0: plain evaluation of the tape ----
        for i in range(n_eq):
            coeffs[i][0] = state[i]
        for oi, op in enumerate(tape.ops):
            vals = [G(b, 0) for b in op.inputs]
            if op.op == "mul":
                res = vals[0] * vals[1]
            elif op.op == "pow":
                res = _pow0(vals[0], op.meta["alpha"])
            elif op.op in ("asin", "acos", "atan", "asinh", "acosh", "atanh", "erf"):
                # aux operand participates only in the recurrence
                res = _reg.opdef(op.op).evaluate(vals[0])
            elif op.op == "atan2":
                res = _reg.opdef(op.op).evaluate(vals[0], vals[1])
            else:
                res = _reg.opdef(op.op).evaluate(*vals)
            coeffs[n_eq + oi][0] = res

        # ---- orders 1..p ----
        for k in range(1, order + 1):
            # state variables: x_i,k = rhs_i,(k-1) / k
            inv_k = 1.0 / float(k)
            for i in range(n_eq):
                r = G(tape.rhs[i], k - 1)
                coeffs[i][k] = 0.0 if _rec._is_zero(r) else r * inv_k
            # op u-vars; at the final order only when outputs need them
            # (heyoka skips them too, taylor_02.cpp)
            if k < order or out_needs_ops:
                for oi, op in enumerate(tape.ops):
                    idx = n_eq + oi
                    coeffs[idx][k] = _rec.get_rule(op.op)(
                        k, op.inputs, op.meta, G, U, idx
                    )

        # ---- pack result ----
        cols = list(range(n_eq))
        rows = []
        for k in range(order + 1):
            vals = [coeffs[i][k] for i in cols]
            if has_outputs:
                vals += [G(o, k) for o in tape.outputs]
            rows.append(
                jnp.stack([jnp.asarray(v, dtype=dtype) for v in vals])
            )
        return jnp.stack(rows)

    return jet


def _pow0(b, alpha: float):
    # negative-exponent powers occur constantly in gravitational dynamics
    # (r^-3/2 etc.); x ** a with non-integer a lowers to exp(log) in XLA
    # anyway, but rsqrt-expressible cases get dedicated fast paths.
    if alpha == -1.0:
        return 1.0 / b
    if alpha == 0.5:
        return jnp.sqrt(b)
    if alpha == -0.5:
        return 1.0 / jnp.sqrt(b)
    if alpha == -1.5:
        r = 1.0 / jnp.sqrt(b)
        return r * r * r
    if alpha == 1.5:
        return b * jnp.sqrt(b)
    if alpha == float(int(alpha)) and abs(alpha) <= 512:
        # any integer exponent via squaring: jnp.power lowers through
        # exp/log on TPU, where negative bases produce NaN (PERF.md)
        n = int(alpha)
        x = b if n > 0 else 1.0 / b
        n = abs(n)
        if n == 0:
            return jnp.ones_like(b)
        r = None
        while n:
            if n & 1:
                r = x if r is None else r * x
            n >>= 1
            if n:
                x = x * x
        return r
    return jnp.power(b, alpha)
