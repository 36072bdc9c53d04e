"""Decomposition of expressions into an SSA tape of elementary operations.

Reference parity: heyoka's ``taylor_decompose_sys`` (``src/taylor_01.cpp:847``)
and ``function_decompose`` (``src/expression_cfunc.cpp:723``): flatten the
expression DAG into "u-variables" (one per elementary op), CSE, topological
sort, splitting of n-ary products into binary ones, and emission of auxiliary
u-variables needed by Taylor recurrences (e.g. the cos companion of every sin,
tan's square, the sqrt auxiliaries of the inverse trig functions — the
per-op ``taylor_decompose()`` hooks of ``src/math/*.cpp``).

TPU-first deltas from the reference:
- sums stay n-ary (the arity-8 split of ``expression.hpp:593-597`` exists for
  heyoka's compact-mode codegen; XLA has no such constraint),
- numbers are kept inline as operands instead of being promoted to params
  (``taylor_01.cpp:788`` promotes for SIMD-batch uniformity; under ``vmap``
  constants broadcast for free),
- CSE is hash-consing at emission time (keyed on (op, operands)), which is
  equivalent to the reference's separate CSE pass (``taylor_01.cpp:315``).

The tape is topologically sorted by construction: an op's operands always have
smaller u-indices, except for documented intra-order auxiliaries (tan's square
uses its own tan at equal order; see recurrences.py for why this is sound).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field
from typing import Iterable, Sequence

from .core import (
    Expr,
    Func,
    Number,
    Param,
    TimeExpr,
    Variable,
    expr,
    postorder,
)

# Operand encodings: ('u', i) tape slot, ('c', value) literal,
# ('p', j) runtime parameter, ('t',) the independent variable.
Operand = tuple


@dataclass
class TapeOp:
    op: str
    inputs: tuple
    meta: dict = field(default_factory=dict)

    def __repr__(self):
        m = f" {self.meta}" if self.meta else ""
        return f"{self.op}{self.inputs!r}{m}"


@dataclass
class Tape:
    """A decomposed function/ODE system.

    u-variables ``0..n_eq-1`` are the state variables; u-variable ``n_eq + i``
    is defined by ``ops[i]``.  ``rhs`` (ODE tapes only) gives, per state
    variable, the operand holding its time derivative.  ``outputs`` gives the
    operands of the requested output expressions (cfunc outputs or sv_funcs).
    """

    n_eq: int
    ops: list
    rhs: list | None
    outputs: list
    n_pars: int
    var_names: list

    @property
    def n_uvars(self) -> int:
        return self.n_eq + len(self.ops)


class _Builder:
    def __init__(self, var_names: Sequence[str], for_taylor: bool):
        self.var_names = list(var_names)
        self.var_idx = {n: i for i, n in enumerate(self.var_names)}
        self.for_taylor = for_taylor
        self.ops: list[TapeOp] = []
        self.cse: dict[tuple, Operand] = {}
        self.n_pars = 0
        self._expr_memo: dict[int, Operand] = {}
        # keep every memo key alive: the memo is id()-keyed, and auxiliary
        # expressions built during emission are temporaries — without a
        # strong reference, a freed node's address can be reused by a new
        # allocation and hit a stale entry
        self._memo_keepalive: list[Expr] = []

    def new_u(self, op: TapeOp) -> Operand:
        self.ops.append(op)
        return ("u", len(self.var_names) + len(self.ops) - 1)

    def emit_op(self, name: str, inputs: tuple, key_extra=()) -> Operand:
        key = (name, inputs) + tuple(key_extra)
        hit = self.cse.get(key)
        if hit is not None:
            return hit
        res = self.new_u(TapeOp(name, inputs))
        self.cse[key] = res
        return res

    def op_of(self, operand: Operand) -> TapeOp | None:
        kind, *rest = operand
        if kind != "u" or rest[0] < len(self.var_names):
            return None
        return self.ops[rest[0] - len(self.var_names)]

    # -- expression emission -------------------------------------------------

    def emit(self, e: Expr) -> Operand:
        memo_hit = self._expr_memo.get(id(e))
        if memo_hit is not None:
            return memo_hit
        res = self._emit_impl(e)
        self._expr_memo[id(e)] = res
        self._memo_keepalive.append(e)
        return res

    def _emit_impl(self, e: Expr) -> Operand:
        if isinstance(e, Number):
            return ("c", e.value)
        if isinstance(e, Param):
            self.n_pars = max(self.n_pars, e.idx + 1)
            return ("p", e.idx)
        if isinstance(e, TimeExpr):
            return ("t",)
        if isinstance(e, Variable):
            try:
                return ("u", self.var_idx[e.name])
            except KeyError:
                raise ValueError(
                    f"variable {e.name!r} appears in a right-hand side but is "
                    f"not among the state variables {self.var_names!r}"
                ) from None
        assert isinstance(e, Func)
        return self._emit_func(e)

    def _emit_func(self, e: Func) -> Operand:
        name = e.op
        ins = tuple(self.emit(a) for a in e.fargs)

        if name == "prod":
            return self._emit_prod(ins)
        if name == "pow":
            # exponent is guaranteed Number by operator normalization
            alpha = e.fargs[1]
            assert isinstance(alpha, Number)
            return self._emit_pow(ins[0], alpha.value)
        if name in ("sin", "cos") and self.for_taylor:
            return self._emit_sincos(name, ins[0])
        if name in ("sinh", "cosh") and self.for_taylor:
            return self._emit_sinhcosh(name, ins[0])
        if name in ("tan", "tanh", "sigmoid") and self.for_taylor:
            return self._emit_with_square(name, ins[0])
        if name in ("asin", "acos", "atan", "asinh", "acosh", "atanh", "erf") and self.for_taylor:
            return self._emit_inverse(name, e.fargs[0], ins[0])
        if name == "atan2" and self.for_taylor:
            return self._emit_atan2(e.fargs, ins)
        if name in ("kepE", "kepF", "kepDE") and self.for_taylor:
            return self._emit_kepler(name, ins)

        return self.emit_op(name, ins)

    def _emit_prod(self, ins: tuple) -> Operand:
        # split n-ary products into a balanced tree of binary products:
        # the Taylor recurrence of a product is a Cauchy convolution, which
        # is defined for binary factors (reference splits too,
        # expression_diff.cpp:380-383 / prod decomposition).
        ins = list(ins)
        if len(ins) == 1:
            return ins[0]
        while len(ins) > 1:
            nxt = []
            for i in range(0, len(ins) - 1, 2):
                nxt.append(self.emit_op("mul", (ins[i], ins[i + 1])))
            if len(ins) % 2:
                nxt.append(ins[-1])
            ins = nxt
        return ins[0]

    def _emit_pow(self, b: Operand, alpha: float) -> Operand:
        if alpha == 0.5:
            return self.emit_op("sqrt", (b,))
        res = self.emit_op("pow", (b,), key_extra=(alpha,))
        self.op_of(res).meta["alpha"] = alpha
        return res

    def _emit_sincos(self, name: str, b: Operand) -> Operand:
        # sin and cos are computed as a coupled pair (reference: sin's
        # taylor_decompose appends the cos companion, src/math/sincos.cpp)
        s = self.emit_op("sin", (b,))
        c = self.emit_op("cos", (b,))
        self.op_of(s).meta["pair"] = c[1]
        self.op_of(c).meta["pair"] = s[1]
        return s if name == "sin" else c

    def _emit_sinhcosh(self, name: str, b: Operand) -> Operand:
        s = self.emit_op("sinh", (b,))
        c = self.emit_op("cosh", (b,))
        self.op_of(s).meta["pair"] = c[1]
        self.op_of(c).meta["pair"] = s[1]
        return s if name == "sinh" else c

    def _emit_with_square(self, name: str, b: Operand) -> Operand:
        # tan/tanh/sigmoid carry their own square/product auxiliary
        # (reference: tan's taylor_decompose adds tan^2, src/math/tan.cpp).
        # NOTE: the auxiliary comes *after* the op in the tape — its order-k
        # coefficient uses the op's order-k coefficient, which is fine because
        # the jet engine processes ops in tape order within each order.
        t = self.emit_op(name, (b,))
        if name == "sigmoid":
            # aux = sigmoid * sigmoid (for s' = (s - s^2) b')
            q = self.emit_op("mul", (t, t))
        else:
            q = self.emit_op("mul", (t, t))
        self.op_of(t).meta["sq"] = q[1]
        return t

    def _emit_inverse(self, name: str, barg: Expr, b: Operand) -> Operand:
        # inverse trig/hyperbolic + erf: recurrence divides by an auxiliary
        # expression c(b) (reference: per-op taylor_decompose hooks):
        #   asin : c = sqrt(1 - b^2)      acos : same
        #   atan : c = 1 + b^2            atanh: c = 1 - b^2
        #   asinh: c = sqrt(1 + b^2)      acosh: c = sqrt(b^2 - 1)
        #   erf  : c = exp(-b^2)
        from . import math as hm

        if name in ("asin", "acos"):
            aux = hm.sqrt(1.0 - barg * barg)
        elif name == "atan":
            aux = 1.0 + barg * barg
        elif name == "atanh":
            aux = 1.0 - barg * barg
        elif name == "asinh":
            aux = hm.sqrt(1.0 + barg * barg)
        elif name == "acosh":
            aux = hm.sqrt(barg * barg - 1.0)
        else:  # erf
            aux = hm.exp(-(barg * barg))
        c = self.emit(aux)
        res = self.emit_op(name, (b, c))
        return res

    def _emit_atan2(self, fargs, ins) -> Operand:
        from . import math as hm

        y, x = fargs
        d = self.emit(x * x + y * y)
        return self.emit_op("atan2", (ins[0], ins[1], d))

    def _emit_kepler(self, name: str, ins: tuple) -> Operand:
        # kepE/kepF/kepDE carry sin/cos-of-solution auxiliaries; the solution
        # op comes first, its trig companions after (same intra-order
        # discipline as tan's square).
        res = self.emit_op(name, ins)
        s = self.emit_op("sin", (res,))
        c = self.emit_op("cos", (res,))
        self.op_of(s).meta["pair"] = c[1]
        self.op_of(c).meta["pair"] = s[1]
        self.op_of(res).meta["sin"] = s[1]
        self.op_of(res).meta["cos"] = c[1]
        return res


def _run(builder_fn):
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 100_000))
    try:
        return builder_fn()
    finally:
        sys.setrecursionlimit(old)


def taylor_decompose_sys(
    sys_: Sequence, extra_outputs: Iterable = ()
) -> Tape:
    """Decompose an ODE system for Taylor integration.

    ``sys_`` is a sequence of ``(Variable | str, Expr)`` pairs — the analog of
    heyoka's ``{prime(x) = rhs, ...}`` (``taylor.hpp:138-139``,
    ``src/taylor_01.cpp:847-1013``).  ``extra_outputs`` are additional
    expressions of the state (event equations / sv_funcs).
    """

    names = []
    rhss = []
    for lhs, rhs in sys_:
        if isinstance(lhs, Variable):
            names.append(lhs.name)
        elif isinstance(lhs, str):
            names.append(lhs)
        else:
            raise TypeError("system lhs must be a Variable or a variable name")
        rhss.append(expr(rhs))
    if len(set(names)) != len(names):
        raise ValueError("duplicate state variables in ODE system")

    # validate: rhs variables must be state variables
    state_set = set(names)
    for r in rhss:
        for node in postorder(r):
            if isinstance(node, Variable) and node.name not in state_set:
                raise ValueError(
                    f"variable {node.name!r} appears in the right-hand side "
                    "but is not a state variable"
                )

    def build():
        b = _Builder(names, for_taylor=True)
        rhs_ops = [b.emit(r) for r in rhss]
        outs = [b.emit(expr(o)) for o in extra_outputs]
        return Tape(
            n_eq=len(names),
            ops=b.ops,
            rhs=rhs_ops,
            outputs=outs,
            n_pars=b.n_pars,
            var_names=names,
        )

    return _run(build)


def function_decompose(fns: Sequence, vars_: Sequence | None = None) -> Tape:
    """Decompose a vector function for compiled-function evaluation.

    The analog of heyoka ``function_decompose`` (``expression_cfunc.cpp:723``).
    ``vars_`` fixes the input ordering; defaults to the sorted union of
    variables in ``fns``.
    """
    from .core import get_variables

    fns = [expr(f) for f in fns]
    if vars_ is None:
        names = get_variables(fns)
    else:
        names = [v.name if isinstance(v, Variable) else str(v) for v in vars_]
        declared = set(names)
        for f in fns:
            for node in postorder(f):
                if isinstance(node, Variable) and node.name not in declared:
                    raise ValueError(
                        f"variable {node.name!r} is not in the declared input list"
                    )

    def build():
        b = _Builder(names, for_taylor=False)
        outs = [b.emit(f) for f in fns]
        return Tape(
            n_eq=len(names),
            ops=b.ops,
            rhs=None,
            outputs=outs,
            n_pars=b.n_pars,
            var_names=names,
        )

    return _run(build)
