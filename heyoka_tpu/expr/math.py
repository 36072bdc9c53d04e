"""Math function factories over the expression AST.

Reference parity: heyoka's math library ``src/math/*.cpp`` /
``include/heyoka/math/*.hpp`` — the full inventory from SURVEY.md §1 L1.5:
sin cos tan asin acos atan atan2 sinh cosh tanh asinh acosh atanh exp log sqrt
pow erf sigmoid relu relup select relational logical kepE kepF kepDE sum prod
constants time.

Numbers fold at construction (like the reference's ``func`` ctors folding
number arguments).
"""

from __future__ import annotations

import math as _pymath

from .core import Expr, Func, Number, expr, sum_expr, prod_expr
from . import registry as _reg


def _fn(op: str, *args) -> Expr:
    eargs = tuple(expr(a) for a in args)
    od = _reg.opdef(op)
    if od.fold is not None and all(isinstance(a, Number) for a in eargs):
        try:
            return Number(od.fold(*[a.value for a in eargs]))
        except (ValueError, OverflowError):
            pass  # e.g. sqrt(-1): keep symbolic; numeric eval yields nan
    return Func(op, eargs)


def sin(x):
    return _fn("sin", x)


def cos(x):
    return _fn("cos", x)


def tan(x):
    return _fn("tan", x)


def asin(x):
    return _fn("asin", x)


def acos(x):
    return _fn("acos", x)


def atan(x):
    return _fn("atan", x)


def atan2(y, x):
    return _fn("atan2", y, x)


def sinh(x):
    return _fn("sinh", x)


def cosh(x):
    return _fn("cosh", x)


def tanh(x):
    return _fn("tanh", x)


def asinh(x):
    return _fn("asinh", x)


def acosh(x):
    return _fn("acosh", x)


def atanh(x):
    return _fn("atanh", x)


def exp(x):
    return _fn("exp", x)


def log(x):
    return _fn("log", x)


def sqrt(x):
    return _fn("sqrt", x)


def cbrt(x):
    return expr(x) ** (1.0 / 3.0)


def erf(x):
    return _fn("erf", x)


def sigmoid(x):
    return _fn("sigmoid", x)


def relu(x):
    return _fn("relu", x)


def relup(x):
    """Derivative of relu (heyoka ``relup``, src/math/relu.cpp)."""
    return _fn("relup", x)


def select(c, a, b):
    return _fn("select", c, a, b)


def lt(a, b):
    return _fn("lt", a, b)


def le(a, b):
    return _fn("le", a, b)


def gt(a, b):
    return _fn("gt", a, b)


def ge(a, b):
    return _fn("ge", a, b)


def eq(a, b):
    return _fn("eq", a, b)


def ne(a, b):
    return _fn("ne", a, b)


def logical_and(*xs):
    return _fn("logical_and", *xs)


def logical_or(*xs):
    return _fn("logical_or", *xs)


def logical_not(x):
    return _fn("logical_not", x)


def kepE(e, M):
    """Elliptic Kepler equation solver E - e sin E = M (src/math/kepE.cpp)."""
    return _fn("kepE", e, M)


def kepF(h, k, lam):
    """Equinoctial Kepler equation F + h cos F - k sin F = lam (src/math/kepF.cpp)."""
    return _fn("kepF", h, k, lam)


def kepDE(s0, c0, DM):
    """Universal-anomaly-difference Kepler equation (src/math/kepDE.cpp)."""
    return _fn("kepDE", s0, c0, DM)


def sum_(terms):
    return sum_expr(terms)


def prod(factors):
    return prod_expr(factors)


def sum_sq(terms):
    """Sum of squares (heyoka ``sum_sq``); lowered to sum of prods."""
    return sum_expr([expr(t) * expr(t) for t in terms])


#: pi at double precision (heyoka exposes arbitrary-precision constants,
#: math/constants.hpp:62-76; f64 is the max working precision on TPU)
pi = Number(_pymath.pi)
