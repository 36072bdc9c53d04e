"""Op registry: the UDF extension protocol as a rule table.

Reference parity: heyoka's ``func`` extension points (``func.hpp:116-284``) —
``llvm_evaluate()`` -> :attr:`OpDef.evaluate` (a jax.numpy rule),
``gradient()`` -> gradient rules in ``diff.py``,
``taylor_diff()`` -> recurrence rules in ``heyoka_tpu.taylor.recurrences``,
``taylor_decompose()`` -> aux-variable hooks in ``decompose.py``.

Splitting the protocol across the modules that consume each rule keeps the
symbolic layer jax-light while giving every op a single authoritative name.
"""

from __future__ import annotations

import math as _pymath
from dataclasses import dataclass
from typing import Callable, Optional


@dataclass(frozen=True)
class OpDef:
    name: str
    nargs: int | None  # None = variadic
    evaluate: Callable  # jnp rule: (*arg_values) -> value
    # constant folding rule over Python floats (None = never fold)
    fold: Optional[Callable] = None


_REGISTRY: dict[str, OpDef] = {}


def register(op: OpDef):
    assert op.name not in _REGISTRY, op.name
    _REGISTRY[op.name] = op


#: lazy resolvers for dynamically-registered ops (e.g. dataset-backed
#: interpolants after unpickling) — each gets the missing name and may
#: register it
_RESOLVERS: list = []


def register_resolver(fn):
    _RESOLVERS.append(fn)


def opdef(name: str) -> OpDef:
    od = _REGISTRY.get(name)
    if od is None:
        for r in _RESOLVERS:
            r(name)
        od = _REGISTRY.get(name)
        if od is None:
            raise KeyError(f"unknown op {name!r}")
    return od


def have_op(name: str) -> bool:
    return name in _REGISTRY


def _jnp():
    import jax.numpy as jnp

    return jnp


# -- elementary arithmetic ---------------------------------------------------

def _ev_sum(*xs):
    r = xs[0]
    for x in xs[1:]:
        r = r + x
    return r


def _ev_prod(*xs):
    r = xs[0]
    for x in xs[1:]:
        r = r * x
    return r


register(OpDef("sum", None, _ev_sum, fold=lambda *xs: sum(xs)))
register(OpDef("prod", None, _ev_prod, fold=lambda *xs: _pymath.prod(xs)))
register(OpDef("div", 2, lambda a, b: a / b, fold=lambda a, b: a / b))
register(OpDef("pow", 2, lambda a, b: _jnp().power(a, b), fold=lambda a, b: a**b))

# -- transcendentals ----------------------------------------------------------

def _r(name, n, jnp_name, pyfold=None):
    def ev(*xs, _n=jnp_name):
        return getattr(_jnp(), _n)(*xs)

    register(OpDef(name, n, ev, fold=pyfold))


_r("sin", 1, "sin", _pymath.sin)
_r("cos", 1, "cos", _pymath.cos)
_r("tan", 1, "tan", _pymath.tan)
_r("asin", 1, "arcsin", _pymath.asin)
_r("acos", 1, "arccos", _pymath.acos)
_r("atan", 1, "arctan", _pymath.atan)
_r("atan2", 2, "arctan2", _pymath.atan2)
_r("sinh", 1, "sinh", _pymath.sinh)
_r("cosh", 1, "cosh", _pymath.cosh)
_r("tanh", 1, "tanh", _pymath.tanh)
_r("asinh", 1, "arcsinh", _pymath.asinh)
_r("acosh", 1, "arccosh", _pymath.acosh)
_r("atanh", 1, "arctanh", _pymath.atanh)
_r("exp", 1, "exp", _pymath.exp)
_r("log", 1, "log", _pymath.log)
_r("sqrt", 1, "sqrt", _pymath.sqrt)


def _ev_erf(x):
    import jax

    return jax.scipy.special.erf(x)


register(OpDef("erf", 1, _ev_erf, fold=_pymath.erf))


def _ev_sigmoid(x):
    import jax

    return jax.nn.sigmoid(x)


register(
    OpDef(
        "sigmoid",
        1,
        _ev_sigmoid,
        fold=lambda x: 1.0 / (1.0 + _pymath.exp(-x)),
    )
)
register(
    OpDef("relu", 1, lambda x: _jnp().maximum(x, 0.0), fold=lambda x: max(x, 0.0))
)
register(
    OpDef(
        "relup",
        1,
        lambda x: (x > 0.0).astype(getattr(x, "dtype", None) or float),
        fold=lambda x: 1.0 if x > 0.0 else 0.0,
    )
)

# -- relational / logical / select -------------------------------------------
# Reference: src/math/relational.cpp, logical.cpp, select.cpp.  Values are
# numeric 0/1 in the working dtype (like the reference's codegen).

def _boolish(fn):
    def ev(*xs):
        jnp = _jnp()
        r = fn(jnp, *xs)
        dt = None
        for x in xs:
            dt = getattr(x, "dtype", dt)
        return r.astype(dt) if dt is not None else r * 1.0

    return ev


register(OpDef("lt", 2, _boolish(lambda jnp, a, b: a < b), fold=lambda a, b: float(a < b)))
register(OpDef("le", 2, _boolish(lambda jnp, a, b: a <= b), fold=lambda a, b: float(a <= b)))
register(OpDef("gt", 2, _boolish(lambda jnp, a, b: a > b), fold=lambda a, b: float(a > b)))
register(OpDef("ge", 2, _boolish(lambda jnp, a, b: a >= b), fold=lambda a, b: float(a >= b)))
register(OpDef("eq", 2, _boolish(lambda jnp, a, b: a == b), fold=lambda a, b: float(a == b)))
register(OpDef("ne", 2, _boolish(lambda jnp, a, b: a != b), fold=lambda a, b: float(a != b)))
register(
    OpDef(
        "logical_and",
        None,
        _boolish(lambda jnp, *xs: _ev_prod(*[x != 0 for x in xs])),
        fold=lambda *xs: float(all(x != 0 for x in xs)),
    )
)
def _ev_or(jnp, *xs):
    r = xs[0] != 0
    for x in xs[1:]:
        r = jnp.logical_or(r, x != 0)
    return r


register(
    OpDef(
        "logical_or",
        None,
        _boolish(_ev_or),
        fold=lambda *xs: float(any(x != 0 for x in xs)),
    )
)


register(
    OpDef(
        "logical_not",
        1,
        _boolish(lambda jnp, x: x == 0),
        fold=lambda x: float(x == 0),
    )
)


def _ev_select(c, a, b):
    jnp = _jnp()
    return jnp.where(c != 0, a, b)


register(OpDef("select", 3, _ev_select, fold=lambda c, a, b: a if c != 0 else b))

# -- Kepler solvers ------------------------------------------------------------
# Reference: src/math/kepE.cpp / kepF.cpp / kepDE.cpp — Newton-Raphson solvers
# emitted directly in LLVM IR.  Here: Newton inside ``lax.while_loop`` with a
# convergence stop (tiny jaxpr, early exit; under vmap lanes run in lockstep
# until all converge — the XLA analog of the reference's vectorized IR loop).


def _newton_solve(x0, fdf, max_iter=50):
    """Branch-free Newton iteration to f64 roundoff convergence."""
    from jax import lax
    jnp = _jnp()

    def cond(c):
        x, dx_prev, it = c
        return (it < max_iter) & jnp.any(jnp.abs(dx_prev) > 1e-15)

    def body(c):
        x, _, it = c
        f, fp = fdf(x)
        dx = f / fp
        return x - dx, dx, it + 1

    x, _, _ = lax.while_loop(cond, body, (x0, jnp.ones_like(x0), 0))
    return x


def _ev_kepE(ecc, M):
    jnp = _jnp()
    # reduce M to [0, 2pi); initial guess (Danby): E = M + 0.85 * e * sign(sin M)
    twopi = 2.0 * _pymath.pi
    Mr = M - twopi * jnp.floor(M / twopi)
    E0 = Mr + 0.85 * ecc * jnp.sign(jnp.sin(Mr))
    E0, Mr = jnp.broadcast_arrays(E0 * jnp.ones_like(ecc), Mr * jnp.ones_like(ecc))

    def fdf(E):
        sE, cE = jnp.sin(E), jnp.cos(E)
        return E - ecc * sE - Mr, 1.0 - ecc * cE

    return _newton_solve(E0, fdf) + (M - Mr)


register(OpDef("kepE", 2, _ev_kepE))


def _ev_kepF(h, k, lam):
    jnp = _jnp()
    # solves F + h*cos(F) - k*sin(F) = lam  (equinoctial Kepler, kepF.cpp)
    twopi = 2.0 * _pymath.pi
    lr = lam - twopi * jnp.floor(lam / twopi)
    F0 = jnp.broadcast_arrays(lr * jnp.ones_like(h) * jnp.ones_like(k))[0]

    def fdf(F):
        sF, cF = jnp.sin(F), jnp.cos(F)
        return F + h * cF - k * sF - lr, 1.0 - h * sF - k * cF

    return _newton_solve(F0, fdf) + (lam - lr)


register(OpDef("kepF", 3, _ev_kepF))


def _ev_kepDE(s0, c0, DM):
    jnp = _jnp()
    # solves DE + s0*(1-cos(DE)) - c0*sin(DE) = DM  (kepDE.cpp)
    twopi = 2.0 * _pymath.pi
    Dr = DM - twopi * jnp.floor(DM / twopi)
    D0 = jnp.broadcast_arrays(Dr * jnp.ones_like(s0) * jnp.ones_like(c0))[0]

    def fdf(DE):
        sD, cD = jnp.sin(DE), jnp.cos(DE)
        return DE + s0 * (1.0 - cD) - c0 * sD - Dr, 1.0 + s0 * sD - c0 * cD

    return _newton_solve(D0, fdf) + (DM - Dr)


register(OpDef("kepDE", 3, _ev_kepDE))
