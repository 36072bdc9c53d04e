"""Order-k Taylor-coefficient recurrences, one rule per tape op.

Reference parity: the ``taylor_diff()`` hooks of heyoka's math library
(``src/math/*.cpp``) — each op knows how to produce the order-k normalized
Taylor coefficient of its u-variable from lower-order coefficients of its
operands (and, for a few ops, same-order coefficients of u-variables that are
guaranteed to precede it in the tape).

Conventions (identical to the reference):
- ``a_k`` denotes the *normalized* coefficient ``a^{(k)}(t)/k!``;
- rules are called for ``k >= 1`` (order 0 is the plain evaluation of the op);
- ``G(operand, j)`` returns the order-``j`` coefficient of an operand,
  with literal Python ``0.0`` for known-zeros (constants/params at ``j>0``)
  so that the emitted XLA graph contains no dead terms.

Every rule is pure jnp scalar arithmetic: under ``vmap`` the scalars become
(batch,)-vectors and the whole jet is one fused XLA computation.
"""

from __future__ import annotations

import math as _pymath
from typing import Callable


def _is_zero(x) -> bool:
    return isinstance(x, float) and x == 0.0


def dot(pairs):
    """Sum of products, skipping terms with a literal-zero factor.

    Returns literal 0.0 when every term vanishes (callers propagate it).
    """
    acc = None
    for a, b in pairs:
        if _is_zero(a) or _is_zero(b):
            continue
        term = a * b
        acc = term if acc is None else acc + term
    return 0.0 if acc is None else acc


def ssum(terms):
    acc = None
    for t in terms:
        if _is_zero(t):
            continue
        acc = t if acc is None else acc + t
    return 0.0 if acc is None else acc


# rule signature: (k, inputs, meta, G, U) -> coefficient
#   k      : order (Python int >= 1)
#   inputs : operand tuple of the op
#   meta   : op metadata (aux u-var indices, pow exponent, ...)
#   G      : operand/order accessor (see jet.py)
#   U      : shortcut, U(i, j) = order-j coefficient of u-var i
_RULES: dict[str, Callable] = {}


def rule(name):
    def deco(fn):
        _RULES[name] = fn
        return fn

    return deco


def get_rule(name: str) -> Callable:
    r = _RULES.get(name)
    if r is None:
        # trigger dynamic-op resolution (see registry.register_resolver)
        from ..expr import registry as _reg

        _reg.opdef(name)
        r = _RULES[name]
    return r


def have_rule(name: str) -> bool:
    return name in _RULES


@rule("sum")
def _sum(k, ins, meta, G, U, self_idx):
    return ssum([G(b, k) for b in ins])


@rule("mul")
def _mul(k, ins, meta, G, U, self_idx):
    # Cauchy product: a_k = sum_{j=0..k} b_j c_{k-j}   (src/math/prod.cpp)
    b, c = ins
    return dot((G(b, j), G(c, k - j)) for j in range(k + 1))


@rule("div")
def _div(k, ins, meta, G, U, self_idx):
    # a = b/c  =>  a_k = (b_k - sum_{j=0..k-1} a_j c_{k-j}) / c_0
    b, c = ins
    num = dot((U(self_idx, j), G(c, k - j)) for j in range(k))
    return (G(b, k) - num) / G(c, 0)


@rule("sin")
def _sin(k, ins, meta, G, U, self_idx):
    # s_k = (1/k) sum_{j=1..k} j b_j c_{k-j}  with c the cos companion
    (b,) = ins
    c_idx = meta["pair"]
    s = dot((_scale(G(b, j), j), U(c_idx, k - j)) for j in range(1, k + 1))
    return _divk(s, k)


@rule("cos")
def _cos(k, ins, meta, G, U, self_idx):
    (b,) = ins
    s_idx = meta["pair"]
    s = dot((_scale(G(b, j), j), U(s_idx, k - j)) for j in range(1, k + 1))
    return _divk(_negate(s), k)


@rule("sinh")
def _sinh(k, ins, meta, G, U, self_idx):
    (b,) = ins
    c_idx = meta["pair"]
    s = dot((_scale(G(b, j), j), U(c_idx, k - j)) for j in range(1, k + 1))
    return _divk(s, k)


@rule("cosh")
def _cosh(k, ins, meta, G, U, self_idx):
    (b,) = ins
    s_idx = meta["pair"]
    s = dot((_scale(G(b, j), j), U(s_idx, k - j)) for j in range(1, k + 1))
    return _divk(s, k)


@rule("exp")
def _exp(k, ins, meta, G, U, self_idx):
    # e_k = (1/k) sum_{j=1..k} j b_j e_{k-j}
    (b,) = ins
    s = dot((_scale(G(b, j), j), U(self_idx, k - j)) for j in range(1, k + 1))
    return _divk(s, k)


@rule("log")
def _log(k, ins, meta, G, U, self_idx):
    # a_k = (b_k - (1/k) sum_{j=1..k-1} j a_j b_{k-j}) / b_0
    (b,) = ins
    s = dot((_scale(U(self_idx, j), j), G(b, k - j)) for j in range(1, k))
    return (G(b, k) - _divk(s, k)) / G(b, 0)


@rule("sqrt")
def _sqrt(k, ins, meta, G, U, self_idx):
    # a_k = (b_k - sum_{j=1..k-1} a_j a_{k-j}) / (2 a_0)
    (b,) = ins
    s = dot((U(self_idx, j), U(self_idx, k - j)) for j in range(1, k))
    return (G(b, k) - s) / (2.0 * U(self_idx, 0))


@rule("pow")
def _pow(k, ins, meta, G, U, self_idx):
    # a = b^alpha:
    # a_k = (1/(k b_0)) sum_{j=0..k-1} (alpha (k-j) - j) b_{k-j} a_j
    (b,) = ins
    alpha = meta["alpha"]
    s = dot(
        (_scale(G(b, k - j), alpha * (k - j) - j), U(self_idx, j))
        for j in range(k)
    )
    return s / (_float(k) * G(b, 0))


@rule("tan")
def _tan(k, ins, meta, G, U, self_idx):
    # t' = (1 + t^2) b'  with q = t^2 an aux u-var *after* t in the tape:
    # t_k = b_k + (1/k) sum_{m=0..k-1} q_m (k-m) b_{k-m}
    (b,) = ins
    q = meta["sq"]
    s = dot((U(q, m), _scale(G(b, k - m), k - m)) for m in range(k))
    return G(b, k) + _divk(s, k)


@rule("tanh")
def _tanh(k, ins, meta, G, U, self_idx):
    # t' = (1 - t^2) b'
    (b,) = ins
    q = meta["sq"]
    s = dot((U(q, m), _scale(G(b, k - m), k - m)) for m in range(k))
    return G(b, k) - _divk(s, k)


@rule("sigmoid")
def _sigmoid(k, ins, meta, G, U, self_idx):
    # s' = (s - s^2) b'
    (b,) = ins
    q = meta["sq"]
    s = dot(
        (U(self_idx, m) - U(q, m), _scale(G(b, k - m), k - m)) for m in range(k)
    )
    return _divk(s, k)


def _inverse_rule(sign: float):
    # a' = sign * b' / c  with c an aux u-var:
    # a_k = (sign k b_k - sum_{m=1..k-1} c_m (k-m) a_{k-m}) / (k c_0)
    def impl(k, ins, meta, G, U, self_idx):
        b, c = ins
        s = dot(
            (G(c, m), _scale(U(self_idx, k - m), k - m)) for m in range(1, k)
        )
        num = _scale(G(b, k), sign * k)
        return (num - s) / (_float(k) * G(c, 0))

    return impl


_RULES["asin"] = _inverse_rule(1.0)
_RULES["acos"] = _inverse_rule(-1.0)
_RULES["atan"] = _inverse_rule(1.0)
_RULES["atanh"] = _inverse_rule(1.0)
_RULES["asinh"] = _inverse_rule(1.0)
_RULES["acosh"] = _inverse_rule(1.0)


@rule("erf")
def _erf(k, ins, meta, G, U, self_idx):
    # a' = (2/sqrt(pi)) e b'  with e = exp(-b^2) aux
    b, e = ins
    s = dot((G(e, m), _scale(G(b, k - m), k - m)) for m in range(k))
    return _divk(_scale(s, 2.0 / _pymath.sqrt(_pymath.pi)), k)


@rule("atan2")
def _atan2(k, ins, meta, G, U, self_idx):
    # a = atan2(y, x), d = x^2 + y^2 aux:
    # k d_0 a_k = sum_{m=0..k-1} (k-m) (x_m y_{k-m} - y_m x_{k-m})
    #             - sum_{m=1..k-1} d_m (k-m) a_{k-m}
    y, x, d = ins
    rhs = dot(
        (G(x, m), _scale(G(y, k - m), k - m)) for m in range(k)
    )
    rhs2 = dot(
        (G(y, m), _scale(G(x, k - m), k - m)) for m in range(k)
    )
    s = dot((G(d, m), _scale(U(self_idx, k - m), k - m)) for m in range(1, k))
    return (rhs - rhs2 - s) / (_float(k) * G(d, 0))


@rule("relu")
def _relu(k, ins, meta, G, U, self_idx):
    (b,) = ins
    b0 = G(b, 0)
    bk = G(b, k)
    if _is_zero(bk):
        return 0.0
    import jax.numpy as jnp

    return jnp.where(b0 > 0.0, bk, 0.0 * bk)


@rule("relup")
def _relup(k, ins, meta, G, U, self_idx):
    return 0.0


@rule("select")
def _select(k, ins, meta, G, U, self_idx):
    c, a, b = ins
    import jax.numpy as jnp

    ak, bk = G(a, k), G(b, k)
    if _is_zero(ak) and _is_zero(bk):
        return 0.0
    c0 = G(c, 0)
    zero = 0.0 * (ak if not _is_zero(ak) else bk)
    av = ak if not _is_zero(ak) else zero
    bv = bk if not _is_zero(bk) else zero
    return jnp.where(c0 != 0.0, av, bv)


def _const_rule(k, ins, meta, G, U, self_idx):
    return 0.0


for _n in ("lt", "le", "gt", "ge", "eq", "ne", "logical_and", "logical_or", "logical_not"):
    _RULES[_n] = _const_rule


@rule("kepE")
def _kepE(k, ins, meta, G, U, self_idx):
    # E - e sin E = M, with s = sin E, c = cos E aux u-vars after E:
    # E_k = [k M_k + sum_{j=1..k} j e_j s_{k-j}
    #        + sum_{m=1..k-1} q_m (k-m) E_{k-m}] / (k (1 - q_0))
    # where q = e*c (computed inline by convolution; e const/param => q_m = e c_m).
    e, M = ins
    s_i, c_i = meta["sin"], meta["cos"]

    def q(m):
        return dot((G(e, j), U(c_i, m - j)) for j in range(m + 1))

    t1 = _scale(G(M, k), k)
    t2 = dot((_scale(G(e, j), j), U(s_i, k - j)) for j in range(1, k + 1))
    t3 = dot((q(m), _scale(U(self_idx, k - m), k - m)) for m in range(1, k))
    return (ssum([t1, t2, t3])) / (_float(k) * (1.0 - q(0)))


@rule("kepF")
def _kepF(k_, ins, meta, G, U, self_idx):
    # F + h cos F - k sin F = lam, s = sin F, c = cos F aux:
    # F'(1 - h s - k c) = lam' - h' c + k' s
    h, kk, lam = ins
    s_i, c_i = meta["sin"], meta["cos"]

    def w(m):
        a = dot((G(h, j), U(s_i, m - j)) for j in range(m + 1))
        b = dot((G(kk, j), U(c_i, m - j)) for j in range(m + 1))
        return ssum([a, b])

    t1 = _scale(G(lam, k_), k_)
    t2 = _negate(dot((_scale(G(h, j), j), U(c_i, k_ - j)) for j in range(1, k_ + 1)))
    t3 = dot((_scale(G(kk, j), j), U(s_i, k_ - j)) for j in range(1, k_ + 1))
    t4 = dot((w(m), _scale(U(self_idx, k_ - m), k_ - m)) for m in range(1, k_))
    return ssum([t1, t2, t3, t4]) / (_float(k_) * (1.0 - w(0)))


@rule("kepDE")
def _kepDE(k, ins, meta, G, U, self_idx):
    # DE + s0 (1 - cos DE) - c0 sin DE = DM, s = sin DE, c = cos DE aux:
    # DE'(1 + s0 s - c0 c) = DM' - s0'(1 - c) + c0' s
    s0, c0, DM = ins
    s_i, c_i = meta["sin"], meta["cos"]

    def w(m):
        a = dot((G(s0, j), U(s_i, m - j)) for j in range(m + 1))
        b = dot((G(c0, j), U(c_i, m - j)) for j in range(m + 1))
        return ssum([a, _negate(b)])

    def one_minus_c(i):
        return (1.0 - U(c_i, 0)) if i == 0 else _negate(U(c_i, i))

    t1 = _scale(G(DM, k), k)
    t2 = _negate(
        dot((_scale(G(s0, j), j), one_minus_c(k - j)) for j in range(1, k + 1))
    )
    t3 = dot((_scale(G(c0, j), j), U(s_i, k - j)) for j in range(1, k + 1))
    t4 = _negate(dot((w(m), _scale(U(self_idx, k - m), k - m)) for m in range(1, k)))
    return ssum([t1, t2, t3, t4]) / (_float(k) * (1.0 + w(0)))


# -- small helpers ------------------------------------------------------------

def _float(k) -> float:
    return float(k)


def _scale(x, f):
    """f * x with literal-zero propagation (f is a Python number)."""
    if _is_zero(x) or f == 0.0:
        return 0.0
    if f == 1.0:
        return x
    return x * float(f)


def _negate(x):
    if _is_zero(x):
        return 0.0
    return -x


def _divk(x, k: int):
    if _is_zero(x):
        return 0.0
    return x * (1.0 / float(k))
