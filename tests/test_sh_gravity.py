"""Spherical-harmonics gravity tests (reference analog: test/sh_gravity.cpp,
test/egm2008.cpp): closed forms, an independent scipy Legendre oracle, and
the acc == grad(pot) identity through the symbolic diff."""

from math import factorial, sqrt

import numpy as np
import pytest
from scipy.special import lpmv

import heyoka_tpu as hy
from heyoka_tpu.models import (
    egm2008_acc,
    egm2008_pot,
    get_egm2008_a,
    get_egm2008_mu,
    sh_gravity_pot,
)
from heyoka_tpu.models.sh_gravity import _egm2008_cs

PT = np.array([5034231.0, -3214555.0, 2301444.7])
R = np.linalg.norm(PT)


@pytest.fixture(scope="module")
def xyz():
    return hy.make_vars("x", "y", "z")


def test_degree0_is_central(xyz):
    mu = get_egm2008_mu()
    cf = hy.make_cfunc([egm2008_pot(list(xyz), 0)], vars=["x", "y", "z"])
    assert float(cf(PT)[0]) == pytest.approx(mu / R, rel=1e-15)


def test_j2_closed_form(xyz):
    mu, a = get_egm2008_mu(), get_egm2008_a()
    cf = hy.make_cfunc([egm2008_pot(list(xyz), 2, 0)], vars=["x", "y", "z"])
    C20 = _egm2008_cs(2, 0)[0]
    sin_phi = PT[2] / R
    want = mu / R * (1 + sqrt(5.0) * C20 * (a / R) ** 2 * 0.5 * (3 * sin_phi**2 - 1))
    assert float(cf(PT)[0]) == pytest.approx(want, rel=1e-15)


def test_acc_is_gradient_of_pot(xyz):
    x, y, z = xyz
    n = m = 6
    pot = egm2008_pot([x, y, z], n, m)
    acc = egm2008_acc([x, y, z], n, m)
    grads = [hy.diff(pot, v) for v in (x, y, z)]
    cf = hy.make_cfunc(acc + grads, vars=["x", "y", "z"])
    vals = np.asarray(cf(PT))
    np.testing.assert_allclose(vals[:3], vals[3:], rtol=0, atol=1e-13)


def test_against_scipy_legendre_oracle(xyz):
    mu, a = get_egm2008_mu(), get_egm2008_a()
    nmax = 10
    cf = hy.make_cfunc([egm2008_pot(list(xyz), nmax)], vars=["x", "y", "z"])
    got = float(cf(PT)[0])

    lon = np.arctan2(PT[1], PT[0])
    lat = np.arcsin(PT[2] / R)
    tot = 0.0
    for i in range(nmax + 1):
        for j in range(i + 1):
            C, S = _egm2008_cs(i, j)
            Nf = sqrt((2 - (j == 0)) * (2 * i + 1) * factorial(i - j) / factorial(i + j))
            # lpmv includes the Condon-Shortley phase; the geodesy convention
            # does not
            Pn = lpmv(j, i, np.sin(lat)) * (-1) ** j * Nf
            tot += (a / R) ** i * Pn * (C * np.cos(j * lon) + S * np.sin(j * lon))
    want = mu / R * tot
    assert got == pytest.approx(want, rel=1e-14)


def test_custom_cs_and_order_clamp(xyz):
    # custom coefficient source: pure J2 field via a dict
    mu, a = 1.0, 1.0
    CS = {(0, 0): (1.0, 0.0), (1, 0): (0.0, 0.0), (1, 1): (0.0, 0.0),
          (2, 0): (-1e-3, 0.0), (2, 1): (0.0, 0.0), (2, 2): (0.0, 0.0)}
    pot = sh_gravity_pot(list(xyz), 2, mu=mu, a=a, CS=CS)
    cf = hy.make_cfunc([pot], vars=["x", "y", "z"])
    p = np.array([0.3, -0.2, 1.1])
    r = np.linalg.norm(p)
    want = mu / r * (1 + sqrt(5.0) * -1e-3 * (a / r) ** 2 * 0.5 * (3 * (p[2] / r) ** 2 - 1))
    assert float(cf(p)[0]) == pytest.approx(want, rel=1e-14)

    with pytest.raises(ValueError, match="order"):
        sh_gravity_pot(list(xyz), 2, 3, mu=1.0, a=1.0, CS=CS)


def test_egm2008_degree_limit(xyz):
    with pytest.raises(ValueError, match="degree"):
        egm2008_pot(list(xyz), 151)
