"""Lagrangian/Hamiltonian tests (reference analog: test/lagham.cpp)."""

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu import lagrangian, hamiltonian
from heyoka_tpu.models import pendulum


def test_lagrangian_pendulum():
    # L = 1/2 v^2 + g cos(x)  (unit mass & length) -> x'' = -g sin x
    x, v = hy.make_vars("x", "v")
    L = 0.5 * v * v + 9.8 * hy.cos(x)
    sys = lagrangian(L, [x], [v])
    ta = hy.taylor_adaptive(sys, [0.05, 0.025], tol=1e-15)
    ta.propagate_until(5.0)
    ta_ref = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-15)
    ta_ref.propagate_until(5.0)
    np.testing.assert_allclose(ta.state, ta_ref.state, atol=1e-13)


def test_lagrangian_dissipation():
    # damped oscillator via Rayleigh dissipation D = 1/2 c v^2:
    # x'' = -k x - c x'
    x, v = hy.make_vars("x", "v")
    k, c = 4.0, 0.3
    L = 0.5 * v * v - 0.5 * k * x * x
    D = 0.5 * c * v * v
    sys = lagrangian(L, [x], [v], D)
    ta = hy.taylor_adaptive(sys, [1.0, 0.0], tol=1e-15)
    ta.propagate_until(2.0)

    # closed form: underdamped
    import math

    om0 = math.sqrt(k)
    zeta = c / (2 * om0)
    omd = om0 * math.sqrt(1 - zeta**2)
    t = 2.0
    xt = math.exp(-zeta * om0 * t) * (
        math.cos(omd * t) + zeta * om0 / omd * math.sin(omd * t)
    )
    assert ta.state[0] == pytest.approx(xt, abs=1e-12)


def test_hamiltonian_matches_lagrangian():
    x, v, p = hy.make_vars("x", "v", "p")
    H = 0.5 * p * p - 9.8 * hy.cos(x)
    sysH = hamiltonian(H, [x], [p])
    ta = hy.taylor_adaptive(sysH, [0.05, 0.025], tol=1e-15)
    ta.propagate_until(5.0)
    ta_ref = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-15)
    ta_ref.propagate_until(5.0)
    np.testing.assert_allclose(ta.state, ta_ref.state, atol=1e-13)


def test_lagrangian_coupled():
    # 2-dof with coupled mass matrix: L = 1/2(v1^2 + v2^2) + v1 v2 * 0.2 - pot
    q1, q2, v1, v2 = hy.make_vars("q1", "q2", "v1", "v2")
    L = (
        0.5 * (v1 * v1 + v2 * v2)
        + 0.2 * v1 * v2
        - 0.5 * (q1 * q1 + 2.0 * q2 * q2)
    )
    sys = lagrangian(L, [q1, q2], [v1, v2])
    ta = hy.taylor_adaptive(sys, [0.3, -0.2, 0.0, 0.1], tol=1e-13)
    # energy conservation check: E = T + V with T from M
    ta.propagate_until(7.0)

    def energy(s):
        qq1, qq2, vv1, vv2 = s
        T = 0.5 * (vv1**2 + vv2**2) + 0.2 * vv1 * vv2
        V = 0.5 * (qq1**2 + 2.0 * qq2**2)
        return T + V

    e0 = energy([0.3, -0.2, 0.0, 0.1])
    e1 = energy(ta.state)
    assert abs(e1 - e0) < 1e-11
