"""dtens + variational-equation tests (reference analogs: test/dtens.cpp,
test/taylor_adaptive_var.cpp)."""

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu import diff_tensors, var_ode_sys, VarArgs
from heyoka_tpu.models import pendulum


def test_diff_tensors_basic():
    x, y = hy.make_vars("x", "y")
    dt = diff_tensors([x * x * y + hy.sin(x)], [x, y], diff_order=2)
    assert dt.order == 2
    assert dt.nouts == 1 and dt.nargs == 2
    cf_in = np.array([0.6, 1.4])

    def num(e):
        cf = hy.make_cfunc([e], vars=[x, y])
        return float(np.asarray(cf(cf_in))[0])

    xv, yv = cf_in
    # values
    assert num(dt[0, (0, 0)]) == pytest.approx(xv * xv * yv + np.sin(xv))
    assert num(dt[0, (1, 0)]) == pytest.approx(2 * xv * yv + np.cos(xv))
    assert num(dt[0, (0, 1)]) == pytest.approx(xv * xv)
    assert num(dt[0, (2, 0)]) == pytest.approx(2 * yv - np.sin(xv))
    assert num(dt[0, (1, 1)]) == pytest.approx(2 * xv)
    assert num(dt[0, (0, 2)]) == pytest.approx(0.0)


def test_dtens_gradient_jacobian_hessian():
    x, y = hy.make_vars("x", "y")
    dt = diff_tensors([x * y], [x, y], diff_order=2)
    g = dt.gradient()
    assert len(g) == 2
    H = dt.hessian(0)
    cf = hy.make_cfunc([H[0][1]], vars=[x, y])
    assert float(np.asarray(cf(np.array([1.0, 1.0])))[0]) == 1.0


def test_dtens_wrt_params():
    x = hy.make_vars("x")
    dt = diff_tensors([hy.par[0] * x + hy.par[1]], [hy.par[0], hy.par[1]])
    g = dt.gradient()
    assert g[0] == x
    assert isinstance(g[1], hy.Number) and g[1].value == 1.0


def fd_stm(sys, state0, t, eps=1e-7):
    """finite-difference state transition matrix"""
    n = len(state0)
    base = hy.taylor_adaptive(sys, state0, tol=1e-15)
    base.propagate_until(t)
    M = np.empty((n, n))
    for j in range(n):
        sp = np.array(state0, dtype=float)
        sp[j] += eps
        tap = hy.taylor_adaptive(sys, sp, tol=1e-15)
        tap.propagate_until(t)
        sm = np.array(state0, dtype=float)
        sm[j] -= eps
        tam = hy.taylor_adaptive(sys, sm, tol=1e-15)
        tam.propagate_until(t)
        M[:, j] = (tap.state - tam.state) / (2 * eps)
    return M


def test_var_ode_sys_stm_pendulum():
    sys = pendulum()
    vsys = var_ode_sys(sys, VarArgs.vars)
    assert len(vsys.sys) == 2 + 4
    state0 = [0.05, 0.025]
    full0 = vsys.initial_state(state0)
    np.testing.assert_array_equal(full0[2:], [1, 0, 0, 1])
    ta = hy.taylor_adaptive(vsys.sys, full0, tol=1e-15)
    t = 3.0
    ta.propagate_until(t)
    # STM layout: block per argument a_j holds d state / d a_j
    stm = np.empty((2, 2))
    for j in range(2):
        stm[:, j] = ta.state[vsys.get_vslice(j)]
    M = fd_stm(sys, state0, t)
    np.testing.assert_allclose(stm, M, atol=5e-6)


def test_var_ode_sys_param_sensitivity():
    x, v = hy.make_vars("x", "v")
    sys = [(x, v), (v, -hy.par[0] * hy.sin(x))]
    vsys = var_ode_sys(sys, VarArgs.params)
    assert vsys.n_vargs == 1
    state0 = [0.05, 0.025]
    ta = hy.taylor_adaptive(
        vsys.sys, vsys.initial_state(state0), pars=[9.8], tol=1e-15
    )
    t = 2.0
    ta.propagate_until(t)
    sens = ta.state[vsys.get_vslice(0)]
    # finite differences in the parameter
    eps = 1e-6
    tap = hy.taylor_adaptive(sys, state0, pars=[9.8 + eps], tol=1e-15)
    tap.propagate_until(t)
    tam = hy.taylor_adaptive(sys, state0, pars=[9.8 - eps], tol=1e-15)
    tam.propagate_until(t)
    fd = (tap.state - tam.state) / (2 * eps)
    np.testing.assert_allclose(sens, fd, atol=1e-7)
