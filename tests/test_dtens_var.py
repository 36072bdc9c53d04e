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
    # dtens layout: order-1 block grouped by component, then by argument
    np.testing.assert_array_equal(full0[2:], [1, 0, 0, 1])
    # passing the var_ode_sys directly auto-fills the variational ICs
    ta = hy.taylor_adaptive(vsys, state0, tol=1e-15)
    assert ta.is_variational() and ta.get_vorder() == 1
    t = 3.0
    ta.propagate_until(t)
    stm = np.empty((2, 2))
    for i in range(2):
        stm[i, :] = ta.state[ta.get_vslice(1, i)]
    M = fd_stm(sys, state0, t)
    np.testing.assert_allclose(stm, M, atol=5e-6)


def test_var_ode_sys_param_sensitivity():
    x, v = hy.make_vars("x", "v")
    sys = [(x, v), (v, -hy.par[0] * hy.sin(x))]
    vsys = var_ode_sys(sys, VarArgs.params)
    assert vsys.n_vargs == 1
    state0 = [0.05, 0.025]
    ta = hy.taylor_adaptive(vsys, state0, pars=[9.8], tol=1e-15)
    t = 2.0
    ta.propagate_until(t)
    sl = ta.get_vslice(1)
    sens = ta.state[sl]
    # finite differences in the parameter
    eps = 1e-6
    tap = hy.taylor_adaptive(sys, state0, pars=[9.8 + eps], tol=1e-15)
    tap.propagate_until(t)
    tam = hy.taylor_adaptive(sys, state0, pars=[9.8 - eps], tol=1e-15)
    tam.propagate_until(t)
    fd = (tap.state - tam.state) / (2 * eps)
    np.testing.assert_allclose(sens, fd, atol=1e-7)


def test_var_ode_sys_order2_and_taylor_map():
    # reference analog: test/taylor_adaptive_var.cpp order-2 checks + the
    # Taylor-map evaluation of the flow polynomial
    sys = pendulum()
    state0 = np.array([0.05, 0.025])
    vsys = var_ode_sys(sys, VarArgs.vars, order=2)
    # 2 originals + 4 first + 6 second derivatives (symmetric mixed)
    assert len(vsys.sys) == 12
    ta = hy.taylor_adaptive(vsys, state0, tol=1e-15)
    assert ta.get_vorder() == 2
    t = 3.0
    ta.propagate_until(t)

    # second derivatives vs central finite differences of the order-1 STM
    eps = 1e-6

    def stm_at(s0):
        v1 = var_ode_sys(sys, VarArgs.vars)
        t1 = hy.taylor_adaptive(v1, s0, tol=1e-15)
        t1.propagate_until(t)
        out = np.empty((2, 2))
        for i in range(2):
            out[i, :] = t1.state[t1.get_vslice(1, i)]
        return out

    flat = vsys.get_dtens().items()
    for j in range(2):
        sp = state0.copy()
        sp[j] += eps
        sm = state0.copy()
        sm[j] -= eps
        dstm = (stm_at(sp) - stm_at(sm)) / (2 * eps)
        for i in range(2):
            for k in range(2):
                counts = [0, 0]
                counts[j] += 1
                counts[k] += 1
                key = (i, tuple(counts))
                pos = next(p for p, (kk, _) in enumerate(flat) if kk == key)
                assert ta.get_mindex(pos) == key
                got = float(ta.state[pos])
                assert abs(got - dstm[i, k]) < 2e-5

    # Taylor map: quadratic flow expansion beats the linear one and lands
    # at the |da|^3 error level
    da = np.array([3e-3, -2e-3])
    approx = ta.eval_taylor_map(da)
    tp = hy.taylor_adaptive(sys, state0 + da, tol=1e-15)
    tp.propagate_until(t)
    assert np.max(np.abs(approx - tp.state)) < 5e-7
    np.testing.assert_array_equal(ta.get_tstate(), approx)


def test_var_ode_sys_initial_time():
    # derivative wrt the initial time: IC is -f(x0, t0)
    sys = pendulum()
    state0 = [0.05, 0.025]
    vsys = var_ode_sys(sys, VarArgs.time)
    full0 = vsys.initial_state(state0)
    # -f(x0) = [-v, +9.8 sin(x)]
    np.testing.assert_allclose(
        full0[2:], [-0.025, 9.8 * np.sin(0.05)], rtol=1e-15
    )
    ta = hy.taylor_adaptive(vsys, np.asarray(state0), tol=1e-15)
    t = 2.0
    ta.propagate_until(t)
    dxdt0 = ta.state[ta.get_vslice(1)]
    # finite differences: start at t0 +- eps from the same state, integrate
    # to the same absolute final time
    eps = 1e-7
    tap = hy.taylor_adaptive(sys, state0, time=eps, tol=1e-15)
    tap.propagate_until(t)
    tam = hy.taylor_adaptive(sys, state0, time=-eps, tol=1e-15)
    tam.propagate_until(t)
    fd = (tap.state - tam.state) / (2 * eps)
    np.testing.assert_allclose(dxdt0, fd, atol=1e-6)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        var_ode_sys(sys, VarArgs.time, order=2).initial_state(state0)


def test_var_stm_analytic_oscillator():
    # round-2 (VERDICT #9): STM validated against the exact analytic
    # solution — for x'=v, v'=-w^2 x the STM is
    # [[cos wt, sin wt / w], [-w sin wt, cos wt]] — at ~1e-13, far below
    # finite-difference noise
    w = 1.7
    x, v = hy.make_vars("x", "v")
    sys = [(x, v), (v, -(w * w) * x)]
    vsys = var_ode_sys(sys, VarArgs.vars)
    ta = hy.taylor_adaptive(vsys, [0.3, -0.2], tol=1e-15)
    t = 2.31
    ta.propagate_until(t)
    stm = np.empty((2, 2))
    for i in range(2):
        stm[i, :] = ta.state[ta.get_vslice(1, i)]
    wt = w * t
    M = np.array([
        [np.cos(wt), np.sin(wt) / w],
        [-w * np.sin(wt), np.cos(wt)],
    ])
    np.testing.assert_allclose(stm, M, rtol=0, atol=5e-13)


def test_var_stm_native_crosscheck():
    # the same variational tape through the independent native (C++ tape
    # interpreter) backend must agree with the XLA integration to ~1e-12
    from heyoka_tpu.native import native_available, native_propagate_until
    from heyoka_tpu.taylor.stepper import taylor_order_from_tol

    if not native_available():
        import pytest

        pytest.skip("native backend unavailable")
    sys = pendulum()
    vsys = var_ode_sys(sys, VarArgs.vars)
    state0 = [0.05, 0.025]
    ta = hy.taylor_adaptive(vsys, state0, tol=1e-15)
    t = 3.0
    ta.propagate_until(t)
    full0 = vsys.initial_state(state0)
    st_n, t_n, _ = native_propagate_until(
        ta.decomposition, full0, None, 0.0, t,
        taylor_order_from_tol(1e-15),
    )
    assert abs(t_n - t) < 1e-14
    np.testing.assert_allclose(
        np.asarray(ta.state), st_n, rtol=0, atol=1e-12
    )


def test_var_ode_sys_batch_matches_scalar():
    # reference: taylor_adaptive_batch's variational members
    # (taylor.hpp:958-1028) — the batch integrator accepts a var_ode_sys,
    # auto-fills per-lane variational ICs, and its Taylor map matches the
    # scalar integrator lane by lane
    sys = pendulum()
    vsys = var_ode_sys(sys, VarArgs.vars)
    rng = np.random.default_rng(5)
    states = 0.05 + 0.01 * rng.standard_normal((3, 2))
    tab = hy.taylor_adaptive_batch(vsys, states, tol=1e-15)
    assert tab.is_variational and tab.get_vorder() == 1
    assert tab.get_n_orig_sv() == 2 and tab.dim == 6
    t = 3.0
    tab.propagate_until(t)
    da = np.array([3e-3, -2e-3])
    mapped = tab.eval_taylor_map(da)
    assert mapped.shape == (3, 2)
    np.testing.assert_array_equal(tab.get_tstate(), mapped)
    for i in range(3):
        ta = hy.taylor_adaptive(vsys, states[i], tol=1e-15)
        ta.propagate_until(t)
        np.testing.assert_allclose(
            np.asarray(tab.state[i]), np.asarray(ta.state),
            rtol=0, atol=1e-12,
        )
        np.testing.assert_allclose(
            mapped[i], ta.eval_taylor_map(da), rtol=0, atol=1e-12
        )
    # per-lane deviations + vslice indexing
    das = np.tile(da, (3, 1))
    np.testing.assert_allclose(tab.eval_taylor_map(das), mapped)
    sl = tab.get_vslice(1, 0)
    assert np.asarray(tab.state[:, sl]).shape == (3, 2)
    # pickle round-trip keeps the variational identity
    import pickle

    tab2 = pickle.loads(pickle.dumps(tab))
    assert tab2.is_variational
    np.testing.assert_allclose(tab2.eval_taylor_map(da), mapped, atol=1e-12)
