"""Integrator-level tests (reference analogs: test/taylor_adaptive.cpp,
two_body.cpp, back_and_forth.cpp, timestep_check.cpp)."""

import math

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu import TaylorOutcome
from heyoka_tpu.models import pendulum, pendulum_energy


def make_pendulum_ta(**kw):
    return hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-15, **kw)


def test_order_from_tol():
    assert hy.taylor_order_from_tol(1e-15) == 19
    assert hy.taylor_order_from_tol(2.2e-16) == 20
    assert hy.taylor_order_from_tol(0.9) == 2


def test_step_and_outcome():
    ta = make_pendulum_ta()
    oc, h = ta.step()
    assert oc == TaylorOutcome.success
    assert 0 < h < 1
    assert ta.time == pytest.approx(h)
    oc, h2 = ta.step(max_delta_t=1e-4)
    assert oc == TaylorOutcome.time_limit
    assert h2 == pytest.approx(1e-4)


def test_step_backward():
    ta = make_pendulum_ta()
    oc, h = ta.step_backward()
    assert oc == TaylorOutcome.success
    assert h < 0
    assert ta.time < 0


def test_propagate_until_reaches_target():
    ta = make_pendulum_ta()
    oc, min_h, max_h, nsteps = ta.propagate_until(10.0)
    assert oc == TaylorOutcome.time_limit
    assert ta.time == pytest.approx(10.0, abs=1e-12)
    assert nsteps > 10
    assert 0 < min_h <= max_h


def test_propagate_for_energy_conservation():
    ta = make_pendulum_ta()
    cf = hy.make_cfunc([pendulum_energy()], vars=["x", "v"])
    e0 = float(np.asarray(cf(ta.state))[0])
    ta.propagate_for(1000.0)
    e1 = float(np.asarray(cf(ta.state))[0])
    assert abs(e1 - e0) / abs(e0) < 1e-12


def test_back_and_forth():
    # reference: test/back_and_forth.cpp — time reversibility
    ta = make_pendulum_ta()
    s0 = ta.state.copy()
    ta.propagate_until(100.0)
    ta.propagate_until(0.0)
    assert abs(ta.time) < 1e-14
    np.testing.assert_allclose(ta.state, s0, rtol=0, atol=1e-11)


def test_vs_jax_odeint():
    from jax.experimental.ode import odeint
    import jax.numpy as jnp

    ta = make_pendulum_ta()
    ta.propagate_until(10.0)

    def f(y, t):
        return jnp.array([y[1], -9.8 * jnp.sin(y[0])])

    ref = odeint(
        f, jnp.array([0.05, 0.025]), jnp.array([0.0, 10.0]),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(ta.state, np.asarray(ref[1]), atol=2e-9)


def test_propagate_grid():
    ta = make_pendulum_ta()
    grid = np.linspace(0.0, 5.0, 23)
    oc, min_h, max_h, nsteps, out = ta.propagate_grid(grid)
    assert oc == TaylorOutcome.time_limit
    assert out.shape == (23, 2)
    assert out[0, 0] == pytest.approx(0.05)
    # cross-check: fresh integrator propagated pointwise
    ta2 = make_pendulum_ta()
    for i, t in enumerate(grid):
        ta2.propagate_until(float(t))
        np.testing.assert_allclose(out[i], ta2.state, rtol=0, atol=1e-12)


def test_dense_output():
    ta = make_pendulum_ta()
    ta.step()
    t_half = ta.time - ta.last_h / 2
    d = ta.update_d_output(t_half)
    ta2 = make_pendulum_ta()
    ta2.propagate_until(t_half)
    np.testing.assert_allclose(d, ta2.state, rtol=0, atol=1e-13)


def test_high_accuracy_mode():
    ta = make_pendulum_ta(high_accuracy=True)
    oc, _ = ta.step()
    assert oc == TaylorOutcome.success
    ta.propagate_until(100.0)
    cf = hy.make_cfunc([pendulum_energy()], vars=["x", "v"])
    e0 = float(np.asarray(cf(np.array([0.05, 0.025])))[0])
    e1 = float(np.asarray(cf(ta.state))[0])
    assert abs(e1 - e0) / abs(e0) < 1e-12


def test_nonfinite_detection():
    x = hy.make_vars("x")
    ta = hy.taylor_adaptive([(x, x * x)], [1.0], tol=1e-9)
    # finite-time blow-up at t=1
    oc, *_ = ta.propagate_until(2.0, max_steps=10_000)
    assert oc == TaylorOutcome.err_nf_state


def test_step_limit():
    ta = make_pendulum_ta()
    oc, *_ , nsteps = ta.propagate_until(1000.0, max_steps=5)
    assert oc == TaylorOutcome.step_limit
    assert nsteps == 5


def test_max_delta_t_cap():
    ta = make_pendulum_ta()
    oc, min_h, max_h, ns = ta.propagate_until(1.0, max_delta_t=0.01)
    assert max_h <= 0.01 + 1e-15
    assert ns >= 100


def test_time_dependent_rhs():
    # x' = cos(t), x(t) = sin(t)
    x = hy.make_vars("x")
    ta = hy.taylor_adaptive([(x, hy.cos(hy.time))], [0.0], tol=1e-15)
    ta.propagate_until(2.0)
    assert ta.state[0] == pytest.approx(math.sin(2.0), abs=1e-14)


def test_pars_runtime():
    x, v = hy.make_vars("x", "v")
    sys = [(x, v), (v, -hy.par[0] * hy.sin(x))]
    ta = hy.taylor_adaptive(sys, [0.05, 0.025], pars=[9.8], tol=1e-15)
    ta.propagate_until(10.0)
    ta_ref = make_pendulum_ta()
    ta_ref.propagate_until(10.0)
    np.testing.assert_allclose(ta.state, ta_ref.state, atol=1e-14)


def test_float32_mode():
    import jax.numpy as jnp

    ta = hy.taylor_adaptive(
        pendulum(), [0.05, 0.025], tol=1e-6, dtype=jnp.float32
    )
    assert ta.order == hy.taylor_order_from_tol(1e-6)
    ta.propagate_until(10.0)
    ta64 = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-6)
    ta64.propagate_until(10.0)
    np.testing.assert_allclose(ta.state, ta64.state, rtol=0, atol=5e-4)
