"""Step-callback support across propagate_* (reference analog:
kw::callback in taylor.hpp propagate functions + test/step_callback.cpp):
host callbacks stop with cb_stop, in-graph callbacks trace into the
on-device drivers, batch variants apply per lockstep iteration."""

import numpy as np

import heyoka_tpu as hy
from heyoka_tpu import TaylorOutcome
from heyoka_tpu.callback import AngleReducer
from heyoka_tpu.models import pendulum

TWO_PI = 2.0 * np.pi


def _rotor():
    # x' = v, v' = 0 with v0 = 1: x ramps linearly, ideal for angle wrapping
    x, v = hy.make_vars("x", "v")
    return [(x, v), (v, 0.0 * x)]


def test_scalar_grid_in_graph_angle_reducer():
    ta = hy.taylor_adaptive(_rotor(), [0.0, 1.0], tol=1e-12)
    grid = np.linspace(0.0, 50.0, 11)
    oc, mn, mx, ns, out = ta.propagate_grid(
        grid, callback=AngleReducer(["x"])
    )
    assert oc == TaylorOutcome.time_limit
    assert 0.0 <= float(ta.state[0]) < TWO_PI
    # the final grid row reflects the *unreduced* dense output of the last
    # step's polynomial (reduction applies to the carried state, like the
    # reference); x mod 2pi must agree with t mod 2pi
    assert np.isclose(float(ta.state[0]), 50.0 % TWO_PI, atol=1e-10)


def test_scalar_grid_host_callback_stop():
    calls = []

    def cb(ta_):
        calls.append(float(ta_.time))
        return len(calls) < 3

    ta = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-12)
    grid = np.linspace(0.0, 1000.0, 101)
    oc, mn, mx, ns, out = ta.propagate_grid(grid, callback=cb)
    assert oc == TaylorOutcome.cb_stop
    assert len(calls) == 3 and ns == 3
    # rows past the stop time are NaN
    reached = grid <= ta.time
    assert np.isfinite(out[reached]).all()
    assert np.isnan(out[~reached]).all()


def test_batch_until_host_callback_stop(rng):
    states = 0.05 + 0.01 * rng.standard_normal((4, 2))
    calls = []

    def cb(tb):
        calls.append(np.asarray(tb.time).copy())
        return len(calls) < 5

    tab = hy.taylor_adaptive_batch(pendulum(), states, tol=1e-12)
    ocs, mn, mx, ns = tab.propagate_until(1000.0, callback=cb)
    assert all(oc == TaylorOutcome.cb_stop for oc in ocs)
    assert len(calls) == 5
    assert (ns == 5).all()


def test_batch_until_in_graph_angle_reducer():
    states = np.array([[0.0, 1.0], [1.0, 2.0]])
    tab = hy.taylor_adaptive_batch(_rotor(), states, tol=1e-12)
    ocs, *_ = tab.propagate_until(40.0, callback=AngleReducer(["x"]))
    assert all(oc == TaylorOutcome.time_limit for oc in ocs)
    xs = tab.state[:, 0]
    assert (xs >= 0.0).all() and (xs < TWO_PI).all()
    np.testing.assert_allclose(
        xs, [40.0 % TWO_PI, (1.0 + 2.0 * 40.0) % TWO_PI], atol=1e-9
    )


def test_batch_grid_host_callback_stop(rng):
    states = 0.05 + 0.01 * rng.standard_normal((3, 2))
    tab = hy.taylor_adaptive_batch(pendulum(), states, tol=1e-12)
    grid = np.linspace(0.0, 1000.0, 51)
    n = [0]

    def cb(tb):
        n[0] += 1
        return n[0] < 4

    ocs, mn, mx, ns, out = tab.propagate_grid(grid, callback=cb)
    assert all(oc == TaylorOutcome.cb_stop for oc in ocs)
    for i in range(3):
        reached = grid <= float(tab.time[i])
        assert np.isfinite(out[i][reached]).all()
        assert np.isnan(out[i][~reached]).all()


def test_until_callback_with_events(rng):
    # events + host callback share the stepwise driver
    x, v = hy.make_vars("x", "v")
    hits = []
    steps = [0]

    def cb(tb):
        steps[0] += 1
        return True

    tab = hy.taylor_adaptive_batch(
        pendulum(), 0.05 + 0.01 * rng.standard_normal((2, 2)), tol=1e-12,
        nt_events=[hy.nt_event(x, lambda tb_, t, d, lane: hits.append(t))],
    )
    ocs, *_ = tab.propagate_until(10.0, callback=cb)
    assert all(oc == TaylorOutcome.time_limit for oc in ocs)
    assert steps[0] > 0
    assert len(hits) == 20  # 10 crossings per lane
