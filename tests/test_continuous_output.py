"""Continuous-output tests (reference analog: test/continuous_output.cpp):
dense interpolation over a whole propagation, scalar + batch, both
directions, accuracy bounded by the integration tolerance."""

import math

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu import TaylorOutcome
from heyoka_tpu.models import pendulum


TOL = 1e-12  # moderate order keeps 1-cpu XLA compiles quick


def test_scalar_c_output_matches_grid():
    ta = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=TOL)
    oc, mn, mx, ns, co = ta.propagate_until(20.0, c_output=True)
    assert oc == TaylorOutcome.time_limit
    assert co.n_steps == ns
    lo, hi = co.bounds
    assert lo == pytest.approx(0.0) and hi == pytest.approx(20.0)

    ts = np.linspace(0.0, 20.0, 101)
    vals = co(ts)
    ta2 = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=TOL)
    *_, out = ta2.propagate_grid(ts)
    np.testing.assert_allclose(vals, out, rtol=0, atol=1e-13)

    # scalar call; end point equals the final state
    np.testing.assert_allclose(co(20.0), ta.state, rtol=0, atol=1e-14)


def test_c_output_backward():
    ta = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=TOL)
    ta.propagate_until(10.0)
    end = ta.state.copy()
    oc, *_, co = ta.propagate_until(0.0, c_output=True)
    lo, hi = co.bounds
    assert lo == pytest.approx(10.0) and hi == pytest.approx(0.0)
    ta2 = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=TOL)
    ta2.propagate_until(4.0)
    np.testing.assert_allclose(co(4.0), ta2.state, rtol=0, atol=1e-11)


def test_c_output_interpolation_error_below_tol():
    # circular-orbit-style check (doc/benchmarks.rst:250-275): the dense
    # output error inside each step stays at the tolerance level
    x, v = hy.make_vars("x", "v")
    sys = [(x, v), (v, -x)]
    ta = hy.taylor_adaptive(sys, [0.0, 1.0], tol=TOL)
    *_, co = ta.propagate_until(12.0, c_output=True)
    ts = np.linspace(0.01, 11.99, 777)
    vals = co(ts)
    np.testing.assert_allclose(vals[:, 0], np.sin(ts), rtol=0, atol=50 * TOL)
    np.testing.assert_allclose(vals[:, 1], np.cos(ts), rtol=0, atol=50 * TOL)


def test_batch_c_output(rng):
    states = 0.05 + 0.01 * rng.standard_normal((4, 2))
    tab = hy.taylor_adaptive_batch(pendulum(), states, tol=TOL)
    targets = np.array([5.0, 8.0, 3.0, -4.0])  # one backward lane
    ocs, mn, mx, ns, co = tab.propagate_until(targets, c_output=True)
    assert co.batch_size == 4
    np.testing.assert_array_equal(co.n_steps, ns)

    q = np.array([2.5, 7.0, 1.5, -2.0])
    vals = co(q)
    for i in range(4):
        ta = hy.taylor_adaptive(pendulum(), states[i], tol=TOL)
        ta.propagate_until(float(q[i]))
        np.testing.assert_allclose(vals[i], ta.state, rtol=0, atol=1e-12)

    # (n_times, batch) queries
    qs = np.stack([q * 0.3, q * 0.9])
    assert co(qs).shape == (2, 4, 2)


def test_c_output_with_nt_events_matches_plain():
    # c_output + events rides the stepwise recorder; interpolated values
    # must match the event-free on-device recorder
    x, v = hy.make_vars("x", "v")
    hits = []
    ta = hy.taylor_adaptive(
        pendulum(), [0.05, 0.025], tol=TOL,
        nt_events=[hy.nt_event(x, lambda ta_, t_, d_: hits.append(t_))],
    )
    oc, mn, mx, ns, co = ta.propagate_until(10.0, c_output=True)
    assert oc == TaylorOutcome.time_limit
    assert len(hits) == 10
    ta2 = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=TOL)
    *_, co2 = ta2.propagate_until(10.0, c_output=True)
    ts = np.linspace(0.0, 10.0, 101)
    np.testing.assert_allclose(co(ts), co2(ts), rtol=0, atol=1e-12)


def test_c_output_with_terminal_event_stop():
    # the recording ends at the terminal stop; the dense output covers
    # [0, t_stop] and matches the integrator's stop state at the boundary
    x, v = hy.make_vars("x", "v")
    ta = hy.taylor_adaptive(
        pendulum(), [0.05, 0.025], tol=TOL, t_events=[hy.t_event(v)]
    )
    oc, mn, mx, ns, co = ta.propagate_until(100.0, c_output=True)
    assert oc == 0
    t_stop = float(ta.time)
    lo, hi = co.bounds
    assert hi == pytest.approx(t_stop)
    np.testing.assert_allclose(
        np.asarray(co(np.array([t_stop]))[0]), ta.state, rtol=0, atol=1e-11
    )
    # velocity along the recorded trajectory vanishes only at the stop
    ts = np.linspace(0.0, t_stop, 50)
    vs = np.asarray(co(ts))[:, 1]
    assert np.min(np.abs(vs[:-1])) > 1e-4


def test_batch_c_output_with_events(rng):
    # per-lane terminal stops: each lane's dense output covers its own
    # interval, padded like the event-free batch recorder
    x, v = hy.make_vars("x", "v")
    states = 0.05 + 0.01 * rng.standard_normal((4, 2))
    tab = hy.taylor_adaptive_batch(
        pendulum(), states, tol=TOL, t_events=[hy.t_event(v)]
    )
    ocs, mn, mx, ns, co = tab.propagate_until(100.0, c_output=True)
    assert all(oc == 0 for oc in ocs)
    for i in range(4):
        t_stop = float(tab.time[i])
        ts = np.linspace(0.0, t_stop, 20)
        # ContinuousOutputBatch takes per-lane query times: (n_times, batch)
        per_lane = np.asarray(co(np.tile(ts[:, None], (1, 4))))
        ref = hy.taylor_adaptive(pendulum(), states[i], tol=TOL)
        *_, ref_co = ref.propagate_until(t_stop, c_output=True)
        np.testing.assert_allclose(
            per_lane[:, i, :], np.asarray(ref_co(ts)), rtol=0, atol=1e-10
        )
