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
