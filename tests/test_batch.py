"""Batch-mode tests (reference analog: test/taylor_adaptive_batch.cpp,
two_body_batch.cpp): batch results must equal per-lane scalar results."""

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu import TaylorOutcome
from heyoka_tpu.models import pendulum


BATCH = 4


def make_states(rng):
    return 0.05 + 0.01 * rng.standard_normal((BATCH, 2))


def test_batch_step_matches_scalar(rng):
    states = make_states(rng)
    tab = hy.taylor_adaptive_batch(pendulum(), states, tol=1e-15)
    tab.step()
    for i in range(BATCH):
        ta = hy.taylor_adaptive(pendulum(), states[i], tol=1e-15)
        oc, h = ta.step()
        oc_b, h_b = tab.get_step_res()[i]
        assert oc_b == oc
        assert h_b == pytest.approx(h, rel=0, abs=0)
        np.testing.assert_array_equal(tab.state[i], ta.state)


def test_batch_propagate_until_matches_scalar(rng):
    states = make_states(rng)
    tab = hy.taylor_adaptive_batch(pendulum(), states, tol=1e-15)
    ocs, min_h, max_h, nsteps = tab.propagate_until(20.0)
    for i in range(BATCH):
        ta = hy.taylor_adaptive(pendulum(), states[i], tol=1e-15)
        oc, mn, mx, ns = ta.propagate_until(20.0)
        assert ocs[i] == oc
        assert nsteps[i] == ns
        # XLA may compile the vmapped while_loop body with different fusion
        # choices than the scalar one, so allow 1-ulp-per-step drift (the
        # reference's batch==scalar exactness relies on identical SIMD
        # instructions, which XLA does not guarantee across programs)
        np.testing.assert_allclose(tab.state[i], ta.state, rtol=0, atol=5e-14)
        np.testing.assert_allclose(tab.time[i], ta.time, rtol=0, atol=1e-12)


def test_batch_get_propagate_res(rng):
    """heyoka taylor_adaptive_batch::get_propagate_res (taylor.hpp:1120):
    per-lane (outcome, min_h, max_h, nsteps) of the last propagate_*."""
    states = make_states(rng)
    tab = hy.taylor_adaptive_batch(pendulum(), states, tol=1e-15)
    with pytest.raises(ValueError):
        tab.get_propagate_res()
    ocs, min_h, max_h, nsteps = tab.propagate_until(5.0)
    res = tab.get_propagate_res()
    assert len(res) == BATCH
    for i, (oc, mn, mx, ns) in enumerate(res):
        assert oc == ocs[i]
        assert mn == min_h[i] and mx == max_h[i] and ns == nsteps[i]
    # propagate_for / propagate_grid refresh the stash
    tab.propagate_for(1.0)
    assert all(r[0] == TaylorOutcome.time_limit
               for r in tab.get_propagate_res())
    *_, out = tab.propagate_grid(np.linspace(6.0, 7.0, 3))
    assert all(r[3] > 0 for r in tab.get_propagate_res())


def test_batch_per_lane_targets(rng):
    states = make_states(rng)
    tab = hy.taylor_adaptive_batch(pendulum(), states, tol=1e-15)
    targets = np.array([1.0, 2.0, 3.0, 4.0])
    tab.propagate_until(targets)
    np.testing.assert_allclose(tab.time, targets, atol=1e-12)


def test_batch_grid(rng):
    states = make_states(rng)
    tab = hy.taylor_adaptive_batch(pendulum(), states, tol=1e-15)
    grid = np.linspace(0.0, 3.0, 7)
    ocs, mn, mx, ns, out = tab.propagate_grid(grid)
    assert out.shape == (BATCH, 7, 2)
    for i in range(BATCH):
        ta = hy.taylor_adaptive(pendulum(), states[i], tol=1e-15)
        *_, out_s = ta.propagate_grid(grid)
        np.testing.assert_allclose(out[i], out_s, rtol=0, atol=1e-13)


def test_batch_update_d_output(rng):
    states = 0.05 + 0.01 * rng.standard_normal((3, 2))
    tab = hy.taylor_adaptive_batch(pendulum(), states, tol=1e-12)
    tab.step()
    mid = tab.time - 0.5 * tab.last_h
    dd = tab.update_d_output(mid)
    for i in range(3):
        ta = hy.taylor_adaptive(pendulum(), states[i], tol=1e-12)
        ta.step()
        want = ta.update_d_output(float(mid[i]))
        np.testing.assert_allclose(dd[i], want, rtol=0, atol=1e-15)
