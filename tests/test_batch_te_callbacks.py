"""Batch terminal events WITH callbacks through the on-device driver.

Reference: ``ed_data_batch::detect_events``
(src/detail/event_detection.cpp:1733) runs batch terminal-event handling
inside one step driver; callbacks decide continue-vs-stop at the event
time (events.hpp:151-309).  The rebuild's batch driver detects and
truncates on device and dispatches callbacks between driver re-entries
(VERDICT r4 item 7 — this replaces the host-stepwise fallback).
"""

import math

import numpy as np
import pytest

import heyoka_tpu as hy


def _pendulum():
    x, v = hy.make_vars("x", "v")
    return [(x, v), (v, -9.8 * hy.sin(x))]


def test_te_callback_continue_matches_scalar():
    B = 4
    hits_b, hits_s = [], []

    def cb_b(tb, sgn, lane):
        hits_b.append((round(float(np.asarray(tb.time)[lane]), 8), lane))
        return True  # continue

    def cb_s(ta, sgn):
        hits_s.append(round(ta.time, 8))
        return True

    x = hy.make_vars("x")
    rng = np.random.default_rng(3)
    st0 = np.tile([0.05, 0.025], (B, 1)) + rng.uniform(-1e-3, 1e-3, (B, 2))

    tb = hy.taylor_adaptive_batch(
        _pendulum(), st0, tol=1e-12,
        t_events=[hy.t_event(x, callback=cb_b)],
    )
    res = tb.propagate_until(np.full(B, 10.0))
    assert all(oc == hy.taylor_outcome.time_limit for oc in res[0])
    assert np.allclose(tb.time, 10.0)

    for i in range(B):
        ta = hy.taylor_adaptive(
            _pendulum(), st0[i], tol=1e-12,
            t_events=[hy.t_event(x, callback=cb_s)],
        )
        ta.propagate_until(10.0)
        np.testing.assert_allclose(ta.state, tb.state[i],
                                   rtol=1e-7, atol=1e-9)

    # every lane crossed x=0 the same number of times as its scalar twin
    lanes_b = sorted(t for t, _ in hits_b)
    assert len(hits_b) == len(hits_s)
    np.testing.assert_allclose(lanes_b, sorted(hits_s), rtol=1e-5)


def test_te_callback_stop_reports_event_index():
    B = 3

    def cb(tb, sgn, lane):
        return False  # stop this lane

    x = hy.make_vars("x")
    st0 = np.tile([0.05, 0.025], (B, 1))
    tb = hy.taylor_adaptive_batch(
        _pendulum(), st0, tol=1e-12,
        t_events=[hy.t_event(x, callback=cb)],
    )
    res = tb.propagate_until(np.full(B, 100.0))
    assert all(int(oc) == 0 for oc in res[0])  # stopping te index 0
    assert (np.asarray(tb.time) < 100.0).all()
    # stats are real
    assert (res[3] > 0).all() and np.isfinite(res[1]).all()


def test_te_callback_mixed_decisions():
    B = 4
    counts = np.zeros(B, int)

    def cb(tb, sgn, lane):
        counts[lane] += 1
        return counts[lane] < 2  # stop each lane at its second crossing

    x = hy.make_vars("x")
    rng = np.random.default_rng(5)
    st0 = np.tile([0.05, 0.025], (B, 1)) + rng.uniform(-1e-3, 1e-3, (B, 2))
    tb = hy.taylor_adaptive_batch(
        _pendulum(), st0, tol=1e-12,
        t_events=[hy.t_event(x, callback=cb)],
    )
    res = tb.propagate_until(np.full(B, 100.0))
    assert (counts == 2).all()
    assert all(int(oc) == 0 for oc in res[0])
    # stopped near the second x=0 crossing, well before the target
    assert (np.asarray(tb.time) < 5.0).all()


def test_te_callback_with_nt_events_together():
    B = 3
    nt_hits = []

    def nt_cb(tb, t, sgn, lane):
        nt_hits.append((lane, t))

    def te_cb(tb, sgn, lane):
        return True

    x, v = hy.make_vars("x", "v")
    st0 = np.tile([0.05, 0.025], (B, 1))
    tb = hy.taylor_adaptive_batch(
        _pendulum(), st0, tol=1e-12,
        t_events=[hy.t_event(x, callback=te_cb)],
        nt_events=[hy.nt_event(v, nt_cb)],
    )
    res = tb.propagate_until(np.full(B, 5.0))
    assert all(oc == hy.taylor_outcome.time_limit for oc in res[0])
    # v crosses zero ~ twice per ~2 s period over 5 s in every lane
    per_lane = [sum(1 for ln, _ in nt_hits if ln == i) for i in range(B)]
    assert all(3 <= n <= 6 for n in per_lane)
