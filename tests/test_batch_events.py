"""Batch event-detection tests (reference analog:
test/batch_event_detection.cpp): per-lane terminal/non-terminal events must
match the scalar integrator lane by lane."""

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu import TaylorOutcome, nt_event, t_event
from heyoka_tpu.models import pendulum

BATCH = 4


@pytest.fixture
def states(rng):
    return 0.05 + 0.01 * rng.standard_normal((BATCH, 2))


def test_batch_t_event_matches_scalar(states):
    x, v = hy.make_vars("x", "v")
    tab = hy.taylor_adaptive_batch(
        pendulum(), states, tol=1e-12, t_events=[t_event(v)]
    )
    ocs, mn, mx, ns = tab.propagate_until(100.0)
    # every lane stops at its first turning point (terminal event index 0)
    assert all(oc == 0 for oc in ocs)
    assert np.max(np.abs(tab.state[:, 1])) < 1e-10
    for i in range(BATCH):
        ta = hy.taylor_adaptive(
            pendulum(), states[i], tol=1e-12, t_events=[t_event(v)]
        )
        ta.propagate_until(100.0)
        assert tab.time[i] == ta.time
        np.testing.assert_array_equal(tab.state[i], ta.state)


def test_batch_nt_event_counts(states):
    x, v = hy.make_vars("x", "v")
    hits = [[] for _ in range(BATCH)]
    ev = nt_event(x, lambda tb, t, d, lane: hits[lane].append((t, d)))
    tab = hy.taylor_adaptive_batch(
        pendulum(), states, tol=1e-12, nt_events=[ev]
    )
    ocs, *_ = tab.propagate_until(10.0)
    assert all(oc == TaylorOutcome.time_limit for oc in ocs)
    # pendulum angle crosses zero twice per ~2.007 s period
    for h in hits:
        assert len(h) == 10
        # alternating directions
        dirs = [d for _, d in h]
        assert all(a != b for a, b in zip(dirs, dirs[1:]))


def test_batch_t_event_callback_continue(states):
    x, v = hy.make_vars("x", "v")
    count = [0] * BATCH

    def cb(tb, d_sgn, lane):
        count[lane] += 1
        return True

    tab = hy.taylor_adaptive_batch(
        pendulum(), states, tol=1e-12, t_events=[t_event(v, callback=cb)]
    )
    ocs, *_ = tab.propagate_until(20.0)
    assert all(oc == TaylorOutcome.time_limit for oc in ocs)
    np.testing.assert_allclose(tab.time, 20.0, atol=1e-12)
    # ~2 turning points per 2.007 s period
    for c in count:
        assert abs(c - 20.0) <= 2


def test_batch_grid_with_nt_events_matches_plain(states):
    # grid output with a (non-interfering) nt event must match the
    # event-free on-device grid driver lane by lane
    x, v = hy.make_vars("x", "v")
    grid = np.linspace(0.0, 5.0, 11)
    hits = [[] for _ in range(BATCH)]
    ev = nt_event(x, lambda tb, t, d, lane: hits[lane].append(t))
    tab = hy.taylor_adaptive_batch(pendulum(), states, tol=1e-12, nt_events=[ev])
    ocs, mn, mx, ns, out = tab.propagate_grid(grid)
    tab2 = hy.taylor_adaptive_batch(pendulum(), states, tol=1e-12)
    ocs2, *_, out2 = tab2.propagate_grid(grid)
    assert all(oc == TaylorOutcome.time_limit for oc in ocs)
    np.testing.assert_allclose(out, out2, rtol=0, atol=5e-13)
    assert all(len(h) == 5 for h in hits)  # 5 zero crossings in 5 s


def test_batch_grid_with_stopping_t_event(states):
    # lanes stop at their first turning point; grid rows past it are NaN
    x, v = hy.make_vars("x", "v")
    grid = np.linspace(0.0, 5.0, 26)
    tab = hy.taylor_adaptive_batch(
        pendulum(), states, tol=1e-12, t_events=[t_event(v)]
    )
    ocs, mn, mx, ns, out = tab.propagate_grid(grid)
    assert all(oc == 0 for oc in ocs)
    for i in range(BATCH):
        t_stop = float(tab.time[i])
        filled = grid <= t_stop
        assert np.isfinite(out[i][filled]).all()
        assert np.isnan(out[i][~filled]).all()
        # the filled rows match the scalar event-free dense output
        ta = hy.taylor_adaptive(pendulum(), states[i], tol=1e-12)
        _, *_, ref = ta.propagate_grid(grid[filled])
        np.testing.assert_allclose(out[i][filled], ref, rtol=0, atol=5e-13)


def test_batch_mixed_te_nt_on_device(states):
    # terminal + non-terminal events together ride the on-device batch
    # driver (callback-free terminal events are pure-stop); nt hits after
    # a lane's terminal stop must not be recorded
    x, v = hy.make_vars("x", "v")
    nhits = [[] for _ in range(BATCH)]
    tab = hy.taylor_adaptive_batch(
        pendulum(), states, tol=1e-12,
        t_events=[t_event(v)],
        nt_events=[nt_event(x, lambda tb, t, d, lane: nhits[lane].append(t))],
    )
    ocs, *_ = tab.propagate_until(100.0)
    assert all(oc == 0 for oc in ocs)
    for i in range(BATCH):
        # the first turning point precedes the first x zero-crossing
        assert not nhits[i]
        ta = hy.taylor_adaptive(
            pendulum(), states[i], tol=1e-12, t_events=[t_event(v)]
        )
        ta.propagate_until(100.0)
        assert tab.time[i] == ta.time
        np.testing.assert_array_equal(tab.state[i], ta.state)


def test_batch_event_overflow_replay_keeps_stopped_lanes():
    # lane 0 terminal-stops at t=0.5 while lane 1 records >1024 nt hits,
    # overflowing the recorder and replaying chunks: lane 0's outcome,
    # time, and state must survive the replays
    import math

    x, v = hy.make_vars("x", "v")
    nhits = [[] for _ in range(2)]
    tab = hy.taylor_adaptive_batch(
        pendulum(), np.tile([0.05, 0.025], (2, 1)), tol=1e-12,
        pars=np.array([[0.5], [1e9]]),
        t_events=[t_event(hy.time - hy.par[0])],
        nt_events=[nt_event(hy.sin(50.0 * hy.time) + 0.0 * x,
                            lambda tb, t, d, lane: nhits[lane].append(t))],
    )
    ocs, mn, mx, ns = tab.propagate_until(100.0)
    assert ocs[0] == 0
    assert ocs[1] == TaylorOutcome.time_limit
    assert abs(float(tab.time[0]) - 0.5) < 1e-12
    assert abs(float(tab.time[1]) - 100.0) < 1e-12
    expect = math.floor(100.0 * 50.0 / math.pi) + 1  # incl. the t=0 root
    assert len(nhits[1]) == expect
    assert all(a <= b for a, b in zip(nhits[1], nhits[1][1:]))
    assert all(t <= 0.5 + 1e-12 for t in nhits[0])


@pytest.mark.parametrize("pallas", [
    False, pytest.param("dd-interpret", marks=pytest.mark.slow)])
def test_batch_events_flat_engine_matches_loop(states, pallas):
    # the flat/dd-Pallas engines drive the event jet (jet_mode); roots,
    # stop times and outcomes must match the loop engine lane by lane
    x, v = hy.make_vars("x", "v")
    if pallas:
        # the dd kernel needs mp_order; pendulum's sin/cos tape is inside
        # the in-kernel rule set since round 2
        kw = dict(compact_mode="flat", mp_order=8, pallas_phase=pallas)
        tol_t = 1e-7  # two-f32 jet: step sequences differ slightly
    else:
        kw = dict(compact_mode="flat")
        tol_t = 1e-11
    hits_f = [[] for _ in range(BATCH)]
    hits_l = [[] for _ in range(BATCH)]

    def mk_cb(hits):
        return lambda tb, t, d, lane: hits[lane].append(t)

    tab_f = hy.taylor_adaptive_batch(
        pendulum(), states.copy(), tol=1e-12,
        t_events=[t_event(v)], nt_events=[nt_event(x, callback=mk_cb(hits_f))],
        **kw)
    tab_l = hy.taylor_adaptive_batch(
        pendulum(), states.copy(), tol=1e-12,
        t_events=[t_event(v)], nt_events=[nt_event(x, callback=mk_cb(hits_l))],
        compact_mode=True)
    ocs_f, *_ = tab_f.propagate_until(100.0)
    ocs_l, *_ = tab_l.propagate_until(100.0)
    assert [int(o) for o in ocs_f] == [int(o) for o in ocs_l]
    np.testing.assert_allclose(tab_f.time, tab_l.time, rtol=0, atol=tol_t)
    assert [len(h) for h in hits_f] == [len(h) for h in hits_l]
    for hf, hl in zip(hits_f, hits_l):
        np.testing.assert_allclose(hf, hl, rtol=0, atol=tol_t)


@pytest.mark.slow
def test_large_batch_f32_tier_matches_scalar():
    # B*n_ev >= 256 engages the certified-f32 isolation tier
    # (events_impl._make_tree_isolator_f32).  Rigor contract: identical
    # hits (count, times, directions) to the scalar integrator per lane.
    B = 384
    rng = np.random.default_rng(11)
    states = np.stack([
        0.05 + 0.02 * rng.standard_normal(B),
        0.025 + 0.01 * rng.standard_normal(B),
    ], axis=1)
    x, v = hy.make_vars("x", "v")
    hits_b = [[] for _ in range(B)]
    tab = hy.taylor_adaptive_batch(
        pendulum(), states.copy(), tol=1e-15, high_accuracy=True,
        nt_events=[nt_event(
            v, lambda tb, t, d, lane: hits_b[lane].append((t, d)))],
    )
    tab.propagate_until(20.0)
    for lane in range(0, B, 37):  # spot-check lanes incl. lane 0
        hits_s = []
        ta = hy.taylor_adaptive(
            pendulum(), states[lane], tol=1e-15, high_accuracy=True,
            nt_events=[nt_event(
                v, lambda ta_, t, d: hits_s.append((t, d)))],
        )
        ta.propagate_until(20.0)
        assert len(hits_b[lane]) == len(hits_s), lane
        for (tb_, db_), (ts_, ds_) in zip(sorted(hits_b[lane]), hits_s):
            assert abs(tb_ - ts_) < 1e-9, (lane, tb_, ts_)
            assert db_ == ds_


@pytest.mark.slow
def test_large_batch_f32_tier_terminal_events():
    # terminal events through the f32 tier: every lane must stop at its
    # first v=0 crossing, matching the scalar integrator's event time
    B = 300
    rng = np.random.default_rng(5)
    states = np.stack([
        0.05 + 0.02 * rng.standard_normal(B),
        0.025 + 0.01 * rng.standard_normal(B),
    ], axis=1)
    x, v = hy.make_vars("x", "v")
    tab = hy.taylor_adaptive_batch(
        pendulum(), states.copy(), tol=1e-15, t_events=[t_event(v)],
    )
    tab.propagate_until(50.0)
    oc = np.asarray([int(r[0]) for r in tab.get_propagate_res()])
    assert (oc == 0).all()  # stopped by t_event 0 everywhere
    for lane in range(0, B, 41):
        ta = hy.taylor_adaptive(
            pendulum(), states[lane], tol=1e-15, t_events=[t_event(v)],
        )
        ta.propagate_until(50.0)
        assert abs(float(np.asarray(tab.time)[lane]) - ta.time) < 1e-11


def test_full_driver_matches_chunked(states, monkeypatch):
    # the whole-propagation driver (one device dispatch, global hit
    # buffer) must produce byte-identical results to the chunked
    # re-entry loop it wraps: same hits, times, outcomes, diagnostics
    x, v = hy.make_vars("x", "v")

    def run(no_full):
        if no_full:
            monkeypatch.setenv("HEYOKA_EV_NO_FULL", "1")
        else:
            monkeypatch.delenv("HEYOKA_EV_NO_FULL", raising=False)
        hits = [[] for _ in range(BATCH)]
        tab = hy.taylor_adaptive_batch(
            pendulum(), states, tol=1e-12,
            nt_events=[nt_event(
                x, lambda tb, t, d, lane: hits[lane].append((t, d)))],
            t_events=[t_event(hy.time - hy.par[0])],
            pars=np.full((BATCH, 1), 8.25),
        )
        ocs, mn, mx, ns = tab.propagate_until(10.0)
        return hits, ocs, np.asarray(tab.state), np.asarray(tab.time), \
            np.asarray(mn), np.asarray(mx), np.asarray(ns)

    h_f, oc_f, st_f, t_f, mn_f, mx_f, ns_f = run(False)
    h_c, oc_c, st_c, t_c, mn_c, mx_c, ns_c = run(True)
    assert oc_f == oc_c
    np.testing.assert_array_equal(st_f, st_c)
    np.testing.assert_array_equal(t_f, t_c)
    np.testing.assert_array_equal(mn_f, mn_c)
    np.testing.assert_array_equal(mx_f, mx_c)
    np.testing.assert_array_equal(ns_f, ns_c)
    assert h_f == h_c
    assert all(len(h) > 0 for h in h_f)
    # terminal stop at t=8.25 on every lane
    assert all(oc == 0 for oc in oc_f)


@pytest.mark.slow
def test_vectorized_nt_callback_matches_scalar():
    """The vectorized nt-callback protocol (cb.vectorized = True, array
    args) must deliver the same hits in the same per-lane chronological
    order as per-hit dispatch (round-4; the per-hit Python loop
    dominated the batched Poincare bench end-to-end)."""
    import numpy as np

    import heyoka_tpu as hy

    x, v = hy.make_vars("x", "v")
    sys_ = [(x, v), (v, -x)]
    B = 16
    rng = np.random.default_rng(5)
    st = np.stack([rng.uniform(0.7, 1.3, B), np.zeros(B)], axis=1)

    scalar_hits = []
    vec_hits = []

    ev_s = hy.nt_event(x, lambda ta, t, d, lane: scalar_hits.append(
        (int(lane), float(t), int(d))))

    def vcb(ta, ts, sgns, lanes):
        for L, t, d in zip(lanes, ts, sgns):
            vec_hits.append((int(L), float(t), int(d)))

    vcb.vectorized = True
    ev_v = hy.nt_event(x, vcb)

    kw = dict(tol=1e-12, compact_mode="flat", mp_order=8)
    ta_s = hy.taylor_adaptive_batch(sys_, st.copy(), nt_events=[ev_s], **kw)
    ta_v = hy.taylor_adaptive_batch(sys_, st.copy(), nt_events=[ev_v], **kw)
    ta_s.propagate_until(20.0)
    ta_v.propagate_until(20.0)

    assert len(vec_hits) == len(scalar_hits) > 0
    # same per-lane hit sequences (global interleaving may differ)
    for i in range(B):
        a = [(t, d) for L, t, d in scalar_hits if L == i]
        b = [(t, d) for L, t, d in vec_hits if L == i]
        assert a == b
