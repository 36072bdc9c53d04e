"""Event-detection tests (reference analogs: test/taylor_t_event.cpp,
taylor_nt_event.cpp, event_detection.cpp)."""

import math

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu import TaylorOutcome, t_event, nt_event, EventDirection
from heyoka_tpu.models import pendulum


def test_nt_event_zero_crossings():
    # harmonic oscillator x'' = -x, x(0)=0, v(0)=1 -> x = sin(t),
    # zeros at k*pi
    x, v = hy.make_vars("x", "v")
    sys = [(x, v), (v, -x)]
    hits = []
    ev = nt_event(x, lambda ta, t, d: hits.append((t, d)))
    ta = hy.taylor_adaptive(sys, [0.0, 1.0], tol=1e-15, nt_events=[ev])
    ta.propagate_until(10.0)
    times = [t for t, _ in hits]
    want = [0.0, math.pi, 2 * math.pi, 3 * math.pi]
    # the root at t=0 may or may not be reported depending on the first
    # step's sign layout; check the interior roots rigorously
    interior = [t for t in times if t > 0.1]
    assert len(interior) == 3
    np.testing.assert_allclose(interior, want[1:], atol=1e-11)
    # directions: x goes + -> - at pi (d=-1), - -> + at 2pi (d=+1)
    d_by_time = {round(t, 3): d for t, d in hits}
    assert d_by_time[round(math.pi, 3)] == -1
    assert d_by_time[round(2 * math.pi, 3)] == 1


def test_nt_event_direction_filter():
    x, v = hy.make_vars("x", "v")
    sys = [(x, v), (v, -x)]
    hits = []
    ev = nt_event(
        x, lambda ta, t, d: hits.append(t), direction=EventDirection.positive
    )
    ta = hy.taylor_adaptive(sys, [0.0, 1.0], tol=1e-15, nt_events=[ev])
    ta.propagate_until(10.0)
    interior = [t for t in hits if t > 0.1]
    np.testing.assert_allclose(interior, [2 * math.pi], atol=1e-11)


def test_t_event_stops():
    # pendulum: stop when v crosses zero (the turning point)
    x, v = hy.make_vars("x", "v")
    ev = t_event(v)
    ta = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-15, t_events=[ev])
    oc, *_ = ta.propagate_until(100.0)
    assert oc == 0  # terminal event index
    assert ta.time < 100.0
    assert abs(ta.state[1]) < 1e-10  # stopped at v == 0


def test_t_event_callback_continue():
    # count turning points but keep going
    x, v = hy.make_vars("x", "v")
    count = []

    def cb(ta, d_sgn):
        count.append(ta.time)
        return True  # continue

    ev = t_event(v, callback=cb)
    ta = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-15, t_events=[ev])
    oc, *_ = ta.propagate_until(20.0)
    assert oc == TaylorOutcome.time_limit
    assert ta.time == pytest.approx(20.0, abs=1e-12)
    # pendulum period ~ 2*pi/sqrt(9.8) = 2.007; two turning points per period
    T = 2 * math.pi / math.sqrt(9.8)
    assert len(count) == pytest.approx(2 * 20.0 / T, abs=1.5)
    # turning points spaced ~T/2 apart
    gaps = np.diff(count)
    np.testing.assert_allclose(gaps, T / 2, rtol=5e-3)


def test_t_event_cooldown_explicit():
    # with a huge cooldown, only the first trigger happens
    x, v = hy.make_vars("x", "v")
    count = []
    ev = t_event(v, callback=lambda ta, d: (count.append(ta.time), True)[1],
                 cooldown=1000.0)
    ta = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-15, t_events=[ev])
    ta.propagate_until(20.0)
    assert len(count) == 1


def test_step_semantics_with_events():
    # Event equations ride along as sv_funcs and participate in the timestep
    # norms (reference: taylor_determine_h, src/taylor_00.cpp:168-195).  With
    # an event equation that is itself a state variable (here: x), the norms
    # are unchanged, so the step must match the plain stepper exactly even
    # though the event machinery runs (and x never crosses zero here).
    x, v = hy.make_vars("x", "v")
    ev = t_event(x, direction=hy.EventDirection.negative)
    ta_e = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-15, t_events=[ev])
    ta_p = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-15)
    oc_e, h_e = ta_e.step()
    oc_p, h_p = ta_p.step()
    assert oc_p == TaylorOutcome.success
    assert oc_e == TaylorOutcome.success
    assert h_e == pytest.approx(h_p, rel=1e-14)
    np.testing.assert_allclose(ta_e.state, ta_p.state, rtol=0, atol=1e-14)

    # with an sv_func of much larger magnitude the reference semantics give a
    # *different* (larger) step, because num_rho grows with the state norm
    ev2 = t_event(x - 100.0)
    ta_e2 = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-15, t_events=[ev2])
    _, h_e2 = ta_e2.step()
    assert h_e2 > h_p


def test_grid_with_nt_events_matches_plain():
    # grid output with a (non-interfering) nt event must match the
    # event-free on-device grid driver
    x, v = hy.make_vars("x", "v")
    grid = np.linspace(0.0, 5.0, 11)
    hits = []
    ev = nt_event(x, lambda ta, t, d: hits.append(t))
    ta = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-12, nt_events=[ev])
    oc, mn, mx, ns, out = ta.propagate_grid(grid)
    ta2 = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-12)
    oc2, *_, out2 = ta2.propagate_grid(grid)
    assert oc == TaylorOutcome.time_limit
    np.testing.assert_allclose(out, out2, rtol=0, atol=5e-13)
    assert len(hits) == 5  # 5 zero crossings of x in 5 s


def test_grid_with_stopping_t_event():
    # propagation stops at the first turning point; later grid rows are NaN
    x, v = hy.make_vars("x", "v")
    grid = np.linspace(0.0, 5.0, 26)
    ta = hy.taylor_adaptive(
        pendulum(), [0.05, 0.025], tol=1e-12, t_events=[t_event(v)]
    )
    oc, mn, mx, ns, out = ta.propagate_grid(grid)
    assert oc == 0  # terminal event index
    t_stop = ta.time
    assert abs(ta.state[1]) < 1e-10
    filled = grid <= t_stop
    assert np.isfinite(out[filled]).all()
    assert np.isnan(out[~filled]).all()
    # filled rows match the event-free dense output
    ta2 = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-12)
    _, *_, ref = ta2.propagate_grid(grid[filled])
    np.testing.assert_allclose(out[filled], ref, rtol=0, atol=5e-13)


def test_isolator_close_and_double_roots():
    # direct check of the Collins-Akritas isolator: (s-0.3)^2 (s-0.7) has a
    # double root at 0.3 (no sign change -- invisible to sampled detection)
    # and a simple root at 0.7
    import jax.numpy as jnp
    from heyoka_tpu.taylor.events_impl import _make_isolator

    # expand (s-a)^2 (s-b): s^3 - (2a+b) s^2 + (a^2+2ab) s - a^2 b
    a, b = 0.3, 0.7
    c = jnp.asarray([-a * a * b, a * a + 2 * a * b, -(2 * a + b), 1.0, 0.0])
    iso = _make_isolator(4, jnp.float64, 4)
    rlo, rhi, valid = iso(c)
    ivals = [
        (float(rlo[i]), float(rhi[i])) for i in range(4) if valid[i]
    ]
    # every isolating interval contains a true root (near the double root,
    # coefficient rounding noise can emit two adjacent ~sqrt(eps)-wide
    # intervals — deduped downstream in find_roots), and both roots are
    # covered
    slack = 1e-7
    for lo, hi in ivals:
        assert (lo - slack <= a <= hi + slack) or (lo - slack <= b <= hi + slack)
    assert any(lo - slack <= a <= hi + slack for lo, hi in ivals)
    assert any(lo - slack <= b <= hi + slack for lo, hi in ivals)


def test_close_root_pair_within_one_step():
    # |v| = 1e-4 crossings straddle each pendulum turning point ~4e-4 s
    # apart -- far below the old sampling grid resolution of a ~0.1 s step;
    # rigorous isolation must find all four per period
    x, v = hy.make_vars("x", "v")
    hits = []
    ev = nt_event(v * v - 1e-8, lambda ta, t, d: hits.append(t))
    ta = hy.taylor_adaptive(
        pendulum(), [0.05, 0.025], tol=1e-15, nt_events=[ev]
    )
    period = 2.00709  # small-angle-corrected period for this amplitude
    ta.propagate_until(period)
    assert len(hits) == 4
    hits = sorted(hits)
    # the two crossings of each pair straddle a turning point closely
    assert hits[1] - hits[0] < 1e-3
    assert hits[3] - hits[2] < 1e-3
    assert hits[2] - hits[1] > 0.5


def test_nt_fast_path_overflow_chunking():
    # >1024 hits forces the on-device recorder to overflow and the host to
    # re-enter (replaying the overflowing step): no hit may be lost
    hits = []
    x, v = hy.make_vars("x", "v")
    ev = nt_event(hy.sin(50.0 * hy.time) + 0.0 * x,
                  lambda ta, t, d: hits.append(t))
    ta = hy.taylor_adaptive(
        pendulum(), [0.05, 0.025], tol=1e-12, nt_events=[ev]
    )
    oc, *_ = ta.propagate_until(100.0)
    assert oc == TaylorOutcome.time_limit
    expect = math.floor(100.0 * 50.0 / math.pi) + 1  # incl. the t=0 root
    assert len(hits) == expect
    assert all(a <= b for a, b in zip(hits, hits[1:]))
    worst = max(abs(h - round(h * 50 / math.pi) * math.pi / 50) for h in hits)
    assert worst < 1e-12


def test_wavy_ramp_bouncing_ball():
    # reference test/wavy_ramp.cpp "accurate event propagation": a ball
    # under constant gravity bounces off a wavy ramp and off y=0; both
    # terminal events carry state-modifying continue-callbacks and the
    # (highly nonlinear) event equation must hold to precision at every
    # trigger.  Exercises: sv-func participation in the timestep norms,
    # cooldown auto-deduction, repeated te re-entry, callback mutation.
    x, y, vx, vy = hy.make_vars("x", "y", "vx", "vy")
    pi = math.pi
    curve_eq = y - (1.0 - x + 0.05 * hy.cos(11 * pi * x))
    n_hits = [0, 0]

    def cb_curve(ta, d_sgn):
        X, Y, VX, VY = np.asarray(ta.state)
        assert abs(Y - (1.0 - X + 0.05 * math.cos(11 * pi * X))) < 1e-9
        gx = 1.0 + 0.05 * 11 * pi * math.sin(11 * pi * X)
        gy = 1.0
        gn = math.hypot(gx, gy)
        gx, gy = gx / gn, gy / gn
        vp = VX * gx + VY * gy
        st = np.array([X, Y, VX - 1.8 * vp * gx, VY - 1.8 * vp * gy])
        ta.state = st
        n_hits[0] += 1
        return True

    def cb_bottom(ta, d_sgn):
        st = np.array(ta.state)
        assert abs(st[1]) < 1e-9
        st[3] = -0.8 * st[3]
        ta.state = st
        n_hits[1] += 1
        return True

    ta = hy.taylor_adaptive(
        [(x, vx), (y, vy), (vx, hy.Number(0.0)),
         (vy, hy.Number(-1.0))],
        [0.0, 1.2, 0.0, 0.0],
        tol=1e-15,
        t_events=[
            t_event(curve_eq, callback=cb_curve,
                    direction=EventDirection.negative),
            t_event(y, callback=cb_bottom,
                    direction=EventDirection.negative),
        ],
    )
    # reference "assertion misfire" case: a raw step of this
    # constant-acceleration system has an unbounded natural h -> the
    # non-finite guard must fire (err_nf_state), not an assertion
    ta_nf = hy.taylor_adaptive(
        [(x, vx), (y, vy), (vx, hy.Number(0.0)),
         (vy, hy.Number(-1.0))],
        [0.0, 1.2, 0.0, 0.0], tol=1e-15,
        t_events=[
            t_event(curve_eq, direction=EventDirection.negative),
            t_event(y, direction=EventDirection.negative),
        ],
    )
    assert ta_nf.step()[0] == TaylorOutcome.err_nf_state
    assert ta_nf.step(10.0)[0] == TaylorOutcome.err_nf_state

    oc, *_ = ta.propagate_until(10.0)
    assert oc == TaylorOutcome.time_limit
    assert ta.time == pytest.approx(10.0, abs=1e-12)
    assert n_hits[0] >= 1  # ramp bounces happened
