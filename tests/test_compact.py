"""Compact-mode jet engine tests (reference analog: the compact_mode=true
sweeps of the test/taylor_* suite): compact must agree with the unrolled
engine to roundoff on every op family, and integrators must accept
compact_mode=True."""

import numpy as np
import jax.numpy as jnp
import pytest

import heyoka_tpu as hy
from heyoka_tpu.expr.decompose import taylor_decompose_sys
from heyoka_tpu.taylor.compact import make_jet_fn_compact
from heyoka_tpu.taylor.jet import make_jet_fn
from heyoka_tpu.models import pendulum, nbody

ORDER = 9

x, y = hy.make_vars("x", "y")

CASES = [
    ("pendulum", pendulum(), [0.05, 0.025], []),
    (
        "trig",
        [
            (x, hy.sin(x) * hy.cos(y) + hy.tan(0.3 * x)),
            (y, hy.exp(-y) + hy.atan2(x, y) + x ** -1.5),
        ],
        [0.7, 1.3],
        [],
    ),
    (
        "kepE",
        [(x, hy.kepE(0.3, y)), (y, hy.sqrt(x) + hy.log(y) + hy.erf(x))],
        [1.2, 0.8],
        [],
    ),
    (
        "kepFDE",
        [
            (x, hy.kepF(0.1, 0.2, y)),
            (y, hy.kepDE(0.1, 0.2, x) + hy.asin(0.3 * x) + hy.tanh(y)
             + hy.sigmoid(x)),
        ],
        [0.9, 0.7],
        [],
    ),
    (
        "select",
        [
            (x, hy.select(hy.gt(x, 0.0), x * x, -x) + hy.relu(y)),
            (y, hy.sigmoid(x) + hy.atan(y) + hy.acos(0.2 * x) + hy.sinh(y)),
        ],
        [0.5, -0.3],
        [],
    ),
    (
        "par_time",
        [(x, hy.par[0] * hy.sin(hy.time) + hy.par[1] * x), (y, hy.time * y)],
        [0.4, 0.6],
        [1.1, -0.2],
    ),
]


@pytest.mark.parametrize("name,sys_,st,pars", CASES, ids=[c[0] for c in CASES])
def test_compact_matches_unrolled(name, sys_, st, pars):
    tape = taylor_decompose_sys(sys_)
    stj = jnp.asarray(np.asarray(st, float))
    pj = jnp.asarray(np.asarray(pars, float))
    t = jnp.asarray(0.3)
    a = np.asarray(make_jet_fn(tape, ORDER)(stj, pj, t))
    b = np.asarray(make_jet_fn_compact(tape, ORDER)(stj, pj, t))
    np.testing.assert_allclose(b, a, rtol=0, atol=1e-13 * np.maximum(1.0, np.abs(a)).max())


@pytest.mark.slow
def test_compact_nbody():
    rng = np.random.default_rng(0)
    base = np.array(
        [0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 1.5, 0, -0.8, 0, 0], float
    )
    st = jnp.asarray(base + 0.01 * rng.standard_normal(18))
    tape = taylor_decompose_sys(nbody(3, masses=[1.0, 1e-3, 2e-3]))
    a = np.asarray(make_jet_fn(tape, 11)(st, jnp.zeros(0), jnp.asarray(0.0)))
    b = np.asarray(make_jet_fn_compact(tape, 11)(st, jnp.zeros(0), jnp.asarray(0.0)))
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-15)


def test_compact_integrator_end_to_end():
    ta_c = hy.taylor_adaptive(
        pendulum(), [0.05, 0.025], tol=1e-12, compact_mode=True
    )
    assert ta_c.compact_mode
    ta_u = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-12)
    ta_c.propagate_until(10.0)
    ta_u.propagate_until(10.0)
    np.testing.assert_allclose(ta_c.state, ta_u.state, rtol=0, atol=5e-13)


def test_compact_with_eop_fallback():
    # data-driven interpolation ops run through the scalar-rule fallback
    from heyoka_tpu.models import pm_x
    from heyoka_tpu.utils.timeconv import cal_to_jd, jd_utc_to_tt

    t1, t2 = jd_utc_to_tt(cal_to_jd(2020, 1, 1), 0.0)
    t0 = float(((t1 - 2451545.0) + t2) / 36525.0)
    sys_ = [(x, pm_x() * 1e6 + 0.0 * x)]
    tape = taylor_decompose_sys(sys_)
    a = np.asarray(
        make_jet_fn(tape, 5)(jnp.asarray([0.1]), jnp.zeros(0), jnp.asarray(t0))
    )
    b = np.asarray(
        make_jet_fn_compact(tape, 5)(jnp.asarray([0.1]), jnp.zeros(0), jnp.asarray(t0))
    )
    np.testing.assert_allclose(b, a, rtol=0, atol=1e-18)


def test_flat_and_mixed_match_loop():
    # the flat-layout batched step and its mixed-precision variant
    from heyoka_tpu.taylor.compact_flat import make_batched_step_flat
    from heyoka_tpu.taylor.compact_loop import make_batched_step

    sys_ = [
        (x, hy.kepE(0.3, y) + hy.sigmoid(x) + hy.tan(0.2 * x)),
        (y, hy.sqrt(x) + hy.log(y) + hy.erf(x) + hy.kepF(0.1, 0.2, x)
         + hy.asin(0.2 * x) + hy.tanh(y) + hy.atan2(x, y)),
    ]
    tape = taylor_decompose_sys(sys_)
    B = 4
    st = jnp.asarray(np.tile([[1.2, 0.8]], (B, 1)))
    p = jnp.zeros((B, 0))
    t = jnp.full((B,), 0.3)
    mdt = jnp.full((B,), 1e9)
    import jax

    s1, h1 = jax.jit(make_batched_step(tape, 11))(st, p, t, mdt)
    s2, h2 = jax.jit(make_batched_step_flat(tape, 11))(st, p, t, mdt)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))

    # mixed precision: step sizes agree to the f32-high-order level
    s3, h3 = jax.jit(make_batched_step_flat(tape, 11, mp_order=6))(st, p, t, mdt)
    np.testing.assert_allclose(np.asarray(h3), np.asarray(h1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s3), np.asarray(s1), rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_flat_3d_unroll_staged_variants():
    # the 3-D layout / unrolled / staged variants of the flat engine must
    # agree with the baseline flat step (jit via jit_flat_step: XLA:CPU
    # miscompiles the unrolled 3-D graph at default opt — see its docstring)
    from heyoka_tpu.taylor.compact_flat import (
        make_batched_step_flat, jit_flat_step,
    )
    import jax

    sys_ = [
        (x, hy.kepE(0.3, y) + hy.sigmoid(x) + hy.tan(0.2 * x)),
        (y, hy.sqrt(x) + hy.log(y) + hy.erf(x) + hy.kepF(0.1, 0.2, x)
         + hy.asin(0.2 * x) + hy.tanh(y) + hy.atan2(x, y)),
    ]
    tape = taylor_decompose_sys(sys_)
    B = 4
    st = jnp.asarray(np.tile([[1.2, 0.8]], (B, 1)))
    p = jnp.zeros((B, 0))
    t = jnp.full((B,), 0.3)
    mdt = jnp.full((B,), 1e9)
    s0, h0 = jax.jit(make_batched_step_flat(tape, 11))(st, p, t, mdt)
    for kw in (
        dict(layout="3d"),
        dict(layout="3d", unroll=True),
        dict(layout="3d", unroll=True, staged=True),
        dict(unroll=True),
    ):
        s, h = jit_flat_step(make_batched_step_flat(tape, 11, **kw))(
            st, p, t, mdt
        )
        # summation order differs between exact-window and masked convs:
        # roundoff-level agreement, not bitwise
        np.testing.assert_allclose(np.asarray(s), np.asarray(s0),
                                   rtol=0, atol=1e-12, err_msg=str(kw))
        np.testing.assert_allclose(np.asarray(h), np.asarray(h0),
                                   rtol=1e-12, err_msg=str(kw))


def test_flat_staged_nbody_matches():
    from heyoka_tpu.taylor.compact_flat import (
        make_batched_step_flat, jit_flat_step,
    )
    import jax

    rng = np.random.default_rng(0)
    base = np.array(
        [0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 1.5, 0, -0.8, 0, 0], float
    )
    B = 3
    st = jnp.asarray(np.tile(base + 0.01 * rng.standard_normal(18), (B, 1)))
    tape = taylor_decompose_sys(nbody(3, masses=[1.0, 1e-3, 2e-3]))
    p = jnp.zeros((B, 0))
    t = jnp.zeros((B,))
    mdt = jnp.full((B,), 1e9)
    s0, h0 = jax.jit(make_batched_step_flat(tape, 15))(st, p, t, mdt)
    s1, h1 = jit_flat_step(
        make_batched_step_flat(tape, 15, layout="3d", unroll=True,
                               staged=True)
    )(st, p, t, mdt)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=0,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), rtol=1e-12)
    # mixed precision on top
    s2, h2 = jit_flat_step(
        make_batched_step_flat(tape, 15, layout="3d", unroll=True,
                               staged=True, mp_order=8)
    )(st, p, t, mdt)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h0), rtol=1e-5)
    # f32 phase noise at orders 9..15 (state magnitudes O(1), h ~ 0.5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s0), rtol=1e-5,
                               atol=1e-6)


def test_batch_integrator_flat_mode():
    # compact_mode="flat": the natively-batched staged engine behind the
    # public batch-integrator API; must agree with the loop engine
    import heyoka_tpu as hy_

    rng = np.random.default_rng(1)
    states = 0.05 + 0.01 * rng.standard_normal((4, 2))
    ta_f = hy_.taylor_adaptive_batch(
        pendulum(), states, tol=1e-12, compact_mode="flat"
    )
    assert ta_f.compact_mode == "flat"
    ta_l = hy_.taylor_adaptive_batch(
        pendulum(), states, tol=1e-12, compact_mode=True
    )
    ta_f.step()
    ta_l.step()
    np.testing.assert_allclose(ta_f.state, ta_l.state, rtol=0, atol=5e-14)
    rf = ta_f.propagate_until(10.0)
    rl = ta_l.propagate_until(10.0)
    assert [int(o) for o in rf[0]] == [int(o) for o in rl[0]]
    np.testing.assert_array_equal(rf[3], rl[3])  # identical step counts
    np.testing.assert_allclose(ta_f.state, ta_l.state, rtol=0, atol=5e-13)
    np.testing.assert_allclose(ta_f.time, ta_l.time, rtol=0, atol=5e-13)
    # dense output rides the flat tc
    d_f = ta_f.update_d_output(ta_f.time - 0.01)
    d_l = ta_l.update_d_output(ta_l.time - 0.01)
    np.testing.assert_allclose(d_f, d_l, rtol=0, atol=5e-13)
    # step-limit + backward propagation
    oc, mn, mx, ns = ta_f.propagate_until(100.0, max_steps=3)
    from heyoka_tpu import TaylorOutcome
    assert all(o == TaylorOutcome.step_limit for o in oc)
    assert np.all(ns == 3)
    ta_f.propagate_for(-1.0)
    # pickling round-trips the string mode
    import pickle
    ta2 = pickle.loads(pickle.dumps(ta_f))
    assert ta2.compact_mode == "flat"
    np.testing.assert_array_equal(ta2.state, ta_f.state)


@pytest.mark.slow
def test_pallas_phase_matches_staged():
    # the VMEM-resident Pallas f32-phase kernel (pallas_phase.py, interpret
    # mode on CPU) must agree with the staged XLA phase to f32 roundoff
    from heyoka_tpu.taylor.compact_flat import (
        make_batched_step_flat, jit_flat_step,
    )
    from heyoka_tpu.taylor.pallas_phase import UnsupportedPallasOp

    rng = np.random.default_rng(0)
    base = np.array(
        [0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 1.5, 0, -0.8, 0, 0], float
    )
    B = 4
    st = jnp.asarray(np.tile(base + 0.01 * rng.standard_normal(18), (B, 1)))
    tape = taylor_decompose_sys(nbody(3, masses=[1.0, 1e-3, 2e-3]))
    p = jnp.zeros((B, 0))
    t = jnp.zeros((B,))
    mdt = jnp.full((B,), 1e9)
    kw = dict(layout="3d", unroll=True, staged=True, mp_order=8)
    s0, h0 = jit_flat_step(make_batched_step_flat(tape, 15, **kw))(
        st, p, t, mdt)
    s1, h1 = jit_flat_step(
        make_batched_step_flat(tape, 15, pallas_phase="interpret", **kw)
    )(st, p, t, mdt)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), rtol=1e-4)

    # sin/cos pair groups (pendulum)
    tape2 = taylor_decompose_sys(pendulum())
    st2 = jnp.asarray(0.05 + 0.01 * rng.standard_normal((B, 2)))
    kw2 = dict(layout="3d", unroll=True, staged=True, mp_order=6)
    s2, h2 = jit_flat_step(make_batched_step_flat(tape2, 13, **kw2))(
        st2, p, t, mdt)
    s3, h3 = jit_flat_step(
        make_batched_step_flat(tape2, 13, pallas_phase="interpret", **kw2)
    )(st2, p, t, mdt)
    np.testing.assert_allclose(np.asarray(s3), np.asarray(s2), rtol=1e-5,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(h3), np.asarray(h2), rtol=1e-4)

    # unsupported tape ops raise at build time (the round-2 kernel covers
    # the full recurrence set, so the remaining unsupported case is a pow
    # group with mixed exponents)
    sys_ = [(x, y**2.5 + y**3.5), (y, x)]
    tape3 = taylor_decompose_sys(sys_)
    with pytest.raises(UnsupportedPallasOp):
        make_batched_step_flat(tape3, 13, pallas_phase="interpret", **kw2)


@pytest.mark.slow
def test_pallas_dd_jet_matches_f64():
    # the double-float (two-f32) full-jet kernel: dd orders must agree
    # with the f64 staged engine to ~2^-48, far beyond plain f32
    from heyoka_tpu.taylor.compact_flat import (
        make_batched_step_flat, jit_flat_step,
    )

    rng = np.random.default_rng(0)
    base = np.array(
        [0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 1.5, 0, -0.8, 0, 0], float
    )
    B = 4
    st = jnp.asarray(np.tile(base + 0.01 * rng.standard_normal(18), (B, 1)))
    tape = taylor_decompose_sys(nbody(3, masses=[1.0, 1e-3, 2e-3]))
    p = jnp.zeros((B, 0))
    t = jnp.zeros((B,))
    mdt = jnp.full((B,), 1e9)
    kw = dict(layout="3d", unroll=True, staged=True, mp_order=8)

    tcf = np.asarray(jit_flat_step(make_batched_step_flat(
        tape, 15, layout="3d", unroll=True, staged=True, _debug_tc=True,
    ))(st, p, t, mdt)[0])
    hi, lo = jit_flat_step(make_batched_step_flat(
        tape, 15, pallas_phase="dd-interpret", _debug_tc=True, **kw,
    ))(st, p, t, mdt)
    rec = np.asarray(hi, np.float64)
    rec[:, :9, :] += np.asarray(lo, np.float64)
    # dd orders: double-float precision (abs ~1e-15 at O(1) magnitudes);
    # a plain-f32 phase would sit at ~1e-8
    for k in range(0, 9):
        np.testing.assert_allclose(rec[:, k, :], tcf[:, k, :], rtol=0,
                                   atol=5e-14, err_msg=f"order {k}")
    # f32 orders above
    for k in range(9, 16):
        np.testing.assert_allclose(rec[:, k, :], tcf[:, k, :], rtol=0,
                                   atol=1e-6, err_msg=f"order {k}")

    # full step output vs the all-f64 engine
    s0, h0 = jit_flat_step(make_batched_step_flat(
        tape, 15, layout="3d", unroll=True, staged=True))(st, p, t, mdt)
    s1, h1 = jit_flat_step(make_batched_step_flat(
        tape, 15, pallas_phase="dd-interpret", **kw))(st, p, t, mdt)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), rtol=1e-4)

    # non-tiling batches (> 128, not a multiple) ride the dd kernel via
    # lane padding
    B2 = 130
    st2 = jnp.asarray(np.tile(np.asarray(st)[0], (B2, 1)))
    p2 = jnp.zeros((B2, 0))
    t2 = jnp.zeros((B2,))
    mdt2 = jnp.full((B2,), 1e9)
    s4, h4 = jit_flat_step(make_batched_step_flat(
        tape, 15, pallas_phase="dd-interpret", **kw))(st2, p2, t2, mdt2)
    np.testing.assert_allclose(np.asarray(s4[:4]), np.asarray(s1),
                               rtol=0, atol=1e-12)
    assert np.isfinite(np.asarray(s4)).all()

    # time-dependent tape: the time column's row-1 seed must survive the
    # kernel (forced oscillator, XLA order-0 fallback for cos)
    xv, vv = hy.make_vars("x", "v")
    sys_t = [(xv, vv), (vv, -xv + 0.1 * hy.cos(0.3 * hy.time))]
    tape_t = taylor_decompose_sys(sys_t)
    st_t = jnp.asarray(0.5 + 0.1 * rng.standard_normal((B, 2)))
    t_t = jnp.full((B,), 1.7)
    kw_t = dict(layout="3d", unroll=True, staged=True, mp_order=6)
    s5, h5 = jit_flat_step(make_batched_step_flat(
        tape_t, 13, layout="3d", unroll=True, staged=True))(
        st_t, p, t_t, mdt)
    s6, h6 = jit_flat_step(make_batched_step_flat(
        tape_t, 13, pallas_phase="dd-interpret", **kw_t))(st_t, p, t_t, mdt)
    np.testing.assert_allclose(np.asarray(s6), np.asarray(s5), rtol=1e-5,
                               atol=1e-7)

    # through the public batch-integrator API
    import heyoka_tpu as hy_

    states = 0.05 + 0.01 * rng.standard_normal((4, 2))
    ta_p = hy_.taylor_adaptive_batch(
        pendulum(), states, tol=1e-15, compact_mode="flat", mp_order=6,
        pallas_phase="interpret",
    )
    ta_l = hy_.taylor_adaptive_batch(
        pendulum(), states, tol=1e-15, compact_mode="flat", mp_order=6,
    )
    ta_p.step()
    ta_l.step()
    np.testing.assert_allclose(ta_p.state, ta_l.state, rtol=1e-6, atol=1e-8)


def test_batch_integrator_flat_grid():
    # propagate_grid through the lockstep flat driver matches the vmapped
    # loop-engine grid driver
    import heyoka_tpu as hy_

    rng = np.random.default_rng(1)
    states = 0.05 + 0.01 * rng.standard_normal((4, 2))
    grid = np.linspace(0.0, 8.0, 17)
    ta_f = hy_.taylor_adaptive_batch(
        pendulum(), states, tol=1e-12, compact_mode="flat"
    )
    ta_l = hy_.taylor_adaptive_batch(
        pendulum(), states, tol=1e-12, compact_mode=True
    )
    rf = ta_f.propagate_grid(grid)
    rl = ta_l.propagate_grid(grid)
    np.testing.assert_allclose(rf[4], rl[4], rtol=0, atol=5e-13)
    np.testing.assert_array_equal(rf[3], rl[3])
    np.testing.assert_allclose(ta_f.state, ta_l.state, rtol=0, atol=5e-13)


@pytest.mark.slow
def test_scaled_carry_extreme_time_units():
    # LEO-like two-body dynamics in km / km/s with time in SECONDS:
    # rho ~ 1e3, c_20 ~ 1e-60 — far outside the f32 coefficient range.
    # The mixed-precision/dd engines carry d_k = c_k sig^k with a
    # power-of-two per-lane sig (pallas_phase._jet_refs scaled carry), so
    # they must pick the same adaptive h as the f64 loop engine (to f32
    # resolution) and match its state at a clamped common step to dd
    # accuracy.  Reference behavior: heyoka is unit-agnostic (f64
    # coefficients) — this is the TPU engines' equivalent guarantee.
    import heyoka_tpu as hy
    from heyoka_tpu.models import nbody

    mu = 398600.4415  # km^3/s^2
    sys_ = nbody(2, masses=[1.0, 0.0], Gconst=mu)
    ic = np.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                   7000.0, 0.0, 0.0, 0.0, 7.546049108166282, 0.0])
    st = np.tile(ic, (4, 1))
    ref = hy.taylor_adaptive_batch(
        sys_, st.copy(), tol=1e-15, high_accuracy=True, compact_mode=True)
    ref.step()
    h_ref = float(np.asarray(ref.last_h)[0])
    assert 50.0 < h_ref < 5000.0

    ref2 = hy.taylor_adaptive_batch(
        sys_, st.copy(), tol=1e-15, high_accuracy=True, compact_mode=True)
    ref2.step(100.0)

    for kw in (dict(compact_mode="flat", mp_order=8),
               dict(compact_mode="flat", mp_order=8,
                    pallas_phase="dd-interpret")):
        tab = hy.taylor_adaptive_batch(
            sys_, st.copy(), tol=1e-15, high_accuracy=True, **kw)
        tab.step()
        h = float(np.asarray(tab.last_h)[0])
        # f32 norms of the (cancellation-heavy, near-circular) order-20
        # coefficients move h by a few percent — an equally valid
        # adaptive step (pre-existing mp-engine property, independent of
        # the scaled carry; the guarantee that matters is the same-h
        # state agreement below)
        assert abs(h - h_ref) / h_ref < 0.05, (kw, h, h_ref)
        tab2 = hy.taylor_adaptive_batch(
            sys_, st.copy(), tol=1e-15, high_accuracy=True, **kw)
        tab2.step(100.0)
        rel = np.max(np.abs(np.asarray(tab2.state) - np.asarray(ref2.state))
                     ) / np.max(np.abs(np.asarray(ref2.state)))
        assert rel < 1e-13, (kw, rel)


@pytest.mark.slow
def test_pallas_piece_reads_mascon(monkeypatch):
    # Instance-regular huge-tape path (SURVEY #24, reference
    # parallel_mode workloads, src/taylor_01.cpp:1202-1247): the dd
    # Pallas kernel reads big operand sets via piecewise slices /
    # broadcasts / deinterleaving reshapes instead of unrolled per-row
    # gathers, and build_plan's family-split entry sort makes the
    # mascon tape's sets (incl. the mixed squares/Gm*dx mul level)
    # piece-expressible.  Coefficients must match the staged XLA
    # engine at dd accuracy for dd orders and f32 above.  Gates are
    # lowered so CPU-sized instance counts exercise the path.
    import jax
    from heyoka_tpu.models import mascon
    from heyoka_tpu.taylor import pallas_phase as pp
    from heyoka_tpu.taylor.compact_flat import (
        jit_flat_step, make_batched_step_flat,
    )

    monkeypatch.setenv("HEYOKA_PLAN_SORT_MIN", "8")
    monkeypatch.setattr(pp, "_STAGE_SKIP_MIN", 8)

    rng = np.random.default_rng(1)
    N, B, ORDER, MP = 16, 2, 9, 5
    pts = rng.uniform(-1.0, 1.0, (4 * N, 3))
    pts = pts[np.linalg.norm(pts, axis=1) <= 1.0][:N]
    masses = rng.uniform(0.5, 1.0, N)
    masses /= masses.sum()
    sys_ = mascon(Gconst=1.0, masses=masses.tolist(),
                  positions=pts.tolist(), omega=(0.0, 0.0, 0.3))
    tape = taylor_decompose_sys(sys_)

    # the plan's big sets must be piece-readable (not scattered)
    from heyoka_tpu.taylor.compact import _read_pieces, build_plan

    plan = build_plan(tape, ORDER)
    for lv in plan.levels:
        for g in lv:
            for c in range(g.in_cols.shape[1]):
                cols = np.asarray(g.in_cols[:, c])
                if cols.size >= 8 and np.unique(cols).size > 1:
                    assert _read_pieces(cols) is not None, (
                        g.name, cols[:12])

    ang = rng.uniform(0, 2 * np.pi, B)
    st = np.zeros((B, 6))
    st[:, 0] = 2.0 * np.cos(ang)
    st[:, 1] = 2.0 * np.sin(ang)
    st[:, 3] = -0.7 * np.sin(ang)
    st[:, 4] = 0.7 * np.cos(ang)
    st = jnp.asarray(st)
    p = jnp.zeros((B, 0))
    t = jnp.zeros((B,))
    mdt = jnp.full((B,), 1e9)

    kw = dict(layout="3d", unroll=True, staged=True)
    tcf = np.asarray(jit_flat_step(make_batched_step_flat(
        tape, ORDER, _debug_tc=True, **kw))(st, p, t, mdt)[0])
    hi, lo = jit_flat_step(make_batched_step_flat(
        tape, ORDER, pallas_phase="dd-interpret", mp_order=MP,
        _debug_tc=True, **kw))(st, p, t, mdt)
    rec = np.asarray(hi, np.float64)
    rec[:, :MP + 1, :] += np.asarray(lo, np.float64)
    for k in range(ORDER + 1):
        d = np.max(np.abs(rec[:, k, :] - tcf[:, k, :]))
        # per-order scale: dd orders sit at the 2^-48 noise of the
        # largest same-order tape value, f32 orders at 2^-24
        scale = max(float(np.max(np.abs(tcf[:, k, :]))), 1.0)
        tol = (2e-14 if k <= MP else 1e-7) * scale
        assert d < tol, (k, d, tol)


@pytest.mark.slow
def test_pallas_row_split_matches_plain(monkeypatch):
    # Row-split VMEM scratch (H/C/V history classes,
    # pallas_phase._row_classes): tapes too wide for the dense
    # (W, K+1) scratch at the mandatory bt=128 keep full history only
    # for convolution-read columns.  The split kernel must match the
    # dense kernel bit-for-bit (same ops, routed reads/writes).
    from heyoka_tpu.models import mascon
    from heyoka_tpu.taylor import pallas_phase as pp
    from heyoka_tpu.taylor.compact_flat import (
        jit_flat_step, make_batched_step_flat,
    )

    monkeypatch.setenv("HEYOKA_PLAN_SORT_MIN", "8")
    monkeypatch.setattr(pp, "_STAGE_SKIP_MIN", 8)

    rng = np.random.default_rng(7)
    N, B, ORDER = 12, 2, 9
    pts = rng.uniform(-1.0, 1.0, (4 * N, 3))
    pts = pts[np.linalg.norm(pts, axis=1) <= 1.0][:N]
    masses = rng.uniform(0.5, 1.0, N)
    masses /= masses.sum()
    sys_ = mascon(Gconst=1.0, masses=masses.tolist(),
                  positions=pts.tolist(), omega=(0.0, 0.0, 0.3))
    tape = taylor_decompose_sys(sys_)

    from heyoka_tpu.taylor.compact import build_plan

    plan = build_plan(tape, ORDER)
    classv, rowmap, sizes, gclass = pp._row_classes(plan)
    assert sizes[1] > 0 and sizes[2] > 0  # real C and V populations

    ang = rng.uniform(0, 2 * np.pi, B)
    st = np.zeros((B, 6))
    st[:, 0] = 2.0 * np.cos(ang)
    st[:, 1] = 2.0 * np.sin(ang)
    st[:, 3] = -0.7 * np.sin(ang)
    st[:, 4] = 0.7 * np.cos(ang)
    st = jnp.asarray(st)
    p = jnp.zeros((B, 0))
    t = jnp.zeros((B,))
    mdt = jnp.full((B,), 1e9)

    kw = dict(dtype=jnp.float64, high_accuracy=True, mp_order=5,
              layout="3d", unroll=True, staged=True,
              pallas_phase="dd-interpret")
    n1, h1 = jit_flat_step(make_batched_step_flat(
        tape, ORDER, **kw))(st, p, t, mdt)
    monkeypatch.setenv("HEYOKA_PALLAS_COMPACT", "1")
    n2, h2 = jit_flat_step(make_batched_step_flat(
        tape, ORDER, **kw))(st, p, t, mdt)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2),
                               rtol=0, atol=1e-18)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
