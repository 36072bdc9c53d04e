"""Engine matrix at PRODUCTION order (VERDICT r2 item 8).

The round-1 matrix (test_engine_matrix.py) checks every op's recurrence
at ORDER=7; production tolerance 1e-15 runs at order 19-20.  This file
sweeps the production engines at ORDER=20 against the arbitrary-precision
oracle (``multiprec.MPTaylorIntegrator._jet`` at 40 digits — an
independent host-side implementation of the recurrences), plus the
high-accuracy/scaled-sig step variants and event detection at f32 and on
the dd engine.

Reference analog: ``test/taylor_sincos.cpp:40,351`` sweeps fp types x
opt levels x compact x high_accuracy per op; the engines here play the
role of opt levels.
"""

import numpy as np
import jax.numpy as jnp
import pytest

#: compile-heavy module: slow tier (see tests/conftest.py)
pytestmark = pytest.mark.slow

import heyoka_tpu as hy
from heyoka_tpu.expr.decompose import taylor_decompose_sys

from test_engine_matrix import _build_sys, _probe_skip

ORDER20 = 20
MP = 8  # production mixed-precision boundary


def _mp_oracle(sys_, state0, order):
    import mpmath as mp
    from heyoka_tpu.multiprec import MPTaylorIntegrator

    m = MPTaylorIntegrator(sys_, state0, dps=40, order=order)
    with mp.workdps(40):
        cc = m._jet()
    n = len(state0)
    return np.array(
        [[float(cc[k][i]) for i in range(n)] for k in range(order + 1)]
    )


def _tc20(engine, tape, state0):
    from heyoka_tpu.taylor.compact_flat import make_batched_step_flat

    dt = jnp.float64
    n = len(state0)
    st = jnp.asarray(state0, dt)[None, :]
    p = jnp.zeros((1, tape.n_pars), dt)
    t0 = jnp.zeros((1,), dt)
    mdt = jnp.full((1,), 1e-6, dt)
    if engine == "compact_loop":
        from heyoka_tpu.taylor.compact_loop import make_jet_fn_compact_loop

        return np.asarray(
            make_jet_fn_compact_loop(tape, ORDER20, dtype=dt)(
                st[0], p[0], t0[0]
            )
        )[:, :n]
    kw = dict(dtype=dt, return_tc=True, layout="3d", unroll=True,
              staged=True)
    if engine == "flat_mixed":
        kw.update(mp_order=MP)
    elif engine == "pallas_dd":
        kw.update(mp_order=MP, pallas_phase="dd-interpret")
    step = make_batched_step_flat(tape, ORDER20, **kw)
    _res, _h, tc = step(st, p, t0, mdt)
    return np.asarray(tc[0])[:, :n]


@pytest.mark.parametrize("engine",
                         ["compact_loop", "flat_staged", "flat_mixed",
                          "pallas_dd"])
def test_engine_matrix_order20(engine):
    probe = "flat_staged" if engine == "flat_mixed" else engine
    skip = _probe_skip(probe, jnp.float64)
    if engine == "pallas_dd":
        skip = skip | {"c1_6"}  # mixed pow exponents per group
    sys_, state0, case_ids = _build_sys(skip)
    assert len(case_ids) >= 20, case_ids
    tape = taylor_decompose_sys(sys_)
    tc = _tc20(engine, tape, state0)
    want = _mp_oracle(sys_, state0, ORDER20)

    if engine in ("flat_mixed", "pallas_dd"):
        # production contract: orders <= MP at f64/dd accuracy, the f32
        # tail at f32 accuracy relative to each CASE's coefficient scale
        # (the tail only enters the state update as |c_k h^k| << tol)
        rt = 5e-9 if engine == "pallas_dd" else 1e-11
        np.testing.assert_allclose(
            tc[: MP + 1], want[: MP + 1], rtol=rt, atol=rt,
            err_msg=f"{engine} low orders; cases {case_ids}",
        )
        scale = np.maximum(np.abs(want).max(axis=0), 1e-30)
        err = np.abs(tc[MP + 1:] - want[MP + 1:]) / scale[None, :]
        assert err.max() < 3e-3, (
            f"{engine} f32 tail err {err.max()}; cases {case_ids}"
        )
    else:
        np.testing.assert_allclose(
            tc, want, rtol=1e-10, atol=1e-12,
            err_msg=f"{engine}; cases {case_ids}",
        )


@pytest.mark.parametrize("high_accuracy", [False, True])
def test_step_order20_high_accuracy(high_accuracy):
    # one clamped adaptive step at order 20: the production engines
    # (plain f64 staged, mixed + sig carry, dd-interpret) must land on
    # the mp-oracle state with high_accuracy on AND off.  A small
    # trig+arithmetic system keeps the order-20 compiles in seconds
    # (full op coverage at order 20 is test_engine_matrix_order20's job;
    # the sig-carry extreme-units case is
    # test_compact.test_scaled_carry_extreme_time_units).
    import mpmath as mp
    from heyoka_tpu.multiprec import MPTaylorIntegrator

    x, v, a, b = hy.make_vars("x", "v", "a", "b")
    sys_ = [
        (x, v),
        (v, -9.8 * hy.sin(x)),
        (a, a * b - hy.sqrt(b)),
        (b, a / b - b),
    ]
    state0 = [0.05, 0.025, 0.7, 1.4]
    H = 1e-3

    m = MPTaylorIntegrator(sys_, state0, dps=40, order=ORDER20)
    with mp.workdps(40):
        m.step(max_delta_t=H)
        want = np.array([float(vv) for vv in m.state])
    assert abs(float(m.time) - H) < 1e-30  # clamped step

    for kw in (dict(), dict(mp_order=MP),
               dict(mp_order=MP, pallas_phase="dd-interpret")):
        tab = hy.taylor_adaptive_batch(
            sys_, np.asarray(state0)[None, :], tol=1e-15,
            high_accuracy=high_accuracy, compact_mode="flat", **kw,
        )
        tab.step(H)
        got = np.asarray(tab.state)[0]
        rel = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-30))
        assert rel < 2e-13, (kw, high_accuracy, rel)


def test_events_f32_and_dd_engine():
    # event detection beyond the f64 loop engine: (a) dtype f32, (b) the
    # dd-interpret flat engine (the production TPU event configuration)
    x, v = hy.make_vars("x", "v")
    sys_ = hy.models.pendulum()
    st = np.tile([0.05, 0.025], (4, 1))

    hits32 = []
    tab32 = hy.taylor_adaptive_batch(
        sys_, st.copy(), tol=1e-6, dtype=jnp.float32,
        nt_events=[hy.nt_event(
            v, lambda tb, t, d, lane: hits32.append((float(t), lane)))],
    )
    tab32.propagate_until(10.0)
    lane0 = sorted(t for t, lane in hits32 if lane == 0)
    assert len(lane0) >= 5

    hits_dd = []
    tab_dd = hy.taylor_adaptive_batch(
        sys_, st.copy(), tol=1e-15, high_accuracy=True,
        compact_mode="flat", mp_order=8, pallas_phase="dd-interpret",
        nt_events=[hy.nt_event(
            v, lambda tb, t, d, lane: hits_dd.append((float(t), lane)))],
    )
    tab_dd.propagate_until(10.0)
    lane0dd = sorted(t for t, lane in hits_dd if lane == 0)
    # f64 loop-engine reference for the same workload
    hits_ref = []
    tab_ref = hy.taylor_adaptive_batch(
        sys_, st.copy(), tol=1e-15, high_accuracy=True, compact_mode=True,
        nt_events=[hy.nt_event(
            v, lambda tb, t, d, lane: hits_ref.append((float(t), lane)))],
    )
    tab_ref.propagate_until(10.0)
    lane0ref = sorted(t for t, lane in hits_ref if lane == 0)
    assert len(lane0dd) == len(lane0ref)
    np.testing.assert_allclose(lane0dd, lane0ref, rtol=0, atol=1e-9)
    # the f32-dtype run must find the same crossings to f32 step accuracy
    assert len(lane0) == len(lane0ref)
    np.testing.assert_allclose(lane0, lane0ref, rtol=0, atol=2e-3)
