"""Public-API native backend: taylor_adaptive(..., backend="native").

Reference context: heyoka's integrators are always native compiled steppers
(src/taylor_adaptive.cpp); the rebuild's ``backend="native"`` exposes the
C++ host runtime (``_native/taperun.cpp``) through the same public
integrator API as the XLA engines — the low-latency path for scalar /
small-batch work (VERDICT r4 item 4).  These tests assert API parity
against the jax backend.
"""

import math
import pickle

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no host C++ compiler"
)


def _pendulum():
    x, v = hy.make_vars("x", "v")
    return [(x, v), (v, -9.8 * hy.sin(x))]


def test_scalar_backend_resolution():
    ta = hy.taylor_adaptive(_pendulum(), [0.05, 0.025], tol=1e-15,
                            backend="native")
    assert ta.backend == "native"
    ta2 = hy.taylor_adaptive(_pendulum(), [0.05, 0.025], tol=1e-15)
    assert ta2.backend == "jax"
    ta3 = hy.taylor_adaptive(_pendulum(), [0.05, 0.025], tol=1e-15,
                             backend="auto")
    assert ta3.backend == "native"


def test_scalar_backend_validation():
    with pytest.raises(ValueError):
        hy.taylor_adaptive(_pendulum(), [0.05, 0.025], backend="llvm")
    ev = hy.nt_event(hy.make_vars("x"), lambda ta, t, d: None)
    with pytest.raises(ValueError):
        hy.taylor_adaptive(_pendulum(), [0.05, 0.025], backend="native",
                           nt_events=[ev])
    # auto with events degrades to jax
    ta = hy.taylor_adaptive(_pendulum(), [0.05, 0.025], backend="auto",
                            nt_events=[ev])
    assert ta.backend == "jax"


def test_scalar_step_and_propagate_parity():
    ta = hy.taylor_adaptive(_pendulum(), [0.05, 0.025], tol=1e-15,
                            backend="native")
    tj = hy.taylor_adaptive(_pendulum(), [0.05, 0.025], tol=1e-15)
    oc, h = ta.step()
    ocj, hj = tj.step()
    assert oc == ocj
    assert h == pytest.approx(hj, rel=1e-12)
    np.testing.assert_allclose(ta.state, tj.state, rtol=1e-12, atol=1e-14)

    res = ta.propagate_until(50.0)
    resj = tj.propagate_until(50.0)
    assert res[0] == resj[0]
    assert res[3] == pytest.approx(resj[3], abs=2)
    np.testing.assert_allclose(ta.state, tj.state, rtol=1e-9, atol=1e-11)
    assert ta.time == 50.0

    # tc written by the last step: dense output agrees
    d = ta.update_d_output(ta.time - 0.25 * ta.last_h)
    dj = tj.update_d_output(tj.time - 0.25 * tj.last_h)
    np.testing.assert_allclose(d, dj, rtol=1e-9, atol=1e-11)


def test_scalar_step_limit_and_backward():
    ta = hy.taylor_adaptive(_pendulum(), [0.05, 0.025], tol=1e-15,
                            backend="native")
    oc, mn, mx, ns = ta.propagate_until(1000.0, max_steps=3)
    assert oc == hy.taylor_outcome.step_limit
    assert ns == 3
    ta2 = hy.taylor_adaptive(_pendulum(), [0.05, 0.025], tol=1e-15,
                             backend="native")
    oc2, *_ = ta2.propagate_until(-5.0)
    assert oc2 == hy.taylor_outcome.time_limit
    assert ta2.time == -5.0


def test_scalar_grid_and_cout_parity():
    g = np.linspace(0.0, 8.0, 17)
    ta = hy.taylor_adaptive(_pendulum(), [0.05, 0.025], tol=1e-15,
                            backend="native")
    tj = hy.taylor_adaptive(_pendulum(), [0.05, 0.025], tol=1e-15)
    out = ta.propagate_grid(g)[4]
    outj = tj.propagate_grid(g)[4]
    np.testing.assert_allclose(out, outj, rtol=1e-10, atol=1e-12)

    ta2 = hy.taylor_adaptive(_pendulum(), [0.05, 0.025], tol=1e-15,
                             backend="native")
    tj2 = hy.taylor_adaptive(_pendulum(), [0.05, 0.025], tol=1e-15)
    c = ta2.propagate_until(8.0, c_output=True)[4]
    cj = tj2.propagate_until(8.0, c_output=True)[4]
    ts = np.linspace(0.3, 7.7, 9)
    np.testing.assert_allclose(c(ts), cj(ts), rtol=1e-10, atol=1e-12)


def test_scalar_callback_and_pickle():
    seen = []

    def cb(ta):
        seen.append(ta.time)
        return True

    ta = hy.taylor_adaptive(_pendulum(), [0.05, 0.025], tol=1e-15,
                            backend="native")
    oc, mn, mx, ns = ta.propagate_until(5.0, callback=cb)
    assert oc == hy.taylor_outcome.time_limit
    assert len(seen) == ns

    ta2 = pickle.loads(pickle.dumps(ta))
    assert ta2.backend == "native"
    np.testing.assert_array_equal(ta2.state, ta.state)
    assert ta2.time == ta.time


def test_scalar_high_accuracy():
    ta = hy.taylor_adaptive(_pendulum(), [0.05, 0.025], tol=1e-15,
                            high_accuracy=True, backend="native")
    tj = hy.taylor_adaptive(_pendulum(), [0.05, 0.025], tol=1e-15,
                            high_accuracy=True)
    ta.propagate_until(20.0)
    tj.propagate_until(20.0)
    np.testing.assert_allclose(ta.state, tj.state, rtol=1e-10, atol=1e-12)


def test_batch_parity_and_auto_threshold(monkeypatch):
    B = 8
    rng = np.random.default_rng(1)
    st0 = np.tile([0.05, 0.025], (B, 1)) + rng.uniform(-1e-3, 1e-3, (B, 2))
    tb = hy.taylor_adaptive_batch(_pendulum(), st0, tol=1e-15,
                                  backend="native")
    assert tb.backend == "native"
    tj = hy.taylor_adaptive_batch(_pendulum(), st0, tol=1e-15)
    tb.step()
    tj.step()
    for (oca, ha), (ocb, hb) in zip(tb.get_step_res(), tj.get_step_res()):
        assert oca == ocb
        assert ha == pytest.approx(hb, rel=1e-12)
    np.testing.assert_allclose(tb.state, tj.state, rtol=1e-12, atol=1e-14)

    res = tb.propagate_until(np.full(B, 30.0))
    resj = tj.propagate_until(np.full(B, 30.0))
    assert list(res[0]) == list(resj[0])
    np.testing.assert_allclose(tb.state, tj.state, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(res[3], resj[3], atol=2)
    pr = tb.get_propagate_res()
    assert len(pr) == B and pr[0][3] == res[3][0]

    # dense output from the propagation's last step
    d = tb.update_d_output(tb.time - 0.25 * tb.last_h)
    dj = tj.update_d_output(tj.time - 0.25 * tj.last_h)
    np.testing.assert_allclose(d, dj, rtol=1e-9, atol=1e-11)

    # auto: tiny batches route native, big ones stay jax
    monkeypatch.setenv("HEYOKA_NATIVE_BATCH_MAX", "16")
    t_small = hy.taylor_adaptive_batch(_pendulum(), st0, tol=1e-15,
                                       backend="auto")
    t_big = hy.taylor_adaptive_batch(
        _pendulum(), np.tile(st0, (3, 1)), tol=1e-15, backend="auto")
    assert t_small.backend == "native"
    assert t_big.backend == "jax"


def test_batch_grid_parity_and_pickle():
    B = 4
    rng = np.random.default_rng(2)
    st0 = np.tile([0.05, 0.025], (B, 1)) + rng.uniform(-1e-3, 1e-3, (B, 2))
    g = np.linspace(0.0, 6.0, 13)
    tb = hy.taylor_adaptive_batch(_pendulum(), st0, tol=1e-15,
                                  backend="native")
    tj = hy.taylor_adaptive_batch(_pendulum(), st0, tol=1e-15)
    out = tb.propagate_grid(g)[4]
    outj = tj.propagate_grid(g)[4]
    np.testing.assert_allclose(out, outj, rtol=1e-10, atol=1e-12)

    tb2 = pickle.loads(pickle.dumps(tb))
    assert tb2.backend == "native"
    np.testing.assert_array_equal(tb2.state, tb.state)


def test_batch_step_limit_outcomes():
    B = 4
    st0 = np.tile([0.05, 0.025], (B, 1))
    tb = hy.taylor_adaptive_batch(_pendulum(), st0, tol=1e-15,
                                  backend="native")
    res = tb.propagate_until(np.full(B, 1000.0), max_steps=3)
    assert all(oc == hy.taylor_outcome.step_limit for oc in res[0])
    assert (res[3] == 3).all()


def test_native_nonfinite_outcome():
    # 1/x through x=0: the native backend must flag err_nf_state
    x = hy.make_vars("x")
    ta = hy.taylor_adaptive([(x, -1.0 / x)], [1.0], tol=1e-12,
                            backend="native")
    oc, *_ = ta.propagate_until(10.0)
    assert oc == hy.taylor_outcome.err_nf_state
