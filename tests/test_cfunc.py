"""Compiled-function tests (reference analog: test/cfunc.cpp)."""

import math

import numpy as np

import heyoka_tpu as hy


def test_single_eval():
    x, y = hy.make_vars("x", "y")
    cf = hy.make_cfunc([x * y + hy.sin(x), x - y], vars=[x, y])
    out = np.asarray(cf(np.array([0.5, 2.0])))
    assert out[0] == (0.5 * 2.0 + math.sin(0.5))
    assert out[1] == -1.5


def test_multi_eval(rng):
    x, y = hy.make_vars("x", "y")
    cf = hy.make_cfunc([hy.exp(x) * y, hy.atan2(y, x)], vars=[x, y])
    pts = rng.standard_normal((64, 2)) + 2.0
    out = np.asarray(cf(pts))
    want = np.stack(
        [np.exp(pts[:, 0]) * pts[:, 1], np.arctan2(pts[:, 1], pts[:, 0])], axis=1
    )
    np.testing.assert_allclose(out, want, rtol=1e-14)


def test_pars_and_time():
    x = hy.make_vars("x")
    cf = hy.make_cfunc([hy.par[0] * x + hy.time], vars=[x])
    out = np.asarray(cf(np.array([2.0]), pars=np.array([3.0]), time=5.0))
    assert out[0] == 11.0


def test_default_var_order():
    # default input ordering = sorted variable names (like the reference)
    a, b = hy.make_vars("a", "b")
    cf = hy.make_cfunc([b - a])
    assert cf.n_vars == 2
    out = np.asarray(cf(np.array([1.0, 5.0])))
    assert out[0] == 4.0


def test_kepler_ops_eval():
    e, M = hy.make_vars("e", "M")
    cf = hy.make_cfunc([hy.kepE(e, M)], vars=[e, M])
    ev, Mv = 0.717, 2.1
    E = float(np.asarray(cf(np.array([ev, Mv])))[0])
    assert abs(E - ev * math.sin(E) - Mv) < 1e-12


def test_batch_pars():
    x = hy.make_vars("x")
    cf = hy.make_cfunc([hy.par[0] * x], vars=[x])
    xs = np.array([[1.0], [2.0]])
    ps = np.array([[10.0], [20.0]])
    out = np.asarray(cf(xs, pars=ps))
    np.testing.assert_allclose(out[:, 0], [10.0, 40.0])


def test_multi_eval_time_array():
    # per-evaluation times (the reference's time-batched cfunc evaluation)
    import heyoka_tpu as hy
    import numpy as np

    x = hy.make_vars("x")
    cf = hy.make_cfunc([x * hy.time + hy.sin(hy.time)], vars=["x"])
    X = np.array([[1.0], [2.0], [3.0]])
    T = np.array([0.1, 0.2, 0.3])
    out = np.asarray(cf(X, time=T))[:, 0]
    np.testing.assert_allclose(out, X[:, 0] * T + np.sin(T), rtol=1e-15)
