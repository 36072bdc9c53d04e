"""Native CPU runtime tests: the C++ tape interpreter is an independent
backend and must agree with the XLA jet engines to roundoff (the analog of
the reference's opt-level-0 vs optimized-code equivalence sweeps,
SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

import heyoka_tpu as hy
from heyoka_tpu import native
from heyoka_tpu.expr.decompose import taylor_decompose_sys
from heyoka_tpu.taylor.jet import make_jet_fn
from heyoka_tpu.models import pendulum, nbody

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)

x, y = hy.make_vars("x", "y")


@pytest.mark.parametrize(
    "sys_,st,pars",
    [
        (pendulum(), [0.05, 0.025], []),
        (
            [
                (x, hy.sin(x) * hy.cos(y) + hy.tan(0.3 * x)),
                (y, hy.exp(-y) + hy.atan2(x, y) + x ** -1.5),
            ],
            [0.7, 1.3],
            [],
        ),
        (
            [
                (x, hy.kepE(0.3, y) + hy.sigmoid(x)),
                (y, hy.sqrt(x) + hy.log(y) + hy.erf(x)
                 + hy.kepF(0.1, 0.2, x) + hy.kepDE(0.1, 0.2, y)),
            ],
            [1.2, 0.8],
            [],
        ),
        (
            [(x, hy.par[0] * hy.asin(0.2 * x) + hy.time), (y, hy.tanh(x * y))],
            [0.4, 0.6],
            [1.3],
        ),
    ],
)
def test_native_jet_matches_xla(sys_, st, pars):
    tape = taylor_decompose_sys(sys_)
    a = np.asarray(
        make_jet_fn(tape, 9)(
            jnp.asarray(np.asarray(st, float)),
            jnp.asarray(np.asarray(pars, float)),
            jnp.asarray(0.3),
        )
    )
    b = native.native_jet(tape, st, pars, 0.3, 9)[:, : a.shape[1]]
    np.testing.assert_allclose(b, a, rtol=1e-13, atol=1e-15)


def test_native_propagate_matches_integrator():
    tape = taylor_decompose_sys(pendulum())
    ta = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-15)
    ta.propagate_until(50.0)
    st, t, ns = native.native_propagate_until(
        tape, [0.05, 0.025], [], 0.0, 50.0, ta.order
    )
    assert t == pytest.approx(50.0, abs=1e-12)
    assert ns > 100
    np.testing.assert_allclose(st, ta.state, rtol=0, atol=1e-13)


def test_native_nbody_energy():
    masses = [1.0, 1e-3, 2e-3]
    sys_ = nbody(3, masses=masses)
    tape = taylor_decompose_sys(sys_)
    st0 = np.array(
        [0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 1.5, 0, -0.8, 0, 0], float
    )
    from heyoka_tpu.models import nbody_energy

    cf = hy.make_cfunc([nbody_energy(3, masses=masses)])
    names = cf.tape.var_names
    sys_names = [lhs.name for lhs, _ in sys_]
    perm = [sys_names.index(n) for n in names]
    e0 = float(cf(st0[perm])[0])
    st, t, ns = native.native_propagate_until(tape, st0, [], 0.0, 20.0, 20)
    e1 = float(cf(st[perm])[0])
    assert abs((e1 - e0) / e0) < 1e-12


def test_native_max_steps_and_nonfinite():
    tape = taylor_decompose_sys(pendulum())
    st, t, ns = native.native_propagate_until(
        tape, [0.05, 0.025], [], 0.0, 1000.0, 20, max_steps=5
    )
    assert ns == 5
    assert t < 1000.0

    # x' = x^2 blows up in finite time -> non-finite detection
    blow = [(x, x * x)]
    tape2 = taylor_decompose_sys(blow)
    with pytest.raises(FloatingPointError):
        native.native_propagate_until(tape2, [1.0], [], 0.0, 10.0, 20)


def test_native_propagate_until_batch():
    # thread-parallel batched native propagation: per-lane results must be
    # bitwise identical to the scalar native driver, and agree with the jax
    # integrator to roundoff
    from heyoka_tpu.native import (
        native_propagate_until, native_propagate_until_batch,
    )

    tape = taylor_decompose_sys(pendulum())
    rng = np.random.default_rng(0)
    states = 0.05 + 0.01 * rng.standard_normal((8, 2))
    st, tm, ns = native_propagate_until_batch(tape, states, None, 0.0, 10.0, 19)
    np.testing.assert_allclose(tm, 10.0, atol=1e-12)
    for i in (0, 3, 7):
        s1, t1, n1 = native_propagate_until(
            tape, states[i], None, 0.0, 10.0, 19
        )
        np.testing.assert_array_equal(st[i], s1)
        assert int(ns[i]) == n1
    ta = hy.taylor_adaptive(pendulum(), states[0], tol=1e-15)
    ta.propagate_until(10.0)
    np.testing.assert_allclose(st[0], ta.state, rtol=0, atol=5e-14)


def test_native_extended_precision():
    # 80-bit long double backend (the reference's tut_extended_precision
    # analog): the pendulum back-and-forth 0 -> 1000 -> 0 return error must
    # beat double by orders of magnitude (benchmarks.rst:162-192 behaviour)
    from heyoka_tpu.native import (
        native_jet, native_jet_ld,
        native_propagate_until, native_propagate_until_ld,
    )

    tape = taylor_decompose_sys(pendulum())
    jd = native_jet(tape, [0.05, 0.025], None, 0.0, 15)
    jl = native_jet_ld(tape, [0.05, 0.025], None, 0.0, 15)
    np.testing.assert_allclose(
        jl.astype(np.float64), jd, rtol=5e-15, atol=1e-18
    )

    s0 = np.array([0.05, 0.025], np.longdouble)
    s1, t1, _ = native_propagate_until_ld(tape, s0, None, 0.0, 1000.0, 26)
    s2, _, _ = native_propagate_until_ld(tape, s1, None, t1, 0.0, 26)
    err_ld = float(np.abs(s2 - s0).max())
    sd1, td1, _ = native_propagate_until(
        tape, [0.05, 0.025], None, 0.0, 1000.0, 20
    )
    sd2, _, _ = native_propagate_until(tape, sd1, None, td1, 0.0, 20)
    err_d = float(np.abs(sd2 - np.array([0.05, 0.025])).max())
    assert err_ld < err_d / 50
    assert err_ld < 1e-16


def test_native_quad_precision():
    # __float128 backend (the f128 tier of the reference's
    # arbitrary-precision support): pendulum 0 -> 200 -> 0 return error at
    # the 1e-33 level, resolved through the double-double boundary
    import ctypes
    from heyoka_tpu import native as nat

    tape = taylor_decompose_sys(pendulum())
    hi, lo, th, tl, n1 = nat.native_propagate_until_f128(
        tape, [0.05, 0.025], None, 0.0, 200.0, 40
    )
    p = nat.pack_tape(tape)
    th2 = ctypes.c_double(th)
    tl2 = ctypes.c_double(tl)
    nat._lib().ht_propagate_until_f128(
        p["n_eq"], p["n_ops"], p["n_pars"], p["opcodes"], p["arity"],
        p["inputs"], p["meta"], p["alpha"], p["consts"], p["n_consts"],
        p["rhs"], hi, lo, np.zeros(1), ctypes.byref(th2),
        ctypes.byref(tl2), 0.0, np.inf, np.int64(0), np.int32(40),
    )
    assert hi[0] == 0.05 and hi[1] == 0.025  # hi parts return exactly
    err = max(abs((hi[0] - 0.05) + lo[0]), abs((hi[1] - 0.025) + lo[1]))
    assert err < 1e-30


def test_multiprec_integrator():
    # arbitrary-precision (mpmath) tier: back-and-forth return error at the
    # requested digit count, and jets identical to the f128 backend through
    # the double-double boundary
    import mpmath as mp
    from heyoka_tpu.multiprec import MPTaylorIntegrator
    from heyoka_tpu.native import native_jet_f128

    tape = taylor_decompose_sys(pendulum())
    mpta = MPTaylorIntegrator(tape, [0.05, 0.025], dps=30)
    with mp.workdps(30):
        x0, v0 = mp.mpf(0.05), mp.mpf(0.025)
    mpta.propagate_until(5.0)
    mpta.propagate_until(0.0)
    with mp.workdps(30):
        err = max(abs(mpta.state[0] - x0), abs(mpta.state[1] - v0))
        assert err < mp.mpf(10) ** -27

    m2 = MPTaylorIntegrator(tape, [0.05, 0.025], dps=40, order=12)
    with mp.workdps(40):
        m2._t = m2.time
        cc = m2._jet()
    jh, jl = native_jet_f128(tape, [0.05, 0.025], None, 0.0, 12)
    for k in range(13):
        for i in range(2):
            q = float(jh[k, i]) + float(jl[k, i])
            assert abs(q - float(cc[k][i])) <= 1e-30 + 1e-15 * abs(q)


def test_multiprec_events_poincare():
    # The mp tier exposes the full per-rung API like the reference's MPFR
    # instantiation (taylor.hpp:688-709, test/event_detection_mp.cpp):
    # pendulum Poincare section at 50 digits.  With x0 = 0, v0 = 1/2 and
    # g = l = 1, the amplitude is acos(7/8) and the turning times (zeros
    # of v) are T/4 + k T/2 with T = 4 K(sin^2(amp/2)) -- a closed form
    # the detected event times must hit to ~40 digits.
    import mpmath as mp
    from heyoka_tpu.multiprec import MPTaylorIntegrator

    sys_ = pendulum(gconst=1.0, length=1.0)
    v = hy.make_vars("v")

    nt_times = []
    nt = hy.nt_event(v, lambda ta, t, d: nt_times.append((t, d)))
    mpta = MPTaylorIntegrator(sys_, [0.0, 0.5], dps=50, nt_events=[nt])
    with mp.workdps(50):
        amp = mp.acos(mp.mpf(7) / 8)
        T = 4 * mp.ellipk(mp.sin(amp / 2) ** 2)
        mpta.propagate_until(float(1.30 * T))
        assert len(nt_times) == 3  # T/4, 3T/4, 5T/4
        for k, (t, d) in enumerate(nt_times):
            assert abs(t - (2 * k + 1) * T / 4) < mp.mpf(10) ** -38
        # turning points alternate direction
        assert nt_times[0][1] == -1 and nt_times[1][1] == 1

    # terminal event: stop at the first turning point, exactly T/4
    te = hy.t_event(v)
    mpte = MPTaylorIntegrator(sys_, [0.0, 0.5], dps=50, t_events=[te])
    mpte.propagate_until(100.0)
    with mp.workdps(50):
        assert mpte.te_triggered == 0
        assert abs(mpte.time - T / 4) < mp.mpf(10) ** -38
        # at the turning point x == amplitude
        assert abs(mpte.state[0] - amp) < mp.mpf(10) ** -38
        # cooldown: re-propagating continues past the same root
        mpte.propagate_until(100.0)
        assert mpte.te_triggered == 0
        assert abs(mpte.time - 3 * T / 4) < mp.mpf(10) ** -37


def test_multiprec_dense_output():
    # dense output + propagate_grid at 40 digits: grid states match a
    # separate integrator landed exactly on each grid point
    import mpmath as mp
    from heyoka_tpu.multiprec import MPTaylorIntegrator

    sys_ = pendulum(gconst=1.0, length=1.0)
    grid = [0.3, 0.9, 1.7, 2.2, 3.0]
    m1 = MPTaylorIntegrator(sys_, [0.05, 0.025], dps=40)
    rows = m1.propagate_grid(grid)
    assert len(rows) == len(grid)
    with mp.workdps(40):
        for t, row in zip(grid, rows):
            m2 = MPTaylorIntegrator(sys_, [0.05, 0.025], dps=40)
            m2.propagate_until(t)
            assert abs(m2.time - mp.mpf(t)) < mp.mpf(10) ** -38
            for a, b in zip(row, m2.state):
                assert abs(a - b) < mp.mpf(10) ** -36

    # update_d_output: continuity across the last step interval
    m3 = MPTaylorIntegrator(sys_, [0.05, 0.025], dps=40)
    m3.step()
    h = m3.last_h
    with mp.workdps(40):
        mid = m3.update_d_output(m3.time - h / 2)
        end = m3.update_d_output(m3.time)
        assert abs(end[0] - m3.state[0]) < mp.mpf(10) ** -38
        assert abs(mid[0]) < 1  # sane value inside the interval
