"""Dense trig-series op tests (expr/series.py; round-2 huge-tape design).

Reference context: the ephemeris theories land as 10^3-10^5 expression
u-vars in the reference (compact-mode codegen); here the series collapse
into single dense tape ops.  These tests pin (a) evaluation and jet
equivalence against the expanded expression path, (b) the closed-form
Taylor rule against the symbolic oracle, (c) differentiation closure, and
(d) the ELP2000 model's series_op variant.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import heyoka_tpu as hy
from heyoka_tpu.expr.series import affine_in_time, trig_series
from heyoka_tpu.expr.decompose import taylor_decompose_sys
from heyoka_tpu.taylor.jet import make_jet_fn


def _random_series(rng, n=5, q=3, d=3):
    amp = np.zeros((n, q))
    amp[:, 0] = rng.uniform(0.5, 2, n)
    amp[:, 1] = rng.uniform(-0.1, 0.1, n)
    amp[:, 2] = rng.uniform(-0.01, 0.01, n)
    ph = np.zeros((n, d))
    ph[:, 0] = rng.uniform(0, 6, n)
    ph[:, 1] = rng.uniform(0.5, 3, n)
    ph[:, 2] = rng.uniform(-0.2, 0.2, n)
    return amp, ph


def _explicit(amp, ph, t):
    from heyoka_tpu.expr.core import expr as mkexpr

    def poly(row):
        acc = mkexpr(float(row[-1]))
        for c in reversed(row[:-1]):
            acc = acc * t + float(c)
        return acc

    return sum(poly(amp[i]) * hy.sin(poly(ph[i])) for i in range(amp.shape[0]))


def test_eval_and_jet_match_expansion(rng):
    amp, ph = _random_series(rng)
    t = hy.time
    f_op = trig_series(t, amp, ph)
    f_ex = _explicit(amp, ph, t)
    cf_op = hy.make_cfunc([f_op], vars=[])
    cf_ex = hy.make_cfunc([f_ex], vars=[])
    for tv in (0.0, 0.37, -1.2, 2.7):
        assert float(cf_op([], time=tv)[0]) == pytest.approx(
            float(cf_ex([], time=tv)[0]), abs=1e-12
        )

    x = hy.make_vars("x")
    tape_op = taylor_decompose_sys([(x, f_op + 0.0 * x)])
    tape_ex = taylor_decompose_sys([(x, f_ex + 0.0 * x)])
    jo = make_jet_fn(tape_op, 12)
    je = make_jet_fn(tape_ex, 12)
    args = (jnp.asarray([0.1]), jnp.zeros((0,)), jnp.asarray(0.7))
    np.testing.assert_allclose(
        np.asarray(jo(*args))[:, :1], np.asarray(je(*args))[:, :1],
        rtol=1e-11, atol=1e-13,
    )


def test_jet_with_shifted_affine_input(rng):
    # u = t + par[0]: the closed form folds the shift via u0/u1
    amp, ph = _random_series(rng, n=3)
    u = hy.time + hy.par[0]
    f_op = trig_series(u, amp, ph)
    f_ex = _explicit(amp, ph, u)
    x = hy.make_vars("x")
    tape_op = taylor_decompose_sys([(x, f_op + 0.0 * x)])
    tape_ex = taylor_decompose_sys([(x, f_ex + 0.0 * x)])
    jo = make_jet_fn(tape_op, 10)
    je = make_jet_fn(tape_ex, 10)
    args = (jnp.asarray([0.1]), jnp.asarray([0.31]), jnp.asarray(0.2))
    np.testing.assert_allclose(
        np.asarray(jo(*args))[:, :1], np.asarray(je(*args))[:, :1],
        rtol=1e-11, atol=1e-13,
    )


def test_diff_closure(rng):
    amp, ph = _random_series(rng, n=4)
    t = hy.time
    f_op = trig_series(t, amp, ph)
    df = hy.diff(f_op, t) if hasattr(hy, "diff") else None
    # numeric check of d/dt via central differences
    cf = hy.make_cfunc([f_op], vars=[])
    if df is not None:
        cfd = hy.make_cfunc([df], vars=[])
        h = 1e-6
        for tv in (0.3, 1.1):
            fd = (float(cf([], time=tv + h)[0]) -
                  float(cf([], time=tv - h)[0])) / (2 * h)
            assert float(cfd([], time=tv)[0]) == pytest.approx(fd, rel=1e-7)


def test_affine_in_time_check():
    t = hy.time
    assert affine_in_time(t)
    assert affine_in_time(2.0 * t + hy.par[0])
    assert affine_in_time(hy.par[1])
    assert not affine_in_time(t * t)
    assert not affine_in_time(hy.sin(t))
    x = hy.make_vars("x")
    assert not affine_in_time(x + t)
    with pytest.raises(ValueError):
        from heyoka_tpu.models import elp2000_spherical

        elp2000_spherical(time_expr=t * t, series_op=True)


def test_elp2000_series_op_equivalence():
    from heyoka_tpu.models import elp2000_cartesian_e2000

    a = elp2000_cartesian_e2000(thresh=1e-5)
    b = elp2000_cartesian_e2000(thresh=1e-5, series_op=True)
    cfa = hy.make_cfunc(a, vars=[])
    cfb = hy.make_cfunc(b, vars=[])
    for tv in (-0.5, 0.0, 0.123):
        va = np.asarray(cfa([], time=tv)).ravel()
        vb = np.asarray(cfb([], time=tv)).ravel()
        np.testing.assert_allclose(vb, va, rtol=1e-9, atol=1e-6)
    # the series tape stays tiny regardless of threshold
    x, y, z = hy.make_vars("x", "y", "z")
    tape = taylor_decompose_sys(
        [(x, b[0]), (y, b[1]), (z, b[2])]
    )
    assert tape.n_uvars < 120
