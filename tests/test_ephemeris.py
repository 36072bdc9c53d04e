"""ELP2000 / VSOP2013 / thermoNET / eo_dynamics tests (reference analogs:
test/elp2000.cpp, test/vsop2013.cpp, test/model_nrlmsise00_tn.cpp,
test/model_jb08_tn.cpp, test/model_eo_dynamics.cpp)."""

import math

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu.models import (
    elp2000_cartesian_e2000,
    elp2000_cartesian_fk5,
    eo_dynamics,
    get_elp2000_mus,
    get_vsop2013_mus,
    jb08_tn,
    nrlmsise00_tn,
    vsop2013_elliptic,
)


def test_elp2000_vs_reference_values():
    # oracle: positions cross-checked against the published theory (the
    # reference's own test vectors, test/elp2000.cpp:41-46)
    cf = hy.make_cfunc(elp2000_cartesian_e2000(thresh=1e-5), vars=[])
    ref = [
        (-361605.79234692274, 44981.04302003427, -30693.19198820311, 2469000.5),
        (-363123.49639910535, 35877.2078378671, -33194.68710267386, 2449000.5),
        (-371572.8001113177, 75278.04108874535, -32227.390108194537, 2429000.5),
        (-373885.8585384737, 127397.62026596011, -30039.82215825389, 2409000.5),
        (-346323.78767959465, 206374.952164921, -28496.523303933904, 2389000.5),
    ]
    for x, y, z, date in ref:
        tm = (date - 2451545.0) / 36525.0
        out = np.asarray(cf(np.zeros(0), time=tm))
        # our truncation bookkeeping differs at the ~30 m level from the
        # reference's at this threshold; the lunar distance is ~4e5 km
        np.testing.assert_allclose(out, [x, y, z], atol=0.05)


def test_elp2000_distance_sanity():
    cf = hy.make_cfunc(elp2000_cartesian_fk5(thresh=1e-6), vars=[])
    for tm in np.linspace(-1.0, 1.0, 7):
        r = np.linalg.norm(np.asarray(cf(np.zeros(0), time=float(tm))))
        assert 356000 < r < 407000  # perigee..apogee range of the Moon

    assert get_elp2000_mus() == (3.986005e14, 4902794214578.239)


def test_vsop2013_pluto_elements():
    # the snapshot ships the planet-9 q/p series: check inclination/node
    q = vsop2013_elliptic(9, 5, thresh=1e-7)
    p = vsop2013_elliptic(9, 6, thresh=1e-7)
    cf = hy.make_cfunc([q, p], vars=[])
    out = np.asarray(cf(np.zeros(0), time=0.0))
    si2 = math.hypot(out[0], out[1])
    assert 2 * math.degrees(math.asin(si2)) == pytest.approx(17.15, abs=0.05)
    Om = math.degrees(math.atan2(out[1], out[0])) % 360
    assert Om == pytest.approx(110.29, abs=0.05)

    assert len(get_vsop2013_mus()) == 10
    with pytest.raises(ValueError, match="not available"):
        vsop2013_elliptic(3, 1)
    with pytest.raises(ValueError, match="planet index"):
        vsop2013_elliptic(0, 1)


def test_thermonets():
    rho = nrlmsise00_tn(
        geodetic=[400.0, 0.4, 1.0], f107=150.0, f107a=140.0, ap=12.0,
        time_expr=180.0,
    )
    cf = hy.make_cfunc([rho], vars=[])
    v400 = float(cf(np.zeros(0))[0])
    assert 1e-13 < v400 < 1e-11  # typical LEO density range

    rho300 = nrlmsise00_tn(
        geodetic=[300.0, 0.4, 1.0], f107=150.0, f107a=140.0, ap=12.0,
        time_expr=180.0,
    )
    v300 = float(hy.make_cfunc([rho300], vars=[])(np.zeros(0))[0])
    assert v300 > 3 * v400  # density decreases with altitude

    rho_j = jb08_tn(
        geodetic=[400.0, 0.4, 1.0], f107=150.0, f107a=140.0, s107=140.0,
        s107a=135.0, m107=140.0, m107a=135.0, y107=140.0, y107a=135.0,
        dDstdT=50.0, time_expr=180.0,
    )
    vj = float(hy.make_cfunc([rho_j], vars=[])(np.zeros(0))[0])
    assert 1e-13 < vj < 1e-11
    # the two models agree within a factor of a few
    assert 0.2 < vj / v400 < 5.0


def test_eo_dynamics_keplerian():
    from heyoka_tpu.utils.timeconv import cal_to_jd, jd_utc_to_tt

    t1, t2 = jd_utc_to_tt(cal_to_jd(2015, 6, 10), 0.0)
    t0 = float(((t1 - 2451545.0) + t2) * 86400.0)

    dyn = eo_dynamics()
    mu = 3986004.415e8 / 1e9
    r0 = 7000.0
    v_circ = math.sqrt(mu / r0)
    ta = hy.taylor_adaptive(
        dyn, [r0, 0.0, 0.0, 0.0, v_circ, 0.0], time=t0, tol=1e-12
    )
    T = 2 * math.pi * math.sqrt(r0**3 / mu)
    ta.propagate_for(T)
    np.testing.assert_allclose(ta.state[:3], [r0, 0.0, 0.0], atol=1e-5)

    with pytest.raises(ValueError, match="must both"):
        eo_dynamics(elp2000_thresh=1e-6)


def test_eo_dynamics_drag_shrinks_orbit():
    # build-only smoke of the full drag expression; evaluate the rhs once
    from heyoka_tpu.utils.timeconv import cal_to_jd, jd_utc_to_tt

    t1, t2 = jd_utc_to_tt(cal_to_jd(2015, 6, 10), 0.0)
    t0 = float(((t1 - 2451545.0) + t2) * 86400.0)
    dyn = eo_dynamics(Cb=0.02)
    cf = hy.make_cfunc(
        [rhs for _, rhs in dyn], vars=["x", "y", "z", "vx", "vy", "vz"]
    )
    st = np.array([6678.0, 0.0, 0.0, 0.0, 7.72, 0.2])
    out = np.asarray(cf(st, time=t0))
    # drag decelerates: acceleration has a component opposite the velocity
    a = out[3:]
    mu = 3986004.415e8 / 1e9
    a_grav = -mu * st[:3] / np.linalg.norm(st[:3]) ** 3
    a_drag = a - a_grav
    vdir = st[3:] / np.linalg.norm(st[3:])
    assert np.dot(a_drag, vdir) < 0
    # magnitude plausible for 300 km altitude with Cb=0.02 m^2/kg
    assert 1e-11 < np.linalg.norm(a_drag) < 1e-5
