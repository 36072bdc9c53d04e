"""Frame transformations / cart2geo / dayfrac / iau2006 / time-conversion
tests (reference analogs: test/model_frame_transformations.cpp,
test/model_cart2geo.cpp, test/model_dayfrac.cpp, test/model_iau2006.cpp)."""

import math

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu.models import (
    cart2geo,
    dayfrac,
    delta_tdb_tt,
    delta_tt_tai,
    geo2cart,
    iau2006,
    rot_fk5j2000_icrs,
    rot_icrs_fk5j2000,
    rot_icrs_itrs,
    rot_itrs_icrs,
    rot_itrs_teme,
    rot_teme_itrs,
    state_from_rsw,
    state_from_rsw_inertial,
    state_to_rsw,
    state_to_rsw_inertial,
)
from heyoka_tpu.utils.timeconv import cal_to_jd, jd_utc_to_tt

ARCSEC = math.pi / (180.0 * 3600.0)
P_ITRS = np.array([6524834.0, 1327012.0, -95321.5])


def tt_cy_of(y, m, d, frac=0.0):
    t1, t2 = jd_utc_to_tt(cal_to_jd(y, m, d), frac)
    return float(((t1 - 2451545.0) + t2) / 36525.0)


def test_iau2006_vs_numpy_oracle():
    # independent numpy evaluation of the same public IERS series data
    from heyoka_tpu.models.iau2006 import (
        _ARCSEC, _LUNISOLAR, _PLANETARY, _POLY_X, _POLY_Y, _series_data,
    )

    d = _series_data()
    t = (2454196.0 - 2451545.0) / 36525.0  # 2007 Apr 5, 12h TT
    args = np.zeros(14)
    for k, c in enumerate(_LUNISOLAR):
        args[k] = np.polyval(list(reversed(c)), t) * _ARCSEC
    for k, c in enumerate(_PLANETARY):
        args[5 + k] = np.polyval(list(reversed(c)), t)

    def series_np(q):
        tot = 0.0
        for p in range(5):
            idxs = d[f"{q}_idxs_{p}"].astype(float)
            cfs = d[f"{q}_cfs_{p}"]
            arg = idxs @ args
            tot += (t ** p) * np.sum(
                cfs[:, 0] / 1e6 * _ARCSEC * np.sin(arg)
                + cfs[:, 1] / 1e6 * _ARCSEC * np.cos(arg)
            )
        return tot

    Xnp = np.polyval(list(reversed(_POLY_X)), t) * _ARCSEC + series_np("X")
    Ynp = np.polyval(list(reversed(_POLY_Y)), t) * _ARCSEC + series_np("Y")

    X, Y, s = iau2006(thresh=0.0)
    cf = hy.make_cfunc([X, Y, s], vars=[])
    out = np.asarray(cf(np.zeros(0), time=t))
    assert out[0] == pytest.approx(Xnp, abs=1e-17)
    assert out[1] == pytest.approx(Ynp, abs=1e-17)
    # SOFA cookbook values for this epoch (model-only, sub-mas agreement
    # modulo the published CIP offsets)
    assert out[0] == pytest.approx(0.000712264603, abs=2e-9)
    assert out[1] == pytest.approx(0.000044385750, abs=2e-9)


def test_iau2006_thresh_truncates():
    X0, _, _ = iau2006(thresh=0.0)
    X1, _, _ = iau2006(thresh=1e-4)
    n0 = len(hy.make_cfunc([X0], vars=[]).tape.ops)
    n1 = len(hy.make_cfunc([X1], vars=[]).tape.ops)
    assert n1 < n0
    with pytest.raises(ValueError, match="threshold"):
        iau2006(thresh=-1.0)


def test_fk5_icrs_bias():
    # published FK5->ICRS rotation (GODOT/reference constants as oracle)
    from heyoka_tpu.models.frames import _FK5_ICRS

    want = np.array([
        [9.9999999999999278e-01, 1.1102233723050031e-07, 4.4118034269763241e-08],
        [-1.1102233297408340e-07, 9.9999999999998912e-01, -9.6477927438885170e-08],
        [-4.4118044980967761e-08, 9.6477922540797404e-08, 9.9999999999999434e-01],
    ])
    np.testing.assert_allclose(_FK5_ICRS, want, rtol=0, atol=1e-15)

    x, y, z = hy.make_vars("x", "y", "z")
    cf = hy.make_cfunc(
        rot_icrs_fk5j2000(rot_fk5j2000_icrs([x, y, z])), vars=["x", "y", "z"]
    )
    np.testing.assert_allclose(np.asarray(cf(P_ITRS)), P_ITRS, rtol=1e-15)


def test_itrs_icrs_roundtrip():
    x, y, z = hy.make_vars("x", "y", "z")
    tc = tt_cy_of(2015, 6, 10)
    icrs = rot_itrs_icrs([x, y, z])
    back = rot_icrs_itrs(icrs)
    cf = hy.make_cfunc(icrs + back, vars=["x", "y", "z"])
    out = np.asarray(cf(P_ITRS, time=tc))
    # rotation: norm preserved, roundtrip at numerical noise
    assert np.linalg.norm(out[:3]) == pytest.approx(np.linalg.norm(P_ITRS), rel=1e-14)
    np.testing.assert_allclose(out[3:], P_ITRS, rtol=0, atol=1e-6)


def test_itrs_teme_roundtrip_and_consistency():
    x, y, z = hy.make_vars("x", "y", "z")
    tc = tt_cy_of(2015, 6, 10)
    teme = rot_itrs_teme([x, y, z])
    back = rot_teme_itrs(teme)
    cf = hy.make_cfunc(teme + back, vars=["x", "y", "z"])
    out = np.asarray(cf(P_ITRS, time=tc))
    np.testing.assert_allclose(out[3:], P_ITRS, rtol=0, atol=1e-6)

    # TEME and ICRS frames differ only by precession-nutation-scale angles
    icrs = rot_itrs_icrs([x, y, z])
    cf2 = hy.make_cfunc(icrs, vars=["x", "y", "z"])
    a = np.asarray(cf2(P_ITRS, time=tc))
    cosang = np.dot(a, out[:3]) / np.linalg.norm(a) / np.linalg.norm(out[:3])
    assert math.acos(min(cosang, 1.0)) < 0.01


def test_cart2geo_roundtrip():
    x, y, z = hy.make_vars("x", "y", "z")
    cfg = hy.make_cfunc(cart2geo([x, y, z]), vars=["x", "y", "z"])
    g = np.asarray(cfg(P_ITRS))
    # h, phi, lon sanity for this LEO-ish point
    assert -1e5 < g[0] < 1e6
    assert abs(g[1]) < math.pi / 2
    h, phi, lon = hy.make_vars("h", "phi", "lon")
    cfc = hy.make_cfunc(geo2cart([h, phi, lon]), vars=["h", "phi", "lon"])
    np.testing.assert_allclose(np.asarray(cfc(g)), P_ITRS, rtol=0, atol=1e-6)
    with pytest.raises(ValueError, match="n_iters"):
        cart2geo([x, y, z], n_iters=0)


def test_dayfrac_values():
    cf = hy.make_cfunc([dayfrac()], vars=[])

    def ttd(y, m, d, frac=0.0):
        t1, t2 = jd_utc_to_tt(cal_to_jd(y, m, d), frac)
        return float((t1 - 2451545.0) + t2)

    assert float(cf(np.zeros(0), time=ttd(2020, 3, 1))[0]) == pytest.approx(60.0, abs=1e-9)
    assert float(cf(np.zeros(0), time=ttd(2021, 3, 1))[0]) == pytest.approx(59.0, abs=1e-9)
    assert float(cf(np.zeros(0), time=ttd(2021, 1, 1))[0]) == pytest.approx(0.0, abs=1e-9)
    assert float(cf(np.zeros(0), time=ttd(2020, 12, 31, 0.75))[0]) == pytest.approx(
        365.75, abs=1e-9
    )


def test_delta_tt_tai_and_tdb():
    assert float(delta_tt_tai.value) == 32.184
    t = hy.make_vars("t")
    cf = hy.make_cfunc([delta_tdb_tt(t)], vars=["t"])
    # TDB-TT is a ~1.657 ms annual sinusoid
    vals = np.asarray(cf(np.linspace(0, 3.2e7, 50).reshape(-1, 1)))[:, 0]
    assert np.max(np.abs(vals)) <= 1.657e-3 + 1e-12
    assert np.max(vals) > 1.0e-3


def test_rsw_roundtrips():
    px, py, pz, vx, vy, vz = hy.make_vars("px", "py", "pz", "vx", "vy", "vz")
    r0 = [7000e3, 0.0, 0.0]
    v0 = [0.0, 7.5e3, 1.0e3]
    st = np.array([7010e3, 30e3, -12e3, 11.0, 7400.0, 950.0])

    for to_f, from_f in [
        (state_to_rsw, state_from_rsw),
        (state_to_rsw_inertial, state_from_rsw_inertial),
    ]:
        rsw = to_f([px, py, pz], [vx, vy, vz], r0, v0)
        back = from_f(rsw[0], rsw[1], r0, v0)
        cf = hy.make_cfunc(
            back[0] + back[1], vars=["px", "py", "pz", "vx", "vy", "vz"]
        )
        np.testing.assert_allclose(np.asarray(cf(st)), st, rtol=1e-12)

    # the reference state itself maps to the origin with S-aligned velocity
    rsw = state_to_rsw([px, py, pz], [vx, vy, vz], r0, v0)
    cf = hy.make_cfunc(rsw[0] + rsw[1], vars=["px", "py", "pz", "vx", "vy", "vz"])
    out = np.asarray(cf(np.array(r0 + v0)))
    np.testing.assert_allclose(out, 0.0, atol=1e-9)
