"""SGP4 propagator tests (reference analog: test/model_sgp4.cpp).

Validation vectors: the published Spacetrack Report #3 near-Earth test case
(satellite 88888) and internal-consistency / derivative checks.
"""

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu.models import SGP4Propagator, gpe_is_deep_space, sgp4
from heyoka_tpu.utils.tle import parse_tle, parse_tle_file
from heyoka_tpu.utils.timeconv import (
    cal_to_jd,
    jd_to_cal,
    jd_utc_to_tai,
    jd_tai_to_utc,
    tai_minus_utc,
)

L1 = "1 88888U          80275.98708465  .00073094  13844-3  66816-4 0    8"
L2 = "2 88888  72.8435 115.9689 0086731  52.6988 110.5714 16.05824518  105"

# Spacetrack Report #3, SGP4 verification ephemeris for sat 88888 (km, km/s).
# Columns: tsince [min], x, y, z, vx, vy, vz.  The modern (Vallado) un-Kozai
# update shifts positions by O(10 m) vs the 1980 report, hence the tolerances.
REPORT3 = np.array([
    [0.0, 2328.97048951, -5995.22076416, 1719.97067261,
     2.91207230, -0.98341546, -7.09081703],
    [360.0, 2456.10705566, -6071.93853760, 1222.89727783,
     2.67938992, -0.44829041, -7.22879231],
    [720.0, 2567.56195068, -6112.50384522, 713.96397400,
     2.44024599, 0.09810869, -7.31995916],
])


@pytest.fixture(scope="module")
def prop():
    gpe = parse_tle(L1, L2)
    return SGP4Propagator(gpe.reshape(9, 1))


def test_report3_vectors(prop):
    for row in REPORT3:
        out = prop(np.array([row[0]]))
        assert out.shape == (1, 7)
        np.testing.assert_allclose(out[0, :3], row[1:4], atol=2e-2)  # 20 m
        np.testing.assert_allclose(out[0, 3:6], row[4:7], atol=2e-5)
        assert out[0, 6] == 0.0  # no error


def test_multi_sat_multi_time():
    gpe = parse_tle(L1, L2)
    sat = np.stack([gpe, gpe], axis=1)  # same sat twice
    prop = SGP4Propagator(sat)
    assert prop.nsats == 2
    times = np.array([[0.0, 360.0], [360.0, 0.0]])
    out = prop(times)
    assert out.shape == (2, 2, 7)
    # rows are (n_evals, n_sats): sat0@0 == sat1@0 etc.
    np.testing.assert_allclose(out[0, 0], out[1, 1], rtol=1e-12)
    np.testing.assert_allclose(out[0, 1], out[1, 0], rtol=1e-12)


def test_deep_space_rejected():
    gpe = parse_tle(L1, L2)
    gpe_ds = gpe.copy()
    gpe_ds[0] = 2.0 * np.pi / 1436.0  # geosynchronous: period ~ 1 day
    assert gpe_is_deep_space(gpe_ds[0], gpe_ds[1], gpe_ds[2])
    with pytest.raises(ValueError, match="deep-space"):
        SGP4Propagator(gpe_ds.reshape(9, 1))


def test_dates_input(prop):
    gpe = parse_tle(L1, L2)
    # propagating at exactly the epoch == tsince 0
    out_t = prop(np.array([0.0]))
    out_d = prop(jd=np.array([gpe[7]]), frac=np.array([gpe[8]]))
    np.testing.assert_allclose(out_d, out_t, atol=1e-6)


def test_derivatives_vs_finite_differences():
    gpe = parse_tle(L1, L2)
    p1 = SGP4Propagator(gpe.reshape(9, 1), diff_order=1)
    assert p1.nouts == 7 * (1 + 7)
    t = np.array([47.0])
    out = p1(t)
    b, e = p1.get_dslice(1)
    jac = out[0, b:e].reshape(7, 7)

    # finite differences over each GPE input
    p0 = SGP4Propagator(gpe.reshape(9, 1))
    for j, eps in enumerate([1e-9, 1e-9, 1e-8, 1e-8, 1e-8, 1e-8, 1e-9]):
        gp = gpe.copy(); gp[j] += eps
        gm = gpe.copy(); gm[j] -= eps
        fd = (SGP4Propagator(gp.reshape(9, 1))(t) - SGP4Propagator(gm.reshape(9, 1))(t)) / (2 * eps)
        np.testing.assert_allclose(
            jac[:, j], fd[0, :7], rtol=2e-4, atol=1e-4,
        )


def test_dslice_mindex():
    gpe = parse_tle(L1, L2)
    p1 = SGP4Propagator(gpe.reshape(9, 1), diff_order=1)
    assert p1.get_dslice(0) == (0, 7)
    assert p1.get_dslice(1) == (7, 56)
    comp, counts = p1.get_mindex(0)
    assert comp == 0 and sum(counts) == 0
    comp, counts = p1.get_mindex(7)
    assert comp == 0 and sum(counts) == 1


def test_sgp4_symbolic_inputs():
    exprs = sgp4()
    assert len(exprs) == 7
    vs = set()
    for e in exprs:
        vs |= set(hy.get_variables(e))
    assert vs == {"n0", "e0", "i0", "node0", "omega0", "m0", "bstar", "tsince"}


def test_parse_tle_file():
    text = f"SAT 88888\n{L1}\n{L2}\n{L1}\n{L2}\n"
    arr = parse_tle_file(text)
    assert arr.shape == (9, 2)
    np.testing.assert_array_equal(arr[:, 0], arr[:, 1])


# -- time-scale conversions ---------------------------------------------------

def test_cal_jd_roundtrip():
    assert cal_to_jd(2000, 1, 1) == 2451544.5
    y, m, d, fd = jd_to_cal(2451545.0)
    assert (y, m, d, fd) == (2000, 1, 1, 0.5)


def test_tai_minus_utc_values():
    assert tai_minus_utc(cal_to_jd(2017, 1, 2)) == 37.0
    assert tai_minus_utc(cal_to_jd(2016, 12, 31)) == 36.0
    assert tai_minus_utc(cal_to_jd(1990, 6, 1)) == 25.0
    assert tai_minus_utc(cal_to_jd(1972, 1, 1)) == 10.0


def test_utc_tai_roundtrip():
    for jd in [2451545.0, 2457754.5, 2444239.5]:
        t1, t2 = jd_utc_to_tai(jd, 0.25)
        u1, u2 = jd_tai_to_utc(t1, t2)
        assert abs((u1 - jd) + (u2 - 0.25)) * 86400 < 1e-6


def test_leap_second_day():
    # 2016-12-31 was a leap-second day (86401 s): TAI-UTC goes 36 -> 37
    jd = cal_to_jd(2016, 12, 31)
    t1, t2 = jd_utc_to_tai(jd, 0.0)
    assert abs((t1 - jd + t2) * 86400 - 36.0) < 1e-6
    t1, t2 = jd_utc_to_tai(jd + 1.0, 0.0)
    assert abs((t1 - (jd + 1.0) + t2) * 86400 - 37.0) < 1e-6
    # mid-day: half of the extra second has accrued
    t1, t2 = jd_utc_to_tai(jd, 0.5)
    assert abs((t1 - jd + t2 - 0.5) * 86400 - 36.5) < 1e-6
