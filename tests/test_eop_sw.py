"""EOP/SW data subsystem tests (reference analogs: test/eop_data.cpp,
test/sw_data.cpp, test/model_eop.cpp, test/model_sw.cpp)."""

import math

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu import EOPData, SWData
from heyoka_tpu.models import (
    Ap_avg, era, erap, f107, f107a_center81, gmst82, pm_x, pm_xp, pm_y, dX, dY,
)
from heyoka_tpu.utils.timeconv import cal_to_jd, jd_utc_to_tt

ARCSEC = math.pi / (180.0 * 3600.0)


def tt_cy_of(y, m, d, frac=0.0):
    t1, t2 = jd_utc_to_tt(cal_to_jd(y, m, d), frac)
    return float(((t1 - 2451545.0) + t2) / 36525.0)


@pytest.fixture(scope="module")
def eop():
    return EOPData()


@pytest.fixture(scope="module")
def sw():
    return SWData()


def test_builtin_tables(eop, sw):
    assert eop.table.shape[1] == 6
    assert sw.table.shape[1] == 4
    assert eop.identifier == "iers_rapid_usno_finals2000A_all"
    assert sw.identifier == "celestrak_long_term"
    assert np.all(np.diff(eop.table[:, 0]) > 0)
    with pytest.raises(ValueError, match="increasing"):
        EOPData(np.zeros((3, 6)))


def test_era_against_formula(eop):
    # at a table node the interpolant equals the IAU2000 ERA formula
    mjd = cal_to_jd(2020, 1, 1) - 2400000.5
    i = int(np.searchsorted(eop.table[:, 0], mjd))
    assert eop.table[i, 0] == mjd
    dut1 = eop.table[i, 1]
    Tu = (mjd - 51544.5) + dut1 / 86400.0
    want = (2 * math.pi * (0.7790572732640 + 1.00273781191135448 * Tu)) % (
        2 * math.pi
    )
    cf = hy.make_cfunc([era()], vars=[])
    got = float(cf(np.zeros(0), time=tt_cy_of(2020, 1, 1))[0])
    assert got == pytest.approx(want, abs=5e-11)


def test_erap_value(eop):
    # ERA rate: ~ 2*pi * 36525 * 1.00273781... rad / Julian century
    cf = hy.make_cfunc([erap()], vars=[])
    got = float(cf(np.zeros(0), time=tt_cy_of(2015, 6, 10))[0])
    want = 2 * math.pi * 1.00273781191135448 * 36525
    assert got == pytest.approx(want, rel=1e-7)


def test_gmst82_vs_era(eop):
    # GMST and ERA agree to within the equation-of-origins scale (< 0.02 rad)
    cf = hy.make_cfunc([era(), gmst82()], vars=[])
    out = np.asarray(cf(np.zeros(0), time=tt_cy_of(2010, 3, 20)))
    assert abs(out[0] - out[1]) % (2 * math.pi) < 0.02


def test_pm_interpolation(eop):
    mjd = cal_to_jd(2012, 7, 15) - 2400000.5
    i = int(np.searchsorted(eop.table[:, 0], mjd))
    cf = hy.make_cfunc([pm_x(), pm_y()], vars=[])
    out = np.asarray(cf(np.zeros(0), time=tt_cy_of(2012, 7, 15)))
    np.testing.assert_allclose(
        out, eop.table[i, 2:4] * ARCSEC, rtol=1e-10
    )
    # midpoint between nodes is the average
    mid = np.asarray(
        cf(np.zeros(0), time=tt_cy_of(2012, 7, 15, 0.5))
    )
    want = 0.5 * (eop.table[i, 2:4] + eop.table[i + 1, 2:4]) * ARCSEC
    np.testing.assert_allclose(mid, want, rtol=1e-9)


def test_pm_xp_is_slope(eop):
    mjd = cal_to_jd(2012, 7, 15) - 2400000.5
    i = int(np.searchsorted(eop.table[:, 0], mjd))
    cf = hy.make_cfunc([pm_xp()], vars=[])
    got = float(cf(np.zeros(0), time=tt_cy_of(2012, 7, 15, 0.3))[0])
    # slope per century from the daily table difference
    from heyoka_tpu.eop_sw import _date_tt_cy

    dcy = np.diff(_date_tt_cy(eop.table[i : i + 2, 0]))[0]
    want = (eop.table[i + 1, 2] - eop.table[i, 2]) * ARCSEC / dcy
    assert got == pytest.approx(want, rel=1e-9)


def test_out_of_range_nan():
    cf = hy.make_cfunc([era(), dX(), dY()], vars=[])
    out = np.asarray(cf(np.zeros(0), time=5.0))  # year ~2500
    assert np.all(np.isnan(out))


def test_sw_values(sw):
    mjd = cal_to_jd(2003, 10, 29) - 2400000.5  # Halloween storm
    i = int(np.searchsorted(sw.table[:, 0], mjd))
    assert sw.table[i, 0] == mjd
    cf = hy.make_cfunc([Ap_avg(), f107(), f107a_center81()], vars=[])
    out = np.asarray(cf(np.zeros(0), time=tt_cy_of(2003, 10, 29)))
    np.testing.assert_allclose(out, sw.table[i, 1:4], rtol=1e-10)
    assert out[0] > 100  # major geomagnetic storm


def test_in_ode_integration(eop):
    # EOP quantities are usable inside an ODE right-hand side: the Taylor
    # recurrence treats them as piecewise-linear in time
    x = hy.make_vars("x")
    t0 = tt_cy_of(2020, 1, 1)
    ta = hy.taylor_adaptive(
        [(x, pm_x() * 1e6)], [0.0], time=t0, tol=1e-12,
    )
    dt = 2.0 / 36525.0  # two days, in centuries
    # cap steps well below one day: the Taylor polynomial is blind to the
    # interpolant's slope changes at the daily table nodes (exactly like the
    # reference's piecewise-linear EOP expressions)
    ta.propagate_until(t0 + dt, max_delta_t=0.02 / 36525.0)
    # compare against trapezoid integral of the interpolant (exact for
    # piecewise linear)
    from heyoka_tpu.eop_sw import _date_tt_cy

    mjd0 = cal_to_jd(2020, 1, 1) - 2400000.5
    i = int(np.searchsorted(eop.table[:, 0], mjd0))
    dates = _date_tt_cy(eop.table[i : i + 3, 0])
    vals = eop.table[i : i + 3, 2] * ARCSEC * 1e6
    want = np.trapezoid(vals, dates)
    assert ta.state[0] == pytest.approx(want, rel=1e-7)


def test_parse_finals2000A():
    from heyoka_tpu.eop_sw import parse_eop_finals2000A

    # build a line with the documented fixed-width offsets
    ln = [" "] * 190
    def put(s_, a, b):
        ln[a:b] = list(s_.rjust(b - a))
    put("55871.00", 7, 15)
    put("0.147495", 18, 27)
    put("0.294028", 37, 46)
    put("-0.3429995", 58, 68)
    put("-85.228", 97, 106)
    put("-8.417", 116, 125)
    tab = parse_eop_finals2000A("".join(ln) + "\n")
    assert tab.shape == (1, 6)
    assert tab[0, 0] == 55871.0
    assert tab[0, 1] == pytest.approx(-0.3429995)
    assert tab[0, 2] == pytest.approx(0.147495)
    assert tab[0, 4] == pytest.approx(-85.228)
