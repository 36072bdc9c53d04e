"""dayfrac(): TT days elapsed since January 1st 00:00 UTC of the current year.

Reference parity: ``model::dayfrac`` (``include/heyoka/model/dayfrac.hpp``,
``src/model/dayfrac.cpp``): input is TT days since J2000.0; the output is the
number of TT days since Jan 1 00:00 UTC of the input's calendar year —
the "day of year" input of the NRLMSISE00/JB08 thermosphere models.

TPU-native delta: the reference offloads evaluation to a host C function
(``heyoka_tt_to_dayfrac``); here the whole calendar computation (Julian-day
to Gregorian year, leap seconds via a device-resident table) is branch-free
jnp arithmetic, so dayfrac stays inside the jitted graph (no host callback).
Pre-1972 epochs use the 1972 TAI-UTC offset (the drift regime is irrelevant
for thermosphere work).

Derivative: d dayfrac / dt == 1 almost everywhere (jumps at year boundaries
are invisible to the Taylor recurrence, like the EOP kinks).
"""

from __future__ import annotations

import numpy as np

from ..expr import registry as _reg
from ..expr import diff as _diff
from ..expr.core import ONE, expr, time as _time_expr
from ..taylor import recurrences as _rec
from ..utils.timeconv import _LEAP_TABLE, cal_to_jd

__all__ = ["dayfrac"]

#: leap-second table as (utc_mjd_of_change, TAI-UTC) arrays
_LEAP_MJD = np.array(
    [float(cal_to_jd(y, m, 1)) - 2400000.5 for (y, m, _) in _LEAP_TABLE]
)
_LEAP_DAT = np.array([d for (_, _, d) in _LEAP_TABLE])


def _dat_of_mjd(jnp, mjd):
    idx = jnp.searchsorted(jnp.asarray(_LEAP_MJD), mjd, side="right") - 1
    idx = jnp.clip(idx, 0, _LEAP_DAT.size - 1)
    return jnp.asarray(_LEAP_DAT)[idx]


def _year_of_jd(jnp, jd):
    """Gregorian year of a Julian date (Fliegel-Van Flandern, jnp ints)."""
    jdn = jnp.floor(jd + 0.5).astype(jnp.int64)
    a = jdn + 32044
    b = (4 * a + 3) // 146097
    c = a - 146097 * b // 4
    d = (4 * c + 3) // 1461
    e = c - 1461 * d // 4
    m = (5 * e + 2) // 153
    return 100 * b + d - 4800 + m // 10


def _jd_of_jan1(jnp, year):
    """UTC JD at 0h of Jan 1 of ``year`` (returns x.5)."""
    yy = year + 4799  # m=1 -> a=1, yy=y+4800-1, mm=10
    jdn = 1 + (153 * 10 + 2) // 5 + 365 * yy + yy // 4 - yy // 100 + yy // 400 - 32045
    return jdn.astype(jnp.float64) - 0.5


def _ev_dayfrac(t):
    import jax.numpy as jnp

    tt_frac = t  # TT days since J2000.0 (JD 2451545.0)
    # TT -> TAI -> UTC; iterate the leap lookup once to settle the date
    tai_frac = tt_frac - 32.184 / 86400.0
    utc_mjd_guess = tai_frac + (2451545.0 - 2400000.5)
    dat = _dat_of_mjd(jnp, utc_mjd_guess)
    utc_mjd = utc_mjd_guess - dat / 86400.0
    dat = _dat_of_mjd(jnp, utc_mjd)
    utc_jd_frac = tai_frac - dat / 86400.0  # UTC days since J2000.0

    year = _year_of_jd(jnp, 2451545.0 + utc_jd_frac)
    yjd = _jd_of_jan1(jnp, year)
    ymjd = yjd - 2400000.5
    ydat = _dat_of_mjd(jnp, ymjd)
    # year start in TT, as days since J2000: (yjd - 2451545) is exact
    ytt_frac = (yjd - 2451545.0) + (ydat + 32.184) / 86400.0
    ret = tt_frac - ytt_frac
    return jnp.maximum(ret, 0.0)


_reg.register(_reg.OpDef("dayfrac", 1, _ev_dayfrac))
_diff._GRAD["dayfrac"] = lambda t: (ONE,)
_rec._RULES["dayfrac"] = lambda k, inputs, meta, G, U, idx: G(inputs[0], k)


def dayfrac(*, time_expr=None):
    """Expression: days since Jan 1 00:00 UTC of the input's year; input is
    TT days since J2000.0 (default: heyoka time)."""
    from ..expr.core import Func

    te = _time_expr if time_expr is None else expr(time_expr)
    return Func("dayfrac", (te,))
