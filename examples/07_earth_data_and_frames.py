"""Tutorial 07 — Earth data, frames and geodesy (reference: tutorials on
EOP data, frame transformations and cart2geo).

Earth-orientation quantities are expressions interpolating IERS data; frame
rotations compose them into ITRS<->ICRS chains.
"""

import numpy as np

import heyoka_tpu as hy
from heyoka_tpu.models import cart2geo, era, gmst82, pm_x, rot_itrs_icrs
from heyoka_tpu.utils.timeconv import cal_to_jd, jd_utc_to_tt

# TT Julian centuries since J2000 for 2015-06-10 00:00 UTC
t1, t2 = jd_utc_to_tt(cal_to_jd(2015, 6, 10), 0.0)
tc = float(((t1 - 2451545.0) + t2) / 36525.0)

cf = hy.make_cfunc([era(), gmst82(), pm_x()], vars=[])
vals = np.asarray(cf(np.zeros(0), time=tc))
print(f"ERA = {vals[0]:.9f} rad, GMST82 = {vals[1]:.9f} rad, "
      f"x_p = {vals[2] / 4.84813681e-6:.4f} arcsec")

# rotate an ITRS position into ICRS and convert to geodetic coordinates
x, y, z = hy.make_vars("x", "y", "z")
p_itrs = np.array([6524834.0, 1327012.0, -95321.5])  # metres

cf2 = hy.make_cfunc(
    rot_itrs_icrs([x, y, z]) + cart2geo([x, y, z]), vars=["x", "y", "z"]
)
out = np.asarray(cf2(p_itrs, time=tc))
print("ICRS position [m]:", out[:3])
h, phi, lon = out[3:]
print(f"geodetic: h = {h / 1e3:.3f} km, lat = {np.degrees(phi):.4f} deg, "
      f"lon = {np.degrees(lon):.4f} deg")
