"""Tutorial 06 — SGP4 satellite propagation (reference: the sgp4_propagator
tutorial).

Parse TLEs, propagate a constellation in one batched XLA computation, and
get derivatives of the Cartesian state w.r.t. the orbital elements.
"""

import numpy as np

import heyoka_tpu as hy
from heyoka_tpu.models import sgp4_propagator
from heyoka_tpu.utils import parse_tle_file

TLES = """
TEST SAT (Spacetrack Report #3)
1 88888U          80275.98708465  .00073094  13844-3  66816-4 0    8
2 88888  72.8435 115.9689 0086731  52.6988 110.5714 16.05824518  105
"""

sats = parse_tle_file(TLES)
prop = sgp4_propagator(sats)
print(prop)

# minutes since each satellite's epoch -> (n_sats, 7): x y z vx vy vz err
out = prop(np.array([0.0]))
print("r(epoch) [km]:", out[0, :3])

# a day of ephemeris at 1-min cadence: (1440, n_sats, 7)
times = np.arange(0.0, 1440.0)[:, None]
eph = prop(np.tile(times, (1, prop.nsats)))
radii = np.linalg.norm(eph[:, 0, :3], axis=1)
print(f"radius range over a day: {radii.min():.1f} .. {radii.max():.1f} km")

# derivatives w.r.t. the GPEs (dtens layout)
prop1 = sgp4_propagator(sats, diff_order=1)
o = prop1(np.array([360.0]))
b, e = prop1.get_dslice(1)
jac = o[0, b:e].reshape(7, 7)
print("d x / d bstar:", jac[0, 6])
