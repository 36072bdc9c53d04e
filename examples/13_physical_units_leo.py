"""Tutorial 13: integrate in your problem's natural units.

heyoka (f64 coefficients) is unit-agnostic; heyoka_tpu's fast engines
carry coefficients in f32 but pre-scale them per lane by a power of two
(the scaled-coefficient carry, PERF.md), so they are unit-agnostic too:
this example integrates a LEO orbit with EGM2008 J2-J4 gravity in
km / km/s with time in *SI seconds* (natural timestep ~400 s — far from
1 — and Taylor coefficients spanning ~130 decades, none of which the
user has to think about).

The one genuine requirement is that order-0 values (state, RHS and
intermediate tape values like the r^(2n+1) harmonics denominators) stay
inside the f32 exponent range — which is why Earth dynamics use km, not
meters (docs/tpu.md "Units and the f32 coefficient range").
"""
import numpy as np

import heyoka_tpu as hy
from heyoka_tpu.models import egm2008_acc, get_egm2008_a, get_egm2008_mu

x, y, z, vx, vy, vz = hy.make_vars("x", "y", "z", "vx", "vy", "vz")
ax, ay, az = egm2008_acc(
    [x, y, z], 4, 4,
    mu=get_egm2008_mu() / 1e9,   # m^3/s^2 -> km^3/s^2
    a=get_egm2008_a() / 1e3,     # m -> km
)
sys_ = [(x, vx), (y, vy), (z, vz), (vx, ax), (vy, ay), (vz, az)]

# a 600-km LEO orbit, km / km/s, SI seconds
ic = np.array([6978.0, 0.0, 0.0, 0.0, 6.641, 3.834])
B = 8
rng = np.random.default_rng(0)
states = ic[None, :] + np.abs(ic)[None, :] * rng.uniform(-1, 1, (B, 6)) * 1e-6

# the TPU production config; on CPU "auto" falls back to the staged
# (also scaled) mixed-precision XLA engine
tab = hy.taylor_adaptive_batch(
    sys_, states, tol=1e-15, high_accuracy=True,
    compact_mode="flat", mp_order=8, pallas_phase="auto",
)
tab.propagate_until(2 * 5801.0)  # two orbital periods, in seconds

r = np.linalg.norm(np.asarray(tab.state)[:, :3], axis=1)
print("time [s]:", np.asarray(tab.time)[0])
print("radius range [km]:", float(r.min()), "-", float(r.max()))
assert np.all((r > 6900) & (r < 7100)), "orbit should stay near-circular"
print("adaptive step range [s]: natural, no manual non-dimensionalization")
