"""Tutorial 04 — event detection (reference: tutorials on terminal and
non-terminal events; the Henon-Heiles Poincare-section benchmark).

Non-terminal events record every zero crossing; terminal events stop (or
redirect) the integration.
"""

import numpy as np

import heyoka_tpu as hy
from heyoka_tpu import EventDirection, nt_event, t_event

x, v = hy.make_vars("x", "v")
sys = [(x, v), (v, -x)]  # harmonic oscillator: x = sin t

# record the times of upward zero crossings of x
crossings = []
ev = nt_event(
    x, lambda ta, t, d_sgn: crossings.append(t),
    direction=EventDirection.positive,
)
ta = hy.taylor_adaptive(sys, [0.0, 1.0], tol=1e-15, nt_events=[ev])
ta.propagate_until(20.0)
print("upward crossings (multiples of 2*pi):", np.round(crossings, 6))

# stop at the first turning point (v == 0)
ta2 = hy.taylor_adaptive(sys, [0.0, 1.0], tol=1e-15, t_events=[t_event(v)])
oc, *_ = ta2.propagate_until(100.0)
print("stopped by terminal event", oc, "at t =", ta2.time, "(pi/2 =", np.pi / 2, ")")
