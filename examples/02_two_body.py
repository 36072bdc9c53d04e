"""Tutorial 02 — Keplerian two-body problem (reference: tutorial on the
Kepler problem + doc/benchmarks energy-conservation methodology).

Long-term integration with high_accuracy mode, energy conservation, and
continuous output over the whole propagation.
"""

import numpy as np

import heyoka_tpu as hy
from heyoka_tpu.models import nbody, nbody_energy

masses = [1.0, 1e-3]
sys = nbody(2, masses=masses)

# circular-ish orbit
state0 = np.array([0, 0, 0, 0, 0, 0, 1.0, 0, 0, 0, 1.0, 0], float)

ta = hy.taylor_adaptive(sys, state0, tol=1e-15, high_accuracy=True)

# energy diagnostic as a compiled function
cf = hy.make_cfunc([nbody_energy(2, masses=masses)])
names = cf.tape.var_names
perm = [[l.name for l, _ in sys].index(n) for n in names]
e0 = float(cf(state0[perm])[0])

# propagate 1000 time units and record continuous output
oc, min_h, max_h, nsteps, c_out = ta.propagate_until(1000.0, c_output=True)
e1 = float(cf(ta.state[perm])[0])
print(f"steps: {nsteps}, min_h: {min_h:.3g}, max_h: {max_h:.3g}")
print(f"relative energy drift over 1000 tu: {abs((e1 - e0) / e0):.2e}")

# sample the trajectory anywhere, post hoc
ts = np.linspace(0.0, 1000.0, 7)
print("sampled x-positions:", c_out(ts)[:, 6])
