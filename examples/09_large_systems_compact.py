"""Tutorial 09 — large systems and compact mode (reference: the compact_mode
tutorial).

For systems with hundreds-to-thousands of u-variables (high-degree
geopotential, ephemeris-driven dynamics), compact mode keeps the XLA graph
small: index-table kernels batch the Taylor recurrences per op kind, so
compile time no longer grows with the tape.
"""

import time

import numpy as np

import heyoka_tpu as hy
from heyoka_tpu.models import nbody

sys = nbody(6, masses=[1.0, 1e-3, 3e-4, 4e-5, 5e-5, 8e-9])
print("u-vars:", hy.taylor_adaptive(sys, np.zeros(36) + 0.1, tol=1e-3).decomposition.n_uvars)

state0 = np.concatenate([
    np.zeros(6),
    [1.0, 0, 0, 0, 1.0, 0.05],
    [0, 1.8, 0, -0.75, 0, 0.02],
    [2.6, 0, 0.1, 0, 0.62, 0],
    [0, 3.6, 0, -0.53, 0, 0.01],
    [4.5, 0, 0, 0, 0.47, 0.01],
])

t0 = time.time()
ta = hy.taylor_adaptive(sys, state0, tol=1e-15, compact_mode=True)
ta.step()
print(f"compact-mode first step (incl. compile): {time.time() - t0:.1f} s")

t0 = time.time()
ta.propagate_until(10.0)
print(f"propagate to t=10: {time.time() - t0:.2f} s, state[6:9] = {ta.state[6:9]}")
