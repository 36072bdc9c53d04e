"""Reference benchmark #5 (propagator half): batched SGP4 over a satellite
population (benchmark/sgp4_propagator.cpp analog): propagate N GPEs over a
grid of epochs and report sat-minutes/s.
"""
import json
import time

import numpy as np

import heyoka_tpu as hy
from heyoka_tpu.models.sgp4 import SGP4Propagator

hy.s11n.enable_compilation_cache()

# synthetic LEO population around the ISS elements
import sys
N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
rng = np.random.default_rng(0)
base = dict(n0=0.0487 * 1440 / (2 * np.pi), e0=0.0001647, i0=51.6416,
            node0=247.4627, omega0=130.5360, m0=325.0288, bstar=2.2e-5)
# GPE layout follows utils/tle.py: (9, n)
gpes = np.zeros((9, N))
gpes[0] = base["n0"] * 2 * np.pi / 1440 * (1 + 1e-3 * rng.standard_normal(N))
gpes[1] = np.abs(base["e0"] * (1 + 0.1 * rng.standard_normal(N)))
gpes[2] = np.deg2rad(base["i0"] + 0.01 * rng.standard_normal(N))
gpes[3] = np.deg2rad(base["node0"] + rng.uniform(0, 360, N))
gpes[4] = np.deg2rad(base["omega0"] + rng.uniform(0, 360, N))
gpes[5] = np.deg2rad(base["m0"] + rng.uniform(0, 360, N))
gpes[6] = base["bstar"] * (1 + 0.1 * rng.standard_normal(N))
prop = SGP4Propagator(gpes)

dates = np.linspace(0.0, 1440.0, 32)  # one day of epochs, minutes
tm = np.broadcast_to(dates[:, None], (32, N))
out = prop(tm)  # warm/compile
t0 = time.perf_counter()
out = prop(tm)
np.asarray(out)
el = time.perf_counter() - t0
print(json.dumps({
    "bench": "sgp4_batch_propagate",
    "sats": N,
    "epochs": 32,
    "evals_per_sec": round(N * 32 / el, 1),
    "elapsed_s": round(el, 4),
}))
