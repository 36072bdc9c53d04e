"""Reference benchmark #5: geopotential dynamics ensemble
(benchmark/geopot.cpp + BASELINE.md config 5 — "ensemble of 10k perturbed
orbits with sgp4/geopotential dynamics").

EGM2008 spherical-harmonics acceleration in the body-fixed frame (the
reference benchmark's configuration — autonomous, so the tape is {sum,
mul, div, sqrt} and rides the fused multi-step Pallas kernel), 10,240
perturbed LEO orbits, one day of propagation at tol 1e-15.

Usage: python benchmarks/geopot_bench.py [max_degree] [batch]
"""
import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import heyoka_tpu as hy
from heyoka_tpu.models import egm2008_acc, egm2008_pot

hy.s11n.enable_compilation_cache()

DEG = int(sys.argv[1]) if len(sys.argv) > 1 else 4
B = int(sys.argv[2]) if len(sys.argv) > 2 else 10240

from heyoka_tpu.models import get_egm2008_a, get_egm2008_mu

x, y, z, vx, vy, vz = hy.make_vars("x", "y", "z", "vx", "vy", "vz")
# km / km/s units (like eo_dynamics): the mixed-precision engines carry
# intermediate u-vars (r^(2n+1) powers of the harmonics) in f32, whose
# range SI meters exceed at degree >= 2 — km keeps every intermediate
# within f32 range with identical relative accuracy
ax, ay, az = egm2008_acc([x, y, z], DEG, DEG,
                         mu=get_egm2008_mu() / 1e9,
                         a=get_egm2008_a() / 1e3)
sys_ = [(x, vx), (y, vy), (z, vz), (vx, ax), (vy, ay), (vz, az)]

# LEO initial conditions (reference geopot.cpp, converted m -> km)
ic = np.array([6740.440, 0.0, 0.0, 0.0, 6.725973853066024,
               3.8832537950295855])
rng = np.random.default_rng(0)
states = ic[None, :] + np.abs(ic)[None, :] * rng.uniform(-1, 1, (B, 6)) * 1e-6

tab = hy.taylor_adaptive_batch(
    sys_, states.copy(), tol=1e-15, high_accuracy=True,
    compact_mode="flat", mp_order=8, pallas_phase="auto",
)
n_uvars = len(tab.decomposition.ops)

# warm (compile)
t0 = time.perf_counter()
tab.propagate_until(60.0)
compile_s = time.perf_counter() - t0

# timed: one day
T = 86400.0
t0 = time.perf_counter()
ocs, mn, mx, ns = tab.propagate_until(T)
ns_tot = int(np.asarray(ns).sum())
elapsed = time.perf_counter() - t0

# validity: every lane must land finite (round-4 regression guard: the
# unscaled TPU Horner NaN'd all lanes, tests/test_scaled_horner.py), and
# the conserved energy v^2/2 + U of the autonomous body-fixed system
# bounds the integration error
st = np.asarray(tab.state)
assert np.isfinite(st).all(), (
    f"non-finite lanes: {int((~np.isfinite(st).all(axis=1)).sum())}"
)
U = egm2008_pot([x, y, z], DEG, DEG, mu=get_egm2008_mu() / 1e9,
                a=get_egm2008_a() / 1e3)
efn = hy.cfunc([0.5 * (vx * vx + vy * vy + vz * vz) - U],
               [x, y, z, vx, vy, vz])
e0 = np.array([float(np.asarray(efn(s))[0]) for s in states[:64]])
e1 = np.array([float(np.asarray(efn(s))[0]) for s in st[:64]])
energy_drift = float(np.max(np.abs((e1 - e0) / e0)))

r = np.linalg.norm(st[:, :3], axis=1)
print(json.dumps({
    "bench": "geopot_ensemble",
    "max_degree": DEG,
    "batch": B,
    "n_uvars": n_uvars,
    "pallas_phase": str(tab._pallas_phase),
    "compile_plus_warm_s": round(compile_s, 1),
    "lane_steps": ns_tot,
    "elapsed_s": round(elapsed, 3),
    "lane_steps_per_sec": round(ns_tot / elapsed, 1),
    "r_min_km": round(float(r.min()), 1),
    "r_max_km": round(float(r.max()), 1),
    "energy_drift": energy_drift,
}))
