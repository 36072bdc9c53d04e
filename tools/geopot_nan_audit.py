"""Round-4 audit of the config-5 geopotential NaN lanes (VERDICT r3
item 2): reproduce on-chip, find the first NaN step, and classify the
root cause.

Phases:
1. run the bench configuration (deg 4, B configurable) to the 1-day
   horizon, checking lane finiteness at checkpoints (bisect to the
   first bad window);
2. report which lanes and their state just before the failure;
3. replay the failing lanes on the CPU f64 flat engine to separate
   engine defect from genuine orbit divergence.

Usage: python tools/geopot_nan_audit.py [batch] [n_checkpoints]
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import heyoka_tpu as hy
from heyoka_tpu.models import egm2008_acc, get_egm2008_a, get_egm2008_mu

hy.s11n.enable_compilation_cache()

DEG = 4
B = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
NCK = int(sys.argv[2]) if len(sys.argv) > 2 else 24

x, y, z, vx, vy, vz = hy.make_vars("x", "y", "z", "vx", "vy", "vz")
ax, ay, az = egm2008_acc([x, y, z], DEG, DEG,
                         mu=get_egm2008_mu() / 1e9,
                         a=get_egm2008_a() / 1e3)
sys_ = [(x, vx), (y, vy), (z, vz), (vx, ax), (vy, ay), (vz, az)]

ic = np.array([6740.440, 0.0, 0.0, 0.0, 6.725973853066024,
               3.8832537950295855])
rng = np.random.default_rng(0)
states = ic[None, :] + np.abs(ic)[None, :] * rng.uniform(-1, 1, (B, 6)) * 1e-6

tab = hy.taylor_adaptive_batch(
    sys_, states.copy(), tol=1e-15, high_accuracy=True,
    compact_mode="flat", mp_order=8, pallas_phase="auto",
)
T = 86400.0
ck = np.linspace(0.0, T, NCK + 1)[1:]
prev_state = np.asarray(tab.state).copy()
prev_t = 0.0
for tgt in ck:
    ocs, mn, mx, ns = tab.propagate_until(float(tgt))
    st = np.asarray(tab.state)
    bad = ~np.isfinite(st).all(axis=1)
    oc = np.asarray(ocs)
    print(json.dumps({
        "t": float(tgt),
        "nan_lanes": int(bad.sum()),
        "outcomes": {str(k): int(v) for k, v in
                     zip(*np.unique(oc, return_counts=True))},
        "r_min": float(np.nanmin(np.linalg.norm(st[:, :3], axis=1))),
        "r_max": float(np.nanmax(np.linalg.norm(st[:, :3], axis=1))),
    }), flush=True)
    if bad.any():
        idx = np.flatnonzero(bad)[:8]
        print(json.dumps({
            "first_bad_window": [prev_t, float(tgt)],
            "lanes": idx.tolist(),
            "outcome_of_bad": oc[idx].tolist(),
            "time_of_bad": np.asarray(tab.time)[idx].tolist(),
            "state_before": prev_state[idx].tolist(),
        }), flush=True)
        break
    prev_state = st.copy()
    prev_t = float(tgt)
else:
    print(json.dumps({"result": "clean", "batch": B, "horizon_s": T}),
          flush=True)
