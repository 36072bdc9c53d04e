"""Isolation matrix for the config-5 geopot NaN (VERDICT r4 item 2).

On-chip evidence so far: the bench config (pallas_phase=auto -> dd,
fused_prop=auto -> fused multi-step kernel) NaNs ALL lanes with outcome
-4 (err_nf_state) inside the first 3600 s window, while the CPU f64
flat engine is clean.  This script separates the suspects on the real
chip at tiny batch:

  A. flat XLA on TPU   (pallas_phase=False, fused off)
  B. dd Pallas jet     (pallas_phase="dd", fused_prop=False)
  C. dd + fused kernel (pallas_phase="dd", fused_prop=True)  # bench path

Each config steps with single step() calls until the first non-finite
state (or max_steps), printing t/h/outcome as it goes.

Usage: python tools/geopot_isolate.py [config A|B|C] [max_steps]
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import heyoka_tpu as hy
from heyoka_tpu.models import egm2008_acc, get_egm2008_a, get_egm2008_mu

hy.s11n.enable_compilation_cache()

CFG = sys.argv[1] if len(sys.argv) > 1 else "C"
MAXS = int(sys.argv[2]) if len(sys.argv) > 2 else 200
B = 8
DEG = 4

x, y, z, vx, vy, vz = hy.make_vars("x", "y", "z", "vx", "vy", "vz")
ax, ay, az = egm2008_acc([x, y, z], DEG, DEG,
                         mu=get_egm2008_mu() / 1e9,
                         a=get_egm2008_a() / 1e3)
sys_ = [(x, vx), (y, vy), (z, vz), (vx, ax), (vy, ay), (vz, az)]

ic = np.array([6740.440, 0.0, 0.0, 0.0, 6.725973853066024,
               3.8832537950295855])
rng = np.random.default_rng(0)
states = ic[None, :] + np.abs(ic)[None, :] * rng.uniform(-1, 1, (B, 6)) * 1e-6

kw = dict(tol=1e-15, high_accuracy=True, compact_mode="flat", mp_order=8)
if CFG == "A":
    kw.update(pallas_phase=False, fused_prop=False)
elif CFG == "B":
    kw.update(pallas_phase="dd", fused_prop=False)
else:
    kw.update(pallas_phase="dd", fused_prop=True)

tab = hy.taylor_adaptive_batch(sys_, states.copy(), **kw)
print(json.dumps({"config": CFG, "pallas_phase": str(tab._pallas_phase),
                  "fused": str(tab._fused_prop)}), flush=True)

if CFG == "C":
    # fused path only exercises via propagate_*; walk in 10 s windows
    tgt = 0.0
    for i in range(MAXS):
        tgt += 10.0
        ocs, mn, mx, ns = tab.propagate_until(float(tgt))
        st = np.asarray(tab.state)
        bad = ~np.isfinite(st).all(axis=1)
        if bad.any() or i % 20 == 0:
            print(json.dumps({
                "win": i, "t": float(tgt), "nan": int(bad.sum()),
                "oc": np.asarray(ocs).tolist(),
                "ns": np.asarray(ns).tolist(),
                "r": np.linalg.norm(st[:, :3], axis=1).round(3).tolist(),
            }), flush=True)
        if bad.any():
            break
else:
    for i in range(MAXS):
        tab.step()
        st = np.asarray(tab.state)
        res = np.asarray(tab.get_step_res(), dtype=np.float64)
        bad = ~np.isfinite(st).all(axis=1)
        if bad.any() or i % 25 == 0:
            print(json.dumps({
                "step": i, "t": np.asarray(tab.time).round(2).tolist(),
                "h": res[:, 1].round(4).tolist(),
                "oc": res[:, 0].tolist(),
                "nan": int(bad.sum()),
            }), flush=True)
        if bad.any():
            break
print("done", flush=True)
