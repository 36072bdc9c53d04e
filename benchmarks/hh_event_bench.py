"""Reference benchmark #3: Henon-Heiles with event detection
(benchmark/hh_event.cpp; doc/benchmarks.rst:105-160 — the Poincare-section
workload: a non-terminal event on y=0 crossings with positive direction).

Reports event-detection overhead: steps/s with vs without the event.
"""
import json
import time

import heyoka_tpu as hy

hy.s11n.enable_compilation_cache()

x, y, px, py = hy.make_vars("x", "y", "px", "py")
sys_ = [
    (x, px),
    (y, py),
    (px, -x - 2.0 * x * y),
    (py, -y - (x * x - y * y)),
]
ic = [0.0, 0.1, 0.35, 0.1]

hits = []
ev = hy.nt_event(y, lambda ta, t, d: hits.append(t),
                 direction=hy.EventDirection.positive)

ta_p = hy.taylor_adaptive(sys_, ic, tol=1e-15, high_accuracy=True)
ta_e = hy.taylor_adaptive(sys_, ic, tol=1e-15, high_accuracy=True,
                          nt_events=[ev])
ta_p.propagate_until(10.0)
ta_e.propagate_until(10.0)  # warm

T = 2000.0
t0 = time.perf_counter()
_, _, _, ns_p = ta_p.propagate_until(T)
el_p = time.perf_counter() - t0
t0 = time.perf_counter()
_, _, _, ns_e = ta_e.propagate_until(T)
el_e = time.perf_counter() - t0
print(json.dumps({
    "bench": "henon_heiles_events",
    "poincare_crossings": len(hits),
    "steps_plain": int(ns_p),
    "steps_events": int(ns_e),
    "steps_per_sec_plain": round(ns_p / el_p, 1),
    "steps_per_sec_events": round(ns_e / el_e, 1),
    "event_overhead_x": round((el_e / ns_e) / (el_p / ns_p), 2),
}))

# --- batched variant: the TPU-scale Poincare-section workload — B
# perturbed orbits with the same nt event, the on-device vmapped
# bounded-recorder path (events land per lane, chronologically)
import numpy as np

B = 1024
rng = np.random.default_rng(0)
states = np.asarray(ic)[None, :] + 1e-3 * rng.standard_normal((B, 4))
n_hits = [0]
ev_b = hy.nt_event(y, lambda ta, t, d, lane: n_hits.__setitem__(
    0, n_hits[0] + 1), direction=hy.EventDirection.positive)
# production TPU config: the staged flat engine with the dd Pallas jet —
# the plain path rides the fused multi-step kernel and the event path the
# jet_mode dd kernel (events_impl.build_event_step_batch flat_jet)
bkw = dict(compact_mode="flat", mp_order=8, pallas_phase="auto")
tab_p = hy.taylor_adaptive_batch(sys_, states, tol=1e-15,
                                 high_accuracy=True, **bkw)
tab_e = hy.taylor_adaptive_batch(sys_, states, tol=1e-15,
                                 high_accuracy=True, nt_events=[ev_b],
                                 **bkw)
tab_p.propagate_until(10.0)
tab_e.propagate_until(10.0)  # warm

TB = 200.0
t0 = time.perf_counter()
_, _, _, ns_bp = tab_p.propagate_until(TB)
el_bp = time.perf_counter() - t0
t0 = time.perf_counter()
_, _, _, ns_be = tab_e.propagate_until(TB)
el_be = time.perf_counter() - t0
tot_p = int(np.asarray(ns_bp).sum())
tot_e = int(np.asarray(ns_be).sum())
print(json.dumps({
    "bench": "henon_heiles_events_batch",
    "batch": B,
    "lane_steps_per_sec_plain": round(tot_p / el_bp, 1),
    "lane_steps_per_sec_events": round(tot_e / el_be, 1),
    "event_overhead_x": round((el_be / tot_e) / (el_bp / tot_p), 2),
}))
