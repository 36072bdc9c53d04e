"""Batched Henon-Heiles event-overhead microbench (batch section of
benchmarks/hh_event_bench.py only — for iterating on the batched event
driver without re-running the slow scalar section).

Reference anchor: doc/benchmarks.rst:105-160 (Poincare-section workload),
src/detail/event_detection.cpp:1733 (ed_data_batch::detect_events).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
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

B = 1024
rng = np.random.default_rng(0)
states = np.asarray(ic)[None, :] + 1e-3 * rng.standard_normal((B, 4))
n_hits = [0]


def _count_hits(ta, ts, sgns, lanes):
    # vectorized nt callback (one call per propagate, array args) — the
    # array-native analog of the reference's inlined C++ section recorder
    n_hits[0] += int(len(ts))


_count_hits.vectorized = True
ev_b = hy.nt_event(y, _count_hits, direction=hy.EventDirection.positive)
bkw = dict(compact_mode="flat", mp_order=8, pallas_phase="auto")
tab_p = hy.taylor_adaptive_batch(sys_, states, tol=1e-15,
                                 high_accuracy=True, **bkw)
tab_e = hy.taylor_adaptive_batch(sys_, states, tol=1e-15,
                                 high_accuracy=True, nt_events=[ev_b],
                                 **bkw)
t0 = time.perf_counter()
tab_p.propagate_until(10.0)
tab_e.propagate_until(10.0)  # warm
print("warm done in", round(time.perf_counter() - t0, 1), "s", flush=True)
n_hits[0] = 0  # drop callbacks fired during warm-up: count only the timed window

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
    "poincare_hits": n_hits[0],
    "lane_steps_per_sec_plain": round(tot_p / el_bp, 1),
    "lane_steps_per_sec_events": round(tot_e / el_be, 1),
    "event_overhead_x": round((el_be / tot_e) / (el_bp / tot_p), 2),
}))
