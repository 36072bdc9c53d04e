"""Reference benchmark #1: pendulum taylor_adaptive propagate_for
(benchmark/pendulum_bench.cpp; the README front-page example at scale).

Single trajectory, on-device propagate loop; reports steps/s.
"""
import json
import time

import heyoka_tpu as hy

hy.s11n.enable_compilation_cache()

ta = hy.taylor_adaptive(hy.models.pendulum(), [0.05, 0.025], tol=1e-15,
                        high_accuracy=True)
ta.propagate_until(10.0)  # warm/compile

t0 = time.perf_counter()
oc, mn, mx, ns = ta.propagate_until(10_000.0)
el = time.perf_counter() - t0
print(json.dumps({
    "bench": "pendulum_propagate_for",
    "steps": int(ns),
    "steps_per_sec": round(ns / el, 1),
    "elapsed_s": round(el, 3),
}))
