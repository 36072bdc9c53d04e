"""Reference benchmark #1: pendulum taylor_adaptive propagate_for
(benchmark/pendulum_bench.cpp; the README front-page example at scale).

Single trajectory, reported for both execution backends:
- ``backend="native"`` — the C++ host runtime, the low-latency scalar path
  (the regime the reference's JIT-compiled stepper owns);
- the jax/XLA device loop (dispatch-latency-bound for one trajectory —
  the TPU engines earn their keep at batch >= O(100), see the other
  benchmarks).
"""
import json
import time

import heyoka_tpu as hy

hy.s11n.enable_compilation_cache()

res = {"bench": "pendulum_propagate_for"}

for backend in ("native", "jax"):
    try:
        ta = hy.taylor_adaptive(
            hy.models.pendulum(), [0.05, 0.025], tol=1e-15,
            high_accuracy=True, backend=backend,
        )
    except RuntimeError:
        continue  # no host compiler: skip the native leg
    ta.propagate_until(10.0)  # warm/compile
    t0 = time.perf_counter()
    oc, mn, mx, ns = ta.propagate_until(10_000.0)
    el = time.perf_counter() - t0
    res[f"{backend}_steps_per_sec"] = round(ns / el, 1)
    res[f"{backend}_elapsed_s"] = round(el, 3)
    res["steps"] = int(ns)

print(json.dumps(res))
