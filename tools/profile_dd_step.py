#!/usr/bin/env python
"""Trace-profile the dd-Pallas step: where do the ~10 ms go (order-0 XLA
f64 eval vs the Pallas jet kernel vs stepsize control/Horner)."""
import glob
import gzip
import json
import math
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import heyoka_tpu as hy
    hy.s11n.enable_compilation_cache()
    from bench import IC, MASSES, GCONST
    from heyoka_tpu.models import nbody
    from heyoka_tpu.expr.decompose import taylor_decompose_sys
    from heyoka_tpu.taylor.compact_flat import make_batched_step_flat
    from heyoka_tpu.taylor.stepper import taylor_order_from_tol

    BATCH = 10_240
    dtype = jnp.float64
    tape = taylor_decompose_sys(nbody(6, masses=MASSES, Gconst=GCONST))
    order = taylor_order_from_tol(1e-15)
    rng = np.random.default_rng(0)
    states = jnp.asarray(
        IC[None, :] + np.abs(IC)[None, :]
        * (rng.uniform(-1, 1, (BATCH, IC.size)) * 1e-8), dtype)
    pars = jnp.zeros((BATCH, 0), dtype)
    t0 = jnp.zeros((BATCH,), dtype)
    mdt = jnp.full((BATCH,), math.inf, dtype)

    step = jax.jit(make_batched_step_flat(
        tape, order, dtype=dtype, high_accuracy=True, mp_order=8,
        layout="3d", unroll=True, staged=True, pallas_phase="dd"))
    s, h = step(states, pars, t0, mdt)
    float(h[0])

    jax.profiler.start_trace("/tmp/profdd")
    t = t0
    for _ in range(4):
        s, h = step(s, pars, t, mdt)
        t = t + h
    float(t[0])
    jax.profiler.stop_trace()

    # parse the chrome trace for device-op durations
    tr = sorted(glob.glob("/tmp/profdd/**/*.trace.json.gz", recursive=True))
    if not tr:
        print("no chrome trace found")
        return
    with gzip.open(tr[-1], "rt") as f:
        data = json.load(f)
    evs = [e for e in data.get("traceEvents", [])
           if e.get("ph") == "X" and e.get("dur")]
    # keep device lanes only (TensorFlow Op / XLA Ops tracks)
    agg = {}
    for e in evs:
        name = e.get("name", "")
        if name.startswith(("process_", "Steal", "thread")):
            continue
        agg.setdefault(name, [0, 0.0])
        agg[name][0] += 1
        agg[name][1] += e["dur"] / 1e3  # ms
    top = sorted(agg.items(), key=lambda kv: -kv[1][1])[:25]
    for name, (n, ms) in top:
        print(f"{ms/4:9.3f} ms/step  x{n//4:4d}  {name[:90]}")


if __name__ == "__main__":
    main()
