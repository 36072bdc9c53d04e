#!/usr/bin/env python
"""Time the staged flat step with the Pallas f32-phase kernel vs the XLA
phase at the north-star workload (outer-SS 6-body, B=10240, tol 1e-15)."""
import math
import sys
import time

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

    def timeit(step, reps=24):
        s, h = step(states, pars, t0, mdt)
        float(h[0])
        t = t0
        s = states
        start = time.perf_counter()
        for r in range(reps):
            s, h = step(s, pars, t, mdt)
            t = t + h
        float(t[0])
        return (time.perf_counter() - start) / reps, s, h

    mp = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    res = {}
    modes = [("xla", False), ("pallas", True), ("dd", "dd")]
    if len(sys.argv) > 2:
        want = sys.argv[2].split(",")
        modes = [m for m in modes if m[0] in want]
    for name, pp in modes:
        step = jax.jit(make_batched_step_flat(
            tape, order, dtype=dtype, high_accuracy=True, mp_order=mp,
            layout="3d", unroll=True, staged=True, pallas_phase=pp))
        t_c0 = time.perf_counter()
        dt, s, h = timeit(step)
        print(f"{name:7s} mp={mp}: {dt*1e3:8.2f} ms/step "
              f"({BATCH/dt/1e3:8.1f}k lane-steps/s)  "
              f"[first-call {time.perf_counter()-t_c0:.1f}s]", flush=True)
        res[name] = (np.asarray(s), np.asarray(h))
    base = "xla" if "xla" in res else sorted(res)[0]
    for name in res:
        if name == base:
            continue
        ds = np.abs(res[name][0] - res[base][0]).max()
        dh = np.abs(res[name][1] - res[base][1]).max()
        print(f"after 25 steps {name} vs {base}: "
              f"max|dstate|={ds:.3e} max|dh|={dh:.3e}")


if __name__ == "__main__":
    main()
