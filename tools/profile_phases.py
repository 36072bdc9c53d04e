#!/usr/bin/env python
"""Bound the cost composition of the staged step: all-f32 full pipeline,
truncated f64-only pipeline (low order), and the mp=8 production config."""
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

    BATCH = 10_240
    tape = taylor_decompose_sys(nbody(6, masses=MASSES, Gconst=GCONST))

    rng = np.random.default_rng(0)
    st64 = IC[None, :] + np.abs(IC)[None, :] * (
        rng.uniform(-1, 1, (BATCH, IC.size)) * 1e-8)
    pars64 = np.zeros((BATCH, 0))

    def timeit(step, states, pars, reps=24):
        dtype = states.dtype
        t0 = jnp.zeros((BATCH,), dtype)
        mdt = jnp.full((BATCH,), math.inf, dtype)
        s, h = step(states, pars, t0, mdt)
        float(h[0])
        t = t0
        s = states
        start = time.perf_counter()
        for _ in range(reps):
            s, h = step(s, pars, t, mdt)
            t = t + h
        float(t[0])
        return (time.perf_counter() - start) / reps

    configs = [
        ("f32 full order19", jnp.float32, 19, None),
        ("f64 order8 only ", jnp.float64, 8, None),
        ("f32 order8 only ", jnp.float32, 8, None),
        ("mp=8 production ", jnp.float64, 19, 8),
    ]
    for name, dt, K, mp in configs:
        step = jax.jit(make_batched_step_flat(
            tape, K, dtype=dt, high_accuracy=True, mp_order=mp,
            layout="3d", unroll=True, staged=True))
        states = jnp.asarray(st64, dt)
        pars = jnp.asarray(pars64, dt)
        d = timeit(step, states, pars)
        print(f"{name}: {d*1e3:8.2f} ms/step ({BATCH/d/1e3:8.1f}k lane-steps/s)",
              flush=True)


if __name__ == "__main__":
    main()
