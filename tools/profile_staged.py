#!/usr/bin/env python
"""Phase breakdown of the staged flat step on the attached device:
time the step at different mp_order values (f64/f32 precision split) to
locate the remaining cost, plus per-mp drift sensitivity hooks."""
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
        return (time.perf_counter() - start) / reps

    for mp in [None, 19, 14, 12, 10, 8, 6]:
        step = jax.jit(make_batched_step_flat(
            tape, order, dtype=dtype, high_accuracy=True, mp_order=mp,
            layout="3d", unroll=True, staged=True))
        dt = timeit(step)
        print(f"mp_order={mp}: {dt*1e3:8.2f} ms/step "
              f"({BATCH/dt/1e3:8.1f}k lane-steps/s)", flush=True)


if __name__ == "__main__":
    main()
