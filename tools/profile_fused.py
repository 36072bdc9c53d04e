#!/usr/bin/env python
"""Does fusing N steps into one dispatch beat N chained dispatches?
Separates device compute from per-dispatch overhead on the tunneled device."""
import math
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

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

    raw = make_batched_step_flat(tape, order, dtype=dtype,
                                 high_accuracy=True, mp_order=8,
                                 layout="3d", unroll=True, staged=True)
    step = jax.jit(raw)

    FUSE = 8

    @jax.jit
    def fused(s, t):
        def body(_, c):
            s_, t_ = c
            ns, h = raw(s_, pars, t_, mdt)
            return ns, t_ + h
        return lax.fori_loop(0, FUSE, body, (s, t))

    # warmup both
    s, h = step(states, pars, t0, mdt); float(h[0])
    fs, ft = fused(states, t0); float(ft[0])

    reps = 24
    s, t = states, t0
    start = time.perf_counter()
    for _ in range(reps):
        s, h = step(s, pars, t, mdt)
        t = t + h
    float(t[0])
    per_disp = (time.perf_counter() - start) / reps
    print(f"chained dispatches : {per_disp*1e3:7.2f} ms/step "
          f"({BATCH/per_disp/1e3:7.1f}k lane-steps/s)", flush=True)

    s, t = states, t0
    start = time.perf_counter()
    for _ in range(reps // FUSE):
        s, t = fused(s, t)
    float(t[0])
    per_fused = (time.perf_counter() - start) / reps
    print(f"fused x{FUSE} in one jit: {per_fused*1e3:7.2f} ms/step "
          f"({BATCH/per_fused/1e3:7.1f}k lane-steps/s)", flush=True)


if __name__ == "__main__":
    main()
