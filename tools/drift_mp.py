#!/usr/bin/env python
"""Energy-drift parity check of the staged engine vs mp_order: drives the
north-star system to ~100 yr at each mp and reports max relative drift."""
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

    BATCH = 256  # drift is per-lane; a small batch drives faster
    dtype = jnp.float64
    tape = taylor_decompose_sys(nbody(6, masses=MASSES, Gconst=GCONST))
    order = taylor_order_from_tol(1e-15)

    rng = np.random.default_rng(0)
    states = jnp.asarray(
        IC[None, :] + np.abs(IC)[None, :]
        * (rng.uniform(-1, 1, (BATCH, IC.size)) * 1e-8), dtype)
    pars = jnp.zeros((BATCH, 0), dtype)
    mdt = jnp.full((BATCH,), math.inf, dtype)

    def energy_np(st):
        st = np.asarray(st).reshape(-1, 6, 6)
        r = st[:, :, :3]
        v = st[:, :, 3:]
        m = np.asarray(MASSES)
        kin = 0.5 * np.sum(m[None, :] * np.sum(v * v, axis=2), axis=1)
        pot = np.zeros(st.shape[0])
        for i in range(6):
            for j in range(i + 1, 6):
                d = np.linalg.norm(r[:, i] - r[:, j], axis=1)
                pot -= GCONST * m[i] * m[j] / d
        return kin + pot

    e0 = energy_np(states)
    import sys as _sys
    cfgs = [(10, False), (8, False), (6, False), (8, "dd"), (7, "dd"), (6, "dd")]
    if len(_sys.argv) > 1:
        sel = _sys.argv[1].split(",")
        cfgs = [c for c in cfgs if f"{c[0]}{'dd' if c[1] else ''}" in sel]
    for mp, pp in cfgs:
        step = jax.jit(make_batched_step_flat(
            tape, order, dtype=dtype, high_accuracy=True, mp_order=mp,
            layout="3d", unroll=True, staged=True, pallas_phase=pp))
        s, t = states, jnp.zeros((BATCH,), dtype)
        n = 0
        while float(jnp.mean(t)) < 100.0 and n < 20000:
            for _ in range(64):
                s, h = step(s, pars, t, mdt)
                t = t + h
            n += 64
        drift = float(np.max(np.abs((energy_np(s) - e0) / e0)))
        print(f"mp_order={mp}{' dd' if pp else ''}: drift={drift:.3e} over "
              f"{float(jnp.mean(t)):.1f} yr ({n} steps)", flush=True)


if __name__ == "__main__":
    main()
