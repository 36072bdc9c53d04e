#!/usr/bin/env python
"""Sweep the fused dd kernel's mp_order (dd/f32 order split) and
chunk_steps at the north-star workload, reporting steps/s and energy
drift per config.  The dd orders dominate kernel flops (each dd op is
~8 f32 ops), so lowering mp_order trades double-float coverage of the
mid orders for speed; this sweep finds the fastest config whose drift
stays at the reference-parity level (<= 5e-13 over the 200-yr window,
the bench.py criterion).

Usage: python tools/mp_sweep.py [mp_orders...]   (default 6 7 8)
"""

import math
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


if __name__ == "__main__":
    import jax.numpy as jnp

    import heyoka_tpu as hy

    hy.s11n.enable_compilation_cache()
    from bench import IC, MASSES, GCONST
    from heyoka_tpu.models import nbody
    from heyoka_tpu.expr.decompose import taylor_decompose_sys
    from heyoka_tpu.taylor.compact_flat import jit_flat_step
    from heyoka_tpu.taylor.fused import make_propagate_until_fused
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
    mdt = jnp.full((BATCH,), math.inf, dtype)

    def energy_np(st):
        st = np.asarray(st).reshape(-1, 6, 6)
        r, v = st[:, :, :3], st[:, :, 3:]
        m = np.asarray(MASSES)
        kin = 0.5 * np.sum(m[None, :] * np.sum(v * v, axis=2), axis=1)
        pot = np.zeros(st.shape[0])
        for i in range(6):
            for j in range(i + 1, 6):
                d = np.linalg.norm(r[:, i] - r[:, j], axis=1)
                pot -= GCONST * m[i] * m[j] / d
        return kin + pot

    e0 = energy_np(states)
    zero = jnp.zeros((BATCH,), dtype)
    ms = jnp.asarray(0, jnp.int64)
    tgt = jnp.full((BATCH,), 200.0, dtype)

    mps = [int(a) for a in sys.argv[1:]] or [6, 7, 8]
    for mp in mps:
        pu = jit_flat_step(make_propagate_until_fused(
            tape, order, dtype=dtype, high_accuracy=True, mp_order=mp,
            pallas_phase="dd", chunk_steps=64))
        r = pu(states, pars, zero, zero,
               jnp.full((BATCH,), 0.5, dtype), zero, mdt, ms)
        int(np.asarray(r["nsteps"])[0])  # compile + warm
        t0 = time.perf_counter()
        r = pu(states, pars, zero, zero, tgt, zero, mdt, ms)
        steps = int(np.asarray(r["nsteps"]).sum())
        dt = time.perf_counter() - t0
        drift = float(np.max(np.abs(
            (energy_np(r["state"]) - e0) / e0)))
        print(f"mp_order={mp}: {steps/dt/1e6:.3f}M steps/s  "
              f"drift={drift:.3e}  ({steps} steps, {dt:.2f}s)",
              flush=True)
