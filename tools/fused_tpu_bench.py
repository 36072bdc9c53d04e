#!/usr/bin/env python
"""On-chip throughput of the fused multi-step kernel (taylor/fused.py)
at the north-star workload: 10,240 outer-Solar-System trajectories,
tol=1e-15, propagate_until a fixed horizon.

Usage: python tools/fused_tpu_bench.py [horizon_yr=200] [chunk=32] [mp_order=8]
"""
import math
import sys
import time

import numpy as np


def main():
    horizon = float(sys.argv[1]) if len(sys.argv) > 1 else 200.0
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    mp_order = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
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
    zero = jnp.zeros((BATCH,), dtype)
    mdt = jnp.full((BATCH,), math.inf, dtype)
    ms = jnp.asarray(0, jnp.int64)

    pu = jit_flat_step(make_propagate_until_fused(
        tape, order, dtype=dtype, high_accuracy=True, mp_order=mp_order,
        pallas_phase="dd", chunk_steps=chunk))

    print(f"compiling (chunk={chunk}, mp_order={mp_order}) ...", flush=True)
    t0 = time.perf_counter()
    r = pu(states, pars, zero, zero, jnp.full((BATCH,), 0.5, dtype), zero,
           mdt, ms)
    n0 = int(np.asarray(r["nsteps"]).sum())
    print(f"warmup {time.perf_counter()-t0:.1f}s ({n0} steps)", flush=True)

    tgt = jnp.full((BATCH,), horizon, dtype)
    t0 = time.perf_counter()
    r = pu(states, pars, zero, zero, tgt, zero, mdt, ms)
    total = int(np.asarray(r["nsteps"]).sum())
    el = time.perf_counter() - t0
    sps = total / el
    # energy drift sanity
    st = np.asarray(r["state"]).reshape(-1, 6, 6)
    m = np.asarray(MASSES)
    def energy(stv):
        rr, vv = stv[:, :, :3], stv[:, :, 3:]
        kin = 0.5 * np.sum(m[None, :] * np.sum(vv * vv, axis=2), axis=1)
        pot = np.zeros(stv.shape[0])
        for i in range(6):
            for j in range(i + 1, 6):
                d = np.linalg.norm(rr[:, i] - rr[:, j], axis=1)
                pot -= GCONST * m[i] * m[j] / d
        return kin + pot
    e0 = energy(np.asarray(states).reshape(-1, 6, 6))
    drift = float(np.max(np.abs((energy(st) - e0) / e0)))
    print(f"horizon={horizon} yr  chunk={chunk}  steps={total}  "
          f"wall={el:.2f}s  steps/s={sps:,.0f}  "
          f"per-lane={total/BATCH:.0f}  drift={drift:.2e}", flush=True)
    print(f"t check: t_hi[:3]={np.asarray(r['t_hi'])[:3]}  "
          f"outcomes ok={np.all(np.asarray(r['outcome']) == -3)}")


if __name__ == "__main__":
    main()
