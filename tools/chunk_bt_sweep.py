#!/usr/bin/env python
"""Sweep the fused dd prop kernel's chunk_steps and batch-tile size
(HEYOKA_PALLAS_BT) at the north-star workload (mp_order=8 fixed — the
reference-parity accuracy config, see tools/mp_sweep.py) and report
steps/s per config.

Usage: python tools/chunk_bt_sweep.py [chunks...]   (default 64 96 128)
Set HEYOKA_PALLAS_BT before launch to sweep the tile size (one process
per tile value — the knob is read at kernel-build time).
"""

import math
import os
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
    zero = jnp.zeros((BATCH,), dtype)
    ms = jnp.asarray(0, jnp.int64)
    tgt = jnp.full((BATCH,), 200.0, dtype)

    bt = os.environ.get("HEYOKA_PALLAS_BT", "128")
    chunks = [int(a) for a in sys.argv[1:]] or [64, 96, 128]
    for ch in chunks:
        pu = jit_flat_step(make_propagate_until_fused(
            tape, order, dtype=dtype, high_accuracy=True, mp_order=8,
            pallas_phase="dd", chunk_steps=ch))
        r = pu(states, pars, zero, zero,
               jnp.full((BATCH,), 0.5, dtype), zero, mdt, ms)
        int(np.asarray(r["nsteps"])[0])  # compile + warm
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            r = pu(states, pars, zero, zero, tgt, zero, mdt, ms)
            steps = int(np.asarray(r["nsteps"]).sum())
            dt = time.perf_counter() - t0
            best = max(best, steps / dt)
        print(f"bt={bt} chunk={ch}: {best/1e6:.3f}M steps/s "
              f"({steps} steps)", flush=True)
