#!/usr/bin/env python
"""Public-API ensemble throughput on the attached chip: 10,240
outer-Solar-System trajectories propagated 1,000 yr (bench.py's horizon,
so raw-vs-public is apples-to-apples) through
ensemble_propagate_until_batch with the dd Pallas engine (the BASELINE
'ensemble_propagate of 10k perturbed orbits' configuration, north-star
dynamics)."""
import sys
import time

import numpy as np


def main():
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import heyoka_tpu as hy
    hy.s11n.enable_compilation_cache()
    from bench import IC, MASSES, GCONST
    from heyoka_tpu.models import nbody
    from heyoka_tpu.ensemble import ensemble_propagate_until_batch

    B = 1024       # lanes per instance
    N_ITER = 10    # instances -> 10,240 trajectories
    rng = np.random.default_rng(0)
    base = IC[None, :] + np.abs(IC)[None, :] * (
        rng.uniform(-1, 1, (B, IC.size)) * 1e-8)
    ta = hy.taylor_adaptive_batch(
        nbody(6, masses=MASSES, Gconst=GCONST), base, tol=1e-15,
        high_accuracy=True, compact_mode="flat", mp_order=8,
        pallas_phase="auto",
    )
    print("resolved pallas_phase:", ta._pallas_phase, flush=True)
    ens = IC[None, None, :] + np.abs(IC)[None, None, :] * (
        rng.uniform(-1, 1, (N_ITER, B, IC.size)) * 1e-8)

    import jax

    t0 = time.perf_counter()
    res = ensemble_propagate_until_batch(ta, 1000.0, N_ITER, {"state": ens})
    jax.block_until_ready(res)
    _ = float(np.asarray(res["nsteps"]).ravel()[0])  # tunnel sync
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = ensemble_propagate_until_batch(ta, 1000.0, N_ITER, {"state": ens})
    jax.block_until_ready(res)
    nsteps = int(np.asarray(res["nsteps"]).sum())
    dt = time.perf_counter() - t0
    print(f"first call {warm:.1f}s; steady: {dt:.2f}s for {nsteps} steps "
          f"-> {nsteps/dt/1e6:.2f}M steps/s "
          f"({N_ITER * B} trajectories to 1,000 yr)", flush=True)


if __name__ == "__main__":
    main()
