#!/usr/bin/env python
"""Long-horizon energy drift of the dd-Pallas engine vs the XLA staged
engine vs the fused multi-step prop kernel: outer-SS to T years (default
10k), reporting drift at checkpoints.
Usage: drift_long.py [T_years] [mode: dd|xla|fused|both|all] [batch]

The "fused" mode exercises the PRODUCTION path bench.py measures
(taylor/fused.make_propagate_until_fused: f32 step selection, dd orders
1..mp, f32 Horner tail, early-exit chunk loop) — VERDICT r2 item 1: the
headline number must carry its own long-horizon accuracy evidence, not
inherit the per-step dd kernel's."""
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
    from heyoka_tpu.dfloat import dd_add_d

    T = float(sys.argv[1]) if len(sys.argv) > 1 else 10_000.0
    want = (sys.argv[2] if len(sys.argv) > 2 else "both")
    BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 256
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
                pot -= GCONST * m[i] * m[j] / np.linalg.norm(
                    r[:, i] - r[:, j], axis=1)
        return kin + pot

    e0 = energy_np(states)

    if want in ("fused", "all"):
        from heyoka_tpu.taylor.compact_flat import jit_flat_step
        from heyoka_tpu.taylor.fused import make_propagate_until_fused

        pu = jit_flat_step(make_propagate_until_fused(
            tape, order, dtype=dtype, high_accuracy=True, mp_order=8,
            pallas_phase="dd", chunk_steps=64))
        s = states
        th = jnp.zeros((BATCH,), dtype)
        tl = jnp.zeros((BATCH,), dtype)
        nsteps = 0
        ms = jnp.asarray(0, jnp.int64)
        t_start = time.perf_counter()
        n_ckpt = 8
        for i in range(1, n_ckpt + 1):
            tgt = jnp.full((BATCH,), T * i / n_ckpt, dtype)
            zl = jnp.zeros((BATCH,), dtype)
            r = pu(s, pars, th, tl, tgt, zl, mdt, ms)
            s, th, tl = r["state"], r["t_hi"], r["t_lo"]
            nsteps += int(np.asarray(r["nsteps"]).astype(np.int64).mean())
            drift = float(np.max(np.abs((energy_np(s) - e0) / e0)))
            print(f"fused: t={float(jnp.mean(th)):9.1f} yr  "
                  f"steps/lane={nsteps:8d}  drift={drift:.3e}  "
                  f"[{time.perf_counter()-t_start:.0f}s]", flush=True)

    modes = [("dd", "dd"), ("xla", False)]
    modes = [m for m in modes if want in (m[0], "both", "all")]
    for name, pp in modes:
        step = jax.jit(make_batched_step_flat(
            tape, order, dtype=dtype, high_accuracy=True, mp_order=8,
            layout="3d", unroll=True, staged=True, pallas_phase=pp))
        s = states
        th = jnp.zeros((BATCH,), dtype)
        tl = jnp.zeros((BATCH,), dtype)
        n = 0
        next_report = T / 8
        t_start = time.perf_counter()
        while float(jnp.mean(th)) < T and n < 10_000_000:
            for _ in range(256):
                s, h = step(s, pars, th, mdt)
                th, tl = dd_add_d(th, tl, h)
            n += 256
            ty = float(jnp.mean(th))
            if ty >= next_report or ty >= T:
                drift = float(np.max(np.abs((energy_np(s) - e0) / e0)))
                print(f"{name}: t={ty:9.1f} yr  steps={n:8d}  "
                      f"drift={drift:.3e}  "
                      f"[{time.perf_counter()-t_start:.0f}s]", flush=True)
                while next_report <= ty:
                    next_report += T / 8


if __name__ == "__main__":
    main()
