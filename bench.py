#!/usr/bin/env python
"""North-star benchmark: outer-Solar-System 6-body Taylor integration,
10k parallel trajectories, steps/sec/chip + energy-drift parity.

Reference configuration: heyoka ``benchmark/outer_ss_long_term_batch.cpp``
(Sun+Jupiter+Saturn+Uranus+Neptune+Pluto, AU/years units, tol=1e-15,
high_accuracy) — see BASELINE.md.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Baseline for the ratio: the reference's batch-mode (AVX-512, 8 lanes/core)
throughput on one Xeon 8360Y *core* is on the order of 1e6 steps/s for this
system (order-20 jet over ~200 u-vars ~ 1e5 flops/step; published results are
comparative plots only, doc/benchmarks.rst). We use 1.0e6 steps/s/core as the
documented per-core yardstick — i.e. vs_baseline is "equivalent 8360Y cores
per TPU chip".  That estimate is deliberately GENEROUS to the reference: a
measured same-algorithm yardstick exists on this very host — the repo's own
AOT-compiled 8-lane native stepper (native_cg.py, the reference's
batch-mode design: specialized straight-line code, SIMD lanes, -O2
-march=native) does ~83k lane-steps/s on this machine's core for this exact
system (BASELINE.md "measured host yardstick").  When the cached stepper is
available, the bench re-measures it and reports ``host_core_steps_per_sec``
and ``vs_host_core_measured`` alongside the estimate-anchored
``vs_baseline``.
"""

import json
import math
import time

import numpy as np

BASELINE_STEPS_PER_SEC = 1.0e6  # heyoka batch mode, one Xeon 8360Y core (est.)

# Outer solar system: masses (solar masses), G in AU^3/(Msun yr^2),
# J2000-ish initial conditions in AU and AU/yr (the standard configuration
# of the reference benchmark / DiffEq benchmarks).
MASSES = [
    1.00000597682,
    1.0 / 1047.355,
    1.0 / 3501.6,
    1.0 / 22869.0,
    1.0 / 19314.0,
    7.4074074e-09,
]
GCONST = 0.01720209895**2 * 365 * 365

IC = np.array([
    # Sun
    -4.06428567034226e-3, -6.08813756435987e-3, -1.66162304225834e-6,
    +6.69048890636161e-6 * 365, -6.33922479583593e-6 * 365, -3.13202145590767e-9 * 365,
    # Jupiter
    +3.40546614227466e+0, +3.62978190075864e+0, +3.42386261766577e-2,
    -5.59797969310664e-3 * 365, +5.51815399480116e-3 * 365, -2.66711392865591e-6 * 365,
    # Saturn
    +6.60801554403466e+0, +6.38084674585064e+0, -1.36145963724542e-1,
    -4.17354020307064e-3 * 365, +3.99723751748116e-3 * 365, +1.67206320571441e-5 * 365,
    # Uranus
    +1.11636331405597e+1, +1.60373479057256e+1, +3.61783279369958e-1,
    -3.25884806151064e-3 * 365, +2.06438412905916e-3 * 365, -2.17699042180559e-5 * 365,
    # Neptune
    -3.01777243405203e+1, +1.91155314998064e+0, -1.53887595621042e-1,
    -2.17471785045538e-4 * 365, -3.11361111025884e-3 * 365, +3.58344705491441e-5 * 365,
    # Pluto
    -2.13858977531573e+1, +3.20719104739886e+1, +2.49245689556096e+0,
    -1.76936577252484e-3 * 365, -2.06720938381724e-3 * 365, +6.58091931493844e-4 * 365,
])


def main():
    import jax
    import jax.numpy as jnp

    import heyoka_tpu as hy

    # persistent XLA compilation cache: compiles are reused across runs
    hy.s11n.enable_compilation_cache()
    from heyoka_tpu.models import nbody
    from heyoka_tpu.expr.decompose import taylor_decompose_sys
    from heyoka_tpu.taylor.compact_flat import make_batched_step_flat
    from heyoka_tpu.taylor.stepper import taylor_order_from_tol

    BATCH = 10_240
    TOL = 1e-15
    dtype = jnp.float64

    sys_ = nbody(6, masses=MASSES, Gconst=GCONST)
    tape = taylor_decompose_sys(sys_)
    order = taylor_order_from_tol(TOL)

    on_tpu = jax.default_backend() not in ("cpu",)

    rng = np.random.default_rng(0)
    states = jnp.asarray(
        IC[None, :] + np.abs(IC)[None, :]
        * (rng.uniform(-1, 1, (BATCH, IC.size)) * 1e-8),
        dtype,
    )
    pars = jnp.zeros((BATCH, 0), dtype)
    t = jnp.zeros((BATCH,), dtype)
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

    if on_tpu:
        # the production path: the fused multi-step Pallas kernel
        # (taylor/fused.py) runs whole adaptive steps — dd order 0, the
        # full Taylor jet (orders 1..8 in two-f32 double-float, matching
        # XLA's emulated-f64 2^-48 arithmetic; 9..19 f32 —
        # error-analysis-safe at tol=1e-15), f32 Jorba step control and
        # the dd Horner update — without leaving VMEM, up to 32 steps
        # per lane per launch; the f64 XLA stepper lands every lane
        # exactly on the target.  This is what
        # taylor_adaptive_batch.propagate_until dispatches to when the
        # dd phase is active.
        from heyoka_tpu.taylor.compact_flat import jit_flat_step
        from heyoka_tpu.taylor.fused import make_propagate_until_fused

        pu = jit_flat_step(make_propagate_until_fused(
            tape, order, dtype=dtype, high_accuracy=True, mp_order=8,
            pallas_phase="dd", chunk_steps=64))

        zero = jnp.zeros((BATCH,), dtype)
        ms = jnp.asarray(0, jnp.int64)

        # warmup / compile
        r = pu(states, pars, zero, zero,
               jnp.full((BATCH,), 0.5, dtype), zero, mdt, ms)
        int(np.asarray(r["nsteps"])[0])

        # Provisional record: a short (~1 s) timed run printed BEFORE the
        # long run, so a driver-side timeout on the full measurement still
        # leaves a parsable JSON line (the final line below supersedes it).
        tgt_p = jnp.full((BATCH,), 20.0, dtype)
        t_start = time.perf_counter()
        rp = pu(states, pars, zero, zero, tgt_p, zero, mdt, ms)
        steps_p = int(np.asarray(rp["nsteps"]).sum())
        el_p = time.perf_counter() - t_start
        e1p = energy_np(rp["state"])
        print(json.dumps({
            "metric": "outer_ss_6body_steps_per_sec_per_chip",
            "value": round(steps_p / el_p, 1),
            "unit": ("adaptive Taylor steps/s (batch=10240, tol=1e-15, "
                     "f64, high_accuracy)"),
            "vs_baseline": round(steps_p / el_p / BASELINE_STEPS_PER_SEC, 3),
            "energy_drift": float(np.max(np.abs((e1p - e0) / e0))),
            "drift_horizon_yr": 20.0,
            "elapsed_s": round(el_p, 3),
            "timed_steps": steps_p,
            "provisional": True,
            "device": str(jax.devices()[0]),
        }), flush=True)

        # timed: full propagate_until to the horizon; a host-side value
        # read closes the timing window (block_until_ready alone does
        # not synchronize on all remote platforms).  1000 yr ~ 1,350
        # adaptive steps/lane: the drift this reports is a real
        # long-horizon parity statement, not a few-hundred-step sample
        # (tools/drift_long.py extends the same engine to 10k yr).
        horizon = 1000.0
        tgt = jnp.full((BATCH,), horizon, dtype)
        t_start = time.perf_counter()
        r = pu(states, pars, zero, zero, tgt, zero, mdt, ms)
        timed_steps = int(np.asarray(r["nsteps"]).sum())
        elapsed = time.perf_counter() - t_start
        steps_per_sec = timed_steps / elapsed
        e1 = energy_np(r["state"])
        drift = float(np.max(np.abs((e1 - e0) / e0)))
        drift_horizon = horizon
    else:
        # CPU dev hosts: the staged XLA flat engine, 32 chained adaptive
        # steps per jit dispatch (the production propagate shape)
        from jax import lax

        step = jax.jit(make_batched_step_flat(
            tape, order, dtype=dtype, high_accuracy=True, mp_order=10,
            layout="3d", unroll=True, staged=True, pallas_phase=False,
        ))

        CHUNK = 32

        @jax.jit
        def run_chunk(s, t2):
            def body(_, c):
                s, t2 = c
                s2, h = step(s, pars, t2, mdt)
                return (s2, t2 + h)
            return lax.fori_loop(0, CHUNK, body, (s, t2))

        s, t2 = run_chunk(states, t)
        float(t2[0])

        s, t2 = states, t
        reps = 0
        t_start = time.perf_counter()
        while True:
            s, t2 = run_chunk(s, t2)
            reps += CHUNK
            float(t2[0])
            if time.perf_counter() - t_start > 3.0:
                break
        elapsed = time.perf_counter() - t_start
        timed_steps = BATCH * reps
        steps_per_sec = timed_steps / elapsed

        total = reps
        while float(jnp.mean(t2)) < 100.0 and total < 20000:
            s, t2 = run_chunk(s, t2)
            total += CHUNK
        e1 = energy_np(s)
        drift = float(np.max(np.abs((e1 - e0) / e0)))
        drift_horizon = float(jnp.mean(t2))

    # measured host yardstick: the AOT-compiled native batch stepper on
    # this host's CPU core, same tape/order/tolerance — only when its .so
    # is already disk-cached (never pay a C++ compile inside the bench)
    host_core = None
    try:
        import os as _osm

        from heyoka_tpu.native_cg import CompiledTape, _tape_digest

        digest = _tape_digest(tape, order, 8)
        so = _osm.path.join(
            _osm.environ.get("XDG_CACHE_HOME",
                             _osm.path.expanduser("~/.cache")),
            "heyoka_tpu", "cg", f"cg_{digest}.so",
        )
        if _osm.path.exists(so):
            cg = CompiledTape(tape, order, W=8)
            Bh = 64
            sts = np.ascontiguousarray(np.asarray(states[:Bh], np.float64))
            ths = np.zeros(Bh)
            tls = np.zeros(Bh)
            s0, _, _ = cg.propagate_until_batch(
                sts, None, ths, tls, np.full(Bh, 10.0),
                high_accuracy=True)
            t0 = time.perf_counter()
            s1, _, _ = cg.propagate_until_batch(
                sts, None, ths, tls, np.full(Bh, 120.0),
                high_accuracy=True)
            host_core = float(np.abs(s1).sum() / (time.perf_counter() - t0))
    except Exception:
        host_core = None

    result = {
        "metric": "outer_ss_6body_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 1),
        "unit": "adaptive Taylor steps/s (batch=10240, tol=1e-15, f64, high_accuracy)",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
        "energy_drift": drift,
        "drift_horizon_yr": round(drift_horizon, 1),
        "elapsed_s": round(elapsed, 3),
        "timed_steps": timed_steps,
        "order": order,
        "n_uvars": tape.n_uvars,
        "device": str(jax.devices()[0]),
    }
    if host_core is not None:
        result["host_core_steps_per_sec"] = round(host_core, 1)
        result["vs_host_core_measured"] = round(steps_per_sec / host_core, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
