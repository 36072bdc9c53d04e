"""General huge-tape (non-series) throughput: mascon dynamics with N
point masses (reference: ``benchmark/mascon_models.cpp`` — the workload
class the reference's ``parallel_mode`` exists for, SURVEY #24).

The N-mascon tape decomposes to ~14N u-vars of instance-regular ops;
``build_plan``'s entry sort + ``compact_flat``'s piecewise slice reads
make the staged flat engine's operand traffic gather-free, which is the
TPU-native answer to intra-step parallelism (gathers serialize on TPU;
slices fuse).  A/B: HEYOKA_FLAT_NO_PIECES=1 restores the gather path.

Usage: python benchmarks/mascon_bench.py [n_mascons] [batch] [steps]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import heyoka_tpu as hy

hy.s11n.enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax

from heyoka_tpu.models import mascon, mascon_energy
from heyoka_tpu.expr.decompose import taylor_decompose_sys
from heyoka_tpu.taylor.compact_flat import (
    jit_flat_step, make_batched_step_flat,
)
from heyoka_tpu.taylor.stepper import taylor_order_from_tol


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    NSTEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    # the reference benchmark's shape: mascons on a unit-ball lattice,
    # total mass 1, slow uniform rotation about z
    rng = np.random.default_rng(42)
    pts = rng.uniform(-1.0, 1.0, (4 * N, 3))
    pts = pts[np.linalg.norm(pts, axis=1) <= 1.0][:N]
    masses = rng.uniform(0.5, 1.0, N)
    masses /= masses.sum()
    omega = (0.0, 0.0, 2.0 * np.pi / 10.0)

    sys_ = mascon(Gconst=1.0, masses=masses.tolist(),
                  positions=pts.tolist(), omega=omega)
    t0 = time.perf_counter()
    tape = taylor_decompose_sys(sys_)
    t_dec = time.perf_counter() - t0
    order = taylor_order_from_tol(1e-15)
    print(f"N={N} u-vars={tape.n_uvars} order={order} "
          f"decompose {t_dec:.1f}s", flush=True)

    dtype = jnp.float64
    phase = sys.argv[4] if len(sys.argv) > 4 else None
    if phase in ("", "none", "None"):
        phase = None
    t0 = time.perf_counter()
    step = make_batched_step_flat(
        tape, order, dtype=dtype, high_accuracy=True, mp_order=8,
        layout="3d", unroll=True, staged=True, pallas_phase=phase,
    )

    from heyoka_tpu.dfloat import dd_add_d

    def chunk(state, th, tl, n):
        def body(c):
            st, th_, tl_, it = c
            ns, h = step(
                st, jnp.zeros((B, 0), dtype), th_,
                jnp.full((B,), jnp.inf, dtype),
            )
            th2, tl2 = dd_add_d(th_, tl_, h)
            return (ns, th2, tl2, it + 1)

        return lax.while_loop(lambda c: c[3] < n, body,
                              (state, th, tl, jnp.int32(0)))

    ck = jit_flat_step(lambda s, th, tl: chunk(s, th, tl, NSTEPS))

    # circular-ish orbits at r ~ 2 around the body
    ang = rng.uniform(0, 2 * np.pi, B)
    r0 = 2.0 + 0.05 * rng.standard_normal(B)
    vc = np.sqrt(1.0 / r0)
    states = np.zeros((B, 6))
    states[:, 0] = r0 * np.cos(ang)
    states[:, 1] = r0 * np.sin(ang)
    states[:, 3] = -vc * np.sin(ang)
    states[:, 4] = vc * np.cos(ang)
    st = jnp.asarray(states, dtype)
    z = jnp.zeros((B,), dtype)

    r = ck(st, z, z)  # compile + warm
    float(r[1][0])  # host value read: block_until_ready does not
    t_compile = time.perf_counter() - t0  # synchronize on the tunnel
    print(f"build+compile {t_compile:.1f}s", flush=True)

    t0 = time.perf_counter()
    out = ck(st, z, z)
    float(out[1][0])  # close the timing window with a host value read
    el = time.perf_counter() - t0
    lane_steps = NSTEPS * B

    # energy drift sanity over the measured window (rotating frame:
    # the Jacobi-like integral of mascon_energy is conserved)
    en = hy.make_cfunc(
        [mascon_energy(Gconst=1.0, masses=masses.tolist(),
                       positions=pts.tolist(), omega=omega)],
        vars=["x", "y", "z", "vx", "vy", "vz"], dtype=dtype,
    )
    p0 = jnp.zeros((0,), dtype)
    tz = jnp.asarray(0.0, dtype)
    e0 = jax.vmap(lambda s: en._single(s, p0, tz)[0])(st)
    e1 = jax.vmap(lambda s: en._single(s, p0, tz)[0])(out[0])
    drift = float(jnp.max(jnp.abs((e1 - e0) / e0)))

    print(json.dumps({
        "bench": "mascon_flat",
        "n_mascons": N,
        "n_uvars": tape.n_uvars,
        "batch": B,
        "pallas_phase": phase,
        "lane_steps_per_sec": round(lane_steps / el, 1),
        "ms_per_step": round(el / NSTEPS * 1e3, 3),
        "energy_drift": drift,
        "compile_s": round(t_compile, 1),
        "device": str(jax.devices()[0]),
    }), flush=True)

    # multi-orbit accuracy: the reference's mascon benches integrate
    # orbits over many periods (benchmark/mascon_models.cpp); r ~ 2
    # circular orbits have period ~ 2 pi r^{3/2} ~ 17.8 time units.
    # Reuse the compiled chunk until >= `orbits` periods have elapsed
    # and report the Jacobi-integral drift over the whole horizon.
    orbits = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0
    if orbits > 0.0:
        horizon = orbits * 2.0 * np.pi * 2.0 ** 1.5
        cur, th, tl = st, z, z
        done_steps = 0
        t0 = time.perf_counter()
        while float(np.asarray(th).min()) < horizon:
            cur, th, tl, _ = ck(cur, th, tl)
            done_steps += NSTEPS
        el_long = time.perf_counter() - t0
        e2 = jax.vmap(lambda s: en._single(s, p0, tz)[0])(cur)
        drift_long = float(jnp.max(jnp.abs((e2 - e0) / e0)))
        print(json.dumps({
            "bench": "mascon_flat_long",
            "orbits": orbits,
            "horizon": round(horizon, 1),
            "lane_steps": done_steps * B,
            "lane_steps_per_sec": round(done_steps * B / el_long, 1),
            "energy_drift": drift_long,
            "all_finite": bool(np.isfinite(np.asarray(cur)).all()),
        }), flush=True)


if __name__ == "__main__":
    main()
