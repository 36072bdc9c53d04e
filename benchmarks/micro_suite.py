"""Secondary reference-benchmark reproductions, one JSON line each
(VERDICT r3 missing #6 — benchmark breadth beyond the five BASELINE
configs).  Each config maps to a reference benchmark CLI:

- kepE:          ``benchmark/kepE_bench.cpp`` — batched elliptic Kepler
                 solves through the cfunc path.
- large_cfunc:   ``benchmark/large_cfunc.cpp`` — build/compile/eval of a
                 wide generated cfunc (compile-time scaling axis).
- diff_tensors:  ``benchmark/diff_tensors.cpp`` — dtens construction
                 cost at rising order (symbolic subsystem).
- pendulum_mp:   ``benchmark/pendulum_mp.cpp`` — the mpmath tier
                 integrating the pendulum at 156 bits (~47 digits).
- fixed_centres: ``benchmark/fixed_centres.cpp`` — batched integration
                 throughput over 16 centres.
- stiff:         ``benchmark/stiff_equation.cpp`` — the Robertson-like
                 stiff problem: Taylor + tight tol survives where
                 explicit RK blows its step budget.
- two_body_step_batch: ``benchmark/two_body_step_batch.cpp`` — raw
                 batched elliptic two-body single steps.

Usage: python benchmarks/micro_suite.py [config ...]  (default: all)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import heyoka_tpu as hy

hy.s11n.enable_compilation_cache()


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def bench_kepe():
    import jax

    e, M = hy.make_vars("e", "M")
    cf = hy.cfunc([hy.kepE(e, M)], [e, M])
    rng = np.random.default_rng(1)
    B = 1 << 20
    ev = rng.uniform(0.0, 0.9, B)
    Mv = rng.uniform(0.0, 2 * np.pi, B)
    pts = np.stack([ev, Mv], axis=1)
    out = cf(pts)  # compile
    E0 = float(np.asarray(out)[0, 0])
    t0 = time.perf_counter()
    out = cf(pts)
    _ = float(np.asarray(out)[0, 0])
    el = time.perf_counter() - t0
    E = np.asarray(out)[:, 0]
    resid = float(np.max(np.abs(E - ev * np.sin(E) - Mv)))
    _emit(bench="kepE", batch=B, evals_per_sec=round(B / el, 1),
          max_residual=resid)


def bench_large_cfunc():
    # reference large_cfunc: thousands of correlated expressions
    rng = np.random.default_rng(2)
    xs = hy.make_vars(*[f"x{i}" for i in range(16)])
    exprs = []
    cur = list(xs)
    for _ in range(6):
        nxt = []
        for i in range(16):
            a, b = cur[i], cur[(i + 5) % 16]
            nxt.append(hy.sin(a) * b + hy.cos(b) * a)
        cur = nxt
        exprs.extend(cur)
    t0 = time.perf_counter()
    cf = hy.cfunc(exprs, xs)
    build = time.perf_counter() - t0
    B = 8192
    pts = rng.standard_normal((B, 16))
    t0 = time.perf_counter()
    out = cf(pts)
    _ = float(np.asarray(out)[0, 0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = cf(pts)
    _ = float(np.asarray(out)[0, 0])
    el = time.perf_counter() - t0
    _emit(bench="large_cfunc", n_outputs=len(exprs), batch=B,
          n_uvars=cf.dc.n_uvars, build_s=round(build, 2),
          compile_s=round(compile_s, 1),
          output_evals_per_sec=round(len(exprs) * B / el, 1))


def bench_diff_tensors():
    xs = hy.make_vars(*[f"x{i}" for i in range(6)])
    f = sum(hy.sin(a) * b for a, b in zip(xs, xs[1:] + xs[:1]))
    rows = []
    for order in (1, 2, 3):
        t0 = time.perf_counter()
        dt_ = hy.diff_tensors([f], xs, order)
        el = time.perf_counter() - t0
        rows.append((order, len(dt_), round(el, 3)))
    _emit(bench="diff_tensors", n_vars=6,
          rows=[{"order": o, "n_derivs": n, "build_s": s}
                for o, n, s in rows])


def bench_pendulum_mp():
    from heyoka_tpu.multiprec import MPTaylorIntegrator

    x, v = hy.make_vars("x", "v")
    sys_ = [(x, v), (v, -9.8 * hy.sin(x))]
    dps = 47  # decimal digits (reference pendulum_mp 156-bit regime)
    ta = MPTaylorIntegrator(sys_, ["0.05", "0.025"], dps=dps)
    t0 = time.perf_counter()
    nst = 0
    while float(ta.time) < 10.0:
        ta.step()
        nst += 1
    el = time.perf_counter() - t0
    # energy conservation at the mp tier
    import mpmath

    with mpmath.workdps(dps):
        e0 = (mpmath.mpf("0.025") ** 2 / 2
              - mpmath.mpf("9.8") * mpmath.cos(mpmath.mpf("0.05")))
        e1 = ta.state[1] ** 2 / 2 - 9.8 * mpmath.cos(ta.state[0])
        drift = abs(float((e1 - e0) / e0))
    _emit(bench="pendulum_mp", dps=dps, steps=nst,
          steps_per_sec=round(nst / el, 1), energy_drift=drift)


def bench_fixed_centres():
    from heyoka_tpu.models import fixed_centres

    rng = np.random.default_rng(3)
    Nc = 16
    pos = rng.uniform(-1, 1, (Nc, 3))
    mas = (rng.uniform(0.5, 1.0, Nc) / Nc).tolist()
    sys_ = fixed_centres(Gconst=1.0, masses=mas, positions=pos.tolist())
    B = 4096
    ang = rng.uniform(0, 2 * np.pi, B)
    st = np.zeros((B, 6))
    st[:, 0] = 3.0 * np.cos(ang)
    st[:, 1] = 3.0 * np.sin(ang)
    st[:, 3] = -np.sqrt(1.0 / 3.0) * np.sin(ang)
    st[:, 4] = np.sqrt(1.0 / 3.0) * np.cos(ang)
    ta = hy.taylor_adaptive_batch(sys_, st, tol=1e-15, high_accuracy=True,
                                  compact_mode="flat", mp_order=8,
                                  pallas_phase="auto")
    ta.propagate_until(1.0)  # compile
    t0 = time.perf_counter()
    _, _, _, ns = ta.propagate_until(25.0)
    tot = int(np.asarray(ns).sum())
    el = time.perf_counter() - t0
    stf = np.asarray(ta.state)
    _emit(bench="fixed_centres", n_centres=Nc, batch=B,
          lane_steps_per_sec=round(tot / el, 1),
          all_finite=bool(np.isfinite(stf).all()))


def bench_stiff():
    # reference stiff_equation.cpp: y' = -lam (y - cos t) with lam = 1e5.
    # Taylor coefficients grow like lam^k/k! (~8e77 at order 19), far
    # beyond the f32 exponent range TPU's emulated f64 inherits — the
    # scaled-carry flat engine is the configuration that survives
    # on-chip (the unscaled scalar engine overflows immediately there).
    y = hy.make_vars("y")
    lam = 1e5
    sys_ = [(y, -lam * (y - hy.cos(hy.time)))]
    B = 8
    ta = hy.taylor_adaptive_batch(sys_, np.zeros((B, 1)), tol=1e-15,
                                  compact_mode="flat", mp_order=5)
    ta.propagate_until(0.01)  # compile + transient
    t0 = time.perf_counter()
    _, _, _, ns = ta.propagate_until(2.0)
    el = time.perf_counter() - t0
    nst = int(np.asarray(ns).sum())
    yr = (lam * lam * np.cos(2.0) + lam * np.sin(2.0)) / (lam * lam + 1)
    err = float(np.abs(np.asarray(ta.state)[:, 0] - yr).max())
    _emit(bench="stiff_equation", lam=lam, batch=B, lane_steps=nst,
          lane_steps_per_sec=round(nst / el, 1), abs_err=err)


def bench_two_body_step_batch():
    from heyoka_tpu.models import nbody

    rng = np.random.default_rng(4)
    sys_ = nbody(2, masses=[1.0, 0.0], Gconst=1.0)
    B = 8192
    ecc = rng.uniform(0.0, 0.9, B)
    st = np.zeros((B, 12))
    st[:, 6] = 1.0 - ecc          # perihelion x of the test body
    st[:, 10] = np.sqrt((1 + ecc) / (1 - ecc))  # vis-viva vy
    ta = hy.taylor_adaptive_batch(sys_, st, tol=1e-15, high_accuracy=True,
                                  compact_mode="flat", mp_order=8,
                                  pallas_phase="auto")
    ta.step()  # compile
    n = 200
    t0 = time.perf_counter()
    for _ in range(n):
        ta.step()
    _ = float(np.asarray(ta.time)[0])
    el = time.perf_counter() - t0
    _emit(bench="two_body_step_batch", batch=B,
          lane_steps_per_sec=round(n * B / el, 1),
          all_finite=bool(np.isfinite(np.asarray(ta.state)).all()))


ALL = {
    "kepE": bench_kepe,
    "large_cfunc": bench_large_cfunc,
    "diff_tensors": bench_diff_tensors,
    "pendulum_mp": bench_pendulum_mp,
    "fixed_centres": bench_fixed_centres,
    "stiff": bench_stiff,
    "two_body_step_batch": bench_two_body_step_batch,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for nm in names:
        ALL[nm]()
