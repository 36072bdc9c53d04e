"""Huge-tape demonstration (reference benchmark/vsop2013_cartesian.cpp;
SURVEY hard part #4: compile-time scaling with 10^2-10^5-term series RHS).

The reference embeds a VSOP2013 cartesian series as an ODE RHS and reports
expression/integrator creation cost; its compact mode keeps the LLVM IR
size flat.  The snapshot (and therefore this repo's re-derived tables)
ships only the planet-9 q/p series, so the configurations here are the
shipped VSOP subset plus the complete ELP2000 lunar theory.

Two engines are measured per configuration:
- the index-table compact engine over the EXPANDED expression tape
  (graph size already independent of tape length — but on TPU the
  per-u-var index loads become vmapped gathers);
- the round-2 dense ``trig_series`` op (expr/series.py): the whole series
  is one tape op evaluated with gather-free vector math, so both compile
  time and runtime stay flat.

Prints one JSON line per phase.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import heyoka_tpu as hy

hy.s11n.enable_compilation_cache()

from heyoka_tpu.expr.decompose import taylor_decompose_sys
from heyoka_tpu.models import elp2000_cartesian_e2000, vsop2013_elliptic

x, y, z = hy.make_vars("x", "y", "z")


def bench_config(label, sys_, n_uvars, B=256, horizon=0.02, t0=0.0):
    # flat staged engine + scaled mixed-precision: the TPU production
    # config for series tapes.  mp_order=5 keeps the f64-phase
    # coefficients of ELP2000-class series (~A rate^k/k!, rate ~8e4
    # rad/millennium) inside the f32 exponent range that TPU's emulated
    # f64 inherits; the scaled f32 phase (top-order-ratio sig estimator)
    # carries the rest.  Round 3 recorded the loops engine here, whose
    # unscaled coefficients overflow on-chip — those ELP numbers were
    # measured over NaN lanes and are void (round-4 audit).
    t_b = time.perf_counter()
    tb = hy.taylor_adaptive_batch(
        sys_, np.zeros((B, len(sys_))), tol=1e-15,
        compact_mode="flat", mp_order=5,
        time=np.full(B, t0),
    )
    el_build = time.perf_counter() - t_b
    t_c = time.perf_counter()
    tb.step()
    el_compile = time.perf_counter() - t_c
    # warm the propagate driver (its own compile unit) before timing
    tb.propagate_until(np.asarray(tb.time) + horizon * 0.2)
    tgt = np.asarray(tb.time) + horizon
    t_r = time.perf_counter()
    _, _, _, ns = tb.propagate_until(tgt)
    el = time.perf_counter() - t_r
    tot = int(np.asarray(ns).sum())
    st = np.asarray(tb.state)
    assert np.isfinite(st).all(), f"{label}: non-finite lanes"
    print(json.dumps({
        "config": label,
        "n_uvars": n_uvars,
        "batch": B,
        "build_s": round(el_build, 2),
        "first_step_compile_s": round(el_compile, 2),
        "lane_steps_per_sec": round(tot / el, 1),
        "all_finite": True,
    }), flush=True)


# --- VSOP2013 planet-9 q/p (shipped subset), thresh=1e-9 -----------------
t0 = time.perf_counter()
q9 = vsop2013_elliptic(9, 5, thresh=1e-9)
p9 = vsop2013_elliptic(9, 6, thresh=1e-9)
tape = taylor_decompose_sys([(x, q9), (y, p9)])
el = time.perf_counter() - t0
print(json.dumps({"config": "vsop_p9_expanded", "expr_build_s": round(el, 2),
                  "n_uvars": tape.n_uvars}), flush=True)

t0 = time.perf_counter()
q9s = vsop2013_elliptic(9, 5, thresh=1e-9, series_op=True)
p9s = vsop2013_elliptic(9, 6, thresh=1e-9, series_op=True)
tape_s = taylor_decompose_sys([(x, q9s), (y, p9s)])
el = time.perf_counter() - t0
print(json.dumps({"config": "vsop_p9_series_op", "expr_build_s": round(el, 2),
                  "n_uvars": tape_s.n_uvars}), flush=True)
bench_config("vsop_p9_series_op", [(x, q9s), (y, p9s)], tape_s.n_uvars,
             horizon=0.1)

# --- ELP2000 lunar cartesian, complete series (314k terms) ---------------
for thr, lbl in ((1e-8, "elp_1e-8"), (0.0, "elp_full")):
    t0 = time.perf_counter()
    c = elp2000_cartesian_e2000(thresh=thr, series_op=True)
    sys_c = [(x, c[0] * 1e-10), (y, c[1] * 1e-10), (z, c[2] * 1e-10)]
    tape_c = taylor_decompose_sys(sys_c)
    el = time.perf_counter() - t0
    print(json.dumps({"config": f"{lbl}_series_op",
                      "expr_build_s": round(el, 2),
                      "n_uvars": tape_c.n_uvars}), flush=True)
    bench_config(f"{lbl}_series_op", sys_c, tape_c.n_uvars)
