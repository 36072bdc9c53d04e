"""Huge-tape demonstration (reference benchmark/vsop2013_cartesian.cpp;
SURVEY hard part #4: compile-time scaling with 10^2-10^4+ u-vars).

The reference benchmark embeds a VSOP2013 cartesian series as an ODE RHS
and reports expression/integrator creation cost.  The reference snapshot
(and therefore this repo's re-derived tables) ships only the planet-9 q/p
series, so the full cartesian conversion cannot be built from shipped data
in either codebase; this benchmark demonstrates the same huge-tape story
with what ships:

- config A: {x' = q9(t), y' = p9(t)} at thresh=1e-9 — ~11k u-vars
  (the VSOP2013 embedding of the reference benchmark, shipped subset);
- config B: {x',y',z'} = ELP2000 cartesian lunar series at thresh=1e-8 —
  ~17k u-vars (complete data ships), integrated end-to-end.

Both run through the index-table compact engine: the XLA graph (and
compile time) is bounded by the op vocabulary, not the tape length — the
TPU-native analog of heyoka's compact mode (taylor_02.cpp:1194).

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

YR = 365.25 * 86400.0 / 1e9  # VSOP time unit: millennia... (t in kyr)

# --- config A: VSOP2013 planet-9 q/p embedding ---------------------------
t0 = time.perf_counter()
q9 = vsop2013_elliptic(9, 5, time_expr=hy.time, thresh=1e-9)
p9 = vsop2013_elliptic(9, 6, time_expr=hy.time, thresh=1e-9)
el_expr = time.perf_counter() - t0
x, y, z = hy.make_vars("x", "y", "z")
t0 = time.perf_counter()
tape_a = taylor_decompose_sys([(x, q9), (y, p9)])
el_tape = time.perf_counter() - t0
print(json.dumps({
    "bench": "vsop2013_p9_qp", "thresh": 1e-9,
    "expr_build_s": round(el_expr, 2),
    "tape_decompose_s": round(el_tape, 2),
    "n_uvars": tape_a.n_uvars,
}), flush=True)

t0 = time.perf_counter()
ta = hy.taylor_adaptive([(x, q9), (y, p9)], [0.0, 0.0], tol=1e-15,
                        compact_mode=True)
el_build = time.perf_counter() - t0
t0 = time.perf_counter()
ta.step()
el_compile = time.perf_counter() - t0
t0 = time.perf_counter()
_, _, _, nsteps = ta.propagate_until(1.0)  # 1 kyr of series time
el = time.perf_counter() - t0
print(json.dumps({
    "integrator_build_s": round(el_build, 2),
    "first_step_compile_s": round(el_compile, 2),
    "steps": int(nsteps),
    "steps_per_sec": round(nsteps / el, 1),
}), flush=True)

# --- config B: ELP2000 lunar cartesian, batched --------------------------
t0 = time.perf_counter()
ser = elp2000_cartesian_e2000(time_expr=hy.time, thresh=1e-8)
el_expr = time.perf_counter() - t0
sys_b = [(x, ser[0] * 1e-10), (y, ser[1] * 1e-10), (z, ser[2] * 1e-10)]
t0 = time.perf_counter()
tape_b = taylor_decompose_sys(sys_b)
el_tape = time.perf_counter() - t0
print(json.dumps({
    "bench": "elp2000_cartesian", "thresh": 1e-8,
    "expr_build_s": round(el_expr, 2),
    "tape_decompose_s": round(el_tape, 2),
    "n_uvars": tape_b.n_uvars,
}), flush=True)

B = 256
pars = None
t0 = time.perf_counter()
tb = hy.taylor_adaptive_batch(sys_b, np.zeros((B, 3)), tol=1e-15,
                              compact_mode=True,
                              time=np.linspace(0.0, 0.5, B))
el_build = time.perf_counter() - t0
t0 = time.perf_counter()
tb.step()
el_compile = time.perf_counter() - t0
tgt = np.asarray(tb.time) + 0.02
t0 = time.perf_counter()
_, _, _, ns_b = tb.propagate_until(tgt)
el_b = time.perf_counter() - t0
tot = int(np.asarray(ns_b).sum())
print(json.dumps({
    "batch": B,
    "integrator_build_s": round(el_build, 2),
    "first_step_compile_s": round(el_compile, 2),
    "batch_lane_steps_per_sec": round(tot / el_b, 1),
}), flush=True)
