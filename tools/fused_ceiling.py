"""Quantify the fused multi-step kernel's ceiling (VERDICT r3 item 9).

Measures, on the real chip, for the north-star workload (outer-SS
6-body, tol 1e-15, B=10240):

1. wall time per whole-batch step through the fused kernel;
2. the static in-kernel f32 op count per step, from the plan (recurrence
   structure x the dd op costs of pallas_phase._mk_arith);
3. achieved f32 op throughput vs the VPU's peak -> utilization;
4. the observed dd multiplier (dd step wall vs an f32-only variant of
   the same plan, mp_order=0);
5. the projected MXU triangular-matmul jet gain, using the round-1
   measured tiny-matmul rate (PERF.md: 60 us per (135,256)
   selection-matmul at Precision.HIGHEST, ~45x off MXU peak).

Prints one JSON per phase.  Conclusion feeds the go/no-go on the MXU
jet rewrite in PERF.md.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import heyoka_tpu as hy

hy.s11n.enable_compilation_cache()

from bench import IC, MASSES, GCONST
from heyoka_tpu.models import nbody
from heyoka_tpu.expr.decompose import taylor_decompose_sys
from heyoka_tpu.taylor.compact import build_plan
from heyoka_tpu.taylor.stepper import taylor_order_from_tol

B = 10240
TOL = 1e-15
MP = 8

sys_ = nbody(6, masses=MASSES, Gconst=GCONST)
K = taylor_order_from_tol(TOL)
tape = taylor_decompose_sys(sys_)
plan = build_plan(tape, K)

# --- static in-kernel op counts per lane-step ---------------------------
# dd op costs in f32 ops (pallas_phase._mk_arith): two_sum 6, quick 3,
# two_prod (cached splits) ~9, dd add ~ 6+2+3 = 11, dd mul ~ 9+4+3 = 16,
# f32 mul/add = 1.  Convolution at order k: (k+1) products + k adds.
DD_MUL, DD_ADD, F_MUL, F_ADD = 16, 11, 1, 1


def conv_ops(k, dd):
    m, a = (DD_MUL, DD_ADD) if dd else (F_MUL, F_ADD)
    return (k + 1) * m + k * a


ops_per_step = 0
for lv in plan.levels:
    for g in lv:
        m = g.out_cols.size
        for k in range(1, K + 1):
            dd = k <= MP
            if g.name in ("mul", "div", "pow", "sq"):
                ops_per_step += m * conv_ops(k, dd)
            elif g.name == "sum":
                nargs = g.in_cols.shape[1]
                ops_per_step += m * nargs * (DD_ADD if dd else F_ADD)
            else:  # transcendental pairs etc: ~2 convs
                ops_per_step += 2 * m * conv_ops(k, dd)
# state rows + Horner + step control (small, ~5%)
ops_per_step = int(ops_per_step * 1.05)
print(json.dumps({"phase": "static", "order": K, "width": plan.width,
                  "in_kernel_f32_ops_per_lane_step": ops_per_step}),
      flush=True)

# --- on-chip wall per step through the fused production path -----------
rng = np.random.default_rng(0)
base = IC[None, :] + np.abs(IC)[None, :] * (
    rng.uniform(-1, 1, (B, IC.size)) * 1e-8)
ta = hy.taylor_adaptive_batch(
    sys_, base, tol=TOL, high_accuracy=True, compact_mode="flat",
    mp_order=MP, pallas_phase="auto")
ta.propagate_until(10.0)  # warm
t0 = time.perf_counter()
_, _, _, ns = ta.propagate_until(510.0)
tot = int(np.asarray(ns).sum())
el = time.perf_counter() - t0
rate = tot / el
f32_rate = rate * ops_per_step
VPU_PEAK = 1.97e12  # v5e: 8x128 lanes x 2 (fma) x 940 MHz, one core
print(json.dumps({
    "phase": "onchip", "lane_steps_per_sec": round(rate, 1),
    "achieved_f32_ops_per_sec": f"{f32_rate:.3e}",
    "vpu_peak_f32_ops_per_sec": f"{VPU_PEAK:.3e}",
    "vpu_utilization_pct": round(100 * f32_rate / VPU_PEAK, 1),
}), flush=True)

# --- dd multiplier: same tol/order, minimal-dd engine (mp_order=1) -----
ta1 = hy.taylor_adaptive_batch(
    sys_, base, tol=TOL, high_accuracy=True, compact_mode="flat",
    mp_order=1, pallas_phase="auto")
ta1.propagate_until(10.0)
t0 = time.perf_counter()
_, _, _, ns = ta1.propagate_until(510.0)
tot1 = int(np.asarray(ns).sum())
el1 = time.perf_counter() - t0
# static op models for both configs give the implied per-op dd cost
ops1 = 0
for lv in plan.levels:
    for g in lv:
        m = g.out_cols.size
        for k in range(1, K + 1):
            dd = k <= 1
            if g.name in ("mul", "div", "pow", "sq"):
                ops1 += m * conv_ops(k, dd)
            elif g.name == "sum":
                ops1 += m * g.in_cols.shape[1] * (DD_ADD if dd else F_ADD)
            else:
                ops1 += 2 * m * conv_ops(k, dd)
ops1 = int(ops1 * 1.05)
r8 = tot / el
r1 = tot1 / el1
print(json.dumps({
    "phase": "dd_multiplier",
    "mp1_lane_steps_per_sec": round(r1, 1),
    "mp8_lane_steps_per_sec": round(r8, 1),
    "static_op_ratio_mp8_over_mp1": round(ops_per_step / ops1, 2),
    "observed_wall_ratio_mp8_over_mp1": round(r1 / r8, 2),
}), flush=True)

# --- MXU triangular-matmul projection ----------------------------------
# Jet convolutions as (K+1, K+1) triangular matmuls over (W-ish, B)
# operands.  Round-1 measured selection-matmuls of comparable shape at
# 60 us per (135, 256) x (256, B/128-tile) at Precision.HIGHEST (exact
# bf16x6) -- ~45x off MXU peak, latency-bound at these tiny K+1=20
# contraction dims.  Per step the engine would need ~n_groups x K
# such matmuls:
n_groups = sum(len(lv) for lv in plan.levels)
proj_matmuls = n_groups * K
proj_time_s = proj_matmuls * 60e-6
cur_step_s = B / rate
print(json.dumps({
    "phase": "mxu_projection", "n_groups": n_groups,
    "proj_matmuls_per_step": proj_matmuls,
    "proj_step_time_s_at_measured_tiny_matmul_rate":
        round(proj_time_s, 4),
    "current_fused_step_time_s": round(cur_step_s, 4),
    "go": bool(proj_time_s < cur_step_s),
}), flush=True)
