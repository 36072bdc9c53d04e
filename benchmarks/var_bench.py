"""Reference benchmark #4: variational-equations construction + integration
on the PCR3BP (benchmark/var_construction.cpp, test/taylor_adaptive_var.cpp).

Reports var-system construction time and the first-order STM after 10 time
units, cross-checked against finite differences.
"""
import json
import time

import numpy as np

import heyoka_tpu as hy

hy.s11n.enable_compilation_cache()

MU = 0.01
sys_ = hy.models.pcr3bp(mu=MU)
ic = [-0.45, 0.80, -0.80, -0.45]

t0 = time.perf_counter()
vsys = hy.var_ode_sys(sys_, hy.VarArgs.vars, order=1)
t_build = time.perf_counter() - t0

ta = hy.taylor_adaptive(vsys, ic, tol=1e-15, compact_mode=True)
t0 = time.perf_counter()
ta.propagate_until(10.0)
t_prop = time.perf_counter() - t0
# variational layout: dtens ordering — order-1 block grouped by component
stm = np.stack([ta.state[ta.get_vslice(1, i)] for i in range(4)], axis=0)

# FD cross-check of one column
eps = 1e-7
base = hy.taylor_adaptive(sys_, ic, tol=1e-15, compact_mode=True)
base.propagate_until(10.0)
pert = hy.taylor_adaptive(sys_, np.asarray(ic) + [eps, 0, 0, 0],
                          tol=1e-15, compact_mode=True)
pert.propagate_until(10.0)
fd = (pert.state - base.state) / eps
err = float(np.abs(fd - stm[:, 0]).max())
print(json.dumps({
    "bench": "pcr3bp_variational",
    "build_s": round(t_build, 3),
    "propagate_s": round(t_prop, 3),
    "stm_col0_vs_fd_maxerr": err,
}))
assert err < 1e-4
