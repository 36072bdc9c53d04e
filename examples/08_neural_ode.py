"""Tutorial 08 — neural ODEs with ffnn (reference: the ffnn/thermoNET
models).

A feed-forward network as an expression graph: its weights are runtime
params, so the same compiled integrator serves every weight vector — the
building block for neural ODEs.
"""

import numpy as np

import heyoka_tpu as hy
from heyoka_tpu.models import ffnn
from heyoka_tpu.models.ffnn import ffnn_par_count

x, v = hy.make_vars("x", "v")

# a learned correction to the pendulum: v' = -9.8 sin(x) + net(x, v)
net_out = ffnn([x, v], [8], 1, [hy.tanh, lambda e: e])
sys = [(x, v), (v, -9.8 * hy.sin(x) + 0.01 * net_out[0])]

npar = ffnn_par_count(2, [8], 1)
rng = np.random.default_rng(0)
weights = 0.1 * rng.standard_normal(npar)

ta = hy.taylor_adaptive(sys, [0.05, 0.025], pars=weights, tol=1e-12)
ta.propagate_until(10.0)
print("state with net correction:", ta.state)

# swap the weights without recompiling
ta2 = hy.taylor_adaptive(sys, [0.05, 0.025], pars=0 * weights, tol=1e-12)
ta2.propagate_until(10.0)
print("state with zero net:      ", ta2.state)
