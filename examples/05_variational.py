"""Tutorial 05 — variational equations and derivative tensors (reference:
tutorials on var_ode_sys/dtens).

Augment an ODE with its variational equations to get state transition
matrices; use diff_tensors for arbitrary-order symbolic derivatives.
"""

import numpy as np

import heyoka_tpu as hy
from heyoka_tpu import VarArgs, var_ode_sys
from heyoka_tpu.models import pendulum

# first-order variational system wrt the initial conditions
vsys = var_ode_sys(pendulum(), VarArgs.vars, order=1)
ta = hy.taylor_adaptive(
    vsys.sys, vsys.initial_state([0.05, 0.025]), tol=1e-12
)
ta.propagate_until(3.0)

# the state transition matrix d state(t) / d state(0)
stm = np.stack(
    [ta.state[vsys.get_vslice(j)] for j in range(vsys.n_vargs)], axis=1
)
print("STM at t=3:\n", stm)
print("det(STM) =", np.linalg.det(stm), "(symplectic: should be 1)")

# symbolic derivative tensors of an expression
x, v = hy.make_vars("x", "v")
dt = hy.diff_tensors([hy.sin(x * v) + x**3], [x, v], diff_order=2)
print("gradient:", dt.gradient())
print("hessian[0][0]:", dt.hessian(0)[0][0])
