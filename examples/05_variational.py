"""Tutorial 05 — variational equations and derivative tensors (reference:
tutorials on var_ode_sys/dtens).

Augment an ODE with its variational equations to get state transition
matrices; use diff_tensors for arbitrary-order symbolic derivatives.
"""

import numpy as np

import heyoka_tpu as hy
from heyoka_tpu import VarArgs, var_ode_sys
from heyoka_tpu.models import pendulum

# first-order variational system wrt the initial conditions; passing the
# var_ode_sys straight to the integrator auto-fills the variational ICs
vsys = var_ode_sys(pendulum(), VarArgs.vars, order=1)
ta = hy.taylor_adaptive(vsys, [0.05, 0.025], tol=1e-12)
ta.propagate_until(3.0)

# the state transition matrix d state(t) / d state(0): order-1 derivatives
# are laid out by component (dtens ordering, like the reference)
stm = np.stack([ta.state[ta.get_vslice(1, i)] for i in range(2)], axis=0)
print("STM at t=3:\n", stm)
print("det(STM) =", np.linalg.det(stm), "(symplectic: should be 1)")

# second-order variationals + Taylor-map evaluation of the flow
vsys2 = var_ode_sys(pendulum(), VarArgs.vars, order=2)
ta2 = hy.taylor_adaptive(vsys2, [0.05, 0.025], tol=1e-12)
ta2.propagate_until(3.0)
da = np.array([1e-3, -2e-3])
print("Taylor map x(x0+da):", ta2.eval_taylor_map(da))
direct = hy.taylor_adaptive(pendulum(), np.array([0.05, 0.025]) + da, tol=1e-12)
direct.propagate_until(3.0)
print("direct integration:  ", direct.state)

# symbolic derivative tensors of an expression
x, v = hy.make_vars("x", "v")
dt = hy.diff_tensors([hy.sin(x * v) + x**3], [x, v], diff_order=2)
print("gradient:", dt.gradient())
print("hessian[0][0]:", dt.hessian(0)[0][0])
