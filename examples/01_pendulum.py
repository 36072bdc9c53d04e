"""Tutorial 01 — the pendulum (reference: tutorial/pendulum.cpp).

Define an ODE system symbolically, build an adaptive Taylor integrator and
propagate it: the minimal end-to-end slice.
"""

import heyoka_tpu as hy

# symbolic state variables
x, v = hy.make_vars("x", "v")

# the ODE system x' = v, v' = -9.8 sin(x)
sys = [(x, v), (v, -9.8 * hy.sin(x))]

# adaptive integrator at (close to) machine-precision tolerance
ta = hy.taylor_adaptive(sys, [0.05, 0.025], tol=1e-15)
print("order:", ta.order)

# one adaptive step, then propagate to t = 10
outcome, h = ta.step()
print("step:", outcome, "h =", h)

ta.propagate_until(10.0)
print("state at t=10:", ta.state)

# dense output inside the last step
print("dense output at t=9.99:", ta.update_d_output(9.99))
