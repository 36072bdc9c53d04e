"""Tutorial 03 — batch mode and mesh ensembles (reference: tutorials on
batch mode and ensemble propagation).

The batch integrator advances many trajectories in lockstep (the TPU analog
of heyoka's SIMD batch mode); ensembles shard trajectories over a device
mesh.
"""

import numpy as np

import heyoka_tpu as hy
from heyoka_tpu.models import pendulum
from heyoka_tpu.ensemble import ensemble_propagate_until

rng = np.random.default_rng(0)
states = 0.05 + 0.01 * rng.standard_normal((8, 2))

# -- batch mode ---------------------------------------------------------------
tab = hy.taylor_adaptive_batch(pendulum(), states, tol=1e-15)
tab.propagate_until(10.0)
print("per-lane outcomes:", [oc for oc, _ in tab.get_step_res()])
print("final states:\n", tab.state)

# -- ensembles ----------------------------------------------------------------
# the generator customizes each ensemble member (here: its initial state);
# pass mesh= to shard the ensemble over the devices of a jax Mesh
ta = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-15)
res = ensemble_propagate_until(ta, 10.0, 8, {"state": states})
print("ensemble final states:\n", np.asarray(res["state"]))
print("steps per member:", np.asarray(res["nsteps"]))
