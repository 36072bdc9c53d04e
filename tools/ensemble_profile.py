"""Decompose the public-ensemble call: input staging, dispatch, device
execution, result read — to find where the 2.25M-vs-3.08M gap lives
(VERDICT r2 item 4)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import heyoka_tpu as hy
hy.s11n.enable_compilation_cache()

import jax
import jax.numpy as jnp

from bench import IC, MASSES, GCONST
from heyoka_tpu.models import nbody
from heyoka_tpu import ensemble as ens_mod
from heyoka_tpu.ensemble import ensemble_propagate_until_batch, _BatchShim, _build_inputs, _flatten_batch_gen

B = 1024
N_ITER = 10
rng = np.random.default_rng(0)
base = IC[None, :] + np.abs(IC)[None, :] * (rng.uniform(-1, 1, (B, IC.size)) * 1e-8)
ta = hy.taylor_adaptive_batch(
    nbody(6, masses=MASSES, Gconst=GCONST), base, tol=1e-15,
    high_accuracy=True, compact_mode="flat", mp_order=8, pallas_phase="auto")
ens = IC[None, None, :] + np.abs(IC)[None, None, :] * (
    rng.uniform(-1, 1, (N_ITER, B, IC.size)) * 1e-8)

res = ensemble_propagate_until_batch(ta, 100.0, N_ITER, {"state": ens})
_ = float(np.asarray(res["nsteps"]).ravel()[0])

# steady state, decomposed
for rep in range(2):
    t0 = time.perf_counter()
    shim = _BatchShim(ta)
    gen = _flatten_batch_gen(ta, N_ITER, {"state": ens})
    states, pars, times = _build_inputs(shim, N_ITER * B, gen)
    dt = ta._dtype  # mirror ensemble.py's packing dtype exactly
    packed = np.concatenate(
        [np.asarray(states, dt),
         np.asarray(times, dt)[:, None],
         np.asarray(pars, dt)], axis=1)
    t1 = time.perf_counter()
    pk = jnp.asarray(packed)
    _ = float(np.asarray(pk[0, 0]))  # host read: sync the tunnel upload
    t2 = time.perf_counter()
    fn = ta._ens_drivers[ens_mod._until_driver_key(np.inf, 0, None)]
    r = fn(pk, jnp.asarray(100.0, dt))
    t3 = time.perf_counter()
    ns = np.asarray(r["nsteps"])
    t4 = time.perf_counter()
    tot = int(ns.sum())
    print(f"rep{rep}: build_inputs {t1-t0:.3f}s  upload {t2-t1:.3f}s  "
          f"dispatch {t3-t2:.3f}s  exec+read {t4-t3:.3f}s  total {t4-t0:.3f}s  "
          f"-> {tot/(t4-t0)/1e6:.2f}M steps/s", flush=True)

# and the whole public call for reference
t0 = time.perf_counter()
res = ensemble_propagate_until_batch(ta, 100.0, N_ITER, {"state": ens})
tot = int(np.asarray(res["nsteps"]).sum())
el = time.perf_counter() - t0
print(f"public API: {el:.3f}s -> {tot/el/1e6:.2f}M steps/s", flush=True)
