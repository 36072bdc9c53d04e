"""Component-level profile of the batched event-detection step.

Times, on the current default device (TPU under axon), for the batched
Henon-Heiles Poincare workload (B lanes, one positive-direction nt event):

- the plain batched step (no events)
- the full event step (jet + step control + root isolation)
- the event step with root-finding stubbed (jet + control only)
- one call of the vmapped Collins-Akritas isolator alone
- the bisection refinement loop alone

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_events.py [B]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import heyoka_tpu as hy

hy.s11n.enable_compilation_cache()

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

x, y, px, py = hy.make_vars("x", "y", "px", "py")
sys_ = [
    (x, px),
    (y, py),
    (px, -x - 2.0 * x * y),
    (py, -y - (x * x - y * y)),
]
ic = [0.0, 0.1, 0.35, 0.1]
rng = np.random.default_rng(0)
states = np.asarray(ic)[None, :] + 1e-3 * rng.standard_normal((B, 4))

ev = hy.nt_event(y, lambda ta, t, d, lane: None,
                 direction=hy.EventDirection.positive)
tab_e = hy.taylor_adaptive_batch(sys_, states, tol=1e-15,
                                 high_accuracy=True, nt_events=[ev])
tab_p = hy.taylor_adaptive_batch(sys_, states, tol=1e-15,
                                 high_accuracy=True)

dtype = tab_e._dtype
st = jnp.asarray(states, dtype)
pars = jnp.zeros((B, 0), dtype)
t_hi = jnp.zeros((B,), dtype)
t_lo = jnp.zeros((B,), dtype)
mdt = jnp.full((B,), jnp.inf, dtype)
cds = tab_e._te_cooldowns


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # host-side scalar read to close the tunnel timing window
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf).ravel()[:1]
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    el = (time.perf_counter() - t0) / n
    print(f"{name:40s} {el * 1e3:9.3f} ms/call")
    return el


# plain batched step
timeit("plain step (_step_jit)", tab_p._step_jit, st, pars, t_hi, t_lo, mdt)

# full event step
timeit("event step (_ev_step)", tab_e._ev_step, st, pars, t_hi, t_lo, mdt,
       cds)

# jet + control only: rebuild the event step with find_roots stubbed
from heyoka_tpu.taylor import events_impl as EI

orig_iso = EI._make_isolator


def _stub_isolator(p, dt, max_roots):
    def isolate(c):
        return (jnp.full((max_roots,), 2.0, dt),
                jnp.full((max_roots,), 2.0, dt),
                jnp.zeros((max_roots,), bool))
    return isolate


EI._make_isolator = _stub_isolator
make = EI.build_event_step(tab_e._fns, tab_e._tape, tab_e._t_events,
                           tab_e._nt_events, dtype)
stub_step = jax.jit(jax.vmap(make(tab_e._tol)))
EI._make_isolator = orig_iso
timeit("event step, isolation stubbed", stub_step, st, pars, t_hi, t_lo,
       mdt, cds)

# isolator alone on a representative coefficient set (from the real jet)
tc = jax.vmap(lambda s, p_, t: tab_e._fns.jet(s, p_, t))(st, pars, t_hi)
order = tab_e._order
n_eq = 4
from heyoka_tpu.taylor import stepper as _st
h = jax.vmap(lambda c, m: _st.determine_h(c, order, n_eq, m))(tc, mdt)
gc = tc[:, :, n_eq:].transpose(0, 2, 1)  # (B, ne, K+1)
hp = jnp.concatenate(
    [jnp.ones((B, 1), dtype),
     jnp.cumprod(jnp.broadcast_to(h[:, None], (B, order)), axis=1)], axis=1)
cs = gc * hp[:, None, :]

iso = EI._make_isolator(order, dtype, EI.MAX_ROOTS)
iso_b = jax.jit(jax.vmap(jax.vmap(iso)))
timeit("CA isolator alone (vmapped)", iso_b, cs)
