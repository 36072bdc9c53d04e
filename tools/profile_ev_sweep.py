"""Split the deferred batch-event driver's cost (HH Poincare workload):

  b) plain-step while_loop (loop skeleton, no events)   -> step cost
  c) deferred driver with isolation STUBBED OUT          -> + record tax
  d) deferred driver as shipped                          -> + sweep tax
  e) the sweep's find_roots alone on a recorded chunk    -> sweep direct
  f) e with the sparse budget forced dense / wider       -> budget effect

Quantifies VERDICT r2 item 2's remaining gap layer by layer.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import heyoka_tpu as hy  # noqa: E402

hy.s11n.enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from heyoka_tpu.taylor import events as hev  # noqa: E402
from heyoka_tpu.taylor.events_impl import MAX_ROOTS  # noqa: E402
from heyoka_tpu.taylor.compact_flat import jit_flat_step  # noqa: E402

x, y, px, py = hy.make_vars("x", "y", "px", "py")
sys_ = [
    (x, px),
    (y, py),
    (px, -x - 2.0 * x * y),
    (py, -y - (x * x - y * y)),
]
ic = [0.0, 0.1, 0.35, 0.1]
B = 1024
rng = np.random.default_rng(0)
states = np.asarray(ic)[None, :] + 1e-3 * rng.standard_normal((B, 4))

ev_b = hy.nt_event(y, lambda ta, t, d, lane: None,
                   direction=hy.EventDirection.positive)
bkw = dict(compact_mode="flat", mp_order=8, pallas_phase="auto")
tab_e = hy.taylor_adaptive_batch(sys_, states, tol=1e-15,
                                 high_accuracy=True, nt_events=[ev_b], **bkw)
ev_step = tab_e._ev_step_raw
order = tab_e._order
CH = 64

pars = jnp.zeros((B, 0), jnp.float64)
z = jnp.zeros((B,), jnp.float64)
inf = jnp.full((B,), np.inf, jnp.float64)
cd0 = jnp.zeros((B, 0), jnp.float64)
act = jnp.ones((B,), bool)
tgt = jnp.full((B,), 1e9, jnp.float64)
ms0 = jnp.asarray(0, jnp.int64)


def timed(fn, *args, n=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


# --- d) the shipped deferred driver, one chunk ---------------------------
pu = jit_flat_step(hev.make_propagate_until_ev_batch(
    ev_step, order, 4, 0, 1, chunk=CH))
el_d, out_d = timed(lambda: pu(jnp.asarray(states), pars, z, z, tgt, z,
                               inf, ms0, cd0, act))
steps = CH * B
print(f"d) deferred driver: {el_d*1e3:8.1f} ms/chunk "
      f"({steps/el_d:,.0f} lane-steps/s)", flush=True)

# --- c) same driver with isolation stubbed out ---------------------------
def fake_roots(gc, h):
    R = gc.shape[0]
    return (jnp.full((R, 1, MAX_ROOTS), 2.0, gc.dtype),
            jnp.zeros((R, 1, MAX_ROOTS), bool),
            jnp.zeros((R, 1, MAX_ROOTS), jnp.int32))


stub = lambda *a, **k: ev_step(*a, **k)  # noqa: E731
stub.plain_step_b = ev_step.plain_step_b
stub.find_roots_b = fake_roots
stub.nt_dirs = ev_step.nt_dirs
pu_c = jit_flat_step(hev.make_propagate_until_ev_batch(
    stub, order, 4, 0, 1, chunk=CH))
el_c, _ = timed(lambda: pu_c(jnp.asarray(states), pars, z, z, tgt, z,
                             inf, ms0, cd0, act))
print(f"c) driver, no isolation: {el_c*1e3:8.1f} ms/chunk "
      f"({steps/el_c:,.0f} lane-steps/s)", flush=True)

# --- e) find_roots alone on a realistic recorded chunk -------------------
# reconstruct the recorded rows by stepping plain and keeping ev_row
plain = ev_step.plain_step_b


def record_chunk(state, th, tl):
    rows, hs, t0s = [], [], []
    for _ in range(CH):
        res = plain(state, pars, th, tl, inf)
        rows.append(res["ev_row"])
        hs.append(res["last_h"])
        t0s.append(th)
        state, th, tl = res["state"], res["t_hi"], res["t_lo"]
    return (jnp.stack(rows), jnp.stack(hs), jnp.stack(t0s))


rows, hs, t0s = record_chunk(jnp.asarray(states), z, z)
R = CH * B
rows_f = rows.reshape(R, 1, order + 1)
hs_f = hs.reshape(R)
fr = jax.jit(ev_step.find_roots_b)
el_e, out_e = timed(lambda: fr(rows_f, hs_f))
print(f"e) find_roots on chunk: {el_e*1e3:8.1f} ms "
      f"(R={R} rows)", flush=True)

# how often does the sparse budget overflow?
hp = jnp.concatenate(
    [jnp.ones((R, 1)), jnp.cumprod(
        jnp.broadcast_to(hs_f[:, None], (R, order)), axis=1)], axis=1)
cs = (rows_f * hp[:, None, :]).reshape(R, order + 1)
need = ~(jnp.abs(cs[:, 0]) > jnp.sum(jnp.abs(cs[:, 1:]), axis=1))
n_need = int(jnp.sum(need))
print(f"   fex survivors: {n_need}/{R} ({100*n_need/R:.1f}%), "
      f"sparse budget M={max(32, R // 8)} "
      f"-> {'DENSE fallback' if n_need > max(32, R // 8) else 'sparse path'}",
      flush=True)
