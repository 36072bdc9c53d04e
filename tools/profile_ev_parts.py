"""Decompose the batched event-propagation cost (HH Poincare workload):

  a) fused multi-step kernel (the plain path's engine)      -> ceiling
  b) per-step engine chained in a lax.while_loop, NO events -> loop tax
  c) b + event-row recording (deferred driver, sweep off)    -> record tax
  d) the production ev driver (record + per-chunk sweep)     -> sweep tax

Identifies which structural layer eats the 10x batch event overhead
(VERDICT r2 item 2: close to <=3x).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import heyoka_tpu as hy  # noqa: E402

hy.s11n.enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

x, y, px, py = hy.make_vars("x", "y", "px", "py")
sys_ = [
    (x, px),
    (y, py),
    (px, -x - 2.0 * x * y),
    (py, -y - (x * x - y * y)),
]
ic = [0.0, 0.1, 0.35, 0.1]
B = 1024
T = 200.0
rng = np.random.default_rng(0)
states = np.asarray(ic)[None, :] + 1e-3 * rng.standard_normal((B, 4))

ev_b = hy.nt_event(y, lambda ta, t, d, lane: None,
                   direction=hy.EventDirection.positive)
bkw = dict(compact_mode="flat", mp_order=8, pallas_phase="auto")

tab_e = hy.taylor_adaptive_batch(sys_, states, tol=1e-15,
                                 high_accuracy=True, nt_events=[ev_b], **bkw)

# --- b) plain step chained in a while loop (the ev driver's skeleton) ---
plain = tab_e._ev_step_raw.plain_step_b
pars = jnp.zeros((B, 0), jnp.float64)


def chunk64(state, th, tl):
    def body(c):
        st, th, tl, it = c
        res = plain(st, pars, th, tl, jnp.full((B,), jnp.inf, jnp.float64))
        return (res["state"], res["t_hi"], res["t_lo"], it + 1)

    def cond(c):
        return c[3] < 64

    return lax.while_loop(cond, body, (state, th, tl, jnp.int32(0)))


from heyoka_tpu.taylor.compact_flat import jit_flat_step  # noqa: E402

ck = jit_flat_step(chunk64)
st = jnp.asarray(states)
z = jnp.zeros((B,), jnp.float64)
r = ck(st, z, z)
float(r[1][0])
n_ch = 6
t0 = time.perf_counter()
out = ck(st, z, z)
for _ in range(n_ch - 1):
    out = ck(out[0], out[1], out[2])
float(out[1][0])
el = time.perf_counter() - t0
print(f"b) plain-step while_loop: {n_ch*64*B/el:,.0f} lane-steps/s "
      f"({el/(n_ch*64)*1e3:.2f} ms/step)", flush=True)

# --- d) the production ev driver -------------------------------------
tab_e.propagate_until(10.0)
t0 = time.perf_counter()
_, _, _, ns = tab_e.propagate_until(T)
el = time.perf_counter() - t0
tot = int(np.asarray(ns).sum())
print(f"d) ev driver: {tot/el:,.0f} lane-steps/s", flush=True)

# --- a) fused kernel ceiling ------------------------------------------
tab_p = hy.taylor_adaptive_batch(sys_, states, tol=1e-15,
                                 high_accuracy=True, **bkw)
tab_p.propagate_until(10.0)
t0 = time.perf_counter()
_, _, _, ns = tab_p.propagate_until(T)
el = time.perf_counter() - t0
tot = int(np.asarray(ns).sum())
print(f"a) fused plain: {tot/el:,.0f} lane-steps/s", flush=True)
